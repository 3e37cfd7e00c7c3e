package graft.xmq

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** XPath predicate/position/count coverage. Every `select` expectation here
  * was verified byte-for-byte against the compiled reference binary
  * (/tmp/refbuild .../xmq <file> select <xpath> to-xmq --compact), including
  * the reverse-document-order select output and the empty result for
  * relative paths (libxml2 NULL context node). */
class XPathSpec extends AnyFunSuite {

  private val books =
    """<root>
      |  <book id="1" cat="a"><title>Alpha</title><price>10</price></book>
      |  <book id="2" cat="b"><title>Beta</title><price>20</price></book>
      |  <book id="3" cat="a"><title>Gamma</title><price>30</price></book>
      |  <shelf><book id="4" cat="c"><title>Delta</title></book><book id="5"><title>Eps</title></book></shelf>
      |</root>""".stripMargin

  private def sel(xpath: String): String = {
    val r = Cli.run(books.getBytes(StandardCharsets.UTF_8), "",
      s"select $xpath to-xmq --compact")
    assert(r.ok, s"select failed: ${r.error}")
    r.output.stripSuffix("\n")
  }

  test("positional predicate counts within each parent (libxml2 semantics)") {
    assert(sel("//book[2]") == "book(id=5){title=Eps}book(id=2 cat=b){title=Beta price=20}")
    assert(sel("//shelf/book[1]/title/text()") == "'Delta'")
    assert(sel("/root/*[2]") == "book(id=2 cat=b){title=Beta price=20}")
  }

  test("attribute predicates: existence and equality") {
    assert(sel("//book[@cat=\"a\"]") ==
      "book(id=3 cat=a){title=Gamma price=30}book(id=1 cat=a){title=Alpha price=10}")
    assert(sel("//book[@cat=\"a\"][2]") == "book(id=3 cat=a){title=Gamma price=30}")
    assert(sel("//*[@cat]") ==
      "book(id=4 cat=c){title=Delta}book(id=3 cat=a){title=Gamma price=30}" +
      "book(id=2 cat=b){title=Beta price=20}book(id=1 cat=a){title=Alpha price=10}")
  }

  test("child-value predicate and last()") {
    assert(sel("//book[title=\"Beta\"]") == "book(id=2 cat=b){title=Beta price=20}")
    assert(sel("/root/book[price=\"30\"]/title") == "title=Gamma")
    assert(sel("//book[last()]") ==
      "book(id=5){title=Eps}book(id=3 cat=a){title=Gamma price=30}")
  }

  test("count() yields a number document like cmd_select's XPATH_NUMBER") {
    assert(sel("count(//book)") == "'5'")
    assert(sel("count(//book[@cat=\"a\"])") == "'2'")
  }

  test("attribute steps select in reverse document order like the reference") {
    assert(sel("//book/@id") == "id=5 id=4 id=3 id=2 id=1")
    assert(sel("//book[1]/@id") == "id=4 id=1")
  }

  test("relative paths match nothing (libxml2 NULL context node)") {
    assert(XPath.matches(parseDoc(books), "root//book").isEmpty)
  }

  test("descendant step between names: a//b") {
    assert(sel("/root//title") ==
      "title=Eps title=Delta title=Gamma title=Beta title=Alpha")
  }

  private def parseDoc(s: String): XDoc =
    XmqEngine.parse(s.getBytes(StandardCharsets.UTF_8),
      XmqEngine.ParseFlags(forced = Xmq.XML))

  test("annotateOffsets reproduces the reference internal test (testinternals.c:761)") {
    val doc = parseDoc("<root>ABC<a>xyz</a>DEFG<b>112233</b></root>")
    TreeOps.annotateOffsets(doc, "o")
    val out = XmqEngine.toXmq(doc, compact = true)
    assert(out == "root(o=0){'ABC'a(o=3)=xyz'DEFG'b(o=10)=112233}\n", s"got: $out")
  }

  test("typed getters: string/long/double and C numeric parsing") {
    val x = "<cfg><port>0x1f</port><oct>017</oct><rate>2.5e2abc</rate><name>srv1</name></cfg>"
    assert(XmqExprsFacade.getString(x, "/cfg/name") == "srv1")
    assert(XmqExprsFacade.getLong(x, "/cfg/port") == 31L)   // 0x1f hex
    assert(XmqExprsFacade.getLong(x, "/cfg/oct") == 15L)    // 017 octal
    assert(XmqExprsFacade.getLong(x, "/cfg/name") == 0L)    // atol on garbage
    assert(XmqExprsFacade.getDouble(x, "/cfg/rate") == 250.0) // strtod prefix
    assert(XmqExprsFacade.getString(x, "/cfg/missing") == null)
  }

  // differential: every expression runs through BOTH engines when the
  // compiled reference binary is present (xpath values double-quoted so the
  // same bytes reach libxml2 and our parser)
  private val refBinary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"
  if (java.nio.file.Files.exists(java.nio.file.Paths.get(refBinary))) {
    val exprs = Seq(
      """//book[contains(title,"a")]""",
      """//book[starts-with(title,"B")]""",
      """//book[not(@cat)]""",
      """//book[@id>2]""",
      """//book[@id>=2 and @cat="a"]""",
      """//book[@cat="a" or @cat="b"]""",
      """//book[position()>1]""",
      """//book[title="Beta" or price=30]""",
      """//book[string-length(title)=4]""",
      """//book[contains(.,"mm")]""",
      """//*[text()="Alpha"]""",
      """//book[@id!=2]""",
      """count(//book[@id<4])""",
      """//shelf/book[last()]""",
      """//book[normalize-space(title)="Eps"]""")
    val inFile = java.nio.file.Files.createTempFile("xpdiff", ".xml")
    java.nio.file.Files.write(inFile, books.getBytes(StandardCharsets.UTF_8))
    for (x <- exprs) test(s"differential vs libxml2: $x") {
      val pb = new ProcessBuilder(refBinary, inFile.toString, "select", x, "to-xmq", "--compact")
      val proc = pb.start()
      val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      proc.waitFor()
      val mine = Cli.run(books.getBytes(StandardCharsets.UTF_8), "",
        s"select $x to-xmq --compact")
      assert(mine.ok, s"${mine.error}")
      assert(mine.output == ref, s"\n--- ref:\n$ref--- mine:\n${mine.output}")
    }
  }

  test("is_wellformed accepts valid content and rejects truncated content") {
    assert(graft.expr.XmqExprs.isWellformed("<a><b>x</b></a>", "xml"))
    assert(!graft.expr.XmqExprs.isWellformed("<a><b>x</b>", "xml"))
    assert(graft.expr.XmqExprs.isWellformed("{\"a\": 1}", "json"))
    assert(!graft.expr.XmqExprs.isWellformed("{\"a\": ", "json"))
    assert(graft.expr.XmqExprs.isWellformed("a{b=c}", "xmq"))
    assert(!graft.expr.XmqExprs.isWellformed("a{b=c", "xmq"))
  }
}

/** test facade defaulting lang=xml for the getter helpers. */
private object XmqExprsFacade {
  def getString(c: String, p: String): String = graft.expr.XmqExprs.getString(c, "xml", p)
  def getLong(c: String, p: String): Long = graft.expr.XmqExprs.getLong(c, "xml", p)
  def getDouble(c: String, p: String): Double = graft.expr.XmqExprs.getDouble(c, "xml", p)
}
