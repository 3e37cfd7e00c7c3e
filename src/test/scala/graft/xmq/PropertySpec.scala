package graft.xmq

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.charset.StandardCharsets

/** Property tests (SURVEY.md §5.2 item 3): print∘parse is the identity on
  * xmq output, quote-depth law, incidental-indent idempotence. */
class PropertySpec extends AnyFunSuite {

  /** deterministic sampling loop (scalatestplus not in the offline cache). */
  private def forAllN[T](gen: Gen[T], n: Int)(body: T => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(body)
      seed = seed.next
      i += 1
    }
  }

  private val nameGen: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaNumChar, Gen.const('_'), Gen.const('-')))
  } yield (h :: t).mkString

  private val textGen: Gen[String] = Gen.frequency(
    6 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const(' '), 1 -> Gen.const('\''),
      1 -> Gen.const('"'), 1 -> Gen.const('\n'), 1 -> Gen.const('='),
      1 -> Gen.const('&'), 1 -> Gen.const('{'), 1 -> Gen.const('('))).map(_.mkString),
    1 -> Gen.const("'''"),
    1 -> Gen.const("  leading and trailing  "),
    1 -> Gen.const("\n\nonly\nnewlines\n\n"))
    // spaces immediately before a newline are not representable in xmq — the
    // reference itself normalizes "x \ny" to "x\ny" (xmq_trim_quote drops
    // line-trailing whitespace at parse; verified against the binary)
    .map(_.replaceAll(" +\n", "\n"))

  private def elemGen(depth: Int): Gen[XElem] = for {
    name <- nameGen
    nAttrs <- Gen.choose(0, 2)
    attrs <- Gen.listOfN(nAttrs, for { k <- nameGen; v <- textGen } yield (k, v))
    nKids <- if (depth >= 2) Gen.const(0) else Gen.choose(0, 3)
    kids <- Gen.listOfN(nKids, Gen.frequency(
      4 -> elemGen(depth + 1).map(e => e: XNode),
      2 -> textGen.filter(_.nonEmpty).map(t => new XText(t): XNode),
      // comment content is per-line ws-trimmed: the reference's un-comment
      // drops leading blank lines / line-leading spaces (compact continuations
      // add no separator space) — such content is not representable
      1 -> textGen.map { t0 =>
        val t = t0.trim.replaceAll("(?m)^ +| +$", "")
        new XComment(if (t.isEmpty) "c" else t): XNode
      }))
    leafText <- textGen
  } yield {
    val e = new XElem(name)
    attrs.zipWithIndex.foreach { case ((k, v), i) =>
      val a = new XAttr(null, k + i) // unique keys
      a.appendText(v)
      e.attrs += a
    }
    if (kids.isEmpty) { if (leafText.nonEmpty) e.appendChild(new XText(leafText)) }
    else kids.foreach(e.appendChild)
    e
  }

  private def treeEquals(a: XNode, b: XNode): Boolean = (a, b) match {
    case (x: XElem, y: XElem) =>
      x.name == y.name && x.attrs.length == y.attrs.length &&
        x.attrs.zip(y.attrs).forall { case (p, q) =>
          p.key == q.key && p.stringValue == q.stringValue } &&
        x.children.length == y.children.length &&
        x.children.zip(y.children).forall { case (p, q) => treeEquals(p, q) }
    case (x: XText, y: XText) => x.content == y.content
    case (x: XComment, y: XComment) => x.content == y.content
    case (x: XEntityRef, y: XEntityRef) => x.name == y.name
    case _ => false
  }

  // NOTE: arbitrary content is first normalized through one parse∘print round
  // — like the reference, xmq cannot represent line-trailing spaces or some
  // leading-newline indentation shapes exactly (verified against the binary:
  // json "\n\nonly\nnl\n\n" re-reads as "\n\n only\n nl\n\n" there too).
  private def normalize(doc: XDoc, compact: Boolean): XDoc =
    XmqBuilder.parse(XmqPrinter.print(doc, compact).getBytes(StandardCharsets.UTF_8))

  test("parse(print(tree)) == tree for normalized random trees (pretty and compact)") {
    forAllN(elemGen(0), 200) { root =>
      val doc0 = new XDoc
      doc0.appendChild(root)
      for (compact <- Seq(false, true)) {
        val doc = normalize(doc0, compact)
        val printed = XmqPrinter.print(doc, compact)
        val reparsed = XmqBuilder.parse(printed.getBytes(StandardCharsets.UTF_8))
        assert(reparsed.children.length == doc.children.length,
          s"compact=$compact printed:\n$printed")
        doc.children.zip(reparsed.children).foreach { case (a, b) =>
          assert(treeEquals(a, b), s"compact=$compact not inverse. printed:\n$printed")
        }
      }
    }
  }

  test("xmq print reaches a fixed point after one normalization round") {
    forAllN(elemGen(0), 100) { root =>
      val doc0 = new XDoc
      doc0.appendChild(root)
      val once = XmqPrinter.print(normalize(doc0, compact = false))
      val twice = XmqPrinter.print(XmqBuilder.parse(once.getBytes(StandardCharsets.UTF_8)))
      assert(once == twice, s"not a fixed point:\n$once\nvs\n$twice")
    }
  }

  test("quote-depth law: n-quote runs of both kinds need max(3, n+1) quotes") {
    val p = new XmqPrinter(XmqSettings())
    forAllN(Gen.zip(Gen.choose(1, 6), Gen.alphaStr.suchThat(_.nonEmpty)), 100) { case (n, pad) =>
      // equal runs of ' and " force the printer to quote with n+1 singles
      val content = pad + ("'" * n) + pad + ("\"" * n) + pad
      val (numq, _, _, useDq) = p.countNecessaryQuotes(content, 0, content.length)
      assert(!useDq)
      assert(numq == math.max(3, n + 1), s"n=$n numq=$numq")
    }
  }

  test("trim drops exactly one trailing newline (reference semantics)") {
    forAllN(Gen.zip(Gen.alphaStr.suchThat(_.nonEmpty), Gen.choose(1, 4)), 100) { case (w, k) =>
      val s = w + ("\n" * k)
      val out = Trim.trimQuote(s, 0, s.length, isXmq = false, isComment = false)
      assert(out == w + ("\n" * (k - 1)))
    }
  }

  test("json round-trip: parse(print_json(parse_json(x))) has identical json output") {
    val jsonGen: Gen[String] = Gen.oneOf(
      """{"a":1,"b":[1,2,"3"],"c":{"d":null,"e":true}}""",
      """[1,2.5,-3e2,"x",false,null,{"k":"v"}]""",
      """{"weird key":"v","":"empty","a":{"a":{"a":[]}}}""",
      """"just a string"""", """42""", """true""")
    forAllN(jsonGen, 30) { j =>
      val d1 = JsonParser.parse(j)
      val out1 = JsonPrinter.print(d1)
      val d2 = JsonParser.parse(out1)
      val out2 = JsonPrinter.print(d2)
      assert(out1 == out2)
    }
  }
}
