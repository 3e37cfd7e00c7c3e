package graft.xmq.ixml

import graft.xmq._
import scala.collection.mutable.ArrayBuffer

/** Top-level Invisible-XML entry: parse input text with an iXML grammar into
  * an XDoc (reference: `xmq --ixml=grammar.ixml input`, xmq.c ixml engine).
  * On parse failure, returns the reference's failure document:
  * {{{
  * ixml(ixml:state = failed xmlns:ixml = http://invisiblexml.org/NS) {
  *   info = 'ixml:L:C: syntax error\n<line>\n<caret>' line = L column = C pos = P }
  * }}}
  * with pos = (1-based) position just past the furthest successful scan —
  * verified against tests/ixml_not_*.test.
  */
object Ixml {

  def parseToDoc(grammarText: String, inputText: String): XDoc = {
    val g = IxmlReader.parse(grammarText)
    try Earley.parse(g, inputText)
    catch {
      case Earley.IxmlParseError(at) =>
        failureDoc(inputText, at)
    }
  }

  /** --ixml-all-parses: single parse prints normally; ambiguity produces the
    * reference's AMBIGUOUS(state=ambiguous) wrapper with one child per
    * distinct parse (tests/ixml_parse_020_ambig.test). */
  def parseAllToDoc(grammarText: String, inputText: String): XDoc = {
    val g = IxmlReader.parse(grammarText)
    try {
      val docs = Earley.parseAll(g, inputText)
      if (docs.length == 1) docs.head
      else {
        val doc = new XDoc
        val root = new XElem("AMBIGUOUS")
        val st = new XAttr(null, "state")
        st.appendText("ambiguous")
        root.attrs += st
        root.nsDefs += NsDef("ixml", "http://invisiblexml.org/NS")
        docs.foreach(_.children.foreach {
          case e: XElem => root.appendChild(e)
          case _ =>
        })
        doc.appendChild(root)
        doc
      }
    } catch {
      case Earley.IxmlParseError(at) =>
        failureDoc(inputText, at)
    }
  }

  /** The reference failure document (xmq.c:4778-4830
    * handle_yaep_syntax_error), reproduced exactly:
    *  - line/col from find_line_col (text.c:707) — col resets to 0 when a
    *    newline is consumed, so on lines >= 2 the column is the 0-based
    *    offset within the line (a faithful quirk);
    *  - the info snippet is a raw BYTE window [at-20, at+20) of the input —
    *    newlines included — with the caret under byte column at-start;
    *    `at` is a codepoint index used as a byte index (faithful to the C,
    *    which indexes char* with the yaep token number);
    *  - pos = at + 1. */
  def failureDoc(input: String, at: Int): XDoc = {
    val cps = input.codePoints().toArray
    var line = 1
    var col = 1
    var k = 0
    while (k < cps.length && k < at) {
      col += 1
      if (cps(k) == '\n') { line += 1; col = 0 }
      k += 1
    }

    val bytes = input.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val start = math.max(0, at - 20)
    val stop = math.min(at + 20, bytes.length)
    val window =
      if (start >= bytes.length) ""
      else new String(bytes, start, stop - start, java.nio.charset.StandardCharsets.UTF_8)

    val doc = new XDoc
    val root = new XElem("ixml")
    val st = new XAttr("ixml", "state")
    st.appendText("failed")
    root.attrs += st
    root.nsDefs += NsDef("ixml", "http://invisiblexml.org/NS")
    def kv(name: String, v: String): Unit = {
      val e = new XElem(name)
      e.appendText(v)
      root.appendChild(e)
    }
    kv("info", s"ixml:$line:$col: syntax error\n$window\n${" " * (at - start)}^")
    kv("line", line.toString)
    kv("column", col.toString)
    kv("pos", (at + 1).toString)
    doc.appendChild(root)
    doc
  }
}
