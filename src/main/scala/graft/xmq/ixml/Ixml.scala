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
      case Earley.IxmlParseError(line, col, pos) =>
        failureDoc(inputText, line, col, pos)
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
      case Earley.IxmlParseError(line, col, pos) =>
        failureDoc(inputText, line, col, pos)
    }
  }

  def failureDoc(input: String, line: Int, col: Int, pos: Int): XDoc = {
    val doc = new XDoc
    val root = new XElem("ixml")
    val st = new XAttr("ixml", "state")
    st.appendText("failed")
    root.attrs += st
    root.nsDefs += NsDef("ixml", "http://invisiblexml.org/NS")
    val lineText = input.split("\n", -1).lift(line - 1).getOrElse("")
    def kv(name: String, v: String): Unit = {
      val e = new XElem(name)
      e.appendText(v)
      root.appendChild(e)
    }
    kv("info", s"ixml:$line:$col: syntax error\n$lineText\n${" " * (col - 1)}^")
    kv("line", line.toString)
    kv("column", col.toString)
    kv("pos", pos.toString)
    doc.appendChild(root)
    doc
  }
}
