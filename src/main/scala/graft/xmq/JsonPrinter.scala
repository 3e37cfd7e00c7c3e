package graft.xmq

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** xmq tree → JSON printer. Re-expression of
  * /root/reference/src/main/c/parts/json.c:863-1621: duplicate sibling keys
  * get [i] suffixes, "A"/"S"/"_" markers honored, comments → "//" keys,
  * doctype → "!DOCTYPE", standalone text → "|" keys, entities → "&" keys.
  */
object JsonPrinter {

  def print(doc: XDoc): String = printCollect(doc)._1

  /** print + the conversion-loss warnings (reference: stderr, so the CLI
    * shows them before the buffered json). */
  def printCollect(doc: XDoc): (String, Seq[String]) = {
    fixupJson(doc)
    val p = new JsonPrinter
    p.printTop(doc)
    (p.result, p.warnings.toSeq)
  }

  /** fixup_json: collapse multi text/charentity children into one text node. */
  def fixupJson(doc: XDoc): Unit = {
    def fix(e: XElem): Unit = {
      val collapsed = collapseText(e)
      if (collapsed != null) {
        e.children.clear()
        e.appendChild(new XText(collapsed))
      } else e.children.foreach { case c: XElem => fix(c); case _ => }
    }
    doc.children.foreach { case e: XElem => fix(e); case _ => }
  }

  /** xml.c xml_collapse_text: null when not collapsible / already collapsed. */
  private def collapseText(e: XElem): String = {
    var numText = 0
    var numEntities = 0
    e.children.foreach {
      case _: XText => numText += 1
      case _: XEntityRef => numEntities += 1
      case _ => return null
    }
    if (numText <= 1 && numEntities == 0) return null
    val sb = new StringBuilder
    e.children.foreach {
      case t: XText => sb.append(t.content)
      case r: XEntityRef =>
        val cp = TextUtil.decodeEntityRef(r.name)
        if (cp > 0) sb.appendAll(Character.toChars(cp))
      case _ =>
    }
    sb.toString
  }
}

final class JsonPrinter {
  private val sb = new StringBuilder
  private var lastChar: Char = 0
  /** conversion-loss diagnostics (reference PRINT_WARNING → stderr). */
  val warnings = new ArrayBuffer[String]()

  def result: String = sb.toString

  private def w(s: String): Unit = {
    sb.append(s)
    if (s.nonEmpty) lastChar = s.charAt(s.length - 1)
  }

  private def checkComma(): Unit = {
    val c = lastChar
    if (c == 0) return
    if (c != '{' && c != '[' && c != ',') { sb.append(','); lastChar = ',' }
  }

  def printTop(doc: XDoc): Unit = {
    // collect leading doctype/comments and trailing comments
    val nodes = doc.children
    var first = 0
    var last = nodes.length - 1
    val preNodes = new ArrayBuffer[XNode]()
    val postNodes = new ArrayBuffer[XNode]()
    var numComments = 0
    while (first <= last && (nodes(first).isInstanceOf[XDoctype] || nodes(first).isInstanceOf[XComment])) {
      preNodes += nodes(first)
      if (nodes(first).isInstanceOf[XComment]) numComments += 1
      first += 1
    }
    while (last > first && nodes(last).isInstanceOf[XComment]) {
      postNodes += nodes(last)
      numComments += 1
      last -= 1
    }
    printObjectNodes(null, nodes.slice(first, last + 1), preNodes, postNodes, numComments)
    sb.append('\n')
  }

  /** json_print_object_nodes with the duplicate-key counter. */
  private def printObjectNodes(container: XElem, nodes: collection.Seq[XNode],
                               preNodes: collection.Seq[XNode] = Nil,
                               postNodes: collection.Seq[XNode] = Nil,
                               prePostComments: Int = 0): Unit = {
    val totals = mutable.HashMap.empty[String, Int]
    nodes.foreach { n =>
      val name = Nodes.jsonCountName(n)
      if (name != null && name != "_") totals(name) = totals.getOrElse(name, 0) + 1
    }
    val used = mutable.HashMap.empty[String, Int]
    var prePostUsed = 0

    nodes.zipWithIndex.foreach { case (n, idx) =>
      if (idx == 0 && container == null) {
        // handled by caller order: element-with-children prints pre/post inside braces
      }
      val name = Nodes.jsonCountName(n)
      if (name != null && name != "_") {
        val t = totals(name)
        val u = used.getOrElse(name, 0)
        printNode(container, n, t, u,
          if (idx == 0) preNodes else Nil, if (idx == nodes.length - 1) postNodes else Nil,
          prePostComments)
        used(name) = u + 1
      } else {
        printNode(container, n, 1, 0,
          if (idx == 0) preNodes else Nil, if (idx == nodes.length - 1) postNodes else Nil,
          prePostComments)
      }
    }
  }

  private def printArrayNodes(nodes: collection.Seq[XNode]): Unit = {
    nodes.foreach { n =>
      checkComma()
      n match {
        case e: XElem =>
          val forceString = e.attr("S").isDefined
          val content = singleTextContent(e)
          val isNum = content != null && JsonParser.jsonIsNumber(content)
          val isKw = content != null && JsonParser.jsonIsKeyword(content)
          if ((forceString || isNum || isKw) && e.children.nonEmpty)
            printValue(e.children, forceString)
          else printNode(null, e, 1, 0)
        case other => printNode(null, other, 1, 0)
      }
    }
  }

  private def singleTextContent(e: XElem): String =
    if (e.children.length == 1) e.children.head match {
      case t: XText => t.content
      case _ => null
    } else null

  private def hasAttrOtherThanAS_(e: XElem): Boolean =
    e.attrs.exists(a => a.key != "A" && a.key != "S" && a.key != "_")

  private def printNode(container: XElem, node: XNode, total: Int, used: Int,
                        preNodes: collection.Seq[XNode] = Nil,
                        postNodes: collection.Seq[XNode] = Nil,
                        prePostComments: Int = 0): Unit = node match {
    case c: XComment => printCommentNode(c, prefixUl = false, total, used)
    case t: XText => printStandaloneQuote(t, total, used)
    case r: XEntityRef => printEntityNode(r)
    case e: XElem =>
      if (Nodes.isLeaf(e) && container != null) printLeafNode(container, e, total, used)
      else if (Nodes.isKeyValueNode(e) && (e.attrs.isEmpty || !hasAttrOtherThanAS_(e)))
        printKeyNode(container, e, total, used, e.attr("S").isDefined)
      else if (e.attr("A").isDefined) {
        // json.c:993-1004: arrays drop the element name (top level) and any
        // non-marker attributes — warn like PRINT_WARNING does
        if (e.name != "_" && container == null)
          warnings += s"""xmq: Warning! The element name "${e.name}" is lost when converted to an unnamed json array!"""
        if (hasAttrOtherThanAS_(e))
          warnings += s"""xmq: Warning! The element "${e.name}" loses its attributes when converted to a json array!"""
        printArrayWithChildren(container, e)
      }
      else printElementWithChildren(container, e, total, used, preNodes, postNodes, prePostComments)
    case d: XDoctype => printDoctypeNode(d)
    case _ =>
  }

  private def printValue(parts: collection.Seq[XNode], forceString: Boolean): Unit = {
    val single = parts.length == 1
    val content = parts.head match {
      case t: XText => t.content
      case _ => null
    }
    if (single && !forceString && content != null &&
        (JsonParser.jsonIsNumber(content) || JsonParser.jsonIsKeyword(content))) {
      w(content)
    } else if (single && content != null && content.isEmpty) {
      w("\"\"")
    } else {
      w("\"")
      parts.foreach {
        case r: XEntityRef => w("&" + r.name + ";")
        case t: XText => w(TextUtil.quoteAsC(t.content))
        case _ =>
      }
      w("\"")
      lastChar = '"'
    }
  }

  private def printElementName(container: XElem, e: XElem, total: Int, used: Int): Unit = {
    w("\"")
    if (e.nsPrefix != null) { w(e.nsPrefix); w(":") }
    if (e.name != "_") w(e.name)
    else e.attr("_").foreach { a => w(TextUtil.quoteAsC(a.stringValue)) }
    if (total > 1) w("[" + used + "]")
    w("\"")
    lastChar = '"'
  }

  private def printAttributes(e: XElem): Unit = {
    e.attrs.foreach { a =>
      if (a.key != "_") {
        checkComma()
        w("\"_")
        if (a.nsPrefix != null) { w(a.nsPrefix); w(":") }
        w(TextUtil.quoteAsC(a.key)); w("\":")
        if (a.values != null) { w("\""); w(TextUtil.quoteAsC(a.stringValue)); w("\"") }
        else w("null")
      }
    }
    e.nsDefs.foreach { ns =>
      checkComma()
      w("\"_xmlns")
      if (ns.prefix != null) { w(":"); w(ns.prefix) }
      w("\":")
      if (ns.href != null) { w("\""); w(ns.href); w("\"") } else w("null")
    }
  }

  private def printElementWithChildren(container: XElem, e: XElem, total: Int, used: Int,
                                       preNodes: collection.Seq[XNode],
                                       postNodes: collection.Seq[XNode],
                                       prePostComments: Int): Unit = {
    checkComma()
    if (container != null) {
      printElementName(container, e, total, used)
      w(":")
    }
    w("{")
    lastChar = '{'

    var prePostUsed = 0
    if (container == null) {
      preNodes.foreach {
        case d: XDoctype => printDoctypeNode(d)
        case c: XComment =>
          printCommentNode(c, prefixUl = true, prePostComments, prePostUsed); prePostUsed += 1
        case _ =>
      }
    }

    if (container == null && e.name != "_") {
      checkComma()
      w("\"_\":")
      lastChar = ':'
      printElementName(container, e, total, used)
    }
    printAttributes(e)
    printObjectNodes(e, e.children)

    if (container == null) {
      postNodes.foreach {
        case c: XComment =>
          printCommentNode(c, prefixUl = true, prePostComments, prePostUsed); prePostUsed += 1
        case _ =>
      }
    }
    w("}")
    lastChar = '}'
  }

  private def printArrayWithChildren(container: XElem, e: XElem): Unit = {
    checkComma()
    if (container != null) {
      printElementName(container, e, 1, 0)
      w(":")
    }
    w("[")
    lastChar = '['
    printArrayNodes(e.children)
    w("]")
    lastChar = ']'
  }

  private def printKeyNode(container: XElem, e: XElem, total: Int, used: Int,
                           forceString: Boolean): Unit = {
    checkComma()
    if (container != null) {
      printElementName(container, e, total, used)
      w(":")
      lastChar = ':'
    }
    printValue(e.children, forceString)
  }

  private def printLeafNode(container: XElem, e: XElem, total: Int, used: Int): Unit = {
    checkComma()
    if (e.name != null && e.name != "_") {
      printElementName(container, e, total, used)
      w(":")
    }
    if (e.attr("A").isDefined) { w("[]"); lastChar = ']' }
    else if (e.attrs.nonEmpty || e.nsDefs.nonEmpty) {
      w("{"); lastChar = '{'
      printAttributes(e)
      w("}"); lastChar = '}'
    } else { w("{}"); lastChar = '}' }
  }

  private def printCommentNode(c: XComment, prefixUl: Boolean, total: Int, used: Int): Unit = {
    checkComma()
    if (prefixUl) w("\"_//") else w("\"//")
    if (total > 1) w("[" + used + "]\":") else w("\":")
    lastChar = ':'
    printValue(Seq(new XText(c.content)), forceString = true)
    lastChar = '"'
  }

  private def printDoctypeNode(d: XDoctype): Unit = {
    checkComma()
    w("\"!DOCTYPE\":")
    lastChar = ':'
    w("\""); w(TextUtil.quoteAsC(d.value)); w("\"")
    lastChar = '"'
  }

  private def printEntityNode(r: XEntityRef): Unit = {
    checkComma()
    w("\"&\":\"&" + r.name + ";\"")
    lastChar = '"'
  }

  private def printStandaloneQuote(t: XText, total: Int, used: Int): Unit = {
    checkComma()
    if (total == 1) w("\"|\":\"" + TextUtil.quoteAsC(t.content) + "\"")
    else w("\"|[" + used + "]\":\"" + TextUtil.quoteAsC(t.content) + "\"")
    lastChar = '"'
  }
}
