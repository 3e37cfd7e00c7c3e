package graft.xmq

/** XML/HTML serializers byte-matching libxml2's unformatted output
  * (xmlDocDumpMemoryEnc / htmlDocContentDumpOutput) for the corpus:
  * - XML decl + one newline after each top-level node
  * - text escapes & < > and CR; attributes escape & < > " and \n \r \t
  * - comment -- escaping via U+2410 applied before writeout
  *   (xmq.c:3565-3650 escape_xml_comment)
  * - html: void elements never self-close, boolean attrs have no value,
  *   script/style content raw, block-ish formatting newlines per libxml2
  */
object XmlPrinter {

  def printXml(doc: XDoc, withDecl: Boolean = true): String = {
    val sb = new StringBuilder
    if (withDecl) {
      sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"")
      if (doc.standalone == 1) sb.append(" standalone=\"yes\"")
      else if (doc.standalone == 0) sb.append(" standalone=\"no\"")
      sb.append("?>\n")
    }
    doc.children.foreach { n =>
      writeNode(sb, n)
      sb.append('\n')
    }
    sb.toString
  }

  private def writeNode(sb: StringBuilder, n: XNode): Unit = n match {
    case t: XText => sb.append(escapeText(t.content))
    case r: XEntityRef => sb.append('&').append(r.name).append(';')
    case c: XComment => sb.append("<!--").append(escapeComment(c.content)).append("-->")
    case p: XPi =>
      sb.append("<?").append(p.name)
      if (p.content != null && p.content.nonEmpty) sb.append(' ').append(p.content)
      sb.append("?>")
    case d: XDoctype => sb.append("<!DOCTYPE ").append(d.value).append('>')
    case e: XElem => writeElement(sb, e)
  }

  private def writeElement(sb: StringBuilder, e: XElem): Unit = {
    sb.append('<')
    if (e.nsPrefix != null) sb.append(e.nsPrefix).append(':')
    sb.append(e.name)
    e.nsDefs.foreach { ns =>
      sb.append(" xmlns")
      if (ns.prefix != null) sb.append(':').append(ns.prefix)
      sb.append("=\"")
      if (ns.href != null) sb.append(escapeAttr(ns.href))
      sb.append('"')
    }
    e.attrs.foreach { a =>
      sb.append(' ')
      if (a.nsPrefix != null) sb.append(a.nsPrefix).append(':')
      sb.append(a.key)
      sb.append("=\"")
      if (a.values != null) a.values.foreach {
        case t: XText => sb.append(escapeAttr(t.content))
        case r: XEntityRef => sb.append('&').append(r.name).append(';')
        case _ =>
      }
      sb.append('"')
    }
    if (e.children.isEmpty) { sb.append("/>"); return }
    sb.append('>')
    e.children.foreach(writeNode(sb, _))
    sb.append("</")
    if (e.nsPrefix != null) sb.append(e.nsPrefix).append(':')
    sb.append(e.name).append('>')
  }

  def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '\r' => sb.append("&#13;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def escapeAttr(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\n' => sb.append("&#10;")
      case '\r' => sb.append("&#13;")
      case '\t' => sb.append("&#9;")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** escape_xml_comment: each "--" gets a ␐ inserted; existing -␐ doubled. */
  def escapeComment(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(c)
      if (c == '-' && i + 1 < s.length &&
          (s.charAt(i + 1) == '-' || s.charAt(i + 1) == '␐')) {
        sb.append('␐')
      }
      i += 1
    }
    sb.toString
  }
}

object HtmlPrinter {

  import XmlParser.{VoidElements, RawTextElements}

  /** html 4.0 element table tags known to libxml2 (htmlElemDesc). */
  private val KnownTags: Set[String] = Set(
    "a", "abbr", "acronym", "address", "applet", "area", "b", "base",
    "basefont", "bdo", "big", "blockquote", "body", "br", "button", "caption",
    "center", "cite", "code", "col", "colgroup", "dd", "del", "dfn", "dir",
    "div", "dl", "dt", "em", "embed", "fieldset", "font", "form", "frame",
    "frameset", "h1", "h2", "h3", "h4", "h5", "h6", "head", "hr", "html",
    "i", "iframe", "img", "input", "ins", "isindex", "kbd", "label", "legend",
    "li", "link", "map", "menu", "meta", "noframes", "noscript", "object",
    "ol", "optgroup", "option", "p", "param", "pre", "q", "s", "samp",
    "script", "select", "small", "span", "strike", "strong", "style", "sub",
    "sup", "table", "tbody", "td", "textarea", "tfoot", "th", "thead",
    "title", "tr", "tt", "u", "ul", "var")

  /** isinline==1 entries of the same table. */
  private val InlineTags: Set[String] = Set(
    "a", "abbr", "acronym", "applet", "b", "basefont", "bdo", "big", "br",
    "button", "cite", "code", "del", "dfn", "em", "font", "i", "iframe",
    "img", "input", "ins", "kbd", "label", "map", "object", "q", "s", "samp",
    "select", "small", "span", "strike", "strong", "sub", "sup", "textarea",
    "tt", "u", "var")

  private def isBlockKnown(name: String): Boolean =
    KnownTags.contains(name) && !InlineTags.contains(name)

  def printHtml(doc: XDoc): String = {
    val sb = new StringBuilder
    doc.children.foreach { n =>
      writeNode(sb, n)
      sb.append('\n')
    }
    sb.toString
  }

  private def isTextual(n: XNode): Boolean =
    n.isInstanceOf[XText] || n.isInstanceOf[XEntityRef]

  private def nameStartsWithP(n: XNode): Boolean = n match {
    case e: XElem => e.name.nonEmpty && e.name.charAt(0) == 'p'
    case _ => false
  }

  private def writeNode(sb: StringBuilder, n: XNode): Unit = n match {
    case t: XText => sb.append(escapeText(t.content))
    case r: XEntityRef => sb.append('&').append(r.name).append(';')
    case c: XComment => sb.append("<!--").append(XmlPrinter.escapeComment(c.content)).append("-->")
    case p: XPi =>
      sb.append("<?").append(p.name)
      if (p.content != null && p.content.nonEmpty) sb.append(' ').append(p.content)
      sb.append(">") // libxml2 html PIs close with > not ?>
    case d: XDoctype => sb.append("<!DOCTYPE ").append(d.value).append('>')
    case e: XElem => writeElement(sb, e)
  }

  private def writeElement(sb: StringBuilder, e: XElem): Unit = {
    sb.append('<')
    if (e.nsPrefix != null) sb.append(e.nsPrefix).append(':')
    sb.append(e.name)
    e.nsDefs.foreach { ns =>
      sb.append(" xmlns")
      if (ns.prefix != null) sb.append(':').append(ns.prefix)
      sb.append("=\"")
      if (ns.href != null) sb.append(XmlPrinter.escapeAttr(ns.href))
      sb.append('"')
    }
    e.attrs.foreach { a =>
      sb.append(' ')
      if (a.nsPrefix != null) sb.append(a.nsPrefix).append(':')
      sb.append(a.key)
      if (a.values != null) {
        sb.append("=\"")
        a.values.foreach {
          case t: XText => sb.append(XmlPrinter.escapeAttr(t.content))
          case r: XEntityRef => sb.append('&').append(r.name).append(';')
          case _ =>
        }
        sb.append('"')
      }
    }
    sb.append('>')
    if (VoidElements.contains(e.name)) return
    // libxml2 htmlNodeDumpFormatOutput format=1: newline after the opening tag
    // of a known non-inline element whose multiple children start non-textual.
    // The p-initial exclusion is on the PARENT (p/pre/param get no inner
    // newlines), not on the first child — probed: <body><p>.. breaks after
    // <body>, while <p><code>..<section>.. does not break after <p>.
    val fmtOpen = isBlockKnown(e.name) && e.children.length > 1 &&
      !isTextual(e.children.head) && !(e.name.nonEmpty && e.name.charAt(0) == 'p')
    if (fmtOpen) sb.append('\n')
    if (RawTextElements.contains(e.name)) {
      // fixup_html (xmq.c:3680-3698): inside cdata-declared elements entity
      // refs are decoded into raw text before writeout.
      e.children.foreach {
        case t: XText => sb.append(t.content) // unescaped
        case r: XEntityRef =>
          val cp = TextUtil.decodeEntityRef(r.name)
          if (cp > 0) sb.appendAll(Character.toChars(cp))
        case other => writeNode(sb, other)
      }
    } else {
      var k = 0
      while (k < e.children.length) {
        val c = e.children(k)
        writeNode(sb, c)
        // newline after a known non-inline child when the next sibling is
        // non-textual (and the parent is not a p* element)
        if (k + 1 < e.children.length) {
          val isBlockChild = c match {
            case ce: XElem => isBlockKnown(ce.name)
            case _ => false
          }
          if (isBlockChild && !isTextual(e.children(k + 1)) &&
              !(e.name.nonEmpty && e.name.charAt(0) == 'p')) sb.append('\n')
        }
        k += 1
      }
    }
    val fmtClose = isBlockKnown(e.name) && e.children.length > 1 &&
      !isTextual(e.children.last) && !(e.name.nonEmpty && e.name.charAt(0) == 'p')
    if (fmtClose) sb.append('\n')
    sb.append("</")
    if (e.nsPrefix != null) sb.append(e.nsPrefix).append(':')
    sb.append(e.name).append('>')
  }

  def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case c => sb.append(c)
    }
    sb.toString
  }
}
