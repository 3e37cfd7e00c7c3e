package graft.xmq

import scala.collection.mutable.ArrayBuffer

/** Minimal xpath subset for the select/delete pipeline commands
  * (the reference delegates to libxml2 xpath; the corpus uses simple
  * patterns: //name, /a/b, //@attr, //name/@attr).
  */
object XPath {

  sealed trait Hit
  final case class ElemHit(e: XElem) extends Hit
  final case class AttrHit(owner: XElem, a: XAttr) extends Hit
  final case class TextHit(t: XText) extends Hit

  def matches(doc: XDoc, path: String): Seq[Hit] = {
    val hits = ArrayBuffer.empty[Hit]
    val descendant = path.startsWith("//")
    val parts = path.stripPrefix("//").stripPrefix("/").split("/").filter(_.nonEmpty)
    if (parts.isEmpty) return hits.toSeq

    def nameMatches(e: XElem, pat: String): Boolean =
      pat == "*" || e.name == pat ||
        (e.nsPrefix != null && s"${e.nsPrefix}:${e.name}" == pat)

    def walk(e: XElem, partIdx: Int, anchored: Boolean): Unit = {
      val pat = parts(partIdx)
      if (pat == "text()") {
        e.children.foreach { case t: XText => hits += TextHit(t); case _ => }
        return
      }
      if (pat.startsWith("@")) {
        val an = pat.substring(1)
        e.attrs.foreach { a =>
          if (an == "*" || a.key == an ||
              (a.nsPrefix != null && s"${a.nsPrefix}:${a.key}" == an))
            hits += AttrHit(e, a)
        }
        return
      }
      if (nameMatches(e, pat)) {
        if (partIdx == parts.length - 1) hits += ElemHit(e)
        else {
          val next = parts(partIdx + 1)
          if (next.startsWith("@") || next == "text()")
            walk(e, partIdx + 1, anchored = true) // attr/text steps bind to e itself
          else
            e.children.foreach { case c: XElem => walk(c, partIdx + 1, anchored = true); case _ => }
        }
      }
      if (!anchored && descendant)
        e.children.foreach { case c: XElem => walk(c, partIdx, anchored = false); case _ => }
    }

    // attribute-only pattern like //@class applies to every element
    if (parts(0).startsWith("@")) {
      def all(e: XElem): Unit = {
        walk(e, 0, anchored = true)
        e.children.foreach { case c: XElem => all(c); case _ => }
      }
      doc.children.foreach { case e: XElem => all(e); case _ => }
      return hits.toSeq
    }

    doc.children.foreach {
      case e: XElem => walk(e, 0, anchored = !descendant)
      case _ =>
    }
    hits.toSeq
  }

  /** delete: unlink all matches (xmq-cli.c:3061-3093). */
  def delete(doc: XDoc, path: String): XDoc = {
    matches(doc, path).foreach {
      case TextHit(t) =>
        if (t.parent != null) {
          val idx = t.parent.children.indexWhere(_ eq t)
          if (idx >= 0) t.parent.children.remove(idx)
        }
      case ElemHit(e) =>
        val list = if (e.parent == null) doc.children else e.parent.children
        val idx = list.indexWhere(_ eq e)
        if (idx >= 0) list.remove(idx)
      case AttrHit(owner, a) =>
        val idx = owner.attrs.indexWhere(_ eq a)
        if (idx >= 0) owner.attrs.remove(idx)
    }
    doc
  }

  /** select: new doc of copied matches; attr hits rewrapped <key>value</key>
    * (xmq-cli.c:2651-2728). */
  def select(doc: XDoc, path: String): XDoc = {
    val out = new XDoc
    matches(doc, path).foreach {
      case ElemHit(e) => out.appendChild(deepCopy(e))
      case TextHit(t) => out.appendChild(new XText(t.content))
      case AttrHit(_, a) =>
        val w = new XElem(a.key)
        w.appendChild(new XText(a.stringValue))
        out.appendChild(w)
    }
    out
  }

  def deepCopy(n: XNode): XNode = n match {
    case e: XElem =>
      val c = new XElem(e.name, e.nsPrefix)
      e.nsDefs.foreach(d => c.nsDefs += NsDef(d.prefix, d.href))
      e.attrs.foreach { a =>
        val na = new XAttr(a.nsPrefix, a.key)
        if (a.values != null) {
          na.values = ArrayBuffer.empty[XNode]
          a.values.foreach(v => na.values += deepCopy(v))
        }
        c.attrs += na
      }
      e.children.foreach(ch => c.appendChild(deepCopy(ch)))
      c
    case t: XText => new XText(t.content)
    case r: XEntityRef => new XEntityRef(r.name)
    case cm: XComment => new XComment(cm.content)
    case p: XPi => new XPi(p.name, p.content)
    case d: XDoctype => new XDoctype(d.name, d.value)
  }
}
