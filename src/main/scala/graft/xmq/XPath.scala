package graft.xmq

import scala.collection.mutable.ArrayBuffer

/** XPath subset for the select/delete pipeline commands (the reference
  * delegates to full libxml2 xpath — /root/reference/src/main/c/xmq-cli.c:2651).
  * Supported: `/a/b`, `//a`, `a//b`, `*`, `@attr`, `text()`, and per-step
  * predicates `[n]`, `[last()]`, `[@k]`, `[@k='v']`, `[child='v']` with
  * libxml2 semantics (positional predicates count within EACH parent context,
  * so //a[2] is every parent's second `a`). `count(path)` evaluates to a
  * number (Cli renders it "%.0f" like cmd_select's XPATH_NUMBER branch).
  */
object XPath {

  sealed trait Hit
  final case class ElemHit(e: XElem) extends Hit
  final case class AttrHit(owner: XElem, a: XAttr) extends Hit
  final case class TextHit(t: XText) extends Hit

  sealed trait Pred
  final case class PosPred(n: Int) extends Pred
  case object LastPred extends Pred
  final case class AttrPred(key: String, value: Option[String]) extends Pred
  final case class ChildPred(name: String, value: String) extends Pred

  /** one location step: element name (or "@attr"/"text()"), its predicates,
    * and whether it uses the descendant axis (preceded by //). */
  final case class Step(name: String, preds: Seq[Pred], descendant: Boolean)

  def parse(path: String): Seq[Step] = {
    val steps = ArrayBuffer.empty[Step]
    var i = 0
    var descendant = false
    val n = path.length
    while (i < n) {
      if (path.startsWith("//", i)) { descendant = true; i += 2 }
      else if (path.charAt(i) == '/') { descendant = false; i += 1 }
      else {
        val start = i
        while (i < n && path.charAt(i) != '/' && path.charAt(i) != '[') i += 1
        val name = path.substring(start, i)
        val preds = ArrayBuffer.empty[Pred]
        while (i < n && path.charAt(i) == '[') {
          val close = matchingBracket(path, i)
          preds += parsePred(path.substring(i + 1, close).trim)
          i = close + 1
        }
        steps += Step(name, preds.toSeq, descendant)
        descendant = false
      }
    }
    steps.toSeq
  }

  private def matchingBracket(s: String, open: Int): Int = {
    var i = open + 1
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else if (c == ']') return i
      i += 1
    }
    throw new IllegalArgumentException(s"unclosed predicate in xpath: $s")
  }

  private def parsePred(p: String): Pred = {
    if (p == "last()") return LastPred
    if (p.forall(_.isDigit) && p.nonEmpty) return PosPred(p.toInt)
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && (t.head == '\'' || t.head == '"') && t.last == t.head)
        t.substring(1, t.length - 1)
      else t
    }
    val eq = {
      // first '=' outside quotes
      var i = 0; var q: Char = 0; var found = -1
      while (i < p.length && found < 0) {
        val c = p.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '\'' || c == '"') q = c
        else if (c == '=') found = i
        i += 1
      }
      found
    }
    if (p.startsWith("@")) {
      if (eq < 0) AttrPred(p.substring(1).trim, None)
      else AttrPred(p.substring(1, eq).trim, Some(unquote(p.substring(eq + 1))))
    } else if (eq > 0) {
      ChildPred(p.substring(0, eq).trim, unquote(p.substring(eq + 1)))
    } else throw new IllegalArgumentException(s"unsupported xpath predicate: [$p]")
  }

  private def nameMatches(e: XElem, pat: String): Boolean =
    pat == "*" || e.name == pat ||
      (e.nsPrefix != null && s"${e.nsPrefix}:${e.name}" == pat)

  private def attrText(a: XAttr): String =
    if (a.values == null) "" else a.values.collect { case t: XText => t.content }.mkString

  private def childText(e: XElem): String = {
    val sb = new StringBuilder
    e.children.foreach { case t: XText => sb.append(t.content); case _ => }
    sb.toString
  }

  private def holds(e: XElem, pred: Pred, pos: Int, total: Int): Boolean = pred match {
    case PosPred(n) => pos == n
    case LastPred => pos == total
    case AttrPred(k, None) => e.attrs.exists(_.key == k)
    case AttrPred(k, Some(v)) => e.attrs.exists(a => a.key == k && attrText(a) == v)
    case ChildPred(name, v) =>
      e.children.exists { case c: XElem => c.name == name && childText(c) == v; case _ => false }
  }

  /** children of a context matching the step name, with predicates applied
    * positionally WITHIN this context (libxml2 semantics). */
  private def applyStep(children: Seq[XNode], step: Step): Seq[XElem] = {
    var cur = children.collect { case e: XElem if nameMatches(e, step.name) => e }
    for (p <- step.preds) {
      val total = cur.size
      cur = cur.zipWithIndex.collect { case (e, i) if holds(e, p, i + 1, total) => e }
    }
    cur
  }

  /** all elements of the subtree rooted at the context children, doc order,
    * including the children themselves (descendant-or-self contexts). */
  private def selfAndDescendants(children: Seq[XNode]): Seq[XElem] = {
    val out = ArrayBuffer.empty[XElem]
    def walk(n: XNode): Unit = n match {
      case e: XElem => out += e; e.children.foreach(walk)
      case _ =>
    }
    children.foreach(walk)
    out.toSeq
  }

  def matches(doc: XDoc, path: String): Seq[Hit] = {
    // libxml2 evaluates with a NULL context node, so relative paths (no
    // leading /) match nothing — mirror that (verified vs the binary)
    if (!path.startsWith("/")) return Seq.empty
    val steps = parse(path)
    if (steps.isEmpty) return Seq.empty

    // document-order index for sorting descendant-step results (libxml2
    // node-sets are in document order even when parents interleave)
    val docOrder = new java.util.IdentityHashMap[XElem, Integer]()
    locally {
      var i = 0
      def num(n: XNode): Unit = n match {
        case e: XElem => docOrder.put(e, i); i += 1; e.children.foreach(num)
        case _ =>
      }
      doc.children.foreach(num)
    }

    // element contexts, beginning with the virtual document root
    var contextChildren: Seq[Seq[XNode]] = Seq(doc.children.toSeq)
    var elems: Seq[XElem] = Seq.empty
    val hits = ArrayBuffer.empty[Hit]

    for ((step, idx) <- steps.zipWithIndex) {
      val isLast = idx == steps.length - 1
      if (step.name == "text()") {
        if (isLast) {
          elems.foreach(_.children.foreach {
            case t: XText => hits += TextHit(t); case _ => })
          return hits.toSeq
        } else return Seq.empty
      } else if (step.name.startsWith("@")) {
        if (isLast) {
          val an = step.name.substring(1)
          // attribute-only pattern like //@class applies to every element
          val owners =
            if (idx == 0 && step.descendant) selfAndDescendants(doc.children.toSeq)
            else elems
          owners.foreach { e =>
            e.attrs.foreach { a =>
              if (an == "*" || a.key == an ||
                  (a.nsPrefix != null && s"${a.nsPrefix}:${a.key}" == an))
                hits += AttrHit(e, a)
            }
          }
          return hits.toSeq
        } else return Seq.empty
      } else {
        val nextElems = ArrayBuffer.empty[XElem]
        for (ctx <- contextChildren) {
          if (step.descendant) {
            // child::name within every descendant-or-self context, doc order:
            // the top-level context's own matching elements first require the
            // virtual parent, then each descendant element as parent
            nextElems ++= applyStep(ctx, step)
            selfAndDescendants(ctx).foreach { d =>
              nextElems ++= applyStep(d.children.toSeq, step)
            }
          } else {
            nextElems ++= applyStep(ctx, step)
          }
        }
        elems = nextElems.distinct.sortBy(docOrder.get(_).intValue()).toSeq
        contextChildren = elems.map(_.children.toSeq)
        if (isLast) {
          elems.foreach(hits += ElemHit(_))
          return hits.toSeq
        }
      }
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

  /** select: new doc of copied matches; attr hits rewrapped <key>value</key>;
    * count(path) yields a number → single text node, "%.0f" like
    * cmd_select's XPATH_NUMBER branch (xmq-cli.c:2651-2728). */
  def select(doc: XDoc, path: String): XDoc = {
    val countRe = """^count\((.*)\)$""".r
    path.trim match {
      case countRe(inner) =>
        val out = new XDoc
        out.appendChild(new XText(matches(doc, inner.trim).size.toString))
        return out
      case _ =>
    }
    val out = new XDoc
    // cmd_select copies matches in REVERSE order and appends, so the output
    // doc is reverse document order (xmq-cli.c:2692 "Copy and unlink in
    // reverse order"; verified vs the binary)
    matches(doc, path).reverse.foreach {
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
