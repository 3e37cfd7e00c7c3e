package graft.xmq

import scala.collection.mutable.ArrayBuffer

/** XPath subset for the select/delete pipeline commands (the reference
  * delegates to full libxml2 xpath — /root/reference/src/main/c/xmq-cli.c:2651).
  * Steps: `/a/b`, `//a`, `a//b`, `*`, `@attr`, `text()`. Predicates are a
  * full expression language with libxml2 semantics: positions (`[n]`,
  * `last()`, `position()`, a number result is a position test), node-set
  * refs (`@k`, child name, `.`, `text()`) comparing existentially,
  * `= != < <= > >=` (relationals always numeric), `and`/`or`,
  * `contains/starts-with/not/string/number/string-length/normalize-space`.
  * Positional predicates count within EACH parent context, so //a[2] is
  * every parent's second `a`. `count(path)` evaluates to a number (Cli
  * renders it "%.0f" like cmd_select's XPATH_NUMBER branch). All verified
  * differentially against the compiled reference binary (XPathSpec).
  */
object XPath {

  sealed trait Hit
  final case class ElemHit(e: XElem) extends Hit
  final case class AttrHit(owner: XElem, a: XAttr) extends Hit
  final case class TextHit(t: XText) extends Hit

  // ---- predicate expression mini-language (libxml2 xpath 1.0 subset):
  // values: @attr, child name, ., text(), string/number literals,
  // position(), last(); functions: contains, starts-with, not;
  // operators: = != < <= > >=, and, or. A whole-predicate number result is
  // a position test, like xpath.
  sealed trait Pred
  final case class PStr(s: String) extends Pred
  final case class PNum(d: Double) extends Pred
  /** node-set reference: "@k", "name", ".", "text()" (string-values). */
  final case class PRef(ref: String) extends Pred
  case object PPosition extends Pred
  case object PLast extends Pred
  final case class PCmp(op: String, l: Pred, r: Pred) extends Pred
  final case class PAnd(l: Pred, r: Pred) extends Pred
  final case class POr(l: Pred, r: Pred) extends Pred
  final case class PFn(name: String, args: Seq[Pred]) extends Pred

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

  /** recursive-descent parser for the predicate expression language. */
  private def parsePred(p: String): Pred = new PredParser(p).parseOrExpr(top = true)

  private final class PredParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s.charAt(i) else 0
    private def at(lit: String): Boolean = s.startsWith(lit, i)
    private def eat(lit: String): Unit = {
      if (!at(lit)) throw new IllegalArgumentException(s"expected '$lit' at $i in [$s]")
      i += lit.length
    }

    def parseOrExpr(top: Boolean = false): Pred = {
      var l = parseAndExpr()
      ws()
      while (at("or") && boundaryAfter(i + 2)) { i += 2; l = POr(l, parseAndExpr()); ws() }
      if (top) { ws(); if (i < s.length) throw new IllegalArgumentException(s"trailing input in predicate [$s]") }
      l
    }

    private def boundaryAfter(j: Int): Boolean =
      j >= s.length || !(s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')

    private def parseAndExpr(): Pred = {
      var l = parseCmpExpr()
      ws()
      while (at("and") && boundaryAfter(i + 3)) { i += 3; l = PAnd(l, parseCmpExpr()); ws() }
      l
    }

    private def parseCmpExpr(): Pred = {
      val l = parsePrimary()
      ws()
      val op =
        if (at("!=")) { i += 2; "!=" }
        else if (at("<=")) { i += 2; "<=" }
        else if (at(">=")) { i += 2; ">=" }
        else if (peek == '=') { i += 1; "=" }
        else if (peek == '<') { i += 1; "<" }
        else if (peek == '>') { i += 1; ">" }
        else return l
      PCmp(op, l, parsePrimary())
    }

    private def parsePrimary(): Pred = {
      ws()
      val c = peek
      if (c == '(') { i += 1; val e = parseOrExpr(); ws(); eat(")"); e }
      else if (c == '\'' || c == '"') {
        i += 1
        val start = i
        while (i < s.length && s.charAt(i) != c) i += 1
        val str = s.substring(start, i)
        eat(c.toString)
        PStr(str)
      }
      else if (c.isDigit) {
        val start = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        PNum(s.substring(start, i).toDouble)
      }
      else if (c == '@') {
        i += 1
        PRef("@" + parseName())
      }
      else if (c == '.') { i += 1; PRef(".") }
      else {
        val name = parseName()
        ws()
        if (peek == '(') {
          i += 1; ws()
          name match {
            case "last" => eat(")"); PLast
            case "position" => eat(")"); PPosition
            case "text" => eat(")"); PRef("text()")
            case "not" | "contains" | "starts-with" | "string-length" |
                 "normalize-space" | "string" | "number" =>
              val args = ArrayBuffer.empty[Pred]
              ws()
              if (peek != ')') {
                args += parseOrExpr()
                ws()
                while (peek == ',') { i += 1; args += parseOrExpr(); ws() }
              }
              eat(")")
              PFn(name, args.toSeq)
            case other => throw new IllegalArgumentException(s"unsupported xpath function: $other()")
          }
        } else if (name.nonEmpty) PRef(name)
        else throw new IllegalArgumentException(s"bad predicate at $i in [$s]")
      }
    }

    private def parseName(): String = {
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit ||
             "_-:.".contains(s.charAt(i)) && !(s.charAt(i) == '.' && i == start))) i += 1
      s.substring(start, i)
    }
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

  // ---- predicate evaluation (xpath 1.0 value model) ----
  private sealed trait PVal
  private final case class VStr(s: String) extends PVal
  private final case class VNum(d: Double) extends PVal
  private final case class VBool(b: Boolean) extends PVal
  /** node-set as its member string-values (enough for this subset). */
  private final case class VSet(vals: Seq[String]) extends PVal

  /** string-value of an element: ALL descendant text (libxml2
    * xmlNodeGetContent), not just direct children. */
  private def textValue(e: XElem): String = {
    val sb = new StringBuilder
    def walk(n: XNode): Unit = n match {
      case t: XText => sb.append(t.content)
      case el: XElem => el.children.foreach(walk)
      case r: XEntityRef =>
        val cp = TextUtil.decodeEntityRef(r.name)
        if (cp > 0) sb.appendAll(Character.toChars(cp))
      case _ =>
    }
    e.children.foreach(walk)
    sb.toString
  }

  private def toStr(v: PVal): String = v match {
    case VStr(s) => s
    case VNum(d) => if (d == d.toLong) d.toLong.toString else d.toString
    case VBool(b) => if (b) "true" else "false"
    case VSet(vals) => vals.headOption.getOrElse("") // string(node-set) = first
  }

  private def toNum(v: PVal): Double = v match {
    case VNum(d) => d
    case VStr(s) => try s.trim.toDouble catch { case _: Exception => Double.NaN }
    case VBool(b) => if (b) 1.0 else 0.0
    case s: VSet => toNum(VStr(toStr(s)))
  }

  private def toBool(v: PVal): Boolean = v match {
    case VBool(b) => b
    case VNum(d) => d != 0.0 && !d.isNaN
    case VStr(s) => s.nonEmpty
    case VSet(vals) => vals.nonEmpty
  }

  private def eval(e: XElem, pred: Pred, pos: Int, total: Int): PVal = pred match {
    case PStr(s) => VStr(s)
    case PNum(d) => VNum(d)
    case PPosition => VNum(pos)
    case PLast => VNum(total)
    case PRef(".") => VSet(Seq(textValue(e)))
    case PRef("text()") =>
      VSet(e.children.collect { case t: XText => t.content }.toSeq)
    case PRef(ref) if ref.startsWith("@") =>
      val k = ref.substring(1)
      VSet(e.attrs.filter(a => a.key == k && a.nsPrefix == null).map(attrText).toSeq)
    case PRef(name) =>
      VSet(e.children.collect { case c: XElem if c.name == name => textValue(c) }.toSeq)
    case PAnd(l, r) => VBool(toBool(eval(e, l, pos, total)) && toBool(eval(e, r, pos, total)))
    case POr(l, r) => VBool(toBool(eval(e, l, pos, total)) || toBool(eval(e, r, pos, total)))
    case PCmp(op, l, r) => VBool(compare(op, eval(e, l, pos, total), eval(e, r, pos, total)))
    case PFn(name, args) =>
      val vs = args.map(a => eval(e, a, pos, total))
      name match {
        case "not" => VBool(!toBool(vs.head))
        case "contains" => VBool(toStr(vs(0)).contains(toStr(vs(1))))
        case "starts-with" => VBool(toStr(vs(0)).startsWith(toStr(vs(1))))
        case "string" => VStr(if (vs.isEmpty) textValue(e) else toStr(vs.head))
        case "number" => VNum(if (vs.isEmpty) toNum(VStr(textValue(e))) else toNum(vs.head))
        case "string-length" =>
          VNum(if (vs.isEmpty) textValue(e).length else toStr(vs.head).length)
        case "normalize-space" =>
          val s0 = if (vs.isEmpty) textValue(e) else toStr(vs.head)
          VStr(s0.trim.replaceAll("\\s+", " "))
        case other => throw new IllegalArgumentException(s"unsupported function $other")
      }
  }

  /** xpath comparison: node-sets compare existentially; < <= > >= always
    * numeric; = != string unless the other side is a number/boolean. */
  private def compare(op: String, l: PVal, r: PVal): Boolean = {
    def cmpAtom(a: PVal, b: PVal): Boolean = op match {
      case "=" | "!=" =>
        val eq = (a, b) match {
          case (VNum(_), _) | (_, VNum(_)) => toNum(a) == toNum(b)
          case (VBool(_), _) | (_, VBool(_)) => toBool(a) == toBool(b)
          case _ => toStr(a) == toStr(b)
        }
        if (op == "=") eq else !eq
      case "<" => toNum(a) < toNum(b)
      case "<=" => toNum(a) <= toNum(b)
      case ">" => toNum(a) > toNum(b)
      case ">=" => toNum(a) >= toNum(b)
    }
    (l, r) match {
      case (VSet(ls), VSet(rs)) => ls.exists(a => rs.exists(b => cmpAtom(VStr(a), VStr(b))))
      case (VSet(ls), other) => ls.exists(a => cmpAtom(VStr(a), other))
      case (other, VSet(rs)) => rs.exists(b => cmpAtom(other, VStr(b)))
      case (a, b) => cmpAtom(a, b)
    }
  }

  private def holds(e: XElem, pred: Pred, pos: Int, total: Int): Boolean =
    eval(e, pred, pos, total) match {
      // a number predicate is a position test (xpath 1.0 §2.4)
      case VNum(d) => pos == d
      case v => toBool(v)
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
    // cmd_select copies matches in REVERSE order and UNLINKS each from the
    // source tree (xmq-cli.c:2692 "Copy and unlink in reverse order"), so
    // the output doc is reverse document order AND a nested match is absent
    // from its later-copied ancestors (differentially fuzz-verified).
    matches(doc, path).reverse.foreach {
      case ElemHit(e) =>
        out.appendChild(deepCopy(e))
        val list = if (e.parent == null) doc.children else e.parent.children
        val idx = list.indexWhere(_ eq e)
        if (idx >= 0) list.remove(idx)
      case TextHit(t) =>
        out.appendChild(new XText(t.content))
        if (t.parent != null) {
          val idx = t.parent.children.indexWhere(_ eq t)
          if (idx >= 0) t.parent.children.remove(idx)
        }
      case AttrHit(owner, a) =>
        val w = new XElem(a.key)
        w.appendChild(new XText(a.stringValue))
        out.appendChild(w)
        val idx = owner.attrs.indexWhere(_ eq a)
        if (idx >= 0) owner.attrs.remove(idx)
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
