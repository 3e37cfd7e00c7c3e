package graft.xmq.ixml

import scala.collection.mutable.{ArrayBuffer, HashMap, HashSet}
import graft.xmq._

/** Earley parser over the desugared iXML grammar + derivation-tree
  * extraction + mark-driven XDoc serialization (clean-room; the reference
  * embeds the yaep Earley engine — /root/reference/src/main/c/yaep*.c — we
  * only reproduce its observable input/output behavior).
  *
  * Desugaring: groups/options/repetitions become synthetic spliced ('-')
  * nonterminals; literals become one terminal per codepoint; insertions and
  * negative lookaheads are zero-width symbols.
  */
object Earley {

  // ---- desugared symbol model ----
  sealed trait GSym
  final case class NtRef(id: Int, mark: Char) extends GSym
  /** one-codepoint terminal: emit into output unless hidden. */
  final case class Term(pred: Int => Boolean, hidden: Boolean, desc: String) extends GSym
  final case class Ins(s: String) extends GSym
  /** zero-width negative lookahead over a literal string or class. */
  final case class Neg(check: (Array[Int], Int) => Boolean, desc: String) extends GSym

  final case class Prod(nt: Int, syms: Array[GSym])
  /** compiled grammar: nonterminal id → (name, mark, productions). */
  final class Compiled(val names: Array[String], val outNames: Array[String],
                       val marks: Array[Char],
                       val prods: Array[ArrayBuffer[Prod]], val start: Int)

  /** `at` = codepoint index of the failing token (yaep err_tok_num). */
  final case class IxmlParseError(at: Int)
    extends Exception(s"syntax error at offset $at")

  def compile(g: Grammar): Compiled = {
    val names = ArrayBuffer.empty[String]
    val marks = ArrayBuffer.empty[Char]
    val index = HashMap.empty[String, Int]
    def ntId(name: String, mark: Char): Int = index.getOrElseUpdate(name, {
      names += name; marks += mark; names.length - 1
    })
    // pre-register all rules so references resolve to rule marks
    g.rules.foreach(r => ntId(r.name, r.mark))
    val prods = ArrayBuffer.empty[ArrayBuffer[Prod]]
    def ensure(id: Int): Unit = while (prods.length <= id) prods += ArrayBuffer.empty[Prod]
    var synth = 0

    def litTerms(l: Lit): Seq[GSym] =
      l.s.codePoints().toArray.toSeq.map(cp =>
        Term(c => c == cp, l.hidden, s"'${new String(Character.toChars(cp))}'"))

    def clsTerm(c: Cls): GSym = {
      val m = c.members
      if (c.exclude) Term(cp => !ClsMember.matches(m, cp), c.hidden, "~[..]")
      else Term(cp => ClsMember.matches(m, cp), c.hidden, "[..]")
    }

    def freshNt(prefix: String): Int = {
      synth += 1
      val id = ntId(s"#$prefix$synth", '-')
      ensure(id)
      id
    }

    def factorSyms(f: Factor): Seq[GSym] = f match {
      case Sym(mark, name) =>
        val id = index.getOrElse(name,
          throw new IllegalArgumentException(s"undefined nonterminal: $name"))
        Seq(NtRef(id, mark))
      case l: Lit => litTerms(l)
      case c: Cls => Seq(clsTerm(c))
      case Insert(s) => Seq(Ins(s))
      case NotAhead(inner) => Seq(negOf(inner))
      case Group(alts) =>
        val id = freshNt("g")
        alts.foreach(a => prods(id) += Prod(id, a.flatMap(factorSyms).toArray))
        Seq(NtRef(id, 0))
      case Opt(inner) =>
        val id = freshNt("o")
        prods(id) += Prod(id, Array.empty)
        prods(id) += Prod(id, factorSyms(inner).toArray)
        Seq(NtRef(id, 0))
      case Rep(inner, sepOpt, min1) =>
        // plus: P -> f | P sep? f ; star: S -> eps | P
        val p = freshNt("p")
        val innerSyms = factorSyms(inner).toArray
        prods(p) += Prod(p, innerSyms)
        val sepSyms = sepOpt.map(factorSyms(_).toArray).getOrElse(Array.empty[GSym])
        prods(p) += Prod(p, NtRef(p, 0) +: (sepSyms ++ innerSyms))
        if (min1) Seq(NtRef(p, 0))
        else {
          val s0 = freshNt("s")
          prods(s0) += Prod(s0, Array.empty)
          prods(s0) += Prod(s0, Array[GSym](NtRef(p, 0)))
          Seq(NtRef(s0, 0))
        }
    }

    def negOf(inner: Factor): GSym = inner match {
      case Lit(_, str) =>
        val cps = str.codePoints().toArray
        Neg((in, pos) => {
          var k = 0
          var ok = true
          while (ok && k < cps.length) {
            if (pos + k >= in.length || in(pos + k) != cps(k)) ok = false
            k += 1
          }
          !ok // succeeds when the literal does NOT match here
        }, s"!'$str'")
      case c: Cls =>
        val m = c.members
        Neg((in, pos) => pos >= in.length ||
          (if (c.exclude) ClsMember.matches(m, in(pos)) else !ClsMember.matches(m, in(pos))),
          "![..]")
      case other =>
        throw new IllegalArgumentException(s"!-lookahead unsupported for $other")
    }

    g.rules.foreach { r =>
      val id = index(r.name)
      ensure(id)
    }
    // (synthetic rules created during factorSyms below also call ensure)
    g.rules.foreach { r =>
      val id = index(r.name)
      r.alts.foreach { a =>
        prods(id) += Prod(id, a.flatMap(factorSyms).toArray)
      }
    }
    val outNames = names.toArray.map { n =>
      g.byName.get(n).flatMap(_.alias).getOrElse(n)
    }
    new Compiled(names.toArray, outNames, marks.toArray,
      prods.toArray.map(identity), index(g.root.name))
  }

  // ---- recognizer ----
  private final case class Item(prodId: Int, dot: Int, origin: Int)

  /** parse `input` (codepoints); returns the derivation tree or throws
    * IxmlParseError with the furthest failure position. */
  def parse(g: Grammar, inputStr: String): XDoc =
    parseInternal(g, inputStr, all = false).head

  /** --ixml-all-parses: every distinct parse (reference xmq-cli.c passes
    * XMQ_FLAG_IXML_ALL_PARSES → yaep ambiguity enumeration). Longest
    * sub-spans are explored first, matching the reference's ordering on the
    * ambiguity corpus; capped to keep pathological grammars bounded. */
  def parseAll(g: Grammar, inputStr: String, max: Int = 64): Seq[XDoc] =
    parseInternal(g, inputStr, all = true, max)

  private def parseInternal(g: Grammar, inputStr: String, all: Boolean, max: Int = 64): Seq[XDoc] = {
    val c = compile(g)
    val input = inputStr.codePoints().toArray
    val n = input.length

    // flatten productions with ids
    val allProds = ArrayBuffer.empty[Prod]
    val prodsOf = Array.fill(c.names.length)(ArrayBuffer.empty[Int])
    for (nt <- c.prods.indices; p <- c.prods(nt)) {
      prodsOf(nt) += allProds.length
      allProds += p
    }

    // nullability (for Aycock–Horspool magic completion)
    val nullable = Array.fill(c.names.length)(false)
    var changed = true
    while (changed) {
      changed = false
      for (p <- allProds) {
        if (!nullable(p.nt) && p.syms.forall {
          case NtRef(id, _) => nullable(id)
          case _: Ins => true
          case _: Neg => false // lookahead depends on position; conservative
          case _ => false
        }) { nullable(p.nt) = true; changed = true }
      }
      // Neg is zero-width; a production of only Ins/Neg CAN derive empty, but
      // nullability is only used to predict-advance — treat Neg-bearing
      // productions as non-nullable and let normal completion handle them.
    }

    val sets = Array.fill(n + 1)(ArrayBuffer.empty[Item])
    val seen = Array.fill(n + 1)(HashSet.empty[(Int, Int, Int)])
    def add(k: Int, it: Item): Unit =
      if (seen(k).add((it.prodId, it.dot, it.origin))) sets(k) += it

    for (pid <- prodsOf(c.start)) add(0, Item(pid, 0, 0))

    var furthest = 0
    var k = 0
    // nonterminals that completed with ZERO width at the current position —
    // a static-nullable check can't see position-dependent Neg guards, and
    // the completer never revisits items added after an empty completion was
    // processed, so prediction consults this dynamic set too (the classic
    // Earley epsilon-completion gap, dynamic Aycock–Horspool variant).
    val emptyDone = HashSet.empty[Int]
    while (k <= n) {
      emptyDone.clear()
      var idx = 0
      while (idx < sets(k).length) {
        val it = sets(k)(idx)
        val prod = allProds(it.prodId)
        if (it.dot < prod.syms.length) {
          prod.syms(it.dot) match {
            case NtRef(id, _) =>
              for (pid <- prodsOf(id)) add(k, Item(pid, 0, k))
              if (nullable(id) || emptyDone(id)) add(k, Item(it.prodId, it.dot + 1, it.origin))
            case Term(pred, _, _) =>
              if (k < n && pred(input(k))) {
                add(k + 1, Item(it.prodId, it.dot + 1, it.origin))
                if (k + 1 > furthest) furthest = k + 1
              }
            case Ins(_) => add(k, Item(it.prodId, it.dot + 1, it.origin))
            case Neg(check, _) =>
              if (check(input, k)) add(k, Item(it.prodId, it.dot + 1, it.origin))
          }
        } else {
          // completion
          val nt = prod.nt
          val org = it.origin
          if (org == k) emptyDone += nt // zero-width span: see emptyDone above
          var j = 0
          while (j < sets(org).length) {
            val cand = sets(org)(j)
            val cp = allProds(cand.prodId)
            if (cand.dot < cp.syms.length) cp.syms(cand.dot) match {
              case NtRef(id, _) if id == nt =>
                add(k, Item(cand.prodId, cand.dot + 1, cand.origin))
              case _ =>
            }
            j += 1
          }
        }
        idx += 1
      }
      k += 1
    }

    val accepted = sets(n).exists { it =>
      val p = allProds(it.prodId)
      p.nt == c.start && it.origin == 0 && it.dot == p.syms.length
    }
    if (!accepted) {
      // the failing token index = furthest position a terminal matched
      throw IxmlParseError(furthest)
    }

    // ---- derivation extraction over the completed chart ----
    // completed spans: (nt, start) -> set of ends; per production too
    val comp = HashMap.empty[(Int, Int), HashSet[Int]] // (nt, origin) -> ends
    val compProd = HashMap.empty[(Int, Int, Int), ArrayBuffer[Int]] // (nt, origin, end) -> prodIds
    for (end <- 0 to n; it <- sets(end)) {
      val p = allProds(it.prodId)
      if (it.dot == p.syms.length) {
        comp.getOrElseUpdate((p.nt, it.origin), HashSet.empty) += end
        compProd.getOrElseUpdate((p.nt, it.origin, end), ArrayBuffer.empty) += it.prodId
      }
    }

    sealed trait DNode
    final case class DNt(nt: Int, mark: Char, kids: Seq[DNode]) extends DNode
    final case class DText(s: String) extends DNode

    val failMemo = HashSet.empty[(Int, Int, Int)]

    def deriveNt(nt: Int, from: Int, to: Int, refMark: Char): Option[DNt] = {
      val pids = compProd.getOrElse((nt, from, to), ArrayBuffer.empty)
      var r: Option[Seq[DNode]] = None
      val it = pids.iterator
      while (r.isEmpty && it.hasNext) {
        val pid = it.next()
        if (!failMemo((pid, from, to))) {
          r = deriveSeq(allProds(pid).syms, 0, from, to)
          if (r.isEmpty) failMemo += ((pid, from, to))
        }
      }
      r.map { kids =>
        val mark = if (refMark != 0) refMark else c.marks(nt)
        DNt(nt, mark, kids)
      }
    }

    def deriveSeq(syms: Array[GSym], si: Int, from: Int, to: Int): Option[Seq[DNode]] = {
      if (si == syms.length) return if (from == to) Some(Nil) else None
      syms(si) match {
        case Term(pred, hidden, _) =>
          if (from < to && pred(input(from))) {
            deriveSeq(syms, si + 1, from + 1, to).map { rest =>
              if (hidden) rest
              else DText(new String(Character.toChars(input(from)))) +: rest
            }
          } else None
        case Ins(str) =>
          deriveSeq(syms, si + 1, from, to).map(rest => DText(str) +: rest)
        case Neg(check, _) =>
          if (check(input, from)) deriveSeq(syms, si + 1, from, to) else None
        case NtRef(id, refMark) =>
          val ends = comp.getOrElse((id, from), HashSet.empty).toSeq.sorted
          var res: Option[Seq[DNode]] = None
          val eit = ends.iterator
          while (res.isEmpty && eit.hasNext) {
            val mid = eit.next()
            if (mid <= to) {
              deriveSeq(syms, si + 1, mid, to) match {
                case Some(rest) =>
                  deriveNt(id, from, mid, refMark) match {
                    case Some(node) => res = Some(node +: rest)
                    case None =>
                  }
                case None =>
              }
            }
          }
          res
      }
    }

    // ---- serialization with marks ----
    def textOf(node: DNode): String = node match {
      case DText(s) => s
      case DNt(_, _, kids) => kids.map(textOf).mkString
    }

    def buildDoc(rootNode: DNode): XDoc = {
      val doc = new XDoc
      def emit(node: DNode, parent: XElem): Unit = node match {
        case DText(s) => if (parent != null) parent.appendText(s)
        case DNt(nt, mark, kids) =>
          mark match {
            case '-' => kids.foreach(emit(_, parent))
            case '@' =>
              if (parent != null) {
                val a = new XAttr(null, c.outNames(nt))
                a.appendText(kids.map(textOf).mkString)
                parent.attrs += a
              }
            case _ =>
              val e = new XElem(c.outNames(nt))
              kids.foreach(emit(_, e))
              if (parent == null) doc.appendChild(e) else parent.appendChild(e)
          }
      }
      // root with '-' mark: iXML serializes its children under... the corpus
      // has no hidden roots; treat root as element regardless
      rootNode match {
        case DNt(nt, mark, kids) if mark == '-' || mark == '@' =>
          val e = new XElem(c.outNames(nt))
          kids.foreach(emit(_, e))
          doc.appendChild(e)
        case other => emit(other, null)
      }
      doc
    }

    // ---- ambiguity detection (capped derivation count, memoized):
    // yaep sets ambiguous_p when the forest has >1 derivation, even when
    // two derivations serialize identically; the reference then marks the
    // root with state="ambiguous" + xmlns:ixml (xmq.c:5154-5167).
    def countAmbiguous(): Boolean = {
      val memo = HashMap.empty[(Int, Int, Int, Int), Int] // (pid, si, from, to) -> 0|1|2(≥2)
      val ntMemo = HashMap.empty[(Int, Int, Int), Int]
      def cap(x: Int): Int = if (x >= 2) 2 else x
      def countSeq(pid: Int, si: Int, from: Int, to: Int): Int =
        memo.getOrElseUpdate((pid, si, from, to), {
          val syms = allProds(pid).syms
          if (si == syms.length) { if (from == to) 1 else 0 }
          else syms(si) match {
            case Term(pred, _, _) =>
              if (from < to && pred(input(from))) countSeq(pid, si + 1, from + 1, to) else 0
            case Ins(_) => countSeq(pid, si + 1, from, to)
            case Neg(check, _) =>
              if (check(input, from)) countSeq(pid, si + 1, from, to) else 0
            case NtRef(id, _) =>
              var total = 0
              val ends = comp.getOrElse((id, from), HashSet.empty)
              val eit = ends.iterator
              while (total < 2 && eit.hasNext) {
                val mid = eit.next()
                if (mid <= to)
                  total = cap(total + countNt(id, from, mid) * countSeq(pid, si + 1, mid, to))
              }
              total
          }
        })
      def countNt(nt: Int, from: Int, to: Int): Int =
        ntMemo.get((nt, from, to)) match {
          case Some(v) => v
          case None =>
            ntMemo((nt, from, to)) = 0 // cycle guard (left recursion)
            var total = 0
            val pids = compProd.getOrElse((nt, from, to), ArrayBuffer.empty)
            val pit = pids.iterator
            while (total < 2 && pit.hasNext) total = cap(total + countSeq(pit.next(), 0, from, to))
            ntMemo((nt, from, to)) = total
            total
        }
      countNt(c.start, 0, n) >= 2
    }

    if (!all) {
      val rootNode = deriveNt(c.start, 0, n, 0)
        .getOrElse(throw new IllegalStateException("accepted but no derivation"))
      val doc = buildDoc(rootNode)
      if (countAmbiguous()) {
        doc.root match {
          case null =>
          case root =>
            val a = new XAttr(null, "state")
            a.appendText("ambiguous")
            root.attrs += a
            if (!root.nsDefs.exists(_.prefix == "ixml"))
              root.nsDefs += NsDef("ixml", "http://invisiblexml.org/NS")
        }
      }
      return Seq(doc)
    }

    // ---- all-parses enumeration (longest sub-spans first, production order) ----
    def allNt(nt: Int, from: Int, to: Int, refMark: Char): Iterator[DNt] = {
      val pids = compProd.getOrElse((nt, from, to), ArrayBuffer.empty)
      pids.iterator.flatMap { pid =>
        allSeq(allProds(pid).syms, 0, from, to).map { kids =>
          val mark = if (refMark != 0) refMark else c.marks(nt)
          DNt(nt, mark, kids)
        }
      }
    }

    def allSeq(syms: Array[GSym], si: Int, from: Int, to: Int): Iterator[Seq[DNode]] = {
      if (si == syms.length)
        return if (from == to) Iterator.single(Nil) else Iterator.empty
      syms(si) match {
        case Term(pred, hidden, _) =>
          if (from < to && pred(input(from)))
            allSeq(syms, si + 1, from + 1, to).map { rest =>
              if (hidden) rest
              else DText(new String(Character.toChars(input(from)))) +: rest
            }
          else Iterator.empty
        case Ins(str) =>
          allSeq(syms, si + 1, from, to).map(rest => DText(str) +: rest)
        case Neg(check, _) =>
          if (check(input, from)) allSeq(syms, si + 1, from, to) else Iterator.empty
        case NtRef(id, refMark) =>
          val ends = comp.getOrElse((id, from), HashSet.empty).toSeq.sorted.reverse
          ends.iterator.filter(_ <= to).flatMap { mid =>
            allNt(id, from, mid, refMark).flatMap { node =>
              allSeq(syms, si + 1, mid, to).map(rest => node +: rest)
            }
          }
      }
    }

    val docs = ArrayBuffer.empty[XDoc]
    val seenOut = HashSet.empty[String]
    val rootIt = allNt(c.start, 0, n, 0)
    while (rootIt.hasNext && docs.length < max) {
      val doc = buildDoc(rootIt.next())
      if (seenOut.add(XmqEngine.toXmq(doc, compact = true))) docs += doc
    }
    docs.toSeq
  }
}
