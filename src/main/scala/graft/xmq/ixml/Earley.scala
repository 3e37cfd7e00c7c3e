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
  /** compiled grammar: nonterminal id → (name, mark, productions), plus the
    * grammar-static recognizer tables (flattened productions, production ids
    * per nonterminal, nullability) so a per-row parse pays none of it. */
  final class Compiled(val names: Array[String], val outNames: Array[String],
                       val marks: Array[Char],
                       val prods: Array[ArrayBuffer[Prod]], val start: Int) {
    val allProds: Array[Prod] = {
      val b = ArrayBuffer.empty[Prod]
      for (nt <- prods.indices; p <- prods(nt)) b += p
      // chart items pack (prodId << 44) | (dot << 32) | origin into one
      // long; past these bounds the dot-increment (it + (1L<<32)) would
      // carry into prodId and corrupt parses SILENTLY — refuse instead
      if (b.length >= (1 << 20))
        throw new IllegalArgumentException(
          s"grammar too large: ${b.length} productions (max ${(1 << 20) - 1})")
      b.foreach { p =>
        if (p.syms.length >= (1 << 12))
          throw new IllegalArgumentException(
            s"grammar too large: a production of nonterminal '${names(p.nt)}' has " +
              s"${p.syms.length} symbols (max ${(1 << 12) - 1})")
      }
      b.toArray
    }
    val prodsOf: Array[Array[Int]] = {
      val b = Array.fill(names.length)(ArrayBuffer.empty[Int])
      for (pid <- allProds.indices) b(allProds(pid).nt) += pid
      b.map(_.toArray)
    }
    // nullability (for Aycock–Horspool magic completion); Neg is zero-width
    // but position-dependent — treated conservatively as non-nullable, the
    // dynamic emptyDone set in the recognizer handles those
    val nullable: Array[Boolean] = {
      val out = Array.fill(names.length)(false)
      var changed = true
      while (changed) {
        changed = false
        for (p <- allProds) {
          if (!out(p.nt) && p.syms.forall {
            case NtRef(id, _) => out(id)
            case _: Ins => true
            case _ => false
          }) { out(p.nt) = true; changed = true }
        }
      }
      out
    }
  }

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
  // Chart items are packed longs — (prodId << 44) | (dot << 32) | origin —
  // in flat long arrays with an open-addressing dedup set: the recognizer
  // runs per ROW in a columnar expression, so per-item allocation and
  // tuple-boxing costs multiply by corpus size.
  @inline private def pk(prodId: Int, dot: Int, origin: Int): Long =
    (prodId.toLong << 44) | (dot.toLong << 32) | origin.toLong
  @inline private def pkProd(v: Long): Int = (v >>> 44).toInt
  @inline private def pkDot(v: Long): Int = ((v >>> 32) & 0xfff).toInt
  @inline private def pkOrg(v: Long): Int = (v & 0xffffffffL).toInt

  private final class LongList {
    var a = new Array[Long](8)
    var n = 0
    def add(v: Long): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n << 1)
      a(n) = v; n += 1
    }
  }

  /** open-addressing set of non-negative longs (packed items are ≥ 0). */
  private final class LongSet {
    private var mask = 15
    private var table: Array[Long] = {
      val t = new Array[Long](16); java.util.Arrays.fill(t, -1L); t
    }
    private var size = 0
    def add(v: Long): Boolean = {
      var i = (java.lang.Long.hashCode(v * 0x9e3779b97f4a7c15L) & mask)
      while (true) {
        val t = table(i)
        if (t == -1L) {
          table(i) = v; size += 1
          if (size * 2 > mask) grow()
          return true
        }
        if (t == v) return false
        i = (i + 1) & mask
      }
      false
    }
    private def grow(): Unit = {
      val old = table
      mask = mask * 2 + 1
      table = new Array[Long](mask + 1)
      java.util.Arrays.fill(table, -1L)
      size = 0
      var j = 0
      while (j < old.length) { if (old(j) != -1L) add(old(j)); j += 1 }
    }
  }

  /** parse `input` (codepoints); returns the derivation tree or throws
    * IxmlParseError with the furthest failure position.
    *
    * Mode selection mirrors the reference (xmq.c:5086-5110): cost markers
    * in the grammar force min-cost selection over all parses; a '*' mark
    * anywhere forces alternative rendering even without --ixml-all-parses. */
  def parse(g: Grammar, inputStr: String): XDoc =
    parseInternal(g, inputStr, all = false)

  /** --ixml-all-parses: render the shared parse forest with an AMBIGUOUS
    * element at each ambiguity site (yaep ALT nodes — xmq.c:4986-5023),
    * alternatives under a '*'-marked parent spliced inline. Production
    * alternatives list in declaration order, span splits longest-first,
    * matching the reference on the ambiguity corpus; per-node alternatives
    * are capped to keep pathological grammars bounded. */
  def parseAllDoc(g: Grammar, inputStr: String): XDoc =
    parseInternal(g, inputStr, all = true)

  // one compiled form per Grammar: a per-row columnar expression parses
  // millions of documents with the same grammar — desugaring per document
  // would dominate small parses (weak keys: grammars die with their query)
  private val compileCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Grammar, Compiled]())

  private def compiled(g: Grammar): Compiled = {
    val hit = compileCache.get(g)
    if (hit != null) hit
    else { val c = compile(g); compileCache.put(g, c); c }
  }

  private def parseInternal(g: Grammar, inputStr: String, all: Boolean, maxAlts: Int = 64): XDoc = {
    val c = compiled(g)
    val input = inputStr.codePoints().toArray
    val n = input.length

    // grammar-static recognizer tables live on Compiled (computed once per
    // grammar, shared across all rows)
    val allProds = c.allProds
    val prodsOf = c.prodsOf
    val nullable = c.nullable

    val sets = Array.fill(n + 1)(new LongList)
    val seen = Array.fill(n + 1)(new LongSet)
    @inline def add(k: Int, v: Long): Unit = if (seen(k).add(v)) sets(k).add(v)

    for (pid <- prodsOf(c.start)) add(0, pk(pid, 0, 0))

    var furthest = 0
    var k = 0
    // nonterminals that completed with ZERO width at the current position —
    // a static-nullable check can't see position-dependent Neg guards, and
    // the completer never revisits items added after an empty completion was
    // processed, so prediction consults this dynamic set too (the classic
    // Earley epsilon-completion gap, dynamic Aycock–Horspool variant).
    // generation-stamped (value k+1 means "empty at position k"): no clears.
    val emptyGen = new Array[Int](c.names.length)
    while (k <= n) {
      val setK = sets(k)
      var idx = 0
      while (idx < setK.n) {
        val it = setK.a(idx)
        val dot = pkDot(it)
        val prod = allProds(pkProd(it))
        if (dot < prod.syms.length) {
          prod.syms(dot) match {
            case NtRef(id, _) =>
              val pids = prodsOf(id)
              var pi = 0
              while (pi < pids.length) { add(k, pk(pids(pi), 0, k)); pi += 1 }
              if (nullable(id) || emptyGen(id) == k + 1) add(k, it + (1L << 32))
            case Term(pred, _, _) =>
              if (k < n && pred(input(k))) {
                add(k + 1, it + (1L << 32))
                if (k + 1 > furthest) furthest = k + 1
              }
            case Ins(_) => add(k, it + (1L << 32))
            case Neg(check, _) =>
              if (check(input, k)) add(k, it + (1L << 32))
          }
        } else {
          // completion
          val nt = prod.nt
          val org = pkOrg(it)
          if (org == k) emptyGen(nt) = k + 1 // zero-width span: see above
          val setO = sets(org)
          var j = 0
          while (j < setO.n) {
            val cand = setO.a(j)
            val cdot = pkDot(cand)
            val cp = allProds(pkProd(cand))
            if (cdot < cp.syms.length) cp.syms(cdot) match {
              case NtRef(id, _) if id == nt => add(k, cand + (1L << 32))
              case _ =>
            }
            j += 1
          }
        }
        idx += 1
      }
      k += 1
    }

    val accepted = {
      val setN = sets(n)
      var found = false
      var i = 0
      while (!found && i < setN.n) {
        val it = setN.a(i)
        val p = allProds(pkProd(it))
        found = p.nt == c.start && pkOrg(it) == 0 && pkDot(it) == p.syms.length
        i += 1
      }
      found
    }
    if (!accepted) {
      // the failing token index = furthest position a terminal matched
      throw IxmlParseError(furthest)
    }

    // ---- derivation extraction over the completed chart ----
    // completed spans: (nt, start) -> set of ends; per production too
    val comp = HashMap.empty[(Int, Int), HashSet[Int]] // (nt, origin) -> ends
    val compProd = HashMap.empty[(Int, Int, Int), ArrayBuffer[Int]] // (nt, origin, end) -> prodIds
    for (end <- 0 to n) {
      val s = sets(end)
      var i = 0
      while (i < s.n) {
        val it = s.a(i)
        val p = allProds(pkProd(it))
        if (pkDot(it) == p.syms.length) {
          comp.getOrElseUpdate((p.nt, pkOrg(it)), HashSet.empty) += end
          compProd.getOrElseUpdate((p.nt, pkOrg(it), end), ArrayBuffer.empty) += pkProd(it)
        }
        i += 1
      }
    }
    // chart iteration yields completions in SET order, which zero-width
    // completions (Neg guards, epsilon chains) can permute; both pick paths
    // below assume DECLARATION order. All pids of one (nt, origin, end)
    // bucket belong to the same nt, so ascending pid IS declaration order.
    compProd.values.foreach(_.sortInPlace())

    sealed trait DNode
    final case class DNt(nt: Int, mark: Char, kids: Seq[DNode]) extends DNode
    final case class DText(s: String) extends DNode
    /** an ambiguity site: one child per alternative (yaep ALT chain →
      * AMBIGUOUS element, xmq.c:4986-5023). */
    final case class DAmb(alts: Seq[DNode]) extends DNode

    // ---- per-node derivation enumeration over the completed chart ----
    // A derivation of (nt, from, to) is a production + a span per symbol.
    // Chart closure guarantees every combination of completed child spans is
    // realizable, so enumeration needs no recursion into children.
    final case class Deriv(pid: Int, spans: Array[Int]) // spans(i) = pos after sym i

    val costMode = g.costsEnabled
    val altMode = all || costMode || g.controlledAmbiguity

    // rule costs by nt id ('<' markers; synthetic nonterminals cost 0)
    val ntCost: Array[Int] = c.names.map(n => g.byName.get(n).map(_.cost).getOrElse(0))

    val derivMemo = HashMap.empty[(Int, Int, Int), IndexedSeq[Deriv]]
    /** all derivations of the node, production order as declared, span splits
      * longest-first (the reference's exploration order on the ambiguity
      * corpus), capped at maxAlts. */
    def derivsOf(nt: Int, from: Int, to: Int): IndexedSeq[Deriv] =
      derivMemo.getOrElseUpdate((nt, from, to), {
        val out = ArrayBuffer.empty[Deriv]
        val pids = compProd.getOrElse((nt, from, to), ArrayBuffer.empty)
        for (pid <- pids if out.length < maxAlts) {
          val syms = allProds(pid).syms
          val spans = new Array[Int](syms.length)
          def walk(si: Int, p: Int): Unit = {
            if (out.length >= maxAlts) return
            if (si == syms.length) {
              if (p == to) out += Deriv(pid, spans.clone())
              return
            }
            syms(si) match {
              case Term(pred, _, _) =>
                if (p < to && pred(input(p))) { spans(si) = p + 1; walk(si + 1, p + 1) }
              case Ins(_) => spans(si) = p; walk(si + 1, p)
              case Neg(check, _) =>
                if (check(input, p)) { spans(si) = p; walk(si + 1, p) }
              case NtRef(id, _) =>
                val ends = comp.getOrElse((id, p), HashSet.empty).toSeq.sorted.reverse
                for (mid <- ends if mid <= to) { spans(si) = mid; walk(si + 1, mid) }
            }
          }
          walk(0, from)
        }
        out.toIndexedSeq
      })

    // ---- min-cost DP over the forest (prune_to_minimal, yaep_tree.c:709) ----
    // cost(node) = rule cost + sum of child node costs; cycles cost +inf.
    val INF = Int.MaxValue / 4
    val costMemo = HashMap.empty[(Int, Int, Int), Int]
    val costActive = HashSet.empty[(Int, Int, Int)]
    def minCost(nt: Int, from: Int, to: Int): Int =
      costMemo.get((nt, from, to)).getOrElse {
        val key = (nt, from, to)
        if (!costActive.add(key)) INF
        else {
          val ds = derivsOf(nt, from, to)
          var best = INF
          for (d <- ds) { val dc = derivCost(d, from); if (dc < best) best = dc }
          costActive.remove(key)
          val total = if (best >= INF) INF else math.min(INF, best + ntCost(nt))
          costMemo((nt, from, to)) = total
          total
        }
      }
    def derivCost(d: Deriv, from: Int): Int = {
      val syms = allProds(d.pid).syms
      var sum = 0
      var p = from
      var si = 0
      while (si < syms.length && sum < INF) {
        syms(si) match {
          case NtRef(id, _) =>
            val cc = minCost(id, p, d.spans(si))
            sum = if (cc >= INF) INF else math.min(INF, sum + cc)
          case _ =>
        }
        p = d.spans(si)
        si += 1
      }
      sum
    }

    // ---- forest rendering ----
    // Returns the node's alternatives (ambiguity sites yield >1), each a DNt
    // carrying the node's effective mark. `active` guards unit-production
    // cycles: a derivation re-entering an in-flight (nt, from, to) is skipped
    // (minimal trees never repeat a node on a path, so a finite alternative
    // always survives when one exists).
    def renderAll(nt: Int, from: Int, to: Int, refMark: Char,
                  active: HashSet[(Int, Int, Int)]): Seq[DNt] = {
      val key = (nt, from, to)
      if (!active.add(key)) return Nil
      try {
        var ds = derivsOf(nt, from, to)
        if (costMode && ds.length > 1) {
          val costs = ds.map(d => derivCost(d, from))
          val best = costs.min
          val kept = ds.indices.filter(i => costs(i) == best).map(ds)
          // prune_to_minimal prepends equal-cost alternatives while walking
          // the chain, so surviving ties come out REVERSED (yaep_tree.c:771)
          ds = if (kept.length > 1) kept.reverse.toIndexedSeq else kept.toIndexedSeq
        }
        val mark = if (refMark != 0) refMark else c.marks(nt)
        val out = ArrayBuffer.empty[DNt]
        for (d <- ds) {
          renderDeriv(d, from, mark == '*', active) match {
            case Some(kids) => out += DNt(nt, mark, kids)
            case None =>
          }
        }
        out.toSeq
      } finally active.remove(key)
    }

    /** render one derivation's child list; None when every alternative of
      * some child was cycle-starved. `parentStar` splices child alternatives
      * without the AMBIGUOUS wrapper (xmq.c:4999-5009). */
    def renderDeriv(d: Deriv, from: Int, parentStar: Boolean,
                    active: HashSet[(Int, Int, Int)]): Option[Seq[DNode]] = {
      val syms = allProds(d.pid).syms
      val kids = ArrayBuffer.empty[DNode]
      var p = from
      var si = 0
      while (si < syms.length) {
        syms(si) match {
          case Term(_, hidden, _) =>
            if (!hidden) kids += DText(new String(Character.toChars(input(p))))
          case Ins(str) => kids += DText(str)
          case Neg(_, _) =>
          case NtRef(id, refMark) =>
            val alts = renderAll(id, p, d.spans(si), refMark, active)
            if (alts.isEmpty) return None
            else if (alts.length == 1) kids += alts.head
            else if (parentStar) kids ++= alts
            else kids += DAmb(alts)
        }
        p = d.spans(si)
        si += 1
      }
      Some(kids.toSeq)
    }

    // ---- single-parse extraction (one_parse mode): build_parse_tree
    // commits to the FIRST origin-valid completion in yaep's state-set-core
    // order (yaep_tree.c:401-470), so the pick order at an ambiguity site
    // mirrors how completions land in a core:
    //   1. scan-completed items — productions whose LAST symbol is a
    //      terminal (the scanner adds them first, yaep.c:2283);
    //   2. completion-cascaded items — productions whose last symbol is a
    //      nonterminal that consumed input (check_leading worklist,
    //      yaep.c:2297); among 1./2. peers, the last DECLARED alternative
    //      comes first (prediction registers rules reversed) with the
    //      shortest leading sub-span;
    //   3. trailing-epsilon advances — derivations whose tail derives empty
    //      (parent-advance items from complete_empty_nonterminals_in_rule,
    //      yaep.c:1855, appended after all leading items).
    // All verified against the reference binary on x|y, p|q|r, q|p, grouped
    // alts, two-site, span-split, and 16 trailing/leading-optional and
    // scan-vs-cascade probe grammars. ----
    val failMemo = HashSet.empty[(Int, Int, Int)]

    @inline def lastIsTerm(pid: Int): Boolean = {
      val ss = allProds(pid).syms
      ss.nonEmpty && ss(ss.length - 1).isInstanceOf[Term]
    }

    def deriveNt(nt: Int, from: Int, to: Int, refMark: Char,
                 active: HashSet[(Int, Int, Int)]): Option[DNt] = {
      val key = (nt, from, to)
      if (!active.add(key)) return None
      try {
        val pids = compProd.getOrElse((nt, from, to), ArrayBuffer.empty)
        var r: Option[Seq[DNode]] = None
        // pass 0: scan-completed (terminal-ending; a completed production's
        // last terminal always consumed input, no strict flag needed);
        // pass 1: cascade (consuming nonterminal end); pass 2: any.
        var pass = 0
        while (r.isEmpty && pass < 3) {
          val it = pids.reverseIterator // last declared production wins
          while (r.isEmpty && it.hasNext) {
            val pid = it.next()
            pass match {
              case 0 =>
                if (lastIsTerm(pid) && !failMemo((pid, from, to))) {
                  r = deriveSeq(allProds(pid).syms, 0, from, to, active, strictEnd = false)
                  if (r.isEmpty && active.size <= 1) failMemo += ((pid, from, to))
                }
              case 1 =>
                // uncached: strict failures say nothing about pass 2
                if (!lastIsTerm(pid))
                  r = deriveSeq(allProds(pid).syms, 0, from, to, active, strictEnd = true)
              case _ =>
                if (!lastIsTerm(pid) && !failMemo((pid, from, to))) {
                  r = deriveSeq(allProds(pid).syms, 0, from, to, active, strictEnd = false)
                  // only cache failures that did not depend on the cycle
                  // guard: skip caching when the guard set is non-trivial
                  if (r.isEmpty && active.size <= 1) failMemo += ((pid, from, to))
                }
            }
          }
          pass += 1
        }
        r.map { kids =>
          val mark = if (refMark != 0) refMark else c.marks(nt)
          DNt(nt, mark, kids)
        }
      } finally active.remove(key)
    }

    def deriveSeq(syms: Array[GSym], si: Int, from: Int, to: Int,
                  active: HashSet[(Int, Int, Int)],
                  strictEnd: Boolean): Option[Seq[DNode]] = {
      if (si == syms.length) return if (from == to) Some(Nil) else None
      val last = si == syms.length - 1
      syms(si) match {
        case Term(pred, hidden, _) =>
          if (from < to && pred(input(from))) {
            deriveSeq(syms, si + 1, from + 1, to, active, strictEnd).map { rest =>
              if (hidden) rest
              else DText(new String(Character.toChars(input(from)))) +: rest
            }
          } else None
        case Ins(str) =>
          if (strictEnd && last) None // zero-width tail: not a leading completion
          else deriveSeq(syms, si + 1, from, to, active, strictEnd).map(rest => DText(str) +: rest)
        case Neg(check, _) =>
          if (strictEnd && last) None // zero-width tail
          else if (check(input, from)) deriveSeq(syms, si + 1, from, to, active, strictEnd)
          else None
        case NtRef(id, refMark) =>
          val ends = comp.getOrElse((id, from), HashSet.empty).toSeq.sorted
          var res: Option[Seq[DNode]] = None
          val eit = ends.iterator
          while (res.isEmpty && eit.hasNext) {
            val mid = eit.next()
            if (mid <= to && !(strictEnd && last && mid == from)) {
              deriveSeq(syms, si + 1, mid, to, active, strictEnd) match {
                case Some(rest) =>
                  deriveNt(id, from, mid, refMark, active) match {
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
      case DAmb(alts) => alts.headOption.map(textOf).getOrElse("")
    }

    def buildDoc(rootNodes: Seq[DNode]): XDoc = {
      val doc = new XDoc
      def emit(node: DNode, parent: XElem): Unit = node match {
        case DText(s) => if (parent != null) parent.appendText(s)
        case DAmb(alts) =>
          val e = new XElem("AMBIGUOUS")
          alts.foreach(emitInto(_, e))
          if (parent == null) doc.appendChild(e) else parent.appendChild(e)
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
      // inside an AMBIGUOUS element hidden alternatives splice their
      // children directly (generate_dom_from_yaep_node: anonymous anodes)
      def emitInto(node: DNode, e: XElem): Unit = emit(node, e)
      rootNodes match {
        case Seq(one) =>
          // root with '-'/'@' mark: the corpus has no hidden roots; treat the
          // root as an element regardless
          one match {
            case DNt(nt, mark, kids) if mark == '-' || mark == '@' =>
              val e = new XElem(c.outNames(nt))
              kids.foreach(emit(_, e))
              doc.appendChild(e)
            case other => emit(other, null)
          }
        case several => emit(DAmb(several), null)
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

    val rootNodes: Seq[DNode] =
      if (altMode) {
        val alts = renderAll(c.start, 0, n, 0, HashSet.empty)
        if (alts.isEmpty) throw new IllegalStateException("accepted but no derivation")
        alts
      } else {
        Seq(deriveNt(c.start, 0, n, 0, HashSet.empty)
          .getOrElse(throw new IllegalStateException("accepted but no derivation")))
      }
    val doc = buildDoc(rootNodes)
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
    doc
  }
}
