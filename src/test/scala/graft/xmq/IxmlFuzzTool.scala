package graft.xmq

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets
import scala.util.Random

/** Differential fuzz for the IXML engine vs the compiled reference binary:
  * random (mostly-CSV-ish, mutated) inputs are parsed with the reference
  * library grammars by both engines; stdout must match byte-for-byte,
  * including parse-failure documents.
  *
  * usage: Test/runMain graft.xmq.IxmlFuzzTool <n-per-grammar> [seed]
  */
object IxmlFuzzTool {
  private val Binary = "/tmp/refbuild/build/x86_64-pc-linux-gnu/release/xmq"

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val seed = if (args.length > 1) args(1).toLong else 42L
    val rnd = new Random(seed)

    if (!Files.exists(Paths.get(Binary))) {
      System.err.println(s"reference binary missing at $Binary — build per memory recipe")
      sys.exit(2)
    }

    val grammars = Seq(
      "csv" -> Files.readString(Paths.get("/root/reference/library/data/csv.ixml")),
      "tsv" -> Files.readString(Paths.get("/root/reference/library/data/tsv.ixml")),
      "scsv" -> Files.readString(Paths.get("/root/reference/library/data/scsv.ixml")),
      "pair" -> "pair = key, -\":\", value.\nkey = ~[\":\"]+.\nvalue = [\"0\"-\"9\"]+.\n",
      // the richest grammar in the library: xmq described in ixml — deep
      // Earley recursion, comments, quotes, entities, and failure positions
      "xmq" -> Files.readString(Paths.get("/root/reference/library/core/xmq.ixml")),
      // guard-heavy: zero-width !-lookahead on every word char plus a
      // leading-digit guard — stresses the epsilon-completion path the r2
      // ADVICE flagged (Neg-only completions consumed by later-predicted
      // items) and the word/num overlap keeps 2-way ambiguity in play
      "guard" -> ("doc = seg++\"-\".\nseg = word; num.\n" +
        "word = (!\"z\", !\"q\", ~[\"-\"])+.\nnum = !\"0\", [\"0\"-\"9\"]+.\n"))

    val tmp = Files.createTempDirectory("ixmlfuzz")
    var total = 0
    var mismatches = 0
    var staleGuard = 0

    def randomCell(): String = {
      val alphabet = "abcXYZ019 _.!?'\"åäö€"
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }

    def randomInput(sep: Char): String = {
      val rows = 1 + rnd.nextInt(5)
      val sb = new StringBuilder
      for (_ <- 0 until rows) {
        val cols = 1 + rnd.nextInt(5)
        sb.append((0 until cols).map(_ => randomCell()).mkString(sep.toString))
        sb.append('\n')
      }
      var s = sb.toString
      // mutations: drop trailing newline / inject random char / truncate
      rnd.nextInt(4) match {
        case 0 => s = s.stripSuffix("\n")
        case 1 if s.nonEmpty =>
          val i = rnd.nextInt(s.length)
          s = s.substring(0, i) + " ".charAt(rnd.nextInt(2)) + s.substring(i)
        case 2 if s.length > 2 => s = s.substring(0, rnd.nextInt(s.length))
        case _ =>
      }
      s
    }

    // xmq-ish snippets: mostly valid, mutations make some fail mid-scan
    def randomXmq(): String = {
      val names = Array("alfa", "beta", "g1", "x")
      val sb = new StringBuilder
      def node(depth: Int): Unit = rnd.nextInt(6) match {
        case 0 => sb.append(names(rnd.nextInt(names.length)))
        case 1 => sb.append(names(rnd.nextInt(names.length))).append(" = ")
          .append(if (rnd.nextBoolean()) "v" + rnd.nextInt(9) else "'q v'")
        case 2 => sb.append("// c").append(rnd.nextInt(9)).append('\n')
        case 3 => sb.append("/* m").append(rnd.nextInt(9)).append(" */")
        case 4 if depth < 2 =>
          sb.append(names(rnd.nextInt(names.length)))
          if (rnd.nextBoolean()) sb.append("(k = ").append(rnd.nextInt(9)).append(')')
          sb.append(" { ")
          val k = 1 + rnd.nextInt(2)
          for (_ <- 0 until k) { node(depth + 1); sb.append(' ') }
          sb.append('}')
        case _ => sb.append('&').append("nbsp").append(';')
      }
      node(0)
      var s = sb.toString
      rnd.nextInt(4) match {
        case 0 if s.length > 2 => s = s.substring(0, rnd.nextInt(s.length)) // truncate
        case 1 => val i = rnd.nextInt(s.length + 1); s = s.substring(0, i) + "ä" + s.substring(i)
        case _ =>
      }
      s
    }

    // random small grammars with 2-way ambiguity (rule choice, span splits,
    // optional/repetition overlap) exercising the round-3 forest extraction:
    // single-parse pick order (last declared alternative, shortest leading
    // span) and the state=ambiguous marker must match the binary byte-exactly.
    // Alternatives per rule stay at 2 — ordering among >=3 same-span
    // alternatives depends on yaep's internal ALT-chain order (documented
    // divergence, IxmlCostRecoverySpec).
    def randomAmbigGrammar(): String = {
      val atoms = Array("\"a\"", "\"b\"", "\"ab\"", "\"z\"")
      val nRules = 2 + rnd.nextInt(3)
      val names = (0 until nRules).map(i => s"r$i")
      def factor(from: Int): String = {
        val f = rnd.nextInt(6) match {
          case 0 | 1 => atoms(rnd.nextInt(atoms.length))
          case 2 if from + 1 < nRules => names(from + 1 + rnd.nextInt(nRules - from - 1))
          case 3 => atoms(rnd.nextInt(2)) + "+"
          case 4 => atoms(rnd.nextInt(2)) + "?"
          case _ => atoms(rnd.nextInt(atoms.length))
        }
        f
      }
      def alt(from: Int): String =
        (0 until 1 + rnd.nextInt(2)).map(_ => factor(from)).mkString(", ")
      names.zipWithIndex.map { case (nm, i) =>
        val alts = (0 until 1 + rnd.nextInt(2)).map(_ => alt(i)).mkString(" | ")
        s"$nm: $alts."
      }.mkString("\n") + "\n"
    }

    def randomAmbigInput(): String = {
      val alphabet = "abz"
      (0 until rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }

    for (i <- 0 until n) {
      val grammar = randomAmbigGrammar()
      val input = randomAmbigInput()
      total += 1
      val gFile = tmp.resolve(s"ambig-$i.ixml")
      val inFile = tmp.resolve(s"ambig-$i.inp")
      Files.writeString(gFile, grammar)
      Files.write(inFile, input.getBytes(StandardCharsets.UTF_8))
      val mine =
        try XmqEngine.toXmq(graft.xmq.ixml.Ixml.parseToDoc(grammar, input))
        catch { case e: Exception => s"ENGINE-ERROR: $e\n" }
      val proc = new ProcessBuilder(Binary, s"--ixml=$gFile", inFile.toString, "to-xmq").start()
      val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      if (rc == 134 || rc == 139) {
        // the reference aborted (yaep assertion) — nothing to compare
      } else if (mine != ref) {
        mismatches += 1
        if (mismatches <= 5) {
          System.err.println(s"=== MISMATCH ambig case $i grammar=\n$grammar input=${TextUtil.quoteAsC(input)}")
          System.err.println(s"--- mine:\n$mine--- ref:\n$ref")
        }
      }
    }

    for ((name, grammar) <- grammars) {
      val gFile = tmp.resolve(s"$name.ixml")
      Files.writeString(gFile, grammar)
      val sep = name match { case "tsv" => '\t'; case "scsv" => ';'; case "pair" => ':'; case _ => ',' }
      for (i <- 0 until n) {
        val input =
          if (name == "pair")
            (if (rnd.nextBoolean()) randomCell().replace(":", "") + ":" + rnd.nextInt(1000)
             else randomCell() + ":" + randomCell())
          else if (name == "xmq") randomXmq()
          else if (name == "guard") {
            val alphabet = "abzq019-"
            (0 until 1 + rnd.nextInt(10)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
          }
          else randomInput(sep)
        total += 1
        val inFile = tmp.resolve(s"$name-$i.inp")
        Files.write(inFile, input.getBytes(StandardCharsets.UTF_8))

        val mine =
          try XmqEngine.toXmq(graft.xmq.ixml.Ixml.parseToDoc(grammar, input))
          catch { case e: Exception => s"ENGINE-ERROR: $e\n" }

        val pb = new ProcessBuilder(Binary, s"--ixml=$gFile", inFile.toString, "to-xmq")
        pb.redirectErrorStream(false)
        val proc = pb.start()
        val ref = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        proc.waitFor()

        if (mine != ref) {
          if (name == "guard" && (staleGuardDivergence(input, mine, ref) ||
              frozenPickDivergence(mine, ref))) {
            staleGuard += 1
          } else {
            mismatches += 1
            if (mismatches <= 5) {
              System.err.println(s"=== MISMATCH $name case $i input=${TextUtil.quoteAsC(input)}")
              System.err.println(s"--- mine:\n$mine--- ref:\n$ref")
            }
          }
        }
      }
    }
    println(s"ixml differential fuzz: $total cases, $mismatches mismatches" +
      (if (staleGuard > 0) s" ($staleGuard known stale-guard reference divergences)" else ""))
    if (mismatches > 0) sys.exit(1)
  }

  /** KNOWN REFERENCE BUG (documented divergence): yaep caches Earley set
    * cores keyed only on the STARTED dotted rules (yaep.c:938 —
    * core_has_not_rules skips the predicted portion, and the reference's
    * own comment says "Later on we can improve this"), so a reused core
    * carries !-guard completions evaluated against a DIFFERENT input
    * position. Effect: after a repeated chart state, the reference lets a
    * guard-blocked char through (accepting e.g. word="q" under !"q") or
    * reports the failure one guarded char later. Our engine evaluates
    * guards at the actual position (spec behavior). This classifier
    * accepts ONLY that signature for the guard grammar:
    *  - ref accepted but we failed at a position whose char is 'z'/'q'
    *    (word guards) — the acceptance necessarily ate a guarded char; or
    *  - both failed, ref's column is LATER, and our column sits on a
    *    guard-blocked char ('z'/'q'/'0'-led num) — the stale cache admitted
    *    that char and the reference failed at some arbitrary later point.
    */
  private def staleGuardDivergence(input: String, mine: String, ref: String): Boolean = {
    def failCol(out: String): Option[Int] =
      "column = (\\d+)".r.findFirstMatchIn(out).map(_.group(1).toInt)
    val guarded = Set('z', 'q', '0')
    (failCol(mine), failCol(ref)) match {
      case (Some(m), None) => // we reject, reference accepted
        ref.contains("doc") && m >= 1 && m <= input.length && guarded(input.charAt(m - 1))
      case (Some(m), Some(r)) =>
        r > m && m >= 1 && m <= input.length && guarded(input.charAt(m - 1))
      case _ => false
    }
  }

  /** SECOND SIGNATURE of the same yaep stale-core bug, surfaced by extended
    * fuzz (seed 77): both engines ACCEPT, but the reference's reused core
    * carries a !"0" verdict frozen at the first same-shape Earley set — so
    * for a later all-digit segment it either silently drops the `num`
    * alternative (printing word + NO ambiguity flag where the grammar is
    * genuinely 2-way ambiguous, e.g. "01-0aa-19": the first interior
    * segment starts with '0', freezing num dead for every later segment) or
    * admits `num` where the guard should block it ("190-b9-0": the first
    * interior segment starts 'b', freezing the !"0" check as passed, so the
    * trailing "0" prints as num). Our engine evaluates guards at the actual
    * position. Accepted iff the outputs are byte-identical after
    * normalizing exactly those two effects for the guard grammar: the
    * ambiguity header and the num↔word label on all-digit values. */
  private def frozenPickDivergence(mine: String, ref: String): Boolean = {
    def norm(out: String): String = out
      .replace("doc(state      = ambiguous\n" +
        "    xmlns:ixml = http://invisiblexml.org/NS)\n{", "doc {")
      .replaceAll("""num = (\d+)""", "word = $1")
    mine.contains("doc") && ref.contains("doc") && norm(mine) == norm(ref)
  }
}
