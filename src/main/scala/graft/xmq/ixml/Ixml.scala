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

  /** --ixml-all-parses: ambiguity renders an AMBIGUOUS element at each
    * divergence site of the shared forest (root-level ambiguity produces the
    * AMBIGUOUS(state=ambiguous) root of tests/ixml_parse_020_ambig.test;
    * nested ambiguity nests the wrapper, verified against the binary). */
  def parseAllToDoc(grammarText: String, inputText: String): XDoc = {
    val g = IxmlReader.parse(grammarText)
    try Earley.parseAllDoc(g, inputText)
    catch {
      case Earley.IxmlParseError(at) =>
        failureDoc(inputText, at)
    }
  }

  /** Result of a recovering parse: the document, plus how many codepoints
    * were skipped (0 = clean parse; recovered=false = recovery failed and
    * `doc` is the reference failure document). */
  final case class Recovered(doc: XDoc, skipped: Int, recovered: Boolean)

  /** --ixml-try-to-recover: on syntax error, skip the fewest codepoints that
    * let the parse resume, then require three matched codepoints (yaep's
    * DEFAULT_RECOVERY_TOKEN_MATCHES, yaep_structs.h:72) or full acceptance;
    * repeat for subsequent errors. Skipped text is absent from the output —
    * yaep renders ERROR nodes as nothing (xmq.c:4899 ignores YAEP_ERROR).
    *
    * DOCUMENTED DIVERGENCE: the reference binary aborts on every input that
    * actually needs recovery (yaep_tree.c:248 assertion — its recovery
    * machinery requires `error` terminals that ixml-generated grammars never
    * contain), so byte parity is impossible; this implements the documented
    * min-cost-skip intent (yaep.c:2365-2369, 3197). Unlike yaep we also
    * accept a pure suffix skip when it yields full acceptance (truncated
    * documents), where yaep rejects EOF-without-match. */
  def parseRecoverToDoc(grammarText: String, inputText: String,
                        allParses: Boolean = false,
                        maxErrors: Int = 100): Recovered =
    parseRecover(IxmlReader.parse(grammarText), inputText, allParses, maxErrors,
      announce = true)

  /** compiled-grammar variant for per-row columnar use (the grammar is
    * compiled once per task, not once per document). */
  def parseRecover(g: Grammar, inputText: String,
                   allParses: Boolean = false,
                   maxErrors: Int = 100,
                   announce: Boolean = false): Recovered = {
    def run(text: String): Either[Int, XDoc] =
      try Right(if (allParses) Earley.parseAllDoc(g, text) else Earley.parse(g, text))
      catch { case Earley.IxmlParseError(at) => Left(at) }

    var text = inputText
    var skipped = 0
    var errors = 0
    var firstErrorAt = -1
    while (errors <= maxErrors) {
      run(text) match {
        case Right(doc) => return Recovered(doc, skipped, recovered = true)
        case Left(at) =>
          if (firstErrorAt < 0) {
            firstErrorAt = at
            // the reference announces recovery on stderr (yaep.c:2596);
            // suppressed in columnar use — a billion-row corpus must not
            // write per-document driver-side noise
            if (announce) System.err.println("Attempting error recovery...")
          }
          errors += 1
          val cps = text.codePoints().toArray
          val n = cps.length
          // minimal skip first; within one cost, latest start first (skip as
          // close to the error as possible). The range must cover the error
          // point: [s, s+cost) with s <= at < s+cost (or a suffix skip).
          var found: (Int, Int) = null // (start, len)
          var cost = 1
          val maxCost = n - (if (at >= n) 0 else at) + math.min(at, 64)
          while (found == null && cost <= math.max(1, maxCost)) {
            var s = math.min(at, n - 1)
            val sLo = math.max(0, math.min(at, n - 1) - cost + 1)
            while (found == null && s >= sLo) {
              val e = math.min(s + cost, n)
              if (e > s) {
                val candidate = new String(
                  (cps.take(s) ++ cps.drop(e)).flatMap(Character.toChars))
                run(candidate) match {
                  case Right(_) => found = (s, e - s)
                  case Left(at2) =>
                    // progress rule: three matched codepoints past the skip
                    if (at2 >= s + 3) found = (s, e - s)
                }
              }
              s -= 1
            }
            cost += 1
          }
          found match {
            case null =>
              return Recovered(failureDoc(inputText, firstErrorAt), skipped,
                recovered = false)
            case (s, len) =>
              text = new String((cps.take(s) ++ cps.drop(s + len))
                .flatMap(Character.toChars))
              skipped += len
          }
      }
    }
    Recovered(failureDoc(inputText, firstErrorAt), skipped, recovered = false)
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
