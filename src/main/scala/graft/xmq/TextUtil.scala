package graft.xmq

/** String/byte helpers mirroring the reference's text module semantics
  * (/root/reference/src/main/c/parts/text.c). All offset-based functions
  * operate on UTF-8 byte arrays to match the C engine exactly.
  */
object TextUtil {

  /** Number of bytes of whitespace at i: ascii space/nl/tab/cr (1),
    * U+00A0 (2), U+2000..U+2003 (3). 0 if not whitespace. (text.c:14-63) */
  def countWhitespace(b: Array[Byte], i: Int, stop: Int): Int = {
    val c = b(i) & 0xff
    if (c == ' ' || c == '\n' || c == '\t' || c == '\r') return 1
    if (i + 1 >= stop) return 0
    if (c != 0xc2 && c != 0xe2) return 0
    val cc = b(i + 1) & 0xff
    if (c == 0xc2 && cc == 0xa0) return 2
    if (c == 0xe2 && cc == 0x80) {
      if (i + 2 >= stop) return 0
      val ccc = b(i + 2) & 0xff
      if (ccc >= 0x80 && ccc <= 0x83) return 3
    }
    0
  }

  def isXmlWhitespace(c: Char): Boolean = c == ' ' || c == '\n' || c == '\t' || c == '\r'
  def isXmqTokenWhitespace(c: Int): Boolean = c == ' ' || c == '\n' || c == '\r'

  def isXmqTextName(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
      c == '-' || c == '_' || c == '.' || c == ':' || c == '#'

  def isXmqElementStart(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'

  /** (text.c is_xmq_element_name) returns (valid, colonIndex or -1) */
  def isXmqElementName(s: String): (Boolean, Int) = {
    if (s.isEmpty || !isXmqElementStart(s.charAt(0))) return (false, -1)
    var colon = -1
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 127 || !isXmqTextName(c)) return (false, -1)
      if (c == ':') colon = i
      i += 1
    }
    (true, colon)
  }

  def isLowercaseHex(c: Int): Boolean = (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')
  def isHex(c: Int): Boolean = isLowercaseHex(c) || (c >= 'A' && c <= 'F')
  def hexValue(c: Int): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') 10 + c - 'a'
    else 10 + c - 'A'

  /** Unicode length: count of non-continuation bytes == code points (text.c str_b_u_len). */
  def uLen(s: String): Int = s.codePointCount(0, s.length)

  /** Escape as C/JSON string content (text.c xmq_quote_as_c, add_quotes=false). */
  def quoteAsC(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= ' ' && c <= 126 && c != '"' && c != '\\') sb.append(c)
      else c match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\u0007' => sb.append("\\a")
        case '\b' => sb.append("\\b")
        case '\t' => sb.append("\\t")
        case '\n' => sb.append("\\n")
        case '\u000b' => sb.append("\\v")
        case '\f' => sb.append("\\f")
        case '\r' => sb.append("\\r")
        case _ =>
          if (c > 126) sb.append(c) // non-7bit utf8 passes through
          else {
            sb.append("\\x")
            sb.append(toHex((c >> 4) & 0xf)); sb.append(toHex(c & 0xf))
          }
      }
      i += 1
    }
    sb.toString
  }

  private def toHex(v: Int): Char = if (v <= 9) ('0' + v).toChar else ('A' - 10 + v).toChar

  /** Unescape C/JSON escapes (text.c xmq_unquote_as_c, remove_quotes=false). */
  def unquoteAsC(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        i += 1
        s.charAt(i) match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case 'n' => sb.append('\n')
          case 'a' => sb.append('\u0007')
          case 'b' => sb.append('\b')
          case 't' => sb.append('\t')
          case 'v' => sb.append('\u000b')
          case 'f' => sb.append('\f')
          case 'r' => sb.append('\r')
          case 'x' if i + 2 < s.length =>
            sb.append(((hexValue(s.charAt(i+1)) << 4) | hexValue(s.charAt(i+2))).toChar)
            i += 2
          case _ => // ignored, like the reference
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** decode &name; style entity to a codepoint; 0 if unknown (xml.c:274-287). */
  def decodeEntityRef(name: String): Int = {
    name match {
      case "apos" => '\''
      case "gt" => '>'
      case "lt" => '<'
      case "quot" => '"'
      case "nbsp" => 160
      case "amp" => '&'
      case _ =>
        if (name.isEmpty || name.charAt(0) != '#') 0
        else if (name.length > 1 && name.charAt(1) == 'x')
          try Integer.parseInt(name.substring(2), 16) catch { case _: Exception => 0 }
        else
          try Integer.parseInt(name.substring(1)) catch { case _: Exception => 0 }
    }
  }

  /** prepend/append a space if the value starts/ends with a single quote
    * (text.c potentially_add_leading_ending_space — used for PI values). */
  def potentiallyAddLeadingEndingSpace(s: String): String = {
    if (s.isEmpty) return s
    val pre = if (s.charAt(0) == '\'') " " else ""
    val post = if (s.charAt(s.length - 1) == '\'') " " else ""
    pre + s + post
  }

  // ---- String-level scans used by trim + printer (ASCII-only semantics) ----

  /** If content has leading whitespace containing a newline, return index after
    * that leading ws run, else -1. onlyNewlines set when the leading run is
    * pure newlines before any other ws. (text.c has_leading_space_nl) */
  def leadingSpaceNl(s: String, from: Int, to: Int): (Int, Int) = {
    var i = from
    var onlyNls = 0
    while (i < to && s.charAt(i) == '\n') { i += 1; onlyNls += 1 }
    var foundNl = onlyNls > 0
    val middle = i
    while (i < to && isXmlWhitespace(s.charAt(i))) {
      if (s.charAt(i) == '\n') foundNl = true
      i += 1
    }
    if (!foundNl) return (-1, 0)
    if (middle == i) (i, onlyNls) else (i, 0)
  }

  /** Mirror of has_ending_nl_space: returns (index of first trailing-ws char, onlyNewlines). */
  def endingNlSpace(s: String, from: Int, to: Int): (Int, Int) = {
    var i = to - 1
    var onlyNls = 0
    while (i >= from && s.charAt(i) == '\n') { i -= 1; onlyNls += 1 }
    var foundNl = onlyNls > 0
    val middle = i
    while (i >= from && isXmlWhitespace(s.charAt(i))) {
      if (s.charAt(i) == '\n') foundNl = true
      i -= 1
    }
    if (!foundNl) return (-1, 0)
    if (middle == i) (i + 1, onlyNls) else (i + 1, 0)
  }

  def hasNewlines(s: String, from: Int, to: Int): Boolean = {
    var i = from
    while (i < to) { if (s.charAt(i) == '\n') return true; i += 1 }
    false
  }

  def hasAllQuotes(s: String, from: Int, to: Int): Boolean = {
    if (from == to) return false
    var allSq = true
    var i = from
    while (i < to && allSq) { if (s.charAt(i) != '\'') allSq = false; i += 1 }
    if (allSq) return true
    i = from
    while (i < to) { if (s.charAt(i) != '"') return false; i += 1 }
    true
  }

  /** (allWhitespace, allSpace, onlyNewlines) per text.c has_all_whitespace */
  def allWhitespace(s: String, from: Int, to: Int): (Boolean, Boolean, Boolean) = {
    var allSpace = true
    var onlyNl = true
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      if (!isXmlWhitespace(c)) return (false, false, false)
      if (c != ' ') allSpace = false
      if (c != '\n') onlyNl = false
      i += 1
    }
    (true, allSpace, onlyNl)
  }

  def isAllXmlWhitespace(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (!isXmlWhitespace(s.charAt(i))) return false; i += 1 }
    true
  }

  /** Value can start with these two chars? (xmq_parser.c unsafe_value_start) */
  def unsafeValueStart(c: Char, cc: Char): Boolean =
    c == '&' || c == '=' || (c == '/' && (cc == '/' || cc == '*'))

  /** Safe unquoted value char at string position i (codepoint-aware for the
    * unicode whitespaces the tokenizer treats as ws). */
  def isSafeValueChar(s: String, i: Int): Boolean = {
    val c = s.charAt(i)
    if (c == ' ' || c == '\n' || c == '\t' || c == '\r' ||
        c == '(' || c == ')' || c == '{' || c == '}' || c == '\'' || c == '"') return false
    if (c == '\u00a0' || (c >= '\u2000' && c <= '\u2003')) return false
    true
  }

  def isXmqTextValue(s: String, from: Int, to: Int): Boolean = {
    if (from >= to) return false
    val c = s.charAt(from)
    val cc = if (from + 1 < to) s.charAt(from + 1) else 0.toChar
    if (unsafeValueStart(c, cc)) return false
    var i = from
    while (i < to) {
      if (!isSafeValueChar(s, i)) return false
      i += 1
    }
    true
  }

  /** Is this codepoint-start position a unicode whitespace (non ascii)? */
  def isUnicodeWhitespaceChar(c: Char): Boolean =
    c == '\u00a0' || (c >= '\u2000' && c <= '\u2003')
}
