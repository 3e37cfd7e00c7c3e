package graft.xmq

import java.nio.charset.StandardCharsets

/** Exact xmq tokenizer: single pass over UTF-8 bytes, emitting the reference's
  * 29 token types via callbacks. Grammar per
  * /root/reference/src/main/c/parts/xmq_parser.c (tokens listed in
  * xmq_internals.h:88-118). Errors raise XmqParseError (the analogue of the
  * reference's longjmp to a single handler).
  */
object Tok {
  val Whitespace = "whitespace"
  val Equals = "equals"
  val BraceLeft = "brace_left"
  val BraceRight = "brace_right"
  val AparLeft = "apar_left"
  val AparRight = "apar_right"
  val CparLeft = "cpar_left"
  val CparRight = "cpar_right"
  val Quote = "quote"
  val Entity = "entity"
  val Comment = "comment"
  val CommentContinuation = "comment_continuation"
  val ElementNs = "element_ns"
  val ElementName = "element_name"
  val ElementKey = "element_key"
  val ElementValueText = "element_value_text"
  val ElementValueQuote = "element_value_quote"
  val ElementValueEntity = "element_value_entity"
  val ElementValueCompoundQuote = "element_value_compound_quote"
  val ElementValueCompoundEntity = "element_value_compound_entity"
  val AttrNs = "attr_ns"
  val AttrKey = "attr_key"
  val AttrValueText = "attr_value_text"
  val AttrValueQuote = "attr_value_quote"
  val AttrValueEntity = "attr_value_entity"
  val AttrValueCompoundQuote = "attr_value_compound_quote"
  val AttrValueCompoundEntity = "attr_value_compound_entity"
  val NsDeclaration = "ns_declaration"
  val NsColon = "ns_colon"
}

final case class XmqParseError(error: String, line: Int, col: Int)
  extends Exception(s"$error at $line:$col")

/** Levels for value parsing (xmq_internals.h Level enum). */
object Level {
  val XMQ = 0
  val ELEMENT_VALUE = 1
  val ELEMENT_VALUE_COMPOUND = 2
  val ATTR_VALUE = 3
  val ATTR_VALUE_COMPOUND = 4
  def enterCompound(l: Int): Int =
    if (l == ELEMENT_VALUE) ELEMENT_VALUE_COMPOUND
    else if (l == ATTR_VALUE) ATTR_VALUE_COMPOUND
    else throw new IllegalStateException("bad compound level")
}

trait TokenSink {
  /** start/stop are byte offsets into the buffer; suffix mirrors the C 'suffix' pointer. */
  def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit
}

final class XmqTokenizer(val buf: Array[Byte], sink: TokenSink) {
  import TextUtil._

  var i = 0
  val stop: Int = buf.length
  var line = 1
  var col = 1

  private def b(k: Int): Int = if (k < stop) buf(k) & 0xff else 0

  private def err(msg: String): Nothing = throw XmqParseError(msg, line, col)

  /** Advance one byte-step like the C increment(): col counts only non-continuation bytes. */
  private def inc(numBytes: Int): Unit = {
    var n = numBytes
    while (n > 0) {
      val c = buf(i) & 0xff
      if ((c & 0xc0) != 0x80) {
        col += 1
        if (c == '\n') { line += 1; col = 1 }
      }
      i += 1
      n -= 1
    }
  }

  /** Advance over nb bytes treating them as one visible char (multi-byte ws). */
  private def incRun(nb: Int): Unit = {
    // increment(first, nb, ...) in C: one col bump keyed off the first byte.
    val c = buf(i) & 0xff
    if ((c & 0xc0) != 0x80) {
      col += 1
      if (c == '\n') { line += 1; col = 1 }
    }
    i += nb
  }

  def tokenize(): Unit = {
    parseXmq()
    if (i < stop) err("unexpected closing brace")
  }

  def parseXmq(): Unit = {
    var done = false
    while (i < stop && !done) {
      val c = b(i)
      val cc = if ((c == '/' || c == '(') && i + 1 < stop) b(i + 1) else 0

      if (isXmqTokenWhitespace(c)) parseWhitespace()
      else if (c == '\'' || c == '"') parseQuote(Level.XMQ)
      else if (c == '&') parseEntity(Level.XMQ)
      else if (c == '/' && (cc == '/' || cc == '*')) parseComment(cc)
      else if (isXmqElementStart(c)) parseElement(doctype = false, pi = false)
      else if (isDoctypeStart) parseElement(doctype = true, pi = false)
      else if (isPiStart) parseElement(doctype = false, pi = true)
      else if (c == '}') done = true
      else if (c == '\t') err("unexpected tab")
      else err(f"invalid char '${c.toChar}'")
    }
  }

  private def isDoctypeStart: Boolean = {
    if (b(i) != '!') return false
    if (i + 8 > stop) return false
    if (new String(buf, i, 8, StandardCharsets.US_ASCII) != "!DOCTYPE") return false
    if (i + 8 == stop) return false
    val c = b(i + 8)
    c == '=' || c == ' ' || c == '\t' || c == '\n' || c == '\r'
  }

  private def isPiStart: Boolean = b(i) == '?' && i + 2 <= stop

  private def parseWhitespace(): Unit = {
    val sl = line; val sc = col; val start = i
    var brk = false
    while (i < stop && !brk) {
      val nw = countWhitespace(buf, i, stop)
      if (nw == 0) brk = true
      else if (nw == 1 && b(i) == '\t') brk = true
      else incRun(nw)
    }
    sink.token(Tok.Whitespace, sl, sc, start, i, i)
  }

  private def countQuotes(k: Int): Int = {
    val q = buf(k)
    var j = k
    while (j < stop && buf(j) == q) j += 1
    j - k
  }

  /** returns (start, stop) of the full quote token incl. surrounding quotes. */
  private def eatQuote(): (Int, Int) = {
    val q = b(i)
    var depth = countQuotes(i)
    val start = i
    var count = depth
    while (count > 0) { inc(1); count -= 1 }
    if (depth == 2) return (start, i) // the empty quote ''
    var end = -1
    while (i < stop && end < 0) {
      val c = b(i)
      if (c != q) inc(1)
      else {
        val n = countQuotes(i)
        if (n > depth) err("quote closed with too many quotes")
        else if (n < depth) { var k = n; while (k > 0) { inc(1); k -= 1 } }
        else { var k = n; while (k > 0) { inc(1); k -= 1 }; depth = 0; end = i }
      }
    }
    if (depth != 0) err("quote not closed")
    (start, end)
  }

  private def parseQuote(level: Int): Unit = {
    val sl = line; val sc = col
    val (s, e) = eatQuote()
    val tpe = level match {
      case Level.XMQ => Tok.Quote
      case Level.ELEMENT_VALUE => Tok.ElementValueQuote
      case Level.ELEMENT_VALUE_COMPOUND => Tok.ElementValueCompoundQuote
      case Level.ATTR_VALUE => Tok.AttrValueQuote
      case Level.ATTR_VALUE_COMPOUND => Tok.AttrValueCompoundQuote
    }
    sink.token(tpe, sl, sc, s, e, e)
  }

  private def eatEntity(): Unit = {
    inc(1) // &
    var c = 0
    var expectSemicolon = false
    var brk = false
    while (i < stop && !brk) {
      c = b(i)
      if (!isXmqTextName(c)) brk = true
      else {
        if (!isLowercaseHex(c)) expectSemicolon = true
        inc(1)
      }
    }
    if (c == ';') { inc(1); expectSemicolon = false }
    if (expectSemicolon) err("entity not closed")
  }

  private def parseEntity(level: Int): Unit = {
    val sl = line; val sc = col; val start = i
    eatEntity()
    val tpe = level match {
      case Level.XMQ => Tok.Entity
      case Level.ELEMENT_VALUE => Tok.ElementValueEntity
      case Level.ELEMENT_VALUE_COMPOUND => Tok.ElementValueCompoundEntity
      case Level.ATTR_VALUE => Tok.AttrValueEntity
      case Level.ATTR_VALUE_COMPOUND => Tok.AttrValueCompoundEntity
    }
    sink.token(tpe, sl, sc, start, i, i)
  }

  private def countSlashes(k: Int): (Int, Boolean) = {
    var j = k
    while (j < stop && buf(j) == '/') j += 1
    (j - k, j < stop && buf(j) == '*')
  }

  private def parseComment(cc: Int): Unit = {
    var sl = line; var sc = col
    var start = i
    val (n, foundAsterisk0) = countSlashes(i)
    if (!foundAsterisk0) {
      // Single-line comment to eol (incl. the newline).
      inc(2)
      var c = 0
      while (i < stop && c != '\n') { c = b(i); inc(1) }
      sink.token(Tok.Comment, sl, sc, start, i, i)
    } else {
      var foundAsterisk = eatCommentToClose(n)
      sink.token(Tok.Comment, sl, sc, start, i, i)
      while (foundAsterisk) {
        start = i; sl = line; sc = col
        foundAsterisk = eatCommentToClose(n)
        sink.token(Tok.CommentContinuation, sl, sc, start, i, i)
      }
    }
  }

  /** eat up to and including the closing n slashes; true if continuation follows. */
  private def eatCommentToClose(numSlashes: Int): Boolean = {
    if (b(i) == '/') {
      var k = numSlashes
      while (k > 0) { inc(1); k -= 1 }
    }
    // at '*'
    inc(1)
    var c = 0
    var ccPrev = 0
    while (i < stop) {
      ccPrev = c
      c = b(i)
      if (ccPrev == '*' && c == '/') {
        val (n, asterisk) = countSlashes(i)
        if (n >= numSlashes) {
          if (n > numSlashes) err("comment closed with too many slashes")
          var k = n
          while (k > 0) { inc(1); k -= 1 }
          return asterisk
        } else inc(1)
      } else inc(1)
    }
    err("comment not closed")
  }

  /** returns (nameStart, nameStop, nsStart, nsStop) — ns -1 when absent. */
  private def eatTextName(): (Int, Int, Int, Int) = {
    var colon = -1
    val start = i
    var brk = false
    while (i < stop && !brk) {
      val c = b(i)
      if (!isXmqTextName(c)) brk = true
      else { if (c == ':') colon = i; inc(1) }
    }
    if (colon >= 0) (colon + 1, i, start, colon) else (start, i, -1, -1)
  }

  private def peekNextIsEqual(): Boolean = {
    var j = i
    var c = 0
    while (j < stop) {
      c = b(j)
      if (!isXmlWhitespace(c.toChar)) return c == '='
      j += 1
    }
    false
  }

  private def parseElement(doctype: Boolean, pi: Boolean): Unit = {
    val startLine = line; val startCol = col
    var nameStart = 0; var nameStop = 0; var nsStart = -1; var nsStop = -1

    if (doctype) {
      nameStart = i
      inc(1) // !
      while (i < stop && isXmqTextName(b(i))) inc(1)
      nameStop = i
    } else if (pi) {
      nameStart = i
      inc(1) // ?
      while (i < stop && isXmqTextName(b(i))) inc(1)
      nameStop = i
    } else {
      val r = eatTextName()
      nameStart = r._1; nameStop = r._2; nsStart = r._3; nsStop = r._4
    }
    val stop0 = i
    val isKey = peekNextIsEqual()

    if (nsStart < 0) {
      sink.token(if (isKey) Tok.ElementKey else Tok.ElementName, startLine, startCol, nameStart, nameStop, stop0)
    } else {
      val nsLen = nsStop - nsStart
      sink.token(Tok.ElementNs, startLine, startCol, nsStart, nsStop, nsStop)
      sink.token(Tok.NsColon, startLine, startCol + nsLen, nsStop, nsStop + 1, nsStop + 1)
      sink.token(if (isKey) Tok.ElementKey else Tok.ElementName, startLine, startCol + nsLen + 1, nameStart, nameStop, stop0)
    }

    if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()

    if (b(i) == '(') {
      val sl = line; val sc = col; val s = i
      inc(1)
      sink.token(Tok.AparLeft, sl, sc, s, i, i)
      parseAttributes()
      if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()
      if (b(i) != ')') err("attributes not closed")
      val sl2 = line; val sc2 = col; val s2 = i
      inc(1)
      sink.token(Tok.AparRight, sl2, sc2, s2, s2 + 1, i)
    }

    if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()

    if (b(i) == '=') {
      val sl = line; val sc = col; val s = i
      inc(1)
      sink.token(Tok.Equals, sl, sc, s, i, i)
      parseValue(Level.ELEMENT_VALUE)
      return
    }

    if (b(i) == '{') {
      val sl = line; val sc = col; val s = i
      inc(1)
      sink.token(Tok.BraceLeft, sl, sc, s, i, i)
      parseXmq()
      if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()
      if (b(i) != '}') err("body not closed")
      val sl2 = line; val sc2 = col; val s2 = i
      inc(1)
      sink.token(Tok.BraceRight, sl2, sc2, s2, i, i)
    }
  }

  private def parseAttributes(): Unit = {
    var done = false
    while (i < stop && !done) {
      val prev = i
      val c = b(i)
      if (isXmlWhitespace(c.toChar)) parseWhitespace()
      else if (c == ')') done = true
      else if (isAttrKeyStart(c)) parseAttribute()
      else done = true
      if (!done && i == prev) done = true // tab stalls token-whitespace; bail like EOF
    }
  }

  private def isAttrKeyStart(c: Int): Boolean =
    !(c == '\'' || c == '"' || c == '(' || c == ')' || c == '{' || c == '}' ||
      c == '/' || c == '=' || c == '&')

  private def parseAttribute(): Unit = {
    val startLine = line; val startCol = col
    val (nameStart, nameStop, nsStart, nsStop) = eatTextName()
    val stop0 = i

    if (nsStart < 0) {
      val len = nameStop - nameStart
      if (len == 5 && isWord(nameStart, "xmlns"))
        sink.token(Tok.NsDeclaration, startLine, startCol, nameStart, nameStop, nameStop)
      else
        sink.token(Tok.AttrKey, startLine, startCol, nameStart, nameStop, stop0)
    } else {
      val nsLen = nsStop - nsStart
      if (nsLen == 5 && isWord(nsStart, "xmlns")) {
        sink.token(Tok.NsDeclaration, startLine, startCol, nsStart, nsStop, nameStop)
        sink.token(Tok.NsColon, startLine, startCol + nsLen, nsStop, nsStop + 1, nsStop + 1)
        sink.token(Tok.AttrNs, startLine, startCol + nsLen + 1, nameStart, nameStop, stop0)
      } else {
        sink.token(Tok.AttrNs, startLine, startCol, nsStart, nsStop, nsStop)
        sink.token(Tok.NsColon, startLine, startCol + nsLen, nsStop, nsStop + 1, nsStop + 1)
        sink.token(Tok.AttrKey, startLine, startCol + nsLen + 1, nameStart, nameStop, stop0)
      }
    }

    if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()

    if (b(i) == '=') {
      val sl = line; val sc = col; val s = i
      inc(1)
      sink.token(Tok.Equals, sl, sc, s, i, i)
      parseValue(Level.ATTR_VALUE)
    }
  }

  private def isWord(at: Int, w: String): Boolean = {
    var k = 0
    while (k < w.length) {
      if (at + k >= stop || buf(at + k) != w.charAt(k)) return false
      k += 1
    }
    true
  }

  private def parseValue(level: Int): Unit = {
    if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()
    val c = b(i)
    if (c == '\'' || c == '"') parseQuote(level)
    else if (c == '&') parseEntity(level)
    else if (c == '(') parseCompound(level)
    else {
      val cc = b(i + 1)
      if (unsafeValueStart(c.toChar, cc.toChar)) err("value cannot start with this")
      parseTextValue(level)
    }
  }

  private def parseTextValue(level: Int): Unit = {
    val sl = line; val sc = col; val start = i
    var brk = false
    while (i < stop && !brk) {
      if (!isSafeValueByte(i)) brk = true
      else inc(1)
    }
    val tpe = if (level == Level.ATTR_VALUE) Tok.AttrValueText else Tok.ElementValueText
    sink.token(tpe, sl, sc, start, i, i)
  }

  private def isSafeValueByte(k: Int): Boolean = {
    val c = b(k)
    if (countWhitespace(buf, k, stop) > 0) return false
    !(c == '\n' || c == '\t' || c == '\r' || c == '(' || c == ')' ||
      c == '{' || c == '}' || c == '\'' || c == '"')
  }

  private def parseCompound(level: Int): Unit = {
    val sl = line; val sc = col; val s = i
    inc(1)
    sink.token(Tok.CparLeft, sl, sc, s, i, i)
    val inner = Level.enterCompound(level)
    var done = false
    while (i < stop && !done) {
      val c = b(i)
      if (isXmlWhitespace(c.toChar)) parseWhitespace()
      else if (c == ')') done = true
      else if (c == '\'' || c == '"') parseQuote(inner)
      else if (c == '&') parseEntity(inner)
      else err("compound may not contain this")
    }
    if (i < stop && isXmlWhitespace(b(i).toChar)) parseWhitespace()
    if (b(i) != ')') err("compound not closed")
    val sl2 = line; val sc2 = col; val s2 = i
    inc(1)
    sink.token(Tok.CparRight, sl2, sc2, s2, i, i)
  }
}
