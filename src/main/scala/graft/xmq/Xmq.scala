package graft.xmq

import java.nio.charset.StandardCharsets

/** Content type detection + top-level parse/print facade. */
object Xmq {

  sealed trait ContentType
  case object XMQ extends ContentType
  case object XML extends ContentType
  case object HTML extends ContentType
  case object JSON extends ContentType
  case object TEXT extends ContentType

  /** xmqDetectContentType (/root/reference/src/main/c/xmq.c:1127-1233). */
  def detect(content: String): ContentType = {
    var i = 0
    val stop = content.length
    while (i < stop) {
      var c = content.charAt(i)
      if (!TextUtil.isXmlWhitespace(c)) {
        if (c == '<') {
          if (i + 4 < stop && content.startsWith("<?xml", i)) return XML
          if (i + 3 < stop && content.startsWith("<!--", i)) {
            // skip comment
            var j = i
            while (j + 2 < stop && !(content.charAt(j) == '-' && content.charAt(j + 1) == '-' && content.charAt(j + 2) == '>')) j += 1
            j += 3
            if (j >= stop) return XML
            i = j
            c = content.charAt(i)
            if (c != '<') return XML // mirrors falling through with a non-< char
          }
          if (findWordIgnoreCase(content, i + 1, "html")) return HTML
          val afterDoctype = matchWordIgnoreCase(content, i, "<!doctype")
          if (afterDoctype > 0 && findWordIgnoreCase(content, afterDoctype + 1, "html")) return HTML
          return XML
        }
        if (c == '{' || c == '"' || c == '[' || (c >= '0' && c <= '9')) return JSON
        var l = 0
        if (c == 't' || c == 'n') l = 4
        else if (c == 'f') l = 5
        if (l != 0 && i + l - 1 < stop) {
          if (i + l == stop || (content.charAt(i + l) == '\n' && i + l + 1 == stop)) {
            val w = content.substring(i, i + l)
            if (w == "true" || w == "false" || w == "null") return JSON
          }
        }
        return XMQ
      }
      i += 1
    }
    XMQ
  }

  private def findWordIgnoreCase(s: String, from: Int, word: String): Boolean =
    matchWordIgnoreCase(s, from, word) > 0

  /** returns index after word if it matches (after leading ws), else -1. */
  private def matchWordIgnoreCase(s: String, from: Int, word: String): Int = {
    var i = from
    while (i < s.length && TextUtil.isXmlWhitespace(s.charAt(i))) i += 1
    if (i + word.length > s.length) return -1
    if (!s.regionMatches(true, i, word, 0, word.length)) return -1
    val next = i + word.length
    if (next >= s.length) return next
    val c = s.charAt(next)
    if (TextUtil.isXmlWhitespace(c) || c == 0 || !Character.isLetterOrDigit(c)) next else -1
  }

  def stripBom(b: Array[Byte]): Array[Byte] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb && (b(2) & 0xff) == 0xbf)
      java.util.Arrays.copyOfRange(b, 3, b.length)
    else b

  /** debugtokens output (CLI `tokenize --type=debugtokens`). */
  def debugTokens(content: Array[Byte]): String = {
    val sb = new StringBuilder
    val sink = new TokenSink {
      def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit = {
        val text = new String(content, start, stop - start, StandardCharsets.UTF_8)
        sb.append('[').append(tpe).append(" \"").append(TextUtil.quoteAsC(text))
          .append("\" ").append(line).append(':').append(col).append(']')
      }
    }
    new XmqTokenizer(content, sink).tokenize()
    sb.append('\n')
    sb.toString
  }

  /** debugcontent output (CLI `tokenize --type=debugcontent`). */
  def debugContent(content: Array[Byte]): String = {
    val sb = new StringBuilder
    val sink = new TokenSink {
      def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit = {
        val text = new String(content, start, stop - start, StandardCharsets.UTF_8)
        tpe match {
          case Tok.ElementValueText | Tok.AttrValueText =>
            sb.append("{value \"").append(TextUtil.quoteAsC(text)).append("\"}")
          case Tok.Quote | Tok.ElementValueQuote | Tok.ElementValueCompoundQuote |
               Tok.AttrValueQuote | Tok.AttrValueCompoundQuote =>
            val trimmed = Trim.unQuote(text, removeQs = true, isXmq = true)
            sb.append("{quote \"").append(TextUtil.quoteAsC(trimmed)).append("\"}")
          case Tok.Comment =>
            val trimmed = Trim.unComment(text)
            sb.append("{comment \"").append(TextUtil.quoteAsC(trimmed)).append("\"}")
          case Tok.CommentContinuation =>
            var n = 0
            var k = text.length - 1
            while (k > 0 && text.charAt(k) == '/') { n += 1; k -= 1 }
            val trimmed = Trim.unComment("/" * n + text)
            sb.append("{comment_continuation \"").append(TextUtil.quoteAsC(trimmed)).append("\"}")
          case _ =>
        }
      }
    }
    new XmqTokenizer(content, sink).tokenize()
    sb.append('\n')
    sb.toString
  }

  def parseXmq(content: Array[Byte], implicitRoot: String = null): XDoc =
    XmqBuilder.parse(stripBom(content), implicitRoot)

  def printXmq(doc: XDoc, compact: Boolean = false): String = XmqPrinter.print(doc, compact)
}
