package graft.xmq

import java.nio.charset.StandardCharsets

/** Replicates the reference CLI command pipeline over one document
  * (xmq-cli.c perform_command chain): load flags + chained commands.
  * Used by the fixture harness and by the Spark pipeline expression.
  */
object Cli {

  final case class Result(output: String, ok: Boolean, error: String = null)

  /** args: e.g. "--trim=none --html", cmds: e.g. "to-xmq --compact" */
  def run(input: Array[Byte], args: String, cmds: String): Result = {
    var forced: Xmq.ContentType = null
    var trim = "default"
    var nomerge = false
    var root: String = null
    var lines = false

    args.trim.split("\\s+").filter(_.nonEmpty).foreach {
      case "--html" | "--htmq" => forced = Xmq.HTML
      case "--xml" => forced = Xmq.XML
      case "--json" => forced = Xmq.JSON
      case "--xmq" => forced = Xmq.XMQ
      case "--text" => forced = Xmq.TEXT
      case "--nomerge" | "--no-merge" => nomerge = true
      case "--lines" => lines = true
      case a if a.startsWith("--trim=") => trim = a.substring(7)
      case a if a.startsWith("--root=") => root = a.substring(7)
      case _ => // unsupported load flag: ignore
    }
    val flags = XmqEngine.ParseFlags(forced, trim, nomerge, root)

    try {
      if (lines) {
        // --lines: each input line is an independent document (xmq-cli.c:2267-2291)
        val text = new String(Xmq.stripBom(input), StandardCharsets.UTF_8)
        val ls = text.split("\n", -1).toSeq
        val effective = if (ls.nonEmpty && ls.last.isEmpty) ls.dropRight(1) else ls
        val outs = effective.map { line =>
          runOne(line.getBytes(StandardCharsets.UTF_8), flags, cmds)
        }
        Result(outs.mkString(""), ok = true)
      } else {
        Result(runOne(input, flags, cmds), ok = true)
      }
    } catch {
      case e: UnsupportedOperationException => throw e
      case e: Exception => Result(null, ok = false, error = e.toString)
    }
  }

  private def runOne(input: Array[Byte], flags: XmqEngine.ParseFlags, cmds: String): String = {
    var doc = XmqEngine.parse(input, flags)
    var output: String = null
    val toks = {
      val t = cmds.trim.split("\\s+").filter(_.nonEmpty).toList
      if (t.isEmpty) List("to-xmq") else t
    }

    def xmqOpts(opts: List[String], htmq: Boolean): XmqSettings =
      XmqSettings(
        compact = opts.contains("--compact"),
        escapeTabs = opts.contains("--escape-tabs"),
        escapeNon7bit = opts.contains("--escape-non-7bit"),
        escapeNewlinesFlag = opts.contains("--escape-newlines"),
        htmq = htmq)

    def exec(ts: List[String]): Unit = ts match {
      case Nil =>
      case ("to-xmq" | "to-htmq") :: rest =>
        val htmq = ts.head == "to-htmq"
        val (opts, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toXmq(doc, xmqOpts(opts, htmq))
        exec(more)
      case "to-xml" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toXml(doc); exec(more)
      case "to-html" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toHtml(doc); exec(more)
      case "to-json" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toJson(doc); exec(more)
      case "to-text" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toText(doc); exec(more)
      case "to-clines" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toClines(doc); exec(more)
      case "delete" :: path :: rest => doc = XPath.delete(doc, path); exec(rest)
      case "select" :: path :: rest => doc = XPath.select(doc, path); exec(rest)
      case "quote-c" :: rest =>
        val (opts, more) = rest.span(_.startsWith("--"))
        var q = "\"" + TextUtil.quoteAsC(XmqEngine.toText(doc)) + "\""
        if (opts.contains("--add-nl")) q += "\n"
        val nd = new XDoc
        nd.appendChild(new XText(q))
        doc = nd
        exec(more)
      case "unquote-c" :: rest =>
        val raw = XmqEngine.toText(doc)
        val t = raw.dropWhile(TextUtil.isXmlWhitespace)
        val un =
          if (!t.startsWith("\"")) "[Not a valid C escaped string]"
          else {
            val inner = t.substring(1)
            val endIdx = findCloseQuote(inner)
            if (endIdx < 0) "[Not a valid C escaped string]"
            else TextUtil.unquoteAsC(inner.substring(0, endIdx))
          }
        val nd = new XDoc
        nd.appendChild(new XText(un))
        doc = nd
        exec(rest)
      case "tokenize" :: rest =>
        val (opts, more) = rest.span(_.startsWith("--"))
        if (opts.contains("--type=debugtokens")) output = Xmq.debugTokens(input)
        else if (opts.contains("--type=debugcontent")) output = Xmq.debugContent(input)
        exec(more)
      case "print" :: rest => exec(rest) // output already buffered
      case "no-output" :: rest => output = ""; exec(rest)
      case other :: _ => throw new UnsupportedOperationException(s"cmd $other")
    }
    exec(toks)
    if (output == null) output = XmqEngine.toXmq(doc)
    output
  }

  /** index of the unescaped closing double quote, or -1. */
  private def findCloseQuote(s: String): Int = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i
      else i += 1
    }
    -1
  }
}
