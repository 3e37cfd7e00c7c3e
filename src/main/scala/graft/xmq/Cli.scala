package graft.xmq

import java.nio.charset.StandardCharsets

/** Replicates the reference CLI command pipeline over one document
  * (xmq-cli.c perform_command chain): load flags + chained commands.
  * Used by the fixture harness and by the Spark pipeline expression.
  */
object Cli {

  final case class Result(output: String, ok: Boolean, error: String = null)

  /** args: e.g. "--trim=none --html", cmds: e.g. "to-xmq --compact".
    * `base` anchors file paths used by transform/validate and relative
    * document() hrefs inside stylesheets (reference: process cwd);
    * `env` carries XMQ_THEME etc. without touching process state. */
  def run(input: Array[Byte], args: String, cmds: String, base: String = ".",
          env: Map[String, String] = Map.empty): Result = {
    var forced: Xmq.ContentType = null
    var trim = "default"
    var nomerge = false
    var root: String = null
    var lines = false
    var ixmlGrammar: String = null
    var ixmlAllParses = false
    var ixmlTryToRecover = false
    var ixmlFailSilent = false
    var clinesInput = false
    var meta: String = null // --version/--help/--license intercept

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
      case "--ixml-all-parses" => ixmlAllParses = true
      case "--ixml-try-to-recover" => ixmlTryToRecover = true
      case "--ixml-fail-silent" => ixmlFailSilent = true
      // --clines input parsing errors out in the reference (rc=1, no output)
      case "--clines" => clinesInput = true
      case "--version" => meta = "xmq: 4.2.0-modified\n"
      case "--license" => meta = License.text
      case "--help" => meta = "Usage: xmq [options] <file> ( <command> [options] )*\n"
      // accepted no-ops: diagnostics to stderr in the reference; network and
      // engine selection are out of scope (zero-egress sandbox); the
      // reference itself never reads build_xml_of_ixml (xmq-cli.c:178)
      case "--debug" | "--verbose" | "--trace" | "--silent" | "--log-xmq"
         | "--xml-of-ixml" | "--force-download" =>
      case a if a.startsWith("--debug=") || a.startsWith("--verbose=") ||
                a.startsWith("--trace=") =>
      case a if a.startsWith("--ixml-engine=") =>
        throw new UnsupportedOperationException("external ixml engines out of scope")
      case a if a.startsWith("--ixml=") =>
        // xmq --ixml=grammar.ixml: the input is parsed with the iXML grammar
        // instead of format detection (xmq-cli.c:2296, ixml:name resolves
        // from the library dir relative to base)
        val spec = a.substring(7)
        val p0 =
          if (spec.startsWith("ixml:")) "library/" + spec.substring(5) + ".ixml"
          else spec
        ixmlGrammar = new String(java.nio.file.Files.readAllBytes(resolve(base, p0)),
          StandardCharsets.UTF_8)
      case _ => // unsupported load flag: ignore
    }
    val flags = XmqEngine.ParseFlags(forced, trim, nomerge, root)
    if (meta != null) return Result(meta, ok = true)
    // the reference's clines input parser is wired but its command pipeline
    // rejects the resulting doc (rc=1, no output) — reproduced as a failure
    if (clinesInput) return Result(null, ok = false, error = "clines input rejected")

    try {
      if (lines) {
        // --lines: each input line is an independent document (xmq-cli.c:2267-2291)
        val text = new String(Xmq.stripBom(input), StandardCharsets.UTF_8)
        val ls = text.split("\n", -1).toSeq
        val effective = if (ls.nonEmpty && ls.last.isEmpty) ls.dropRight(1) else ls
        val outs = effective.map { line =>
          runOne(line.getBytes(StandardCharsets.UTF_8), flags, cmds, base, env)
        }
        Result(outs.mkString(""), ok = true)
      } else if (ixmlGrammar != null) {
        val text = new String(Xmq.stripBom(input), StandardCharsets.UTF_8)
        val doc =
          if (ixmlTryToRecover)
            graft.xmq.ixml.Ixml.parseRecoverToDoc(ixmlGrammar, text, ixmlAllParses).doc
          else if (ixmlAllParses) graft.xmq.ixml.Ixml.parseAllToDoc(ixmlGrammar, text)
          else graft.xmq.ixml.Ixml.parseToDoc(ixmlGrammar, text)
        // --ixml-fail-silent: XMQ_FLAG_IXML_FAIL_SILENT clears the document
        // on parse failure and prints nothing (xmq.c:5128-5137), exit 0
        val failed = doc.root != null && doc.root.name == "ixml" &&
          doc.root.attrs.exists(a => a.key == "state" && a.stringValue == "failed")
        if (ixmlFailSilent && failed) Result("", ok = true)
        else Result(runDoc(doc, input, flags, cmds, base, env), ok = true)
      } else {
        Result(runOne(input, flags, cmds, base, env), ok = true)
      }
    } catch {
      case e: UnsupportedOperationException => throw e
      case e: Exception => Result(null, ok = false, error = e.toString)
    }
  }

  /** split command string honoring single-quoted segments (for --shell='...')
    * and keeping xpath predicate brackets together (an xpath like
    * `//a[@x="1" and @y]` is ONE argv element when the real CLI is driven
    * from a shell). */
  private[xmq] def splitArgs(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') inQuote = !inQuote
      else if (!inQuote && c == '[') { depth += 1; cur.append(c) }
      else if (!inQuote && c == ']') { depth = math.max(0, depth - 1); cur.append(c) }
      else if (!inQuote && depth == 0 && (c == ' ' || c == '\t' || c == '\n')) {
        if (cur.nonEmpty) { out += cur.toString; cur.clear() }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toList
  }

  private def runOne(input: Array[Byte], flags: XmqEngine.ParseFlags, cmds: String, base: String,
                     env: Map[String, String]): String =
    runDoc(XmqEngine.parse(input, flags), input, flags, cmds, base, env)

  /** the command pipeline over an already-built document (normal parse or
    * --ixml grammar parse). */
  private def runDoc(doc0: XDoc, input: Array[Byte], flags: XmqEngine.ParseFlags,
                     cmds: String, base: String, env: Map[String, String]): String = {
    var doc = doc0
    var output: String = null
    val toks = {
      val t = splitArgs(cmds)
      if (t.isEmpty) List("to-xmq") else t
    }

    def xmqOpts(opts: List[String], htmq: Boolean): XmqSettings =
      XmqSettings(
        compact = opts.contains("--compact"),
        addIndent = opts.collectFirst {
          case o if o.startsWith("--indent=") => o.substring(9).toInt
        }.getOrElse(4),
        preferDoubleQuotes = opts.contains("--prefer-double-quotes"),
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
        val (opts, more) = rest.span(_.startsWith("--"))
        output = XmlPrinter.printXml(doc, withDecl = !opts.contains("--omit-decl"))
        exec(more)
      case "to-html" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        output = XmqEngine.toHtml(doc); exec(more)
      case "to-json" :: rest =>
        val (_, more) = rest.span(_.startsWith("--"))
        // warnings go to stderr (unbuffered) → they precede the json
        val (json, warns) = JsonPrinter.printCollect(doc)
        output = warns.map(_ + "\n").mkString + json
        exec(more)
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
        val themeSpec = opts.find(_.startsWith("--theme="))
          .map(_.substring(8)).orElse(env.get("XMQ_THEME")).orNull
        if (opts.contains("--type=debugtokens")) output = Xmq.debugTokens(input)
        else if (opts.contains("--type=debugcontent")) output = Xmq.debugContent(input)
        else opts.find(_.startsWith("--type=")).map(_.substring(7)).foreach {
          case t @ ("tex" | "html" | "terminal") =>
            output = Theme.colorizeRaw(input, t, themeSpec)
          case _ =>
        }
        exec(more)
      case "replace" :: spec :: rest =>
        // replace <xpath>=<value>: set content of first match (xmq-cli.c:3095)
        val eq = spec.indexOf('=')
        if (eq > 0) {
          val (path, value) = (spec.substring(0, eq), spec.substring(eq + 1))
          XPath.matches(doc, path).headOption.foreach {
            case XPath.ElemHit(e) =>
              e.children.clear()
              e.appendChild(new XText(value))
            case XPath.AttrHit(_, a) =>
              a.values = scala.collection.mutable.ArrayBuffer(new XText(value))
            case XPath.TextHit(t) => t.content = value
          }
        }
        exec(rest)
      case "replace-entity" :: name :: value :: rest if !value.startsWith("--") =>
        replaceEntities(doc, name, value); exec(rest)
      case "delete-entity" :: name :: rest =>
        deleteEntities(doc, name); exec(rest)
      case "add" :: snippet :: rest =>
        // parse snippet as xmq, append its roots as doc siblings (xmq-cli.c:2772)
        val frag = XmqBuilder.parse(snippet.getBytes(StandardCharsets.UTF_8))
        frag.children.foreach(doc.appendChild)
        exec(rest)
      case "add-root" :: name :: rest =>
        val root = new XElem(name)
        doc.children.foreach(root.appendChild)
        val nd = new XDoc
        nd.appendChild(root)
        doc = nd
        exec(rest)
      case "statistics" :: rest =>
        doc = Statistics.compute(doc, input.length)
        exec(rest)
      case "substitute-char-entities" :: rest =>
        substituteEntities(doc, null, charOnly = true); exec(rest)
      case "substitute-entity" :: name :: rest =>
        substituteEntities(doc, name, charOnly = false); exec(rest)
      case "for-each" :: path :: rest =>
        val (opts, more) = rest.span(_.startsWith("--"))
        val shellCmd = opts.find(_.startsWith("--shell=")).map(_.substring(8))
        shellCmd.foreach { cmdline => output = forEachShell(doc, path, cmdline) }
        exec(more)
      case "transform" :: rest =>
        // transform [--stringparam=k=v ...] <stylesheet> (xmq-cli.c:2489 cmd_transform)
        val (opts, more) = rest.span(_.startsWith("--"))
        // --stringparam=k=v passes a string; --param=k=v passes a raw XPath
        // expression (xmq-cli.c:1142-1181 quotes only the stringparam form).
        // JAXP setParameter takes objects, so quoted expressions unwrap to
        // strings and bare numbers become Doubles; node-set expressions are
        // out of scope (documented).
        val params: Map[String, Any] = opts.collect {
          case o if o.startsWith("--stringparam=") || o.startsWith("--param=") =>
            val raw = o.startsWith("--param=")
            val kv = o.substring(o.indexOf('=') + 1)
            val i = kv.indexOf('=')
            if (i <= 0) None
            else {
              val v0 = kv.substring(i + 1)
              val v: Any =
                if (!raw) v0
                else if (v0.length >= 2 &&
                  ((v0.head == '\'' && v0.last == '\'') ||
                   (v0.head == '"' && v0.last == '"'))) v0.substring(1, v0.length - 1)
                else v0.toDoubleOption.map(d => d: java.lang.Double).getOrElse(v0)
              Some(kv.substring(0, i) -> v)
            }
        }.flatten.toMap
        more match {
          case path :: rest2 =>
            val bytes = java.nio.file.Files.readAllBytes(resolve(base, path))
            doc =
              try Xslt.transform(doc, bytes, params, base)
              catch { case _: Xslt.XsltError => new XDoc } // libxslt: empty output
            exec(rest2)
          case Nil => throw new IllegalArgumentException("transform needs a stylesheet")
        }
      case "validate" :: rest =>
        // validate [--silent] <xsd> (xmq-cli.c:2589 cmd_validate); the first
        // validation error prints the abortValidating banner + message and
        // stops the pipeline (the reference exit(1)s).
        val (opts, more) = rest.span(_.startsWith("--"))
        val silent = opts.contains("--silent")
        more match {
          case path :: rest2 =>
            val bytes = java.nio.file.Files.readAllBytes(resolve(base, path))
            Xsd.validate(doc, bytes) match {
              case None => exec(rest2)
              case Some(msg) =>
                output = if (silent) "" else s"xmq: Document cannot be validated against $path\n$msg\n\n"
            }
          case Nil => throw new IllegalArgumentException("validate needs an xsd")
        }
      case ("render-tex" | "render-html" | "render-terminal") :: rest =>
        // render-* [--theme=...]: theme spec from flag, else XMQ_THEME env
        // (xmq-cli.c:1661); tex defaults to light mode (xmq.c:186), the
        // terminal to a dark background
        val cmd = ts.head
        val (opts, more) = rest.span(_.startsWith("--"))
        val spec = opts.find(_.startsWith("--theme="))
          .map(_.substring(8)).orElse(env.get("XMQ_THEME")).orNull
        // --bg=dark|light|mono overrides the mode (mono renders light
        // markup too — verified against the binary)
        val bg = opts.find(_.startsWith("--bg=")).map(_.substring(5))
        // --use-is/--use-et/--use-cr/--use-nl override the printer's
        // whitespace substitution strings (xmq-cli.c:952-983); --use-es is
        // accepted but has no observable effect on these paths (verified)
        def useOpt(name: String, dflt: String): String =
          opts.find(_.startsWith(s"--use-$name=")).map(_.substring(9)).getOrElse(dflt)
        def gapsOf(d: Theme.GapStrings) = Theme.GapStrings(
          useOpt("is", d.is), useOpt("nl", d.nl), useOpt("et", d.et), useOpt("cr", d.cr))
        output = cmd match {
          case "render-html" => Theme.renderHtml(doc, spec,
            darkModeDefault = bg match {
              case Some("light") | Some("mono") => false
              case Some("dark") => true
              case _ => true
            },
            nostyle = opts.contains("--nostyle"),
            onlystyle = opts.contains("--onlystyle"),
            classExtra = opts.find(_.startsWith("--class="))
              .map(_.substring(8)).orNull,
            idAttr = opts.find(_.startsWith("--id=")).map(_.substring(5)).orNull,
            gaps = gapsOf(Theme.htmlGaps))
          case "render-terminal" => Theme.renderTerminal(doc, spec, tty = false)
          case _ => Theme.renderTex(doc, spec, gapsOf(Theme.texGaps))
        }
        exec(more)
      case "print" :: rest => exec(rest) // output already buffered
      case "no-output" :: rest => output = ""; exec(rest)
      case other :: _ => throw new UnsupportedOperationException(s"cmd $other")
    }
    exec(toks)
    if (output == null) output = XmqEngine.toXmq(doc)
    output
  }

  /** delete entity-ref nodes by name everywhere (xmq-cli.c delete_entities). */
  private def deleteEntities(doc: XDoc, name: String): Unit = {
    def clean(list: scala.collection.mutable.ArrayBuffer[XNode]): Unit = {
      var i = 0
      while (i < list.length) {
        list(i) match {
          case r: XEntityRef if r.name == name => list.remove(i); i -= 1
          case e: XElem => clean(e.children)
          case _ =>
        }
        i += 1
      }
    }
    clean(doc.children)
  }

  /** replace entity refs with text, merging adjacent text (xmq-cli.c:3138). */
  private def replaceEntities(doc: XDoc, name: String, value: String): Unit = {
    def repl(list: scala.collection.mutable.ArrayBuffer[XNode]): Unit = {
      var i = 0
      while (i < list.length) {
        list(i) match {
          case r: XEntityRef if r.name == name =>
            val prev = if (i > 0) list(i - 1) else null
            val next = if (i + 1 < list.length) list(i + 1) else null
            (prev, next) match {
              case (p: XText, n: XText) =>
                p.content += value + n.content; list.remove(i, 2); i -= 2
              case (p: XText, _) => p.content += value; list.remove(i); i -= 1
              case (_, n: XText) => n.content = value + n.content; list.remove(i); i -= 1
              case _ => list(i) = new XText(value)
            }
          case e: XElem =>
            repl(e.children)
            e.attrs.foreach { a =>
              if (a.values != null) repl(a.values)
            }
          case _ =>
        }
        i += 1
      }
    }
    repl(doc.children)
  }

  /** decode entity refs into text (xmq-cli.c:3247-3316). */
  private def substituteEntities(doc: XDoc, name: String, charOnly: Boolean): Unit = {
    def subst(list: scala.collection.mutable.ArrayBuffer[XNode]): Unit = {
      var i = 0
      while (i < list.length) {
        list(i) match {
          case r: XEntityRef if (charOnly && r.name.startsWith("#")) ||
                                (!charOnly && r.name == name) =>
            val cp = TextUtil.decodeEntityRef(r.name)
            if (cp > 0) {
              val txt = new String(Character.toChars(cp))
              // merge with neighbors like xmlTextMerge
              val prev = if (i > 0) list(i - 1) else null
              val next = if (i + 1 < list.length) list(i + 1) else null
              (prev, next) match {
                case (p: XText, n: XText) =>
                  p.content += txt + n.content; list.remove(i, 2); i -= 2
                case (p: XText, _) => p.content += txt; list.remove(i); i -= 1
                case (_, n: XText) => n.content = txt + n.content; list.remove(i); i -= 1
                case _ => list(i) = new XText(txt)
              }
            }
          case e: XElem => subst(e.children)
          case _ =>
        }
        i += 1
      }
    }
    subst(doc.children)
  }

  /** for-each <xpath> --shell='cmd': run shell per match. Like the reference
    * (xmq-cli.c:3925 invoke_shell + make_shell_safe_name), the `${name}`
    * references STAY in the command string (with unsafe characters of the
    * name rewritten to '_') and the node values are passed as environment
    * variables, so /bin/sh performs the expansion itself — document content
    * is never textually spliced into the command (no command injection). */
  private def forEachShell(doc: XDoc, path: String, cmdline: String): String = {
    val sb = new StringBuilder
    val re = """\$\{([^}]*)\}""".r
    def shellSafe(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'
    XPath.matches(doc, path).foreach {
      case XPath.ElemHit(e) =>
        val env = scala.collection.mutable.LinkedHashMap.empty[String, String]
        val cmd = re.replaceAllIn(cmdline, m => {
          val key = m.group(1)
          val v =
            if (key == ".") collectText(e)
            else if (key == "..") e.name
            else e.children.collectFirst {
              case c: XElem if c.name == key => collectText(c)
            }.getOrElse("")
          val safe = key.map(c => if (shellSafe(c)) c else '_')
          if (safe.nonEmpty) env(safe) = v
          java.util.regex.Matcher.quoteReplacement(
            if (safe.isEmpty) "" else "$" + "{" + safe + "}")
        })
        val pb = new ProcessBuilder("/bin/sh", "-c", cmd)
        env.foreach { case (k, v) => pb.environment().put(k, v) }
        pb.redirectErrorStream(true)
        val proc = pb.start()
        val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
        proc.waitFor()
        sb.append(out)
      case _ =>
    }
    sb.toString
  }

  private def collectText(e: XElem): String = {
    val sb = new StringBuilder
    def walk(n: XNode): Unit = n match {
      case t: XText => sb.append(t.content)
      case el: XElem => el.children.foreach(walk)
      case _ =>
    }
    e.children.foreach(walk)
    sb.toString
  }

  private def resolve(base: String, path: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(path)
    if (p.isAbsolute) p else java.nio.file.Paths.get(base).resolve(path)
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
