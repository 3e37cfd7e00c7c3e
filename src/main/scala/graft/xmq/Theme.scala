package graft.xmq

/** Color themes + the render-tex renderer.
  *
  * Reference: /root/reference/src/main/c/parts/default_themes.c (default
  * dark/light tables, XMQ_THEME spec parsing), parts/colors.c
  * (string_to_color_def, generate_tex_color), xmq.c setup_tex_coloring
  * (definecolor/newcommand preamble, per-token theme strings) and the
  * tokenize_TYPE colorize callbacks (xmq.c:691-708, write_safe_tex).
  */
object Theme {

  /** r = -1 encodes "unset" (empty color string); tex prints it as 0,0,0. */
  final case class ColorDef(r: Int, g: Int, b: Int, bold: Boolean, underline: Boolean)
  val Unset: ColorDef = ColorDef(-1, -1, -1, bold = false, underline = false)

  // index order = color_names[] in colors.c
  val colorNames: Array[String] = Array(
    "xmqC", "xmqQ", "xmqE", "xmqNS", "xmqEN", "xmqEK", "xmqEKV", "xmqAK",
    "xmqAKV", "xmqCP", "xmqNSD", "xmqUW", "xmqXSL", "xmqFG", "xmqBG")

  private val shortIndex = Map(
    "C" -> 0, "Q" -> 1, "E" -> 2, "NS" -> 3, "EN" -> 4, "EK" -> 5,
    "EKV" -> 6, "AK" -> 7, "AKV" -> 8, "CP" -> 9, "NSD" -> 10, "UW" -> 11,
    "XSL" -> 12, "FG" -> 13, "BG" -> 14)

  private val defaultDark = Array(
    "#2aa1b3", "#26a269_B", "#c061cb", "#a9a9a9", "#ff8c00", "#88b4f7",
    "#26a269_B", "#88b4f7", "#6196ec", "#c061cb", "#2aa1b3", "#880000_U",
    "#c061cb", "", "")

  private val defaultLight = Array(
    "#2aa1b3", "#26a269_B", "#c061cb", "#696969", "#a86c00", "#0060fd",
    "#26a269_B", "#0060fd", "#12488c", "#c061cb", "#1a91a3", "#880000_U",
    "#c061cb", "", "")

  /** string_to_color_def: "#rrggbb[_B][_U]" or "" (unset). */
  def parseColor(s: String): Option[ColorDef] = {
    if (s.isEmpty) return Some(Unset)
    if (s.length < 7 || s.charAt(0) != '#') return None
    try {
      val r = Integer.parseInt(s.substring(1, 3), 16)
      val g = Integer.parseInt(s.substring(3, 5), 16)
      val b = Integer.parseInt(s.substring(5, 7), 16)
      var bold = false; var underline = false
      var i = 7
      while (i + 1 < s.length + 1 && i < s.length && s.charAt(i) == '_') {
        if (i + 1 < s.length) {
          if (s.charAt(i + 1) == 'B') bold = true
          if (s.charAt(i + 1) == 'U') underline = true
        }
        i += 2
      }
      Some(ColorDef(r, g, b, bold, underline))
    } catch { case _: NumberFormatException => None }
  }

  final class Installed(val dark: Array[ColorDef], val light: Array[ColorDef])

  /** installTheme: defaults + comma-separated override groups; each group
    * is [dark+|light+]NAME=COLOR[:NAME=COLOR...]. Unparseable groups leave
    * the defaults installed (the reference returns false but keeps going). */
  def install(spec: String): Installed = {
    val dark = defaultDark.map(c => parseColor(c).getOrElse(Unset))
    val light = defaultLight.map(c => parseColor(c).getOrElse(Unset))
    if (spec != null) spec.split(",", -1).foreach { group0 =>
      var group = group0
      var doDark = true; var doLight = true
      if (group.startsWith("dark+")) { doLight = false; group = group.substring(5) }
      else if (group.startsWith("light+")) { doDark = false; group = group.substring(6) }
      group.split(":").foreach { kv =>
        val eq = kv.indexOf('=')
        if (eq > 0 && eq <= 3) {
          for {
            idx <- shortIndex.get(kv.substring(0, eq))
            cd <- parseColor(kv.substring(eq + 1))
          } {
            if (doDark) dark(idx) = cd
            if (doLight) light(idx) = cd
          }
        }
      }
    }
    new Installed(dark, light)
  }

  /** generate_tex_color: unset prints 0,0,0. */
  private def texColor(d: ColorDef, name: String): String =
    if (d.r < 0) s"\\definecolor{$name}{RGB}{0,0,0}"
    else s"\\definecolor{$name}{RGB}{${d.r},${d.g},${d.b}}"

  /** setup_tex_coloring's style block: definecolors (always the lightbg
    * table), newcommands with bold/underline from the active mode, \xmqI. */
  def texStyle(theme: Installed, darkMode: Boolean): String = {
    val active = if (darkMode) theme.dark else theme.light
    val sb = new StringBuilder
    for (i <- colorNames.indices)
      sb.append(texColor(theme.light(i), colorNames(i))).append('\n')
    for (i <- colorNames.indices) {
      val (bPre, bPost) = if (active(i).bold) ("\\textbf{", "}") else ("", "")
      val (uPre, uPost) = if (active(i).underline) ("\\underline{", "}") else ("", "")
      sb.append(s"\\newcommand{\\${colorNames(i)}}[1]{{\\color{${colorNames(i)}}$bPre$uPre#1$bPost$uPost}}\n")
    }
    sb.append("\\newcommand{\\xmqI}[0]{{\\mbox{\\ }}}\n")
    sb.toString
  }

  /** token type → tex color command (setup_tex_coloring theme assignments);
    * null = uncolored passthrough. */
  private val tokenCommand: Map[String, String] = Map(
    Tok.CparLeft -> "xmqCP", Tok.CparRight -> "xmqCP",
    Tok.Quote -> "xmqQ", Tok.Entity -> "xmqE",
    Tok.Comment -> "xmqC", Tok.CommentContinuation -> "xmqC",
    Tok.ElementNs -> "xmqNS", Tok.ElementName -> "xmqEN",
    Tok.ElementKey -> "xmqEK",
    Tok.ElementValueText -> "xmqEKV", Tok.ElementValueQuote -> "xmqEKV",
    Tok.ElementValueCompoundQuote -> "xmqEKV",
    Tok.ElementValueEntity -> "xmqE", Tok.ElementValueCompoundEntity -> "xmqE",
    Tok.AttrNs -> "xmqNS", Tok.AttrKey -> "xmqAK",
    Tok.AttrValueText -> "xmqAKV", Tok.AttrValueQuote -> "xmqAKV",
    Tok.AttrValueCompoundQuote -> "xmqAKV",
    Tok.AttrValueEntity -> "xmqE", Tok.AttrValueCompoundEntity -> "xmqE",
    Tok.NsDeclaration -> "xmqNSD")

  /** write_safe_tex: span content — only & \ _ escape; spaces stay raw
    * inside \xmqXX{...} commands. */
  private def texEscape(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("\\&")
    case '\\' => sb.append("\\\\")
    case '_' => sb.append("\\_")
    case '\'' => sb.append("{'}") // breaks the tex '' ligature
    case '\n' => sb.append("\\linebreak\n")
    case c => sb.append(c)
  }

  /** Printer whitespace substitutions for gap text between tokens
    * (setup_tex_coloring defaults; overridable via --use-is/--use-et/
    * --use-cr/--use-nl, xmq-cli.c:952-983). */
  final case class GapStrings(is: String, nl: String,
                              et: String = "\t", cr: String = "\r")
  val texGaps: GapStrings = GapStrings("\\xmqI ", "\\linebreak\n")
  val htmlGaps: GapStrings = GapStrings(" ", "\n")

  private def gapEscaper(contentEsc: (String, StringBuilder) => Unit,
                         g: GapStrings): (String, StringBuilder) => Unit =
    (s, sb) => s.foreach {
      case ' ' => sb.append(g.is)
      case '\n' => sb.append(g.nl)
      case '\t' => sb.append(g.et)
      case '\r' => sb.append(g.cr)
      case c => contentEsc(c.toString, sb)
    }

  /** generate_html_color: custom-element CSS rule. In a full render the
    * reference has resolved FG/BG to the mode colors (000000); --onlystyle
    * skips that resolution, so its C printf formats the -1 sentinel as
    * "ffffffff" per component — reproduced byte-exactly. */
  private def htmlColor(d: ColorDef, name: String, rawSentinel: Boolean): String = {
    val rgb =
      if (d.r >= 0) f"${d.r}%02x${d.g}%02x${d.b}%02x"
      else if (rawSentinel) "ffffffffffffffffffffffff"
      else "000000"
    val bold = if (d.bold) "font-weight:600;" else ""
    val ul = if (d.underline) "text-decoration:underline;" else ""
    s"$name{color:#$rgb;$bold$ul}"
  }

  private def hex6(d: ColorDef, dflt: String): String =
    if (d.r < 0) dflt else f"${d.r}%02x${d.g}%02x${d.b}%02x"

  /** setup_html_coloring's stylesheet (dark + light pre rules + per-token
    * custom-element colors). */
  def htmlStyle(theme: Installed, rawSentinel: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append("@media screen and (orientation: portrait) { pre { font-size: 2vw; } }")
    sb.append("@media screen and (orientation: landscape) { pre { max-width: 98%; } }")
    sb.append("pre.xmq_dark {white-space:pre-wrap;word-break:break-all;border-radius:2px;background-color:#")
    sb.append(hex6(theme.dark(14), "263338"))
    sb.append(";border:solid 1px #555555;display:inline-block;padding:1em;color:#")
    sb.append(hex6(theme.dark(13), "ffffff")).append(";}\n")
    sb.append("pre.xmq_light{white-space:pre-wrap;word-break:break-all;border-radius:2px;background-color:#")
    sb.append(hex6(theme.light(14), "ffffcc"))
    sb.append(";border:solid 1px #888888;display:inline-block;padding:1em;color:#")
    sb.append(hex6(theme.dark(13), "000000")).append(";}\n")
    sb.append("body.xmq_dark {background-color:black;}\nbody.xmq_light {}\n")
    for (i <- colorNames.indices) sb.append(htmlColor(theme.dark(i), colorNames(i), rawSentinel))
    sb.append("pre.xmq_light {\n")
    for (i <- colorNames.indices) sb.append(htmlColor(theme.light(i), colorNames(i), rawSentinel))
    sb.append("pre.xmq_dark {}\n}\n")
    sb.toString
  }

  /** the render content writer escapes & < > only — double quotes print raw
    * (verified against the binary; write_safe_html's quot branch is not on
    * the quote-content path). */
  private def htmlEscape(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("&amp;")
    case '<' => sb.append("&lt;")
    case '>' => sb.append("&gt;")
    case c => sb.append(c)
  }

  /** render-html: standalone html page, tokens wrapped in custom elements
    * (<xmqEN>...</xmqEN>) styled by the theme css (setup_html_coloring). */
  def renderHtml(doc: XDoc, themeSpec: String, darkModeDefault: Boolean = true,
                 nostyle: Boolean = false, onlystyle: Boolean = false,
                 classExtra: String = null, idAttr: String = null,
                 gaps: GapStrings = htmlGaps): String = {
    val darkMode =
      if (themeSpec == null) darkModeDefault
      else if (themeSpec.endsWith("-dark")) true
      else if (themeSpec.endsWith("-light")) false
      else darkModeDefault
    val theme = install(themeSpec)
    // --onlystyle: just the stylesheet; the FG/BG mode resolution of a full
    // render has not happened, so unset colors print the raw C sentinel
    if (onlystyle) return htmlStyle(theme, rawSentinel = true)
    val body0 = colorizeTokens(doc,
      tpe => tokenCommand.get(tpe).map(cmd => (s"<$cmd>", s"</$cmd>")),
      htmlEscape, gapEscaper(htmlEscape, gaps))
    // the print's final newline stays outside <pre>
    val body =
      if (body0.endsWith(gaps.nl)) body0.dropRight(gaps.nl.length)
      else body0.stripSuffix("\n")
    val mode = if (darkMode) "xmq_dark" else "xmq_light"
    val idPart = if (idAttr != null) s"""id="$idAttr" """ else ""
    val classPart = if (classExtra != null) s" $classExtra" else ""
    val pre = s"""<pre ${idPart}class="xmq $mode$classPart">$body</pre>"""
    // --nostyle: only the pre block, no page wrapper or stylesheet
    if (nostyle) return pre + "\n"
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n")
    sb.append("<head><meta http-equiv=\"content-type\" content=\"text/html; charset=UTF-8\">")
    sb.append("<meta name=\"viewport\" content=\"width=device-width, initial-scale=1, maximum-scale=5\"><style>")
    sb.append(htmlStyle(theme, rawSentinel = true))
    sb.append("</style></head>")
    sb.append(s"""<body class="$mode">""")
    sb.append(pre)
    sb.append("</body>")
    sb.append("</html>")
    sb.append('\n')
    sb.toString
  }

  private val Reset = "[0m"

  /** generate_ansi_color, truecolor variant: ESC[0;[1;][4;]38;2;R;G;Bm. */
  private def ansiColor(d: ColorDef): String = {
    if (d.r < 0) return Reset
    val sb = new StringBuilder("[0;")
    if (d.bold) sb.append("1;")
    if (d.underline) sb.append("4;")
    sb.append("38;2;").append(d.r).append(';').append(d.g).append(';').append(d.b).append('m')
    sb.toString
  }

  /** render-terminal (truecolor): ANSI-colored xmq for a dark or light
    * terminal background (setup_terminal_coloring). */
  def renderTerminal(doc: XDoc, themeSpec: String, darkMode: Boolean = true,
                     tty: Boolean = true): String = {
    // piped (non-tty) output disables terminal coloring entirely in the
    // reference — plain xmq print, no ANSI, no reset
    if (!tty) return XmqEngine.toXmq(doc)
    val theme = install(themeSpec)
    val active = if (darkMode) theme.dark else theme.light
    val body = colorizeTokens(doc,
      tpe => tokenCommand.get(tpe) match {
        case Some(cmd) =>
          val idx = colorNames.indexOf(cmd)
          Some((ansiColor(active(idx)), ""))
        case None => Some((Reset, ""))
      },
      (s, sb) => sb.append(s))
    body + Reset + "\n"
  }

  /** tokenize --type=tex/html/terminal: colorize the RAW input token stream
    * (the reference's xmqSetupParseCallbacksColorizeTokens path — no
    * document/style wrapper, just the colored tokens). */
  /** write_safe_tex exactly: & \ _ only (the tokenize path has no ligature
    * handling — that belongs to the render quote writer). */
  private def texEscapeSafe(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("\\&")
    case '\\' => sb.append("\\\\")
    case '_' => sb.append("\\_")
    case c => sb.append(c)
  }

  /** write_safe_html exactly: & < > " (the render quote-content path skips
    * the quot branch; this path does not). */
  private def htmlEscapeSafe(s: String, sb: StringBuilder): Unit = s.foreach {
    case '&' => sb.append("&amp;")
    case '<' => sb.append("&lt;")
    case '>' => sb.append("&gt;")
    case '"' => sb.append("&quot;")
    case c => sb.append(c)
  }

  /** xterm 256-color quantization (6x6x6 cube) used by the tokenize
    * terminal path. */
  private def cube6(v: Int): Int = {
    val steps = Array(0, 95, 135, 175, 215, 255)
    var best = 0
    for (i <- steps.indices) if (math.abs(steps(i) - v) < math.abs(steps(best) - v)) best = i
    best
  }
  private def ansi256Color(d: ColorDef): String = {
    if (d.r < 0) return Reset
    val idx = 16 + 36 * cube6(d.r) + 6 * cube6(d.g) + cube6(d.b)
    val sb = new StringBuilder("[0;")
    if (d.bold) sb.append("1;")
    if (d.underline) sb.append("4;")
    sb.append("38;5;").append(idx).append('m')
    sb.toString
  }

  def colorizeRaw(bytes: Array[Byte], mode: String, themeSpec: String): String = {
    val theme = install(themeSpec)
    mode match {
      case "tex" =>
        "\\texttt{\\flushleft\\noindent " +
          colorizeBytes(bytes, tpe => tokenCommand.get(tpe).map(cmd => (s"\\$cmd{", "}")),
            texEscapeSafe) + "\n}\n"
      case "html" =>
        "<pre class=\"xmq xmq_dark\">" +
          colorizeBytes(bytes, tpe => tokenCommand.get(tpe).map(cmd => (s"<$cmd>", s"</$cmd>")),
            htmlEscapeSafe) + "</pre>"
      case "terminal" =>
        // piped tokenize colorizes with 256-color codes; every token writes
        // a PREFIX only (colored, or a bare reset for uncolored tokens) —
        // no postfix, so the stream ends un-reset after a colored token
        colorizeBytes(bytes, tpe => tokenCommand.get(tpe) match {
          case Some(cmd) => Some((ansi256Color(theme.dark(colorNames.indexOf(cmd))), ""))
          case None => Some((Reset, ""))
        }, (s, sb) => sb.append(s))
      case other => throw new IllegalArgumentException(s"unknown tokenize type $other")
    }
  }

  /** shared token-stream colorizer: print the doc as xmq, re-tokenize, wrap
    * each token with the renderer's pre/post, escape content. */
  private def colorizeTokens(doc: XDoc,
                             wrap: String => Option[(String, String)],
                             escape: (String, StringBuilder) => Unit,
                             gapEscape: (String, StringBuilder) => Unit = null): String =
    colorizeBytes(XmqEngine.toXmq(doc).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      wrap, escape, splitQuotes = true, gapEscape)

  /** `splitQuotes`: the render-* commands colorize through the PRINTER,
    * which writes quote delimiters, each content line, and continuation
    * indentation as separate token writes (xmq.c tokenize_##TYPE per write);
    * `tokenize --type=` colorizes the parser's token stream where a quote is
    * ONE callback — so renders split, raw tokenize does not. */
  private def colorizeBytes(bytes: Array[Byte],
                            wrap: String => Option[(String, String)],
                            escape: (String, StringBuilder) => Unit,
                            splitQuotes: Boolean = false,
                            gapEscape0: (String, StringBuilder) => Unit = null): String = {
    // gap text (inter-token whitespace, quote continuation indentation) may
    // escape differently from span content (tex: spaces become \xmqI only
    // in gaps — setup_tex_coloring's indentation_space/explicit_space)
    val gapEscape = if (gapEscape0 != null) gapEscape0 else escape
    val body = new StringBuilder
    var pos = 0
    val sink = new TokenSink {
      def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit = {
        if (start > pos)
          gapEscape(new String(bytes, pos, start - pos, java.nio.charset.StandardCharsets.UTF_8), body)
        val text = new String(bytes, start, stop - start, java.nio.charset.StandardCharsets.UTF_8)
        def span(s: String, pp: Option[(String, String)]): Unit = pp match {
          case Some((pre, post)) => body.append(pre); escape(s, body); body.append(post)
          case None => escape(s, body)
        }
        val pp = wrap(tpe)
        // quote delimiters are written RAW by the printer (only the content
        // goes through write_safe_html, xmq.c:892)
        def rawSpan(s: String): Unit = pp match {
          case Some((pre, post)) => body.append(pre).append(s).append(post)
          case None => body.append(s)
        }
        val isQuote = splitQuotes && tpe.endsWith("quote") && text.nonEmpty &&
          (text.charAt(0) == '\'' || text.charAt(0) == '"')
        if (splitQuotes && tpe == "whitespace") {
          // the printer writes inter-token whitespace through its
          // indentation/space settings, not the safe content writer
          gapEscape(text, body)
        } else if (splitQuotes && (tpe == "comment" || tpe == "comment_continuation") &&
            text.endsWith("\n")) {
          // the printer ends the comment span before its newline
          span(text.dropRight(1), pp); gapEscape("\n", body)
        } else if (!isQuote) span(text, pp)
        else {
          val q = text.charAt(0)
          var r = 0
          while (r < text.length && text.charAt(r) == q) r += 1
          if (r == text.length) span(text, pp) // empty quote: one content span
          else {
            val content = text.substring(r, text.length - r)
            rawSpan(text.substring(0, r))
            // continuation lines are printer-indented to the content column
            val indent = (col - 1) + r
            val lines = content.split("\n", -1)
            for (li <- lines.indices) {
              if (li > 0) {
                var k = 0
                val ln = lines(li)
                while (k < indent && k < ln.length && ln.charAt(k) == ' ') k += 1
                gapEscape("\n" + ln.substring(0, k), body)
                if (ln.length > k) span(ln.substring(k), pp)
              } else if (lines(li).nonEmpty) span(lines(li), pp)
            }
            rawSpan(text.substring(text.length - r))
          }
        }
        pos = stop
      }
    }
    new XmqTokenizer(bytes, sink).tokenize()
    if (pos < bytes.length)
      gapEscape(new String(bytes, pos, bytes.length - pos, java.nio.charset.StandardCharsets.UTF_8), body)
    body.toString
  }

  /** render-tex: full LaTeX document with the colorized xmq of `doc`.
    * The body re-tokenizes the engine's own byte-exact xmq print and wraps
    * each token in its theme command — the same token/color pairing the
    * reference printer injects. */
  def renderTex(doc: XDoc, themeSpec: String, gaps: GapStrings = texGaps): String = {
    // render_to==TEX forces dark_mode=false when no spec names a mode (xmq.c:186)
    val darkMode = themeSpec != null && themeSpec.endsWith("-dark")
    val theme = install(themeSpec)
    val body0 = colorizeTokens(doc,
      {
        // structural braces print as \{ \} (theme pre-string), with the
        // brace char itself outside any color command
        case "brace_left" | "brace_right" => Some(("\\", ""))
        case tpe => tokenCommand.get(tpe).map(cmd => (s"\\$cmd{", "}"))
      },
      texEscape, gapEscaper(texEscape, gaps))
    // the final newline of the print is a plain newline, not a \linebreak
    val body =
      if (body0.endsWith(gaps.nl)) body0.dropRight(gaps.nl.length)
      else body0.stripSuffix("\n")
    val sb = new StringBuilder
    sb.append("\\documentclass[10pt,a4paper]{article}\n\\usepackage{color}\n\\usepackage{bold-extra}\n")
    sb.append(texStyle(theme, darkMode))
    sb.append("\n\\begin{document}\n")
    sb.append("\\texttt{\\flushleft\\noindent ")
    sb.append(body)
    sb.append("\n}\n")
    sb.append("\n\\end{document}\n")
    sb.append('\n')
    sb.toString
  }
}
