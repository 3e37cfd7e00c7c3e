package graft.xmq

import scala.collection.mutable

/** Canonicalizes DOCTYPE content the way libxml2's xmlNodeDump would
  * reconstruct it: {{{name PUBLIC "p" "s" [\n<decl>\n<decl>\n]}}}.
  * Used by both the xmq builder (!DOCTYPE = value) and the XML reader. */
object DoctypeUtil {

  final case class AttDef(elem: String, attr: String, tpe: String, mode: String, dflt: String)
  final case class Dtd(name: String, canonical: String, entities: Map[String, String],
                       attDefs: Seq[AttDef] = Seq.empty)

  def normalize(raw0: String): Dtd = {
    val raw = raw0.trim
    var i = 0
    val n = raw.length
    def skipWs(): Unit = { while (i < n && TextUtil.isXmlWhitespace(raw.charAt(i))) i += 1 }

    // name
    val nameStart = i
    while (i < n && !TextUtil.isXmlWhitespace(raw.charAt(i)) && raw.charAt(i) != '[') i += 1
    val name = raw.substring(nameStart, i)
    skipWs()

    // external id
    val ext = new StringBuilder
    if (raw.startsWith("PUBLIC", i) || raw.startsWith("SYSTEM", i)) {
      val kind = raw.substring(i, i + 6)
      i += 6
      skipWs()
      def quoted(): String = {
        if (i < n && (raw.charAt(i) == '"' || raw.charAt(i) == '\'')) {
          val q = raw.charAt(i)
          val s0 = i + 1
          i += 1
          while (i < n && raw.charAt(i) != q) i += 1
          val v = raw.substring(s0, i)
          if (i < n) i += 1
          v
        } else ""
      }
      if (kind == "PUBLIC") {
        val p = quoted(); skipWs(); val s = quoted()
        ext.append(" PUBLIC \"").append(p).append("\" \"").append(s).append("\"")
      } else {
        val s = quoted()
        ext.append(" SYSTEM \"").append(s).append("\"")
      }
      skipWs()
    }

    // internal subset
    val decls = mutable.ArrayBuffer.empty[String]
    val entities = mutable.HashMap.empty[String, String]
    val attDefs = mutable.ArrayBuffer.empty[AttDef]
    if (i < n && raw.charAt(i) == '[') {
      i += 1
      while (i < n && raw.charAt(i) != ']') {
        if (raw.charAt(i) == '<') {
          val declStart = i
          // scan to matching '>' respecting quotes
          var q: Char = 0
          var done = false
          while (i < n && !done) {
            val c = raw.charAt(i)
            if (q != 0) { if (c == q) q = 0 }
            else if (c == '"' || c == '\'') q = c
            else if (c == '>') done = true
            i += 1
          }
          decls ++= normalizeDecl(raw.substring(declStart, i), entities, attDefs)
        } else i += 1
      }
    }

    val canonical = new StringBuilder(name)
    canonical.append(ext)
    if (decls.nonEmpty) {
      canonical.append(" [\n")
      decls.foreach(d => canonical.append(d).append('\n'))
      canonical.append(']')
    }
    Dtd(name, canonical.toString, entities.toMap, attDefs.toSeq)
  }

  private val EntityRe = """(?s)<!ENTITY\s+(\S+)\s+(["'])(.*?)\2\s*>""".r

  private def normalizeDecl(decl: String, entities: mutable.HashMap[String, String],
                            attDefs: mutable.ArrayBuffer[AttDef]): Seq[String] =
    decl match {
      case EntityRe(name, _, value) =>
        entities(name) = resolveCharRefs(value)
        Seq(s"""<!ENTITY $name "$value">""")
      case d if d.startsWith("<!ATTLIST") =>
        // libxml2 splits a multi-attribute ATTLIST into one decl per attribute
        // and re-quotes defaults with double quotes.
        val body = d.stripPrefix("<!ATTLIST").stripSuffix(">").trim
        val toks = tokenizeAttlist(body)
        if (toks.isEmpty) Seq(d)
        else {
          val elem = toks.head
          val out = mutable.ArrayBuffer.empty[String]
          var k = 1
          while (k + 1 < toks.length) {
            val attr = toks(k); val tpe = toks(k + 1)
            k += 2
            var mode: String = null
            var dflt: String = null
            if (k < toks.length && toks(k).startsWith("#")) { mode = toks(k); k += 1 }
            if (mode != "#REQUIRED" && mode != "#IMPLIED" &&
                k < toks.length && toks(k).startsWith("\u0000")) {
              dflt = toks(k).substring(1); k += 1
            }
            attDefs += AttDef(elem, attr, tpe, mode, dflt)
            val sb = new StringBuilder("<!ATTLIST ")
            sb.append(elem).append(' ').append(attr).append(' ').append(tpe)
            if (mode != null) sb.append(' ').append(mode)
            if (dflt != null) sb.append(" \"").append(dflt).append('"')
            sb.append('>')
            out += sb.toString
          }
          out.toSeq
        }
      case _ => Seq(decl)
    }

  /** tokenize ATTLIST body; quoted strings become "\u0000"+content tokens. */
  private def tokenizeAttlist(body: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = body.length
    while (i < n) {
      val c = body.charAt(i)
      if (TextUtil.isXmlWhitespace(c)) i += 1
      else if (c == '"' || c == '\'') {
        val q = c; val s0 = i + 1
        i += 1
        while (i < n && body.charAt(i) != q) i += 1
        out += "\u0000" + body.substring(s0, i)
        if (i < n) i += 1
      } else if (c == '(') {
        val s0 = i
        while (i < n && body.charAt(i) != ')') i += 1
        if (i < n) i += 1
        out += body.substring(s0, i)
      } else {
        val s0 = i
        while (i < n && !TextUtil.isXmlWhitespace(body.charAt(i)) &&
               body.charAt(i) != '"' && body.charAt(i) != '\'') i += 1
        out += body.substring(s0, i)
      }
    }
    out.toSeq
  }

  /** entity declaration values resolve char refs for substitution purposes. */
  private def resolveCharRefs(v: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '&' && i + 1 < v.length && v.charAt(i + 1) == '#') {
        val semi = v.indexOf(';', i)
        if (semi > 0) {
          val cp = TextUtil.decodeEntityRef(v.substring(i + 1, semi))
          if (cp > 0) { sb.appendAll(Character.toChars(cp)); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
