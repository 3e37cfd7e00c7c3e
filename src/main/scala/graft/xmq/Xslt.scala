package graft.xmq

import java.io.StringReader
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import javax.xml.transform.{ErrorListener, OutputKeys, Source, TransformerException, TransformerFactory, URIResolver}
import javax.xml.transform.dom.DOMResult
import javax.xml.transform.stream.StreamSource
import scala.collection.mutable.ArrayBuffer

/** XSLT 1.0 `transform` command (reference: xmq-cli.c cmd_transform,
  * ~2489-2529, which delegates to libxslt). We delegate to the JDK's
  * built-in XSLT 1.0 processor (javax.xml.transform) instead.
  *
  * Reference semantics preserved here:
  *  - the stylesheet file is loaded through the SAME multi-format loader as
  *    documents (an .xslq/.json stylesheet works — xmq-cli.c loads it with
  *    xmqParseFile then converts to a libxml2 DOM);
  *  - `document("file")` inside the stylesheet also goes through the
  *    multi-format loader (xmq-cli.c registers an xslt doc loader), so a
  *    stylesheet can pull in JSON/xmq resources;
  *  - `--stringparam=name=value` sets a string parameter;
  *  - the result replaces the current document; xsl:output's
  *    doctype-system/doctype-public materialize as a !DOCTYPE node (libxslt
  *    serializes them; we re-create the node in the tree).
  */
object Xslt {

  final class XsltError(msg: String, cause: Throwable = null) extends RuntimeException(msg, cause)

  /** Compile a stylesheet (any engine format) into a shareable, thread-safe
    * Templates — the per-task cache unit for the Catalyst expression. */
  def compile(stylesheet: Array[Byte], resolveBase: String = "."): javax.xml.transform.Templates = {
    // the reference loads stylesheets TRIM_NONE (xmq-cli.c:4329-4368) —
    // default trim would strip whitespace-only text like <xsl:text>&#10;</...>
    val ssDoc = XmqEngine.parse(stylesheet, XmqEngine.ParseFlags(trim = "none"))
    protectPreservedWhitespace(ssDoc)
    val ssXml = XmqEngine.toXml(ssDoc)
    val factory = TransformerFactory.newInstance()
    factory.setErrorListener(throwingListener)
    factory.setURIResolver(multiFormatResolver(resolveBase))
    try factory.newTemplates(new StreamSource(new StringReader(ssXml)))
    catch { case e: TransformerException => throw new XsltError(s"stylesheet: ${e.getMessage}", e) }
  }

  /** Transform `doc` with the given stylesheet source bytes.
    * `resolveBase` anchors relative document() hrefs (reference: cwd). */
  def transform(doc: XDoc,
                stylesheet: Array[Byte],
                params: Map[String, Any] = Map.empty,
                resolveBase: String = "."): XDoc =
    transformDoc(doc, compile(stylesheet, resolveBase), params, resolveBase)

  /** Transform with a pre-compiled Templates (expression hot path). */
  def transformDoc(doc: XDoc,
                   templates: javax.xml.transform.Templates,
                   params: Map[String, Any] = Map.empty,
                   resolveBase: String = "."): XDoc = {
    val transformer = templates.newTransformer()
    transformer.setErrorListener(throwingListener)
    transformer.setURIResolver(multiFormatResolver(resolveBase))
    params.foreach { case (k, v) => transformer.setParameter(k, v) }
    transformWith(doc, transformer)
  }

  /** Prepare a reusable Transformer (one per task in the Catalyst
    * expression: instantiation costs dominate per-row transforms). */
  def newTransformer(templates: javax.xml.transform.Templates,
                     resolveBase: String = "."): javax.xml.transform.Transformer = {
    val transformer = templates.newTransformer()
    transformer.setErrorListener(throwingListener)
    transformer.setURIResolver(multiFormatResolver(resolveBase))
    transformer
  }

  /** Transform with a prepared Transformer (no per-row parameters). */
  def transformWith(doc: XDoc, transformer: javax.xml.transform.Transformer): XDoc = {
    val inXml = XmqEngine.toXml(doc)

    // Build the engine tree straight from SAX events: XSLTC's own SAX2DOM
    // silently drops top-level text nodes (pure method=text results AND
    // text siblings after result elements — differentially fuzz-verified),
    // so a DOMResult is not faithful to what libxslt produces.
    val handler = new SaxDocBuilder
    val result = new javax.xml.transform.sax.SAXResult(handler)
    result.setLexicalHandler(handler)
    try transformer.transform(new StreamSource(new StringReader(inXml)), result)
    catch {
      case e: TransformerException => throw new XsltError(e.getMessage, e)
      case e: RuntimeException => throw new XsltError(e.getMessage, e)
    }
    val out = handler.doc
    // xsl:output doctype-system/doctype-public → !DOCTYPE node (libxslt
    // emits it in front of the serialized result; xmq shows it as !DOCTYPE).
    val sys = transformer.getOutputProperty(OutputKeys.DOCTYPE_SYSTEM)
    val pub = transformer.getOutputProperty(OutputKeys.DOCTYPE_PUBLIC)
    if ((sys != null || pub != null) && out.root != null) {
      val name = out.root.name
      val value =
        if (pub != null && sys != null) s"""$name PUBLIC "$pub" "$sys""""
        else if (sys != null) s"""$name SYSTEM "$sys""""
        else s"""$name PUBLIC "$pub""""
      out.children.insert(0, new XDoctype(name, value))
    }
    out
  }

  private val XslNs = "http://www.w3.org/1999/XSL/Transform"

  /** XSLTC (unlike libxslt) strips whitespace-only stylesheet text nodes even
    * under xml:space="preserve"; wrap them in xsl:text so they survive. */
  private def protectPreservedWhitespace(doc: XDoc): Unit = {
    def isWs(s: String) = s.nonEmpty && s.forall(c => c == ' ' || c == '\t' || c == '\n' || c == '\r')
    def wsEntity(r: XEntityRef): Boolean = {
      val cp = TextUtil.decodeEntityRef(r.name)
      cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r'
    }
    def walk(e: XElem, preserve0: Boolean, xslPrefix0: String, topLevel: Boolean): Unit = {
      val preserve = e.attrs.find(a => a.nsPrefix == "xml" && a.key == "space") match {
        case Some(a) => a.stringValue == "preserve"
        case None => preserve0
      }
      val xslPrefix = e.nsDefs.find(_.href == XslNs).map(_.prefix).getOrElse(xslPrefix0)
      var i = 0
      while (i < e.children.length) {
        e.children(i) match {
          case t: XText if preserve && !topLevel && isWs(t.content) =>
            val w = new XElem("text", xslPrefix)
            w.appendChild(t)
            w.parent = e
            e.children(i) = w
          case r: XEntityRef if preserve && !topLevel && wsEntity(r) =>
            val w = new XElem("text", xslPrefix)
            w.appendChild(r)
            w.parent = e
            e.children(i) = w
          case c: XElem => walk(c, preserve, xslPrefix, topLevel = false)
          case _ =>
        }
        i += 1
      }
    }
    doc.children.foreach {
      // top level of xsl:stylesheet cannot hold xsl:text — start wrapping below it
      case e: XElem => walk(e, preserve0 = false, "xsl", topLevel = true)
      case _ =>
    }
  }

  /** document()/xsl:include loader with the reference's multi-format
    * behavior: any file the engine can detect (xmq/json/xml/html) becomes
    * an XML source. */
  private def multiFormatResolver(base: String): URIResolver = new URIResolver {
    override def resolve(href: String, baseUri: String): Source = {
      val p0 = Paths.get(href)
      val p: Path = if (p0.isAbsolute) p0 else Paths.get(base).resolve(href)
      if (!Files.exists(p)) return null // fall back to default resolution
      val bytes = Files.readAllBytes(p)
      val d = XmqEngine.parse(bytes)
      new StreamSource(new StringReader(XmqEngine.toXml(d)), p.toUri.toString)
    }
  }

  private val throwingListener: ErrorListener = new ErrorListener {
    override def warning(e: TransformerException): Unit = ()
    override def error(e: TransformerException): Unit = throw e
    override def fatalError(e: TransformerException): Unit = throw e
  }

  /** SAX ContentHandler+LexicalHandler building the engine tree directly
    * from the transformer's event stream (faithful: every characters() event
    * lands in the doc, unlike XSLTC's SAX2DOM). Redundant re-declarations of
    * in-scope namespaces are dropped, as before. */
  private final class SaxDocBuilder extends org.xml.sax.helpers.DefaultHandler
      with org.xml.sax.ext.LexicalHandler {
    val doc = new XDoc
    private var stack = List.empty[XElem]
    private var pendingNs = List.empty[(String, String)] // (prefix "", uri)
    private var scopes = List(Map.empty[String, String])

    override def startPrefixMapping(prefix: String, uri: String): Unit =
      pendingNs ::= (prefix, uri)

    override def startElement(uri: String, localName: String, qName: String,
                              atts: org.xml.sax.Attributes): Unit = {
      val prefix = qName.indexOf(':') match {
        case -1 => null
        case i => qName.substring(0, i)
      }
      val name = if (localName != null && localName.nonEmpty) localName else qName
      val e = new XElem(name, prefix)
      var scope = scopes.head
      pendingNs.reverse.foreach { case (p, u) =>
        if (scope.getOrElse(p, "") != u) {
          e.nsDefs += NsDef(if (p.isEmpty) null else p, u)
          scope = scope.updated(p, u)
        }
      }
      pendingNs = Nil
      var i = 0
      while (i < atts.getLength) {
        val aq = atts.getQName(i)
        if (aq != "xmlns" && !aq.startsWith("xmlns:")) {
          val ap = aq.indexOf(':') match {
            case -1 => null
            case j => aq.substring(0, j)
          }
          val al = atts.getLocalName(i)
          val xa = new XAttr(ap, if (al != null && al.nonEmpty) al else aq)
          xa.appendText(atts.getValue(i))
          e.attrs += xa
        }
        i += 1
      }
      stack.headOption match {
        case Some(parent) => parent.appendChild(e)
        case None => doc.appendChild(e)
      }
      stack ::= e
      scopes ::= scope
    }

    override def endElement(uri: String, localName: String, qName: String): Unit = {
      stack = stack.tail
      scopes = scopes.tail
    }

    override def characters(ch: Array[Char], start: Int, length: Int): Unit = {
      val s = new String(ch, start, length)
      stack.headOption match {
        case Some(parent) => parent.appendText(s)
        case None =>
          doc.children.lastOption match {
            case Some(t: XText) => t.content += s
            case _ => doc.appendChild(new XText(s))
          }
      }
    }

    // whitespace-only result text arrives as ignorableWhitespace — it is
    // real output (xsl:text newlines in method=text)
    override def ignorableWhitespace(ch: Array[Char], start: Int, length: Int): Unit =
      characters(ch, start, length)

    override def processingInstruction(target: String, data: String): Unit = {
      val pi = new XPi(target, data)
      stack.headOption match {
        case Some(parent) => parent.appendChild(pi)
        case None => doc.appendChild(pi)
      }
    }

    override def comment(ch: Array[Char], start: Int, length: Int): Unit = {
      val cm = new XComment(new String(ch, start, length))
      stack.headOption match {
        case Some(parent) => parent.appendChild(cm)
        case None => doc.appendChild(cm)
      }
    }

    // LexicalHandler no-ops
    override def startDTD(name: String, publicId: String, systemId: String): Unit = ()
    override def endDTD(): Unit = ()
    override def startEntity(name: String): Unit = ()
    override def endEntity(name: String): Unit = ()
    override def startCDATA(): Unit = ()
    override def endCDATA(): Unit = ()
  }
}
