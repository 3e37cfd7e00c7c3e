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
    val ssDoc = XmqEngine.parse(stylesheet)
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
                params: Map[String, String] = Map.empty,
                resolveBase: String = "."): XDoc =
    transformDoc(doc, compile(stylesheet, resolveBase), params, resolveBase)

  /** Transform with a pre-compiled Templates (expression hot path). */
  def transformDoc(doc: XDoc,
                   templates: javax.xml.transform.Templates,
                   params: Map[String, String] = Map.empty,
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

    // A Document node cannot hold top-level text (xsl:output method=text,
    // or fragments with mixed top-level content) — collect into a fragment.
    val ownerDoc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder().newDocument()
    val result = new DOMResult(ownerDoc.createDocumentFragment())
    try transformer.transform(new StreamSource(new StringReader(inXml)), result)
    catch {
      case e: TransformerException => throw new XsltError(e.getMessage, e)
      case e: RuntimeException => throw new XsltError(e.getMessage, e)
    }

    var out = fromDom(result.getNode)
    if (out.children.isEmpty) {
      // XSLTC's DOM builder drops results with no element at all (pure
      // xsl:output method=text / top-level value-of) — recover the text via
      // the serializer.
      val sw = new java.io.StringWriter
      transformer.setOutputProperty(OutputKeys.OMIT_XML_DECLARATION, "yes")
      try transformer.transform(
        new StreamSource(new StringReader(inXml)),
        new javax.xml.transform.stream.StreamResult(sw))
      catch { case e: TransformerException => throw new XsltError(e.getMessage, e) }
      if (sw.toString.nonEmpty) {
        out = new XDoc
        out.appendChild(new XText(sw.toString))
      }
    }
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

  /** Convert an org.w3c.dom result tree into the engine's XDoc model. */
  def fromDom(node: org.w3c.dom.Node): XDoc = {
    import org.w3c.dom.Node._
    val doc = new XDoc

    def convertElem(e: org.w3c.dom.Element, inScope: Map[String, String]): XElem = {
      val out = new XElem(localName(e), prefixOf(e))
      var scope = inScope
      val atts = e.getAttributes
      var i = 0
      while (i < atts.getLength) {
        val a = atts.item(i).asInstanceOf[org.w3c.dom.Attr]
        val ns = a.getNamespaceURI
        if (ns == "http://www.w3.org/2000/xmlns/" || a.getNodeName == "xmlns" ||
            a.getNodeName.startsWith("xmlns:")) {
          // XSLTC re-declares in-scope (and empty-default) namespaces on every
          // literal-result element; keep only declarations that change scope.
          val prefix = if (a.getNodeName == "xmlns") null else a.getNodeName.substring(6)
          val key = if (prefix == null) "" else prefix
          if (scope.getOrElse(key, "") != a.getValue) {
            out.nsDefs += NsDef(prefix, a.getValue)
            scope = scope.updated(key, a.getValue)
          }
        } else {
          val xa = new XAttr(prefixOf(a), localName(a))
          xa.appendText(a.getValue)
          out.attrs += xa
        }
        i += 1
      }
      var c = e.getFirstChild
      while (c != null) {
        convertInto(c, scope, n => out.appendChild(n), s => out.appendText(s))
        c = c.getNextSibling
      }
      out
    }

    def convertInto(n: org.w3c.dom.Node, scope: Map[String, String],
                    add: XNode => Unit, addText: String => Unit): Unit =
      n.getNodeType match {
        case ELEMENT_NODE => add(convertElem(n.asInstanceOf[org.w3c.dom.Element], scope))
        case TEXT_NODE | CDATA_SECTION_NODE => addText(n.getNodeValue)
        case COMMENT_NODE => add(new XComment(n.getNodeValue))
        case PROCESSING_INSTRUCTION_NODE => add(new XPi(n.getNodeName, n.getNodeValue))
        case _ => // doctype handled separately; ignore the rest
      }

    var c = node.getFirstChild
    val pendingText = new StringBuilder
    def flushText(): Unit = if (pendingText.nonEmpty) {
      doc.appendChild(new XText(pendingText.toString)); pendingText.clear()
    }
    while (c != null) {
      c.getNodeType match {
        case TEXT_NODE | CDATA_SECTION_NODE => pendingText.append(c.getNodeValue)
        case _ =>
          flushText()
          convertInto(c, Map.empty, n => doc.appendChild(n), s => doc.appendChild(new XText(s)))
      }
      c = c.getNextSibling
    }
    flushText()
    doc
  }

  private def localName(n: org.w3c.dom.Node): String = {
    val l = n.getLocalName
    if (l != null) l else n.getNodeName
  }
  private def prefixOf(n: org.w3c.dom.Node): String = n.getPrefix
}
