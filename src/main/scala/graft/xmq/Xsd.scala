package graft.xmq

import java.io.StringReader
import javax.xml.XMLConstants
import javax.xml.transform.stream.StreamSource
import javax.xml.validation.SchemaFactory
import org.xml.sax.{ErrorHandler, SAXParseException}

/** XSD `validate` command (reference: xmq-cli.c cmd_validate, 2589-2632,
  * which delegates to libxml2's xmlSchemaValidateDoc; the first validation
  * error aborts with "xmq: Document cannot be validated against <xsd>" plus
  * libxml2's structured error text — abortValidating at xmq-cli.c:766).
  *
  * We delegate to the JDK's built-in XML Schema validator. Xerces words its
  * diagnostics differently from libxml2, so the two error families the
  * reference corpus exercises are re-rendered in libxml2's phrasing
  * (unexpected element / no declaration for the validation root); anything
  * else passes through as the Xerces message.
  */
object Xsd {

  final class SchemaError(msg: String) extends RuntimeException(msg)

  /** Compile an XSD (any engine format) into a shareable, thread-safe
    * Schema — the per-task cache unit for the Catalyst expression. */
  def compile(xsdBytes: Array[Byte]): javax.xml.validation.Schema = {
    val xsdXml =
      try XmqEngine.toXml(XmqEngine.parse(xsdBytes))
      catch { case e: Exception => throw new SchemaError(e.toString) }
    val factory = SchemaFactory.newInstance(XMLConstants.W3C_XML_SCHEMA_NS_URI)
    try factory.newSchema(new StreamSource(new StringReader(xsdXml)))
    catch { case e: org.xml.sax.SAXException => throw new SchemaError(e.getMessage) }
  }

  /** None = document valid; Some(msg) = first validation error, worded like
    * libxml2. Throws SchemaError when the schema itself cannot be loaded. */
  def validate(doc: XDoc, xsdBytes: Array[Byte]): Option[String] =
    validateWith(doc, compile(xsdBytes))

  /** Boolean-only validation with a reusable Validator (the Catalyst
    * expression's hot path: Validator creation dominates per-row cost;
    * javax Validators are reusable across validate() calls). */
  def validateQuick(doc: XDoc, validator: javax.xml.validation.Validator): Boolean =
    try {
      validator.validate(new StreamSource(new StringReader(XmqEngine.toXml(doc))))
      true
    } catch { case _: org.xml.sax.SAXException => false }

  def validateWith(doc: XDoc, schema: javax.xml.validation.Schema): Option[String] = {
    val validator = schema.newValidator()
    var firstError: SAXParseException = null
    validator.setErrorHandler(new ErrorHandler {
      override def warning(e: SAXParseException): Unit = ()
      override def error(e: SAXParseException): Unit =
        { if (firstError == null) firstError = e; throw e }
      override def fatalError(e: SAXParseException): Unit =
        { if (firstError == null) firstError = e; throw e }
    })
    try {
      validator.validate(new StreamSource(new StringReader(XmqEngine.toXml(doc))))
      None
    } catch {
      case _: org.xml.sax.SAXException =>
        Some(render(if (firstError != null) firstError.getMessage else "validation failed", doc))
    }
  }

  /** Re-render a Xerces diagnostic in libxml2's phrasing. */
  private[xmq] def render(msg: String, doc: XDoc): String = {
    // cvc-elt.1[.a]: Cannot find the declaration of element 'q:name'.
    val NoDecl = """cvc-elt\.1[^:]*: Cannot find the declaration of element '([^']+)'\.""".r
    // cvc-complex-type.2.4.a: Invalid content was found starting with element
    // '<elem>'. One of '{<list>}' is expected.
    val Unexpected =
      """cvc-complex-type\.2\.4\.a: Invalid content was found starting with element '(.+?)'\. One of '\{(.*)\}' is expected\.""".r
    msg match {
      case NoDecl(qname) =>
        s"Element '${clarkOfRoot(qname, doc)}': No matching global declaration available for the validation root."
      case Unexpected(elem, expected) =>
        val names = splitExpected(expected)
        val exp =
          if (names.length == 1) s"Expected is ( ${names.head} )."
          else s"Expected is one of ( ${names.mkString(", ")} )."
        s"Element '${clark(elem)}': This element is not expected. $exp"
      case other => other
    }
  }

  /** Xerces writes ns-qualified names as {"uri":local}; libxml2 as {uri}local. */
  private def clark(token: String): String = {
    val t = token.stripPrefix("{").stripSuffix("}")
    val m = """"([^"]*)":(.+)""".r
    t match {
      case m(uri, local) => s"{$uri}$local"
      case _ => t
    }
  }

  /** Resolve the validation root's qname against the document's own ns defs
    * (Xerces reports the prefixed name; libxml2 reports {uri}local). */
  private def clarkOfRoot(qname: String, doc: XDoc): String = {
    if (qname.startsWith("{")) return clark(qname)
    val (prefix, local) = qname.indexOf(':') match {
      case -1 => (null, qname)
      case i => (qname.substring(0, i), qname.substring(i + 1))
    }
    val root = doc.root
    val uri =
      if (root == null) null
      else root.nsDefs.find(d => d.prefix == prefix || (prefix == null && d.prefix == null))
        .map(_.href).orNull
    if (uri == null || uri.isEmpty) local else s"{$uri}$local"
  }

  private def splitExpected(list: String): Seq[String] =
    list.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { item =>
      val m = """"([^"]*)":(.+)""".r
      item match {
        case m(_, local) => local
        case other => other
      }
    }
}
