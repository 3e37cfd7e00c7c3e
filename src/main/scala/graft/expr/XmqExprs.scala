package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.SparkSession

import graft.xmq._

/** Catalyst expressions wrapping the xmq engine (SURVEY.md §4.3).
  * All deterministic, null-safe, UTF8String in/out, CodegenFallback for v1
  * (the per-row work is parser/printer-bound, not expression-dispatch-bound).
  */
object XmqExprs {

  private[expr] def ctOf(lang: String): Xmq.ContentType = lang match {
    case "xml" => Xmq.XML
    case "html" => Xmq.HTML
    case "json" => Xmq.JSON
    case "xmq" | "htmq" => Xmq.XMQ
    case "text" => Xmq.TEXT
    case _ => null // auto-detect
  }

  /** parse content as `lang`, print back in the same format (the round-trip
    * kernel; null on parse error). */
  def roundtrip(content: String, lang: String): String = {
    try {
      val ct = ctOf(lang)
      val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ct))
      // detect on the SAME BOM-stripped text the parser saw: detecting on
      // the raw string would see U+FEFF as the first char and print a
      // BOM-prefixed XML document back as XMQ
      val stripped =
        if (content.startsWith("\uFEFF")) content.substring(1) else content
      val effective = if (ct != null) ct else Xmq.detect(stripped)
      effective match {
        case Xmq.XML => XmqEngine.toXml(doc)
        case Xmq.HTML => XmqEngine.toHtml(doc)
        case Xmq.JSON => XmqEngine.toJson(doc)
        case _ => XmqEngine.toXmq(doc)
      }
    } catch { case _: Exception => null }
  }

  /** Per-thread LAST-PARSE memo for the READ-ONLY getter kernels: a row
    * evaluated by several getter expressions over the same (content, lang)
    * — the typed-get shape, 8 getters per row — parses once instead of
    * once per getter (rows evaluate expression-by-expression, so the
    * previous parse is almost always the one needed). Only non-mutating
    * consumers may use it: probe/annotate mutate the tree and parse their
    * own copy. A parse failure memoizes as doc=null, so repeated
    * wellformed-checks of a bad document stay cheap. */
  private final class ParseMemo {
    var content: String = null
    var lang: String = null
    var doc: XDoc = null
  }
  private val parseMemo = new ThreadLocal[ParseMemo] {
    override def initialValue(): ParseMemo = new ParseMemo
  }

  /** documents above this size are parsed without memoizing — bounds the
    * per-thread retention (content string + tree) the memo pins. */
  private val memoMaxChars = 4 << 20

  /** memoized parse; null when content does not parse as lang. */
  private def parsedOrNull(content: String, lang: String): XDoc = {
    val m = parseMemo.get()
    if (m.content != null && m.lang == lang && m.content == content) m.doc
    else {
      // invalidate BEFORE parsing: a non-Exception Throwable (e.g. a
      // StackOverflowError on pathological nesting) must not leave the memo
      // claiming the new content maps to the previous document's tree
      m.content = null
      m.lang = null
      m.doc = null
      val doc =
        try XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
        catch { case _: Exception => null }
      if (content.length <= memoMaxChars) {
        m.content = content
        m.lang = lang
        m.doc = doc
      }
      doc
    }
  }

  /** first xpath match's string content (reference xmqGetString →
    * catch_single_content, xmq.c:4343): element → its direct text children
    * concatenated; attribute → its value; text node → its content.
    * null when nothing matches or the document does not parse. */
  def getString(content: String, lang: String, path: String): String = {
    val doc = parsedOrNull(content, lang)
    if (doc == null) null
    else try stringOfFirstMatch(doc, path)
    catch { case _: Exception => null }
  }

  private def stringOfFirstMatch(doc: XDoc, path: String): String =
    XPath.matches(doc, path).headOption.map {
      case XPath.ElemHit(e) =>
        e.children.collect { case t: XText => t.content }.mkString
      case XPath.AttrHit(_, a) => a.stringValue
      case XPath.TextHit(t) => t.content
    }.orNull

  /** Multi-output probe: ONE parse feeding count, well-formedness, the first
    * valueXpath match as a C-long, and the offset-annotated compact print —
    * the plan shape for queries that need several derived columns from the
    * same document (six single-output expressions re-parse six times —
    * VERDICT r2 "What's wrong" #4). */
  final case class Probe(count: Long, wellformed: Boolean, firstLong: Long,
                         annotated: String)

  def probe(content: String, lang: String, countXpath: String,
            valueXpath: String, attr: String): Probe = try {
    val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
    // xpath failures (bad path syntax) are caught PER FIELD: the document
    // parsed, so wellformed must stay true — the single-output expressions
    // this probe replaces (is_wellformed, xmq_count) decide independently,
    // and the fused plan must agree with them column for column
    val n = try XPath.matches(doc, countXpath).size.toLong
            catch { case _: Exception => 0L }
    val s = try stringOfFirstMatch(doc, valueXpath)
            catch { case _: Exception => null }
    val firstLong = if (s == null) 0L else parseLongC(s)
    // annotation mutates the tree: run it last
    TreeOps.annotateOffsets(doc, attr)
    Probe(n, wellformed = true, firstLong, XmqEngine.toXmq(doc, compact = true))
  } catch { case _: Exception => Probe(0L, wellformed = false, 0L, null) }

  /** C strtol/atol semantics of xmqGetLong (xmq.c:4319). The reference
    * branches on the raw first bytes (no leading-whitespace skip):
    * content[0]=='0' && content[1]=='x' → strtol base 16; content[0]=='0'
    * → strtol base 8 (trailing garbage stops the scan, "017abc" → 15);
    * otherwise atol (whitespace skip, optional sign, decimal prefix).
    * Overflow clamps like strtol. 0 when no digits. */
  def parseLongC(s: String): Long = {
    def clamped(digits: String, radix: Int, neg: Boolean): Long =
      if (digits.isEmpty) 0L
      else try {
        val v = java.lang.Long.parseLong(digits, radix)
        if (neg) -v else v
      } catch {
        case _: NumberFormatException => if (neg) Long.MinValue else Long.MaxValue
      }
    if (s == null || s.isEmpty) 0L
    else if (s.length >= 2 && s.charAt(0) == '0' && s.charAt(1) == 'x')
      clamped(s.drop(2).takeWhile(c => Character.digit(c, 16) >= 0), 16, neg = false)
    else if (s.charAt(0) == '0')
      clamped(s.drop(1).takeWhile(c => c >= '0' && c <= '7'), 8, neg = false)
    else {
      val t = s.dropWhile(c => c == ' ' || (c >= '\t' && c <= '\r'))
      val neg = t.startsWith("-")
      val rest = if (t.startsWith("-") || t.startsWith("+")) t.drop(1) else t
      clamped(rest.takeWhile(c => c >= '0' && c <= '9'), 10, neg)
    }
  }

  def getLong(content: String, lang: String, path: String): Long = {
    val s = getString(content, lang, path)
    if (s == null) 0L else parseLongC(s)
  }

  def getDouble(content: String, lang: String, path: String): Double = {
    val s = getString(content, lang, path)
    if (s == null) return 0.0
    // strtod: longest valid leading prefix, 0 on none
    val m = java.util.regex.Pattern.compile("^\\s*[-+]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][-+]?\\d+)?")
      .matcher(s)
    if (m.find()) m.group(0).trim.toDouble else 0.0
  }

  def countMatches(content: String, lang: String, path: String): Long = {
    val doc = parsedOrNull(content, lang)
    if (doc == null) 0L
    else try XPath.matches(doc, path).size.toLong
    catch { case _: Exception => 0L }
  }

  /** structural well-formedness: does the content parse as `lang`?
    * (the v1 slice of the reference's validate command — SURVEY.md §2.3) */
  def isWellformed(content: String, lang: String): Boolean =
    parsedOrNull(content, lang) != null

  /** xmqAnnotateOffsets as a conversion: parse, annotate, print compact xmq. */
  def annotateOffsets(content: String, lang: String, attr: String): String = try {
    val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
    TreeOps.annotateOffsets(doc, attr)
    XmqEngine.toXmq(doc, compact = true)
  } catch { case _: Exception => null }

  /** xslt_transform eval body: parse, transform with the task's prepared
    * Transformer, print in the requested format. Errors → null (libxslt:
    * empty output). */
  def xsltTransform(content: String, lang: String,
                    transformer: javax.xml.transform.Transformer, to: String): String = try {
    val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
    val out = Xslt.transformWith(doc, transformer)
    to match {
      case "xml" => XmqEngine.toXml(out)
      case "html" => XmqEngine.toHtml(out)
      case "json" => XmqEngine.toJson(out)
      case "text" => XmqEngine.toText(out)
      case "xmq_compact" => XmqEngine.toXmq(out, compact = true)
      case _ => XmqEngine.toXmq(out)
    }
  } catch { case _: Exception => null }

  /** xsd_valid eval body: malformed content or any validation error → false. */
  def xsdValid(content: String, lang: String, validator: javax.xml.validation.Validator): Boolean = try {
    val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
    Xsd.validateQuick(doc, validator)
  } catch { case _: Exception => false }

  def convert(content: String, lang: String, to: String, compact: Boolean): String = {
    try {
      val doc = XmqEngine.parse(content.getBytes("UTF-8"), XmqEngine.ParseFlags(forced = ctOf(lang)))
      to match {
        case "xml" => XmqEngine.toXml(doc)
        case "html" => XmqEngine.toHtml(doc)
        case "json" => XmqEngine.toJson(doc)
        case "text" => XmqEngine.toText(doc)
        case "clines" => XmqEngine.toClines(doc)
        case _ => XmqEngine.toXmq(doc, compact)
      }
    } catch { case _: Exception => null }
  }
}

/** xmq_roundtrip(content, lang): re-print content in its own format. */
case class XmqRoundTrip(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(c: Any, l: Any): Any = {
    val out = XmqExprs.roundtrip(c.toString, l.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "xmq_roundtrip"
}

/** xmq_roundtrip_ok(content, lang): sha256-invariance check done inline. */
case class XmqRoundTripOk(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val c = left.eval(input)
    val l = right.eval(input)
    if (c == null || l == null) return false
    val out = XmqExprs.roundtrip(c.toString, l.toString)
    out != null && out == c.toString
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "xmq_roundtrip_ok"
}

/** Per-task compile cache for an expression's "program" child (ixml
  * grammar, XSLT stylesheet, XSD schema). The child is usually a literal:
  * compile once when foldable, otherwise memoize the last compiled text —
  * expression instances are per-task after deserialization, so plain vars
  * are safe. Held in a `@transient lazy val` by each expression, so the
  * cache is rebuilt empty on the executor and never serialized. */
private[expr] final class CompiledChild[T >: Null <: AnyRef](
    child: Expression, compile: String => T) {
  private lazy val const: T =
    if (child.foldable) {
      val v = child.eval(null)
      if (v == null) null else compile(v.toString)
    } else null
  private var lastText: String = null
  private var lastVal: T = null
  /** compiled form of `v` (non-null child value). */
  def get(v: Any): T =
    if (const != null) const
    else {
      val text = v.toString
      if (lastText != text) { lastVal = compile(text); lastText = text }
      lastVal
    }
}

/** Per-task instance cache keyed by reference identity: one derived
  * worker (Transformer, Validator — reusable but not thread-safe) per
  * compiled program, rebuilt only when the program object changes. */
private[expr] final class DerivedFrom[K <: AnyRef, V](make: K => V) {
  private var forKey: K = null.asInstanceOf[K]
  private var value: V = null.asInstanceOf[V]
  def get(k: K): V = {
    if (forKey ne k) { value = make(k); forKey = k }
    value
  }
}

/** ixml_parse(grammar, input): parse input text with an Invisible-XML
  * grammar (reference: xmq --ixml=g.ixml, xmq.c ixml engine) and print the
  * resulting document as xmq. Parse failures return the reference's failure
  * document (ixml:state=failed), not null, so failures are queryable.
  * The grammar compiles once per expression instance when the grammar child
  * is foldable (the common literal case), not once per row. */
case class IxmlParse(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import graft.xmq.ixml.{Earley, IxmlReader}
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val grammarOf =
    new CompiledChild[graft.xmq.ixml.Grammar](left, IxmlReader.parse(_))

  override protected def nullSafeEval(g: Any, in: Any): Any = {
    val grammar = grammarOf.get(g)
    val input = in.toString
    val doc =
      try Earley.parse(grammar, input)
      catch {
        case Earley.IxmlParseError(at) =>
          graft.xmq.ixml.Ixml.failureDoc(input, at)
      }
    UTF8String.fromString(XmqEngine.toXmq(doc))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "ixml_parse"
}

/** ixml_parse_recover(grammar, input): like ixml_parse but with the
  * reference's --ixml-try-to-recover semantics (min-cost codepoint skip; see
  * Ixml.parseRecoverToDoc) — the pipeline shape for dirty text corpora where
  * a partial parse beats an all-or-nothing failure document. Returns
  * struct(parsed, skipped, recovered): parsed is the xmq print of the
  * (possibly recovered) document, or null when recovery failed; skipped is
  * the number of codepoints dropped. */
case class IxmlParseRecover(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  import graft.xmq.ixml.{Ixml, IxmlReader}
  override def dataType: DataType = IxmlParseRecover.schema
  override def nullable: Boolean = true

  @transient private lazy val grammarOf =
    new CompiledChild[graft.xmq.ixml.Grammar](left, IxmlReader.parse(_))

  override protected def nullSafeEval(g: Any, in: Any): Any = {
    val r = Ixml.parseRecover(grammarOf.get(g), in.toString)
    InternalRow(
      if (r.recovered) UTF8String.fromString(XmqEngine.toXmq(r.doc)) else null,
      r.skipped, r.recovered)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "ixml_parse_recover"
}

object IxmlParseRecover {
  val schema: StructType = StructType(Seq(
    StructField("parsed", StringType, nullable = true),
    StructField("skipped", IntegerType, nullable = false),
    StructField("recovered", BooleanType, nullable = false)))
}

/** xslt_transform(content, lang, stylesheet, to): apply an XSLT 1.0
  * stylesheet (itself in any engine format: xmq/xml/json) to the parsed
  * content and print the result in format `to` ("xmq"/"xml"/"json"/"text"/
  * compact xmq via "xmq_compact"). The reference's `transform` command as a
  * distributed column operator. Stylesheet compiles to a shared Templates
  * once when foldable (javax Templates is thread-safe; per-row Transformer
  * creation is cheap). Errors return null (libxslt prints nothing). */
case class XsltTransform(children: Seq[Expression]) extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val templatesOf =
    new CompiledChild[javax.xml.transform.Templates](
      children(2), t => Xslt.compile(t.getBytes("UTF-8")))
  // one Transformer per Templates (instantiation dominates per-row cost)
  @transient private lazy val transformerFor =
    new DerivedFrom[javax.xml.transform.Templates,
      javax.xml.transform.Transformer](Xslt.newTransformer(_))

  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val out = XmqExprs.xsltTransform(vals(0).toString, vals(1).toString,
      transformerFor.get(templatesOf.get(vals(2))), vals(3).toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
  override def prettyName: String = "xslt_transform"
}

/** xsd_valid(content, lang, xsd): true when the parsed content validates
  * against the XSD (the reference's `validate` command as a predicate).
  * Schema compiles once when the xsd child is foldable (javax Schema is
  * thread-safe; Validators are created per thread). */
case class XsdValid(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  @transient private lazy val schemaOf =
    new CompiledChild[javax.xml.validation.Schema](
      third, t => Xsd.compile(t.getBytes("UTF-8")))
  // one Validator per Schema: Validators are reusable (not thread-safe,
  // but expression instances are per-task after deserialization)
  @transient private lazy val validatorFor =
    new DerivedFrom[javax.xml.validation.Schema,
      javax.xml.validation.Validator](_.newValidator())

  override def eval(input: InternalRow): Any = {
    val c = first.eval(input)
    val l = second.eval(input)
    val x = third.eval(input)
    if (c == null || l == null || x == null) return false
    XmqExprs.xsdValid(c.toString, l.toString,
      validatorFor.get(schemaOf.get(x)))
  }
  override protected def nullSafeEval(c: Any, l: Any, x: Any): Any =
    throw new IllegalStateException("eval overridden")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xsd_valid"
}

/** xmq_convert(content, lang, to, compact) */
case class XmqConvert(children: Seq[Expression]) extends Expression
  with ImplicitCastInputTypes with CodegenFallback {
  // declared input types insert analysis-time casts for SQL callers —
  // without them `xmq_convert(c, l, 'xml', 'true')` passes a string where
  // eval asInstanceOf[Boolean]s, crashing the executor instead of the plan
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, StringType, BooleanType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vals = children.map(_.eval(input))
    if (vals.exists(_ == null)) return null
    val out = XmqExprs.convert(vals(0).toString, vals(1).toString, vals(2).toString,
      vals(3).asInstanceOf[Boolean])
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
  override def prettyName: String = "xmq_convert"
}

/** xmq_detect(content): XMQ|XML|HTML|JSON */
case class XmqDetect(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(c: Any): Any =
    UTF8String.fromString(Xmq.detect(c.toString) match {
      case Xmq.XML => "xml"
      case Xmq.HTML => "html"
      case Xmq.JSON => "json"
      case _ => "xmq"
    })
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "xmq_detect"
}

/** xmq_get_string(content, lang, xpath): first match's string content
  * (reference xmqGetString, xmq.c:4343). */
case class XmqGetString(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(c: Any, l: Any, p: Any): Any = {
    val out = XmqExprs.getString(c.toString, l.toString, p.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xmq_get_string"
}

/** xmq_get_long(content, lang, xpath): C strtol semantics (xmq.c:4319). */
case class XmqGetLong(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  // xmqGetLong returns 0 for a missing document/xpath, so a null input row
  // maps to 0L rather than TernaryExpression's default null (which would
  // contradict nullable=false and NPE in UnsafeProjection).
  override def eval(input: InternalRow): Any = {
    val c = first.eval(input); val l = second.eval(input); val p = third.eval(input)
    if (c == null || l == null || p == null) 0L
    else XmqExprs.getLong(c.toString, l.toString, p.toString)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xmq_get_long"
}

/** xmq_get_double(content, lang, xpath): strtod semantics (xmq.c:4357). */
case class XmqGetDouble(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  // null inputs → 0.0 (missing content yields 0 in the reference API).
  override def eval(input: InternalRow): Any = {
    val c = first.eval(input); val l = second.eval(input); val p = third.eval(input)
    if (c == null || l == null || p == null) 0.0
    else XmqExprs.getDouble(c.toString, l.toString, p.toString)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xmq_get_double"
}

/** xmq_count(content, lang, xpath): number of xpath matches (cmd_select's
  * XPATH_NUMBER count() path, xmq-cli.c:2670). */
case class XmqCount(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  // null inputs → 0 matches (mirrors XmqWellformed's null handling).
  override def eval(input: InternalRow): Any = {
    val c = first.eval(input); val l = second.eval(input); val p = third.eval(input)
    if (c == null || l == null || p == null) 0L
    else XmqExprs.countMatches(c.toString, l.toString, p.toString)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xmq_count"
}

/** is_wellformed(content, lang): does the content parse as lang? (v1 slice
  * of the reference's validate command, xmq-cli.c:2589). */
case class XmqWellformed(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val c = left.eval(input)
    val l = right.eval(input)
    if (c == null || l == null) return false
    XmqExprs.isWellformed(c.toString, l.toString)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "is_wellformed"
}

/** xmq_annotate_offsets(content, lang, attr): annotated compact xmq
  * (reference xmqAnnotateOffsets, xmq.c:3400). */
case class XmqAnnotate(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(c: Any, l: Any, a: Any): Any = {
    val out = XmqExprs.annotateOffsets(c.toString, l.toString, a.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "xmq_annotate_offsets"
}

/** xmq_probe(content, lang, countXpath, valueXpath, attr): parse ONCE,
  * return struct(n_matches, wellformed, first_long, annotated) — multi-output
  * replacement for chains of single-output expressions over one document. */
case class XmqProbe(children: Seq[Expression]) extends Expression with CodegenFallback {
  require(children.length == 5, "xmq_probe takes 5 arguments")
  override def dataType: DataType = XmqProbe.schema
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) // missing content: the reference's 0/false shape
      return InternalRow(0L, false, 0L, null)
    val p = XmqExprs.probe(vs(0).toString, vs(1).toString, vs(2).toString,
      vs(3).toString, vs(4).toString)
    InternalRow(p.count, p.wellformed, p.firstLong,
      if (p.annotated == null) null else UTF8String.fromString(p.annotated))
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)
  override def prettyName: String = "xmq_probe"
}

object XmqProbe {
  val schema: StructType = StructType(Seq(
    StructField("n_matches", LongType, nullable = false),
    StructField("wellformed", BooleanType, nullable = false),
    StructField("first_long", LongType, nullable = false),
    StructField("annotated", StringType, nullable = true)))
}

/** xmq_tokenize(content): array<struct<type,text,line,col>> mirroring
  * `tokenize --type=debugtokens` (SURVEY.md §1.5/§2.2). */
case class XmqTokenize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = XmqTokenize.schema
  override def nullable: Boolean = true
  override protected def nullSafeEval(c: Any): Any = {
    try {
      val bytes = c.toString.getBytes("UTF-8")
      val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val sink = new TokenSink {
        def token(tpe: String, line: Int, col: Int, start: Int, stop: Int, suffix: Int): Unit = {
          val text = new String(bytes, start, stop - start, "UTF-8")
          rows += InternalRow(UTF8String.fromString(tpe), UTF8String.fromString(text), line, col)
        }
      }
      new XmqTokenizer(bytes, sink).tokenize()
      new GenericArrayData(rows.toArray[Any])
    } catch { case _: Exception => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "xmq_tokenize"
}
object XmqTokenize {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("type", StringType), StructField("text", StringType),
    StructField("line", IntegerType), StructField("col", IntegerType))))
}

/** zorder_interleave(h1, h2, lang): 28+28+8-bit interleaved Z-value. The two
  * hashes contribute alternating bits; the lang byte is folded into the low
  * bits so files of the same language cluster within a (repo,path) locality
  * cell. Pure, deterministic (SURVEY.md §4.3 item 2). */
case class ZOrderInterleave(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  // SQL callers pass integer literals (`zorder_interleave(h1, h2, 3)`);
  // the declared types insert the long casts the raw asInstanceOf needs
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    ZOrderInterleave.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Long])
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "zorder_interleave"
}
object ZOrderInterleave {
  /** interleave the top 28 bits of a and b, plus low 8 bits of lang. */
  def interleave(a: Long, b: Long, lang: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 28) {
      val abit = (a >>> (63 - i)) & 1L
      val bbit = (b >>> (63 - i)) & 1L
      z = (z << 2) | (abit << 1) | bbit
      i += 1
    }
    (z << 8) | (lang & 0xffL)
  }
}

/** hilbert_index(x, y, order): 2-D Hilbert curve index — locality-preserving
  * fallback for skewed repo distributions (SURVEY.md §4.3). Standard public
  * x/y-to-d algorithm (Wikipedia "Hilbert curve"). */
case class HilbertIndex(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType, IntegerType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long], c.asInstanceOf[Int])
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "hilbert_index"
}
object HilbertIndex {
  /** order = bits per dimension (<=31). x,y are masked to that many bits. */
  def xy2d(x0: Long, y0: Long, order: Int): Long = {
    val n = 1L << order
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var rx = 0L
    var ry = 0L
    var d = 0L
    var s = n / 2
    while (s > 0) {
      rx = if ((x & s) > 0) 1L else 0L
      ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }
}

/** Column wrappers + SQL registration. */
object XmqFunctions {
  import org.apache.spark.sql.GraftInternal.{col => mkCol, expr => exprOf}

  def xmq_roundtrip(content: Column, lang: Column): Column =
    mkCol(XmqRoundTrip(exprOf(content), exprOf(lang)))
  def xmq_roundtrip_ok(content: Column, lang: Column): Column =
    mkCol(XmqRoundTripOk(exprOf(content), exprOf(lang)))
  def xmq_convert(content: Column, lang: Column, to: Column, compact: Column): Column =
    mkCol(XmqConvert(Seq(exprOf(content), exprOf(lang), exprOf(to), exprOf(compact))))
  def xmq_detect(content: Column): Column = mkCol(XmqDetect(exprOf(content)))
  def xmq_tokenize(content: Column): Column = mkCol(XmqTokenize(exprOf(content)))
  def xmq_get_string(content: Column, lang: Column, xpath: Column): Column =
    mkCol(XmqGetString(exprOf(content), exprOf(lang), exprOf(xpath)))
  def xmq_get_long(content: Column, lang: Column, xpath: Column): Column =
    mkCol(XmqGetLong(exprOf(content), exprOf(lang), exprOf(xpath)))
  def xmq_get_double(content: Column, lang: Column, xpath: Column): Column =
    mkCol(XmqGetDouble(exprOf(content), exprOf(lang), exprOf(xpath)))
  def xmq_count(content: Column, lang: Column, xpath: Column): Column =
    mkCol(XmqCount(exprOf(content), exprOf(lang), exprOf(xpath)))

  /** Typed document extraction — the reference's intended XMQCoreType use
    * (xmq.h:803-860 getters + :382-407 vocabulary): the first xpath match's
    * string through the parse kernel, validated and ANSI-safely cast per
    * `coreType`. Returns struct(raw, ok, value) where value's Spark type
    * follows CoreTypes.castTo. The parse runs ONCE: the raw extraction is
    * let-bound through a single-element transform() lambda, so the verdict
    * and the cast reference the bound value instead of three copies of the
    * parsing expression. */
  def xmq_typed_get(content: Column, lang: Column, path: Column,
                    coreType: String): Column = {
    import org.apache.spark.sql.functions._
    val raw = xmq_get_string(content, lang, path)
    // coalesce: a missing xpath match (raw null) must verdict FALSE for
    // every core type — the regex/range forms would yield null while the
    // string form yields false, an inconsistent three-valued column
    element_at(transform(array(raw), x => struct(
      x.as("raw"),
      coalesce(graft.expr.CoreTypes.valid(x, coreType), lit(false)).as("ok"),
      graft.expr.CoreTypes.castTo(x, coreType).as("value"))), 1)
  }
  def is_wellformed(content: Column, lang: Column): Column =
    mkCol(XmqWellformed(exprOf(content), exprOf(lang)))
  def ixml_parse(grammar: Column, input: Column): Column =
    mkCol(IxmlParse(exprOf(grammar), exprOf(input)))
  def ixml_parse_recover(grammar: Column, input: Column): Column =
    mkCol(IxmlParseRecover(exprOf(grammar), exprOf(input)))
  def xslt_transform(content: Column, lang: Column, stylesheet: Column, to: Column): Column =
    mkCol(XsltTransform(Seq(exprOf(content), exprOf(lang), exprOf(stylesheet), exprOf(to))))
  def xsd_valid(content: Column, lang: Column, xsd: Column): Column =
    mkCol(XsdValid(exprOf(content), exprOf(lang), exprOf(xsd)))
  def xmq_annotate_offsets(content: Column, lang: Column, attr: Column): Column =
    mkCol(XmqAnnotate(exprOf(content), exprOf(lang), exprOf(attr)))
  def xmq_probe(content: Column, lang: Column, countXpath: Column,
                valueXpath: Column, attr: Column): Column =
    mkCol(XmqProbe(Seq(exprOf(content), exprOf(lang), exprOf(countXpath),
      exprOf(valueXpath), exprOf(attr))))
  def zorder_interleave(a: Column, b: Column, lang: Column): Column =
    mkCol(ZOrderInterleave(exprOf(a), exprOf(b), exprOf(lang)))
  def hilbert_index(x: Column, y: Column, order: Column): Column =
    mkCol(HilbertIndex(exprOf(x), exprOf(y), exprOf(order)))

  /** register as SQL functions on the session. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.GraftInternal.registerFunction
    registerFunction(spark, "xmq_roundtrip", es => XmqRoundTrip(es(0), es(1)))
    registerFunction(spark, "xmq_roundtrip_ok", es => XmqRoundTripOk(es(0), es(1)))
    registerFunction(spark, "xmq_convert", es => XmqConvert(es))
    registerFunction(spark, "xmq_detect", es => XmqDetect(es.head))
    registerFunction(spark, "xmq_tokenize", es => XmqTokenize(es.head))
    registerFunction(spark, "xmq_get_string", es => XmqGetString(es(0), es(1), es(2)))
    registerFunction(spark, "xmq_get_long", es => XmqGetLong(es(0), es(1), es(2)))
    registerFunction(spark, "xmq_get_double", es => XmqGetDouble(es(0), es(1), es(2)))
    registerFunction(spark, "xmq_count", es => XmqCount(es(0), es(1), es(2)))
    registerFunction(spark, "is_wellformed", es => XmqWellformed(es(0), es(1)))
    registerFunction(spark, "ixml_parse", es => IxmlParse(es(0), es(1)))
    registerFunction(spark, "ixml_parse_recover", es => IxmlParseRecover(es(0), es(1)))
    registerFunction(spark, "xslt_transform", es => XsltTransform(es))
    registerFunction(spark, "xsd_valid", es => XsdValid(es(0), es(1), es(2)))
    registerFunction(spark, "xmq_annotate_offsets", es => XmqAnnotate(es(0), es(1), es(2)))
    registerFunction(spark, "xmq_probe", es => XmqProbe(es))
    registerFunction(spark, "zorder_interleave", es => ZOrderInterleave(es(0), es(1), es(2)))
    registerFunction(spark, "hilbert_index", es => HilbertIndex(es(0), es(1), es(2)))
  }
}
