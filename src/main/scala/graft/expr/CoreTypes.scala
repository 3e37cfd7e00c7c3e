package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's XMQCoreType scalar vocabulary
  * (/root/reference/src/main/c/xmq.h:382-407: BOOL, I8..I128, U8..U128,
  * F32/F64, STRING, BASE64, EMAIL, URI, URL, IP/IPV4/IPV6_ADDRESS) mapped
  * onto Spark: a VALIDATION predicate and a typed CAST per core type, both
  * pure Column compositions of built-in functions (codegen'd — no UDFs).
  *
  * The reference declares the enum but ships no implementation (SURVEY §1.3
  * "declared-but-mostly-aspirational"), so the concrete lexical rules here
  * are chosen as the natural reading of the doc comments and pinned by the
  * q34 oracle: integers are optional-sign decimal digits range-checked at
  * their declared width via STRING math (digit count + lexicographic bound
  * compare — full 128-bit range, no numeric overflow anywhere), BOOL is the
  * literal true/false, STRING excludes NUL bytes per the doc comment, and
  * EMAIL/URI/URL/IP are the regexes below — RE2-compatible (no lookahead)
  * and shared verbatim with the DuckDB oracle so both engines decide
  * identically.
  *
  * `castTo` represents 128-bit integers as DECIMAL(38,0), which covers
  * |v| < 1e38 — the sliver up to 2^127 ≈ 1.70e38 validates but casts to
  * null, the honest Spark representability limit.
  */
object CoreTypes {

  // anchored with \z, not $: Java's $ also matches BEFORE a trailing
  // newline, so "1\n" would validate in Spark while DuckDB's RE2 $ (end of
  // text) rejects it — \z means absolute end of input in BOTH engines,
  // keeping the shared-verbatim contract honest for newline-tailed values
  val EmailRe = "^[^@\\s]+@[^@\\s]+\\.[^@\\s]+\\z"
  val UriRe = "^[A-Za-z][A-Za-z0-9+.-]*:[^\\s]*\\z"
  val UrlRe = "^(https?|ftp)://[^\\s/]+[^\\s]*\\z"
  val Ipv4Re =
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\z"
  /** full 8-group form, or a compressed form REQUIRING a literal `::` with
    * 0-7 hex groups on either side (the standard no-lookahead approximation:
    * a `::` form with more than 8 total groups is not rejected; mixed
    * trailing-IPv4 forms are not recognized). */
  val Ipv6Re = {
    val h = "[0-9A-Fa-f]{1,4}"
    s"^(($h:){7}$h|(($h:){0,6}$h)?::(($h:){0,6}$h)?)\\z"
  }
  val IntRe = "^[+-]?[0-9]+\\z"
  val FloatRe = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?\\z"
  val Base64Re = "^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{4}|[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{2}==)?\\z"

  /** (max, |min|) decimal strings per signed width; unsigned max per width. */
  val SignedBounds: Map[String, (String, String)] = Map(
    "i8"   -> ("127", "128"),
    "i16"  -> ("32767", "32768"),
    "i32"  -> ("2147483647", "2147483648"),
    "i64"  -> ("9223372036854775807", "9223372036854775808"),
    "i128" -> ("170141183460469231731687303715884105727",
               "170141183460469231731687303715884105728"))
  val UnsignedBounds: Map[String, String] = Map(
    "u8"   -> "255",
    "u16"  -> "65535",
    "u32"  -> "4294967295",
    "u64"  -> "18446744073709551615",
    "u128" -> "340282366920938463463374607431768211455")

  /** magnitude digits of a sign-prefixed decimal string: sign stripped,
    * leading zeros stripped, all-zeros normalized to "0". No lookahead —
    * the DuckDB oracle mirrors these exact regexp_replace steps in RE2. */
  private def magDigits(v: Column): Column = {
    val stripped = regexp_replace(regexp_replace(v, "^[+-]", ""), "^0+", "")
    when(stripped === "", "0").otherwise(stripped)
  }

  /** |v| <= bound, by digit count then lexicographic compare at equal
    * length — exact for any width, purely string-typed. */
  private def magLe(v: Column, bound: String): Column = {
    val d = magDigits(v)
    length(d) < bound.length || (length(d) === bound.length && d <= bound)
  }

  private def signedIn(v: Column, t: String): Column = {
    val (max, minAbs) = SignedBounds(t)
    v.rlike(IntRe) &&
      when(v.startsWith("-"), magLe(v, minAbs)).otherwise(magLe(v, max))
  }

  private def unsignedIn(v: Column, t: String): Column =
    v.rlike(IntRe) && !v.startsWith("-") && magLe(v, UnsignedBounds(t))

  /** does `v` conform to the core type's lexical + range rules? */
  def valid(v: Column, coreType: String): Column = coreType match {
    case "bool" => v.isin("true", "false")
    case t @ ("i8" | "i16" | "i32" | "i64" | "i128") => signedIn(v, t)
    case t @ ("u8" | "u16" | "u32" | "u64" | "u128") => unsignedIn(v, t)
    case "f32" => v.rlike(FloatRe) &&
      abs(v.try_cast("double")) <= lit(java.lang.Float.MAX_VALUE.toDouble)
    case "f64" => v.rlike(FloatRe)
    case "string" => v.isNotNull && !v.contains("\u0000")
    case "base64" => v.rlike(Base64Re)
    case "email"  => v.rlike(EmailRe)
    case "uri"    => v.rlike(UriRe)
    case "url"    => v.rlike(UrlRe)
    case "ip_address"   => v.rlike(Ipv4Re) || v.rlike(Ipv6Re)
    case "ipv4_address" => v.rlike(Ipv4Re)
    case "ipv6_address" => v.rlike(Ipv6Re)
    case other => throw new IllegalArgumentException(s"unknown core type $other")
  }

  /** typed value when valid, null otherwise. try_cast throughout — safe
    * under ANSI mode, and the i128/u128 beyond-DECIMAL(38) sliver nulls
    * instead of throwing. */
  def castTo(v: Column, coreType: String): Column = {
    val ok = valid(v, coreType)
    coreType match {
      case "bool"          => when(ok, v === "true")
      case "i8"            => when(ok, v.try_cast("tinyint"))
      case "i16"           => when(ok, v.try_cast("smallint"))
      case "i32"           => when(ok, v.try_cast("int"))
      case "i64"           => when(ok, v.try_cast("bigint"))
      case "u8" | "u16"    => when(ok, v.try_cast("int"))
      case "u32"           => when(ok, v.try_cast("bigint"))
      case "u64"           => when(ok, v.try_cast("decimal(20,0)"))
      case "i128" | "u128" => when(ok, v.try_cast("decimal(38,0)"))
      case "f32"           => when(ok, v.try_cast("float"))
      case "f64"           => when(ok, v.try_cast("double"))
      case _               => when(ok, v) // string-shaped types keep the string
    }
  }

  val all: Seq[String] = Seq("bool", "i8", "i16", "i32", "i64", "i128",
    "u8", "u16", "u32", "u64", "u128", "f32", "f64", "string", "base64",
    "email", "uri", "url", "ip_address", "ipv4_address", "ipv6_address")
}
