package graft

import graft.expr.CoreTypes
import org.apache.spark.sql.functions._

/** XMQCoreType vocabulary: per-type accept/reject probes incl. the exact
  * range boundaries (string-math 128-bit), plus castTo typing. */
class CoreTypesSpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private def checks(t: String, good: Seq[String], bad: Seq[String]): Unit = {
    import spark.implicits._
    val df = (good.map((_, true)) ++ bad.map((_, false))).toDF("v", "expected")
    val wrong = df.withColumn("got", coalesce(CoreTypes.valid($"v", t), lit(false)))
      .filter($"got" =!= $"expected").collect()
    assert(wrong.isEmpty,
      s"$t misjudged: ${wrong.map(r => s"'${r.getString(0)}' -> ${r.getBoolean(2)}").mkString(", ")}")
  }

  test("integer core types accept/reject at their exact boundaries") {
    checks("i8", Seq("127", "-128", "0", "+5", "007"), Seq("128", "-129", "1.0", "", "abc", "1e2"))
    checks("i16", Seq("32767", "-32768"), Seq("32768", "-32769"))
    checks("i32", Seq("2147483647", "-2147483648"), Seq("2147483648", "-2147483649"))
    checks("i64", Seq("9223372036854775807", "-9223372036854775808"),
      Seq("9223372036854775808", "-9223372036854775809"))
    checks("i128",
      Seq("170141183460469231731687303715884105727",
          "-170141183460469231731687303715884105728",
          "000170141183460469231731687303715884105727"),
      Seq("170141183460469231731687303715884105728",
          "-170141183460469231731687303715884105729"))
    checks("u8", Seq("255", "0", "+255", "0255"), Seq("256", "-1", "-0"))
    checks("u16", Seq("65535"), Seq("65536"))
    checks("u32", Seq("4294967295"), Seq("4294967296"))
    checks("u64", Seq("18446744073709551615"), Seq("18446744073709551616"))
    checks("u128", Seq("340282366920938463463374607431768211455"),
      Seq("340282366920938463463374607431768211456"))
  }

  test("float, bool, string, base64 core types") {
    checks("f64", Seq("1.5", "-0.25", ".5", "3.", "1e300", "2E-8", "+1"), Seq("", "1e", "e5", "1.2.3", "nan"))
    checks("f32", Seq("3.4e38", "-3.4e38", "0"), Seq("3.5e38", "1e39"))
    checks("bool", Seq("true", "false"), Seq("True", "FALSE", "1", ""))
    checks("string", Seq("anything at all", ""), Seq("has\u0000nul"))
    checks("base64", Seq("QUJD", "QUJDRQ==", "QQ==", "QUJDRA==", ""), Seq("QQ=", "Q", "QU JD", "Q!JD"))
  }

  test("email, uri, url, ip core types") {
    checks("email", Seq("a@b.co", "x.y+z@sub.example.org"), Seq("nope", "a@b", "a b@c.d", "@b.co"))
    checks("uri", Seq("mailto:x", "https://h/p", "a+b:whatever"), Seq("no colon", "1ttp:x", "ht tp:x"))
    checks("url", Seq("https://h.org/p?q=1", "ftp://h", "http://h"), Seq("mailto:x", "https:/h", "ftp:x"))
    checks("ipv4_address", Seq("0.0.0.0", "255.255.255.255", "128.0.0.1"),
      Seq("256.0.0.1", "1.2.3", "01.2.3.4", "1.2.3.4.5"))
    checks("ipv6_address", Seq("fe80::1a2b", "::1", "::", "1:2:3:4:5:6:7:8", "abcd::"),
      Seq("g::1", "1:2:3:4:5:6:7:8:9", "12345::1"))
    checks("ip_address", Seq("127.0.0.1", "::1"), Seq("not-an-ip"))
  }

  test("castTo produces typed values, nulls outside range or representability") {
    import spark.implicits._
    val df = Seq("42", "-7", "999", "170141183460469231731687303715884105727",
      "99999999999999999999999999999999999999").toDF("v")
    val out = df.select(
      CoreTypes.castTo($"v", "i8").as("as_i8"),
      CoreTypes.castTo($"v", "i128").as("as_i128"),
      CoreTypes.castTo($"v", "f64").as("as_f64"))
    assert(out.schema("as_i8").dataType.typeName == "byte")
    assert(out.schema("as_i128").dataType.typeName == "decimal(38,0)")
    val rows = out.collect()
    assert(rows(0).getByte(0) == 42 && rows(1).getByte(0) == -7)
    assert(rows(2).isNullAt(0), "999 must not cast to i8")
    // 2^127-1 VALIDATES as i128 but exceeds DECIMAL(38)'s 1e38 — casts null
    assert(rows(3).isNullAt(1), "beyond-decimal38 sliver must cast to null")
    // 38 nines fits decimal(38,0)
    assert(rows(4).getDecimal(1).toString == "99999999999999999999999999999999999999")
    assert(math.abs(rows(0).getDouble(2) - 42.0) < 1e-12)
  }
}
