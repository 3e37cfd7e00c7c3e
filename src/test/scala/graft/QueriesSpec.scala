package graft

/** Smoke: every SparkEntry query runs on sf0.001 and returns rows. */
class QueriesSpec extends SparkTestBase {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
