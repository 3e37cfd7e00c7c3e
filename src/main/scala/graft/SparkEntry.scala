package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator/capability from SURVEY.md §2,
  * expressed Spark-first (DataFrame/Dataset + Catalyst). `oracleSql` holds
  * the DuckDB-equivalent ANSI SQL for the driver's correctness gate; the
  * column names (and ordering) are aligned on both sides.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    q1Agg(spark, dir)
  }

  // ----------------------------------------------------------------------
  // Relational core (SURVEY.md §2.5): scan+filter+project (pushdown),
  // hash aggregate, broadcast join, window, semi join, top-k, distinct.
  // ----------------------------------------------------------------------

  private def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private def q2JoinAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders   = t(s, dir, "orders")
    val customer = t(s, dir, "customer")
    val nation   = t(s, dir, "nation")
    // customer (15k @sf0.1) and nation (25) are broadcast by Catalyst;
    // hint explicitly so the plan survives a 100x orders scale-up.
    orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
           round(sum($"o_totalprice"), 2).as("total_price"))
      .orderBy($"n_name")
  }

  private def q3TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("spend"),
           count(lit(1)).as("n_orders"))
      .orderBy($"spend".desc, $"o_custkey".asc)
      .limit(10)
  }

  private def q4Window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey",
              $"o_orderkey".as("last_orderkey"),
              date_format($"o_orderdate", "yyyy-MM-dd").as("last_orderdate"))
      .orderBy($"o_custkey")
  }

  private def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"c_mktsegment")
  }

  private def q6Filter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1994-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1995-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) &&
              $"l_quantity" < 24)
      .agg(round(sum($"l_extendedprice" * $"l_discount"), 2).as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  private def q7EventsAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"user_id").as("n_users"),
           round(sum($"value"), 2).as("total_value"))
      .orderBy($"event_type")
  }

  private def q8EventsHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_format($"ts", "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n_events"),
           round(sum($"value"), 2).as("total_value"))
      .orderBy($"hour")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"           -> (q1Agg(_, _)),
    "q2_join_agg"      -> (q2JoinAgg(_, _)),
    "q3_topk"          -> (q3TopK(_, _)),
    "q4_window"        -> (q4Window(_, _)),
    "q5_semijoin"      -> (q5SemiJoin(_, _)),
    "q6_filter_agg"    -> (q6Filter(_, _)),
    "q7_events_agg"    -> (q7EventsAgg(_, _)),
    "q8_events_hourly" -> (q8EventsHourly(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_agg" ->
      """SELECT n_name, count(*) AS n_orders,
        | round(sum(o_totalprice), 2) AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_topk" ->
      """SELECT o_custkey, round(sum(o_totalprice), 2) AS spend,
        | count(*) AS n_orders
        |FROM orders GROUP BY 1
        |ORDER BY spend DESC, o_custkey ASC LIMIT 10""".stripMargin,
    "q4_window" ->
      """SELECT o_custkey, o_orderkey AS last_orderkey,
        | strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q5_semijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        | count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate <  TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_events_agg" ->
      """SELECT event_type, count(*) AS n_events,
        | count(DISTINCT user_id) AS n_users,
        | round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_events_hourly" ->
      """SELECT strftime(ts, '%Y-%m-%d %H') AS hour,
        | count(*) AS n_events, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
