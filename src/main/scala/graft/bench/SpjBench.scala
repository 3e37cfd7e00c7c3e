package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence for storage-partitioned joins: the SAME two rowsets joined
  * on repo (a) as plain lake tables — both sides shuffled by the join — and
  * (b) as bucket-clustered tables through the SQL catalog, where the scan's
  * KeyGroupedPartitioning + reported ordering make the sort-merge join
  * shuffle-free AND sort-free. Interleaved best-of-k trials (shared host);
  * prints one JSON line.
  *
  * {{{ sbt -batch "runMain graft.bench.SpjBench 2000000 3" }}}
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 2000000
    val trials = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // key cardinality scales with the data (rows/100 repos): a large-large
    // join whose output stays ~5 pairs per fact row, so the timed difference
    // is the exchanges, not pair enumeration
    val repos = math.max(997, rows / 100)
    def synth(n: Int, commit: String) = spark.range(n).select(
      concat(lit("repo_"), (col("id") % repos).cast("string")).as("repo"),
      concat(lit(commit), lit("/f"), col("id").cast("string")).as("path"),
      lit(commit).as("commit"),
      element_at(typedLit(Seq("scala", "c", "rust")), (col("id") % 3 + 1).cast("int")).as("lang"),
      concat(lit("content "), col("id").cast("string")).as("content"))

    val wh = java.nio.file.Files.createTempDirectory("graft-spj-bench").toString
    val fact = new graft.lake.GraftTable(spark, s"$wh/ns/fact")
    val dim = new graft.lake.GraftTable(spark, s"$wh/ns/dim")
    fact.append(synth(rows, "c0"))
    dim.append(synth(rows / 20, "c1"))

    spark.conf.set("spark.sql.catalog.spjb", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.spjb.warehouse", wh)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // pin the join shape: SPJ vs shuffled must differ only in the exchanges,
    // not in the join algorithm
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val q = """SELECT /*+ MERGE(b) */ a.repo, a.path, b.path AS bpath
              |FROM spjb.ns.fact a JOIN spjb.ns.dim b ON a.repo = b.repo""".stripMargin

    def time(): (Double, Long, String) = {
      val df = spark.sql(q)
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n, df.queryExecution.executedPlan.toString)
    }

    // warm both paths once
    val t0 = time()

    // A: unbucketed — the join shuffles both sides
    var shuffled = Double.MaxValue
    var spj = Double.MaxValue
    var rowsOut = 0L
    var planShuffled = ""; var planSpj = ""
    val tBucketize0 = System.nanoTime()
    // interleave: bucketize AFTER measuring the shuffled side each trial
    // is impossible (layout is a table property), so measure shuffled first,
    // then bucketize once and measure SPJ — the bucketize cost is reported
    // too (the one-time rewrite the later joins amortize)
    for (_ <- 1 to trials) { val (s, n, p) = time(); shuffled = math.min(shuffled, s); rowsOut = n; planShuffled = p }
    val nBuckets = spark.sparkContext.defaultParallelism
    graft.lake.Maintenance.bucketize(fact, nBuckets)
    graft.lake.Maintenance.bucketize(dim, nBuckets)
    val bucketizeSecs = (System.nanoTime() - tBucketize0) / 1e9 - shuffled * trials
    for (_ <- 1 to trials) { val (s, _, p) = time(); spj = math.min(spj, s); planSpj = p }

    val shuffledHasEx = planShuffled.contains("Exchange")
    val spjHasEx = planSpj.contains("Exchange")
    val spjHasSort = planSpj.contains("Sort [")
    println(s"""{"bench":"spj_ab","rows":$rows,"dim_rows":${rows / 20},"out_rows":$rowsOut,""" +
      s""""cores":"$cpus","buckets":$nBuckets,"trials":$trials,""" +
      s""""shuffled_join_sec":$shuffled,"spj_join_sec":$spj,""" +
      s""""speedup":${shuffled / spj},"bucketize_once_sec":$bucketizeSecs,""" +
      s""""shuffled_plan_has_exchange":$shuffledHasEx,"spj_plan_has_exchange":$spjHasEx,""" +
      s""""spj_plan_has_sort":$spjHasSort}""")
    require(shuffledHasEx && !spjHasEx && !spjHasSort,
      "plan shapes must differ exactly by the exchanges and sorts")
    spark.stop()
  }
}
