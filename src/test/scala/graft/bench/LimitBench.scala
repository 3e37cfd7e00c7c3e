package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** LIMIT / TopN pushdown A/B at bench scale, same table, same layout:
  *
  *   limit_pushed    — `LIMIT 10` through the connector (planning truncated
  *                     to the fewest covering files + capped readers)
  *   full_count      — the same table's full-scan count, the "no pushdown"
  *                     denominator for rows-touched
  *   topn_capped     — `ORDER BY repo ASC LIMIT 25` over the bucket-SORTED
  *                     table: readers serve each bucket's sorted prefix
  *   topn_uncapped   — `ORDER BY repo DESC LIMIT 25` on the SAME table:
  *                     DESC cannot be a sorted prefix, pushTopN refuses, the
  *                     global sort eats the whole scan (symmetric compare
  *                     cost, so the delta is the cap, not the direction)
  *
  * Reports best-of-k wall seconds AND the scan's numOutputRows metric —
  * the rows that actually left the reader, the honest "bytes touched"
  * proxy. Test/runMain graft.bench.LimitBench [rows] [files] [trials]
  */
object LimitBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 3000000
    val files = if (args.length > 1) args(1).toInt else 64
    val trials = if (args.length > 2) args(2).toInt else 4

    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-limit-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-limitbench").toString
    val t = new graft.lake.GraftTable(spark, dir)
    t.append(spark.range(rows).repartition(files).as[java.lang.Long]
      .mapPartitions(_.map(id => graft.synth.SourceFiles.row(42L, Long2long(id), 8)))
      .toDF())
    graft.lake.Maintenance.bucketize(t, 32, "repo")
    val total = t.currentSnapshot.get.fileCount

    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      val leaves = df.queryExecution.executedPlan.collectLeaves()
      val fromLeaves = leaves.flatMap(_.metrics.get("numOutputRows")).map(_.value)
      if (fromLeaves.nonEmpty) fromLeaves.sum
      else // AQE wraps the whole plan in one leaf: walk the final plan inside
        df.queryExecution.executedPlan.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.collectLeaves()
              .flatMap(_.metrics.get("numOutputRows")).map(_.value).sum
        }.sum
    }

    def bestOf(name: String, mk: () => org.apache.spark.sql.DataFrame,
               act: org.apache.spark.sql.DataFrame => Long): Unit = {
      var best = Double.MaxValue; var n = 0L; var sr = 0L
      (1 to trials).foreach { _ =>
        val df = mk()
        val t0 = System.nanoTime()
        n = act(df)
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs < best) { best = secs; sr = scanRows(df) }
      }
      println(f"""{"bench":"limit_pushdown","case":"$name","rows":$rows,"files":$total,"best_secs":$best%.3f,"result_rows":$n,"scan_rows":$sr}""")
    }

    def read() = spark.read.format("graft").load(dir)

    // warmups (codegen, footers, page cache)
    read().count(); read().limit(10).count()
    read().orderBy($"repo").limit(25).count()
    read().orderBy($"repo".desc).limit(25).count()

    bestOf("full_count", () => read(), _.count())
    bestOf("limit_pushed", () => read().limit(10), _.collect().length.toLong)
    bestOf("topn_capped", () => read().orderBy($"repo").limit(25),
      _.collect().length.toLong)
    bestOf("topn_uncapped", () => read().orderBy($"repo".desc).limit(25),
      _.collect().length.toLong)

    // plan sanity: print the two TopN descriptions once
    val capped = read().orderBy($"repo").limit(25)
    capped.count()
    val cDesc = capped.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    println("capped_plan_has=" + cDesc.contains("PushedTopN=repo ASC LIMIT 25 (capped)"))
    val lim = read().limit(10)
    lim.count()
    val lDesc = lim.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    println("limit_plan=" + "PushedLimit=10 files=(\\d+)/(\\d+)".r.findFirstIn(lDesc).getOrElse("?"))
    spark.stop()
  }
}
