package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * plus the xmq round-trip throughput headline, and prints ONE JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // untimed warmup: first job otherwise absorbs parquet-reader init,
    // codegen compilation and xmq-engine JIT on behalf of whichever query
    // happens to sort first
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // materialize every output column (noop sink) — count() would let
      // Spark prune the very columns a query exists to compute
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: xmq round-trip verification throughput (rows/sec)
    import spark.implicits._
    val n = 20000
    val nRepos = math.max(4, math.sqrt(n.toDouble).toInt)
    val synth = spark.range(n)
      .mapPartitions(_.map(id => graft.synth.SourceFiles.row(42L, id, nRepos)))
      .toDF().cache()
    synth.count() // materialize outside the timed section
    val t0 = System.nanoTime()
    val ok = synth.filter(graft.expr.XmqFunctions.xmq_roundtrip_ok($"content", $"lang")).count()
    val rtSecs = (System.nanoTime() - t0) / 1e9
    synth.unpersist()

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + rtSecs
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""xmq_roundtrip_rows_per_sec":${ok / rtSecs},"xmq_roundtrip_rows":$ok,""" +
      s""""cores":"$cpus","sf":"$sfDir"}""")
    spark.stop()
  }
}
