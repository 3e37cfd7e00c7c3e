package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence for Bloom-sidecar point lookups: the SAME table queried for
  * one commit (a) through the plain pruned scan — stats cannot exclude a
  * hash-distributed key, every file opens — and (b) through BloomIndex
  * .lookup, which opens only may-contain files. Also records the one-pass
  * sidecar build cost at two sizes (linearity evidence). Interleaved
  * best-of-k trials (shared host); prints one JSON line.
  *
  * {{{ sbt -batch "runMain graft.bench.BloomBench 400000 128 3" }}}
  */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 400000
    val files = if (args.length > 1) args(1).toInt else 128
    val trials = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // commits are sha-like and unique per row: the adversarial case for
    // min/max stats, the designed case for the bloom
    def synth(n: Int) = spark.range(n).select(
      concat(lit("repo_"), (col("id") % 97).cast("string")).as("repo"),
      concat(lit("f/"), col("id").cast("string")).as("path"),
      sha2(col("id").cast("string"), 256).as("commit"),
      lit("scala").as("lang"),
      concat(lit("content "), col("id").cast("string"),
        lit(" "), sha2(concat(lit("pad"), col("id").cast("string")), 256)).as("content"))

    val loc = java.nio.file.Files.createTempDirectory("graft-bloom-bench").toString
    val t = new graft.lake.GraftTable(spark, loc)
    t.append(synth(rows).repartition(files))

    val tb0 = System.nanoTime()
    val (indexed, bits) = graft.lake.BloomIndex.build(t, "commit")
    val buildSecs = (System.nanoTime() - tb0) / 1e9

    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"${rows / 2}".getBytes("UTF-8")).map("%02x".format(_)).mkString

    // a point lookup RETURNS its row — both paths must materialize the
    // payload column, not just count ids (a count touches only the narrow
    // commit column and understates the full-scan cost a real lookup pays)
    def timeFull(): (Double, Long) = {
      val (df, _, _) = t.prunedScan(lit(true)) // stats prune nothing for commit
      val t0 = System.nanoTime()
      val n = df.filter(col("commit") === key)
        .agg(sum(length(col("content")))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def timeBloom(): (Double, Long, Int, Int) = {
      val t0 = System.nanoTime()
      val (df, total, kept) = graft.lake.BloomIndex.lookup(t, "commit", key)
      val n = df.agg(sum(length(col("content")))).head().getLong(0)
      ((System.nanoTime() - t0) / 1e9, n, total, kept)
    }

    // warmup both paths once, then interleave
    timeFull(); timeBloom()
    var full = Double.MaxValue; var bloom = Double.MaxValue
    var hits = (0L, 0, 0)
    for (_ <- 1 to trials) {
      val (fs, fn) = timeFull()
      val (bs, bn, total, kept) = timeBloom()
      require(fn == bn && bn >= 1, s"row mismatch full=$fn bloom=$bn")
      full = math.min(full, fs); bloom = math.min(bloom, bs)
      hits = (bn, total, kept)
    }
    println(s"""{"bench":"bloom_lookup","rows":$rows,"files":${hits._2},""" +
      s""""indexed":$indexed,"bits_per_filter":$bits,"build_secs":$buildSecs,""" +
      s""""full_scan_secs":$full,"bloom_secs":$bloom,""" +
      s""""files_opened":${hits._3},"speedup":${full / bloom},"cores":"$cpus"}""")
    spark.stop()
  }
}
