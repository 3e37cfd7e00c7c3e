package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.EqualTo

/** ROW-GROUP stats pruning A/B: the same many-row-group data file decoded
  * through `GraftColumnarPartitionReader` with the pushed predicate handed
  * to parquet's statistics filter (pruned) vs with no predicate (full
  * decode) — wall seconds and rows that actually left the vectorized
  * decoder. The file is written sorted by repo with a small
  * parquet.block.size so group stats carry tight disjoint-ish repo ranges,
  * the layout `Maintenance.cluster`/`bucketize` produce at scale.
  * Test/runMain graft.bench.RowGroupBench [rows] [blockKiB] [trials]
  */
object RowGroupBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 2000000
    val blockKiB = if (args.length > 1) args(1).toInt else 1024
    val trials = if (args.length > 2) args(2).toInt else 4

    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-rowgroup-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt("parquet.block.size", blockKiB * 1024)
    val dir = java.nio.file.Files.createTempDirectory("graft-rgbench").toString
    val t = new graft.lake.GraftTable(spark, dir)
    t.append(spark.range(rows).as[java.lang.Long]
      .mapPartitions(_.map(id => graft.synth.SourceFiles.row(42L, Long2long(id), 8)))
      .toDF().coalesce(1).sortWithinPartitions("repo"))
    val path = t.io.abs(t.manifest(t.currentSnapshot.get)
      .select("file_path").head().getString(0)).toString

    // how many groups does the file actually have?
    val groups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), hc)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try rd.getFooter.getBlocks.size finally rd.close()
    }

    val repo = graft.synth.SourceFiles.repoName(3)
    val schema = graft.lake.GraftTable.dataSchema

    def decode(filters: Array[org.apache.spark.sql.sources.Filter]): (Double, Long) = {
      var best = Double.MaxValue; var n = 0L
      (1 to trials).foreach { _ =>
        val t0 = System.nanoTime()
        val r = new graft.lake.GraftColumnarPartitionReader(path, schema, filters)
        var c = 0L
        try { while (r.next()) c += r.get().numRows() } finally r.close()
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs < best) best = secs
        n = c
      }
      (best, n)
    }

    decode(Array.empty) // warm the page cache so the A/B is CPU/decode-bound
    val (fullS, fullN) = decode(Array.empty)
    val (prunedS, prunedN) = decode(Array(EqualTo("repo", repo)))
    val matches = t.scan().filter($"repo" === repo).count()

    println(f"""{"bench":"rowgroup_prune","rows":$rows,"groups":$groups,"full_secs":$fullS%.3f,"full_decoded":$fullN,"pruned_secs":$prunedS%.3f,"pruned_decoded":$prunedN,"matches":$matches}""")
    spark.stop()
  }
}
