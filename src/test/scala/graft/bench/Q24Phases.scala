package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of exactly the q24 lake-table build (SparkEntry
  * buildLakeTable), to locate the fixed overhead the driver bench pays.
  * Test/runMain graft.bench.Q24Phases [sfDir] */
object Q24Phases {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]").appName("q24phases")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        println(f"  job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    })
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // warm up parquet reader + codegen paths
    timed("warmup")(spark.read.parquet(s"$dir/documents.parquet").count())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def shaped(df: org.apache.spark.sql.DataFrame, v2: Boolean) = df.select(
      concat(lit("repo_"), ($"doc_id" % 10).cast("string")).as("repo"),
      concat(lit("f/"), $"doc_id".cast("string"), lit(".txt")).as("path"),
      lit("c0").as("commit"), $"lang",
      (if (v2) concat(lit("v2 "), $"text") else $"text").as("content"))
    val base = shaped(docs.filter($"doc_id" % 3 =!= 0), v2 = false)
    val source = shaped(docs.filter($"doc_id" % 5 === 0), v2 = true)
    val loc = java.nio.file.Files.createTempDirectory("graft-q24phases").toString
    val table = new graft.lake.GraftTable(spark, loc)
    timed("append")(table.append(base.repartition(8)))
    timed("mergeInto")(graft.lake.Maintenance.mergeInto(table, "t", source))
    timed("compact")(graft.lake.Maintenance.compact(table, "t",
      smallBytes = Long.MaxValue, targetBytes = 4L << 20))
    timed("cluster")(graft.lake.Maintenance.cluster(table, "t"))
    timed("rewriteManifests")(table.rewriteManifests())
    timed("expire")(table.expireSnapshots(System.currentTimeMillis() + 1000))
    timed("scan+sha")(table.scan()
      .select($"repo", $"path", sha2($"content", 256).as("s")).count())
    spark.stop()
  }
}
