package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{GraftTable, Maintenance}

/** scratch: mismatched-bucket SPJ conf matrix — correctness + exchange count. */
object SpjDebugTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def rows(n: Int, commit: String) = (0 until n).toDF("i").select(
      concat(lit("repo_"), ($"i" % 13).cast("string")).as("repo"),
      concat(lit("f/"), $"i".cast("string")).as("path"),
      lit(commit).as("commit"), lit("scala").as("lang"),
      concat(lit("content "), $"i".cast("string")).as("content"))

    val wh = Files.createTempDirectory("graft-spj-dbg").toString
    val a = new GraftTable(spark, s"$wh/ns/a")
    val b = new GraftTable(spark, s"$wh/ns/b")
    a.append(rows(400, "c0")); b.append(rows(150, "c1"))
    Maintenance.bucketize(a, 16); Maintenance.bucketize(b, 8)
    spark.conf.set("spark.sql.catalog.dbg", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dbg.warehouse", wh)

    val expected = {
      val ar = rows(400, "c0").groupBy("repo").count().withColumnRenamed("count", "an")
      val br = rows(150, "c1").groupBy("repo").count().withColumnRenamed("count", "bn")
      ar.join(br, "repo").agg(sum($"an" * $"bn")).head().getLong(0)
    }
    println(s"EXPECTED $expected")

    val base = "spark.sql.sources.v2.bucketing."
    val combos = Seq(
      ("push+compat", Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled")),
      ("push+compat-nofilter", Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled", "NOFILTER")),
      ("push+compat+partial", Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled", "partiallyClusteredDistribution.enabled")),
      ("compat-only", Seq("enabled", "allowCompatibleTransforms.enabled")),
      ("bucketing-only", Seq("enabled")))
    // which repos lose pairs under push+compat?
    Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled")
      .foreach(c => spark.conf.set(base + c, "true"))
    spark.conf.set(base + "partiallyClusteredDistribution.enabled", "false")
    val got = spark.sql(
      """SELECT /*+ MERGE(b) */ a.repo FROM dbg.ns.a a JOIN dbg.ns.b b ON a.repo = b.repo""")
      .groupBy("repo").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = {
      val ar = rows(400, "c0").groupBy("repo").count().withColumnRenamed("count", "an")
      val br = rows(150, "c1").groupBy("repo").count().withColumnRenamed("count", "bn")
      ar.join(br, "repo").select($"repo", ($"an" * $"bn").as("p")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    // dump each side's SPJ params + partition grouping
    val probe = spark.sql(
      """SELECT /*+ MERGE(b) */ a.repo FROM dbg.ns.a a JOIN dbg.ns.b b ON a.repo = b.repo""")
    probe.count()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      case other => other.children.flatMap(scans)
    }
    scans(probe.queryExecution.executedPlan).foreach { bs =>
        val spj = org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          .unapply(bs).get._6
        println(s"SCAN ${bs.scan.description().take(60)}")
        println(s"  keyGroupedPartitioning=${spj.keyGroupedPartitioning.map(_.size)}")
        println(s"  joinKeyPositions=${spj.joinKeyPositions}")
        println(s"  commonPartitionValues=${spj.commonPartitionValues.map(_.map { case (r, n) => (r.getInt(0), n) })}")
        println(s"  reducers=${spj.reducers.map(_.map(_.isDefined))}")
        println(s"  applyPartialClustering=${spj.applyPartialClustering} replicatePartitions=${spj.replicatePartitions}")
        println(s"  partitions=${bs.partitions.map(_.map {
          case g: graft.lake.GraftBucketedPartition => g.bucket.toString
          case _ => "?" }.mkString("[", ",", "]")).mkString(" ")}")
    }

    for (r <- exp.keys.toSeq.sorted) {
      val b16 = graft.lake.Bucketing.BucketBound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(16,
          org.apache.spark.unsafe.types.UTF8String.fromString(r)))
      val b8 = graft.lake.Bucketing.BucketBound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(8,
          org.apache.spark.unsafe.types.UTF8String.fromString(r)))
      println(s"REPO $r b16=$b16 b8=$b8 exp=${exp(r)} got=${got.getOrElse(r, 0L)}")
    }

    // hypothesis: merge-join elides the sort on the reduced (concatenated) side.
    // a hash join must be correct with zero exchanges if SPJ itself is fine.
    Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled")
      .foreach(c => spark.conf.set(base + c, "true"))
    val hj = spark.sql(
      """SELECT /*+ SHUFFLE_HASH(b) */ a.repo FROM dbg.ns.a a JOIN dbg.ns.b b ON a.repo = b.repo""")
    val hjCnt = hj.count()
    val hjPlan = hj.queryExecution.executedPlan.toString
    println(s"HASHJOIN count=$hjCnt exchanges=${"Exchange".r.findAllIn(hjPlan).length} ok=${hjCnt == expected}")

    for ((name, confs) <- combos) {
      val all = Seq("enabled", "pushPartValues.enabled", "allowCompatibleTransforms.enabled",
        "partiallyClusteredDistribution.enabled")
      all.foreach(c => spark.conf.set(base + c, confs.contains(c).toString))
      spark.conf.set(base + "partition.filter.enabled", (!confs.contains("NOFILTER")).toString)
      val df = spark.sql(
        """SELECT /*+ MERGE(b) */ a.repo FROM dbg.ns.a a JOIN dbg.ns.b b ON a.repo = b.repo""")
      val cnt = df.count()
      val plan = df.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      println(s"COMBO $name count=$cnt exchanges=$nEx ok=${cnt == expected}")
    }
    spark.stop()
  }
}
