package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N vs 4N scaling evidence (north_rule: efficiency >= 0.8). A real
  * multi-executor cluster isn't available in this sandbox, so per the task
  * brief the same job runs at two parallelism levels on identical
  * deterministic input. The sandbox host is shared and noisy, so the two
  * levels are measured with INTERLEAVED trials (n,4n,n,4n,...) under one
  * local[4N] session, parallelism controlled by partition count — noise
  * periods then hit both levels equally; best-of-k per level is reported.
  * Efficiency = R_4N / (4 * R_N) on rows/sec.
  *
  *   runMain graft.bench.ScalingBench [rows] [N] [trials]
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val n = if (args.length > 1) args(1).toInt else 8
    val trials = if (args.length > 2) args(2).toInt else 5
    val n4 = n * 4

    // leave host headroom: the driver, GC and OS share the same cores, so the
    // session sizes to 4N threads only (not all host cores)
    val spark = SparkSession.builder()
      .master(s"local[$n4]")
      .appName("graft-scaling")
      .config("spark.sql.shuffle.partitions", n4.toString)
      .config("spark.sql.adaptive.enabled", "false") // keep partition counts exact
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nRepos = math.max(4, math.sqrt(rows.toDouble).toInt)
    def synthAt(parts: Int): DataFrame =
      spark.range(rows).repartition(parts).as[java.lang.Long]
        .mapPartitions(_.map(id => graft.synth.SourceFiles.row(42L, Long2long(id), nRepos)))
        .toDF().cache()

    // identical rows, two partition counts -> two parallelism levels
    val dfN = synthAt(n)
    val dfN4 = synthAt(n4)
    dfN.count(); dfN4.count()
    def scan(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.filter(graft.expr.XmqFunctions.xmq_roundtrip_ok($"content", $"lang")).count()
      (System.nanoTime() - t0) / 1e9
    }
    scan(dfN4) // JIT warmup

    // task-CPU-time accounting: if CPU-per-row is flat across levels, the
    // payload scales linearly and any wall gap is host contention
    val cpuTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuTime.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def cpuScan(df: DataFrame): (Double, Double) = {
      cpuTime.set(0)
      val wall = scan(df)
      Thread.sleep(100) // let listener events drain
      (wall, cpuTime.get() / 1e9)
    }

    var bestN = Double.MaxValue
    var bestN4 = Double.MaxValue
    var cpuN = Double.MaxValue
    var cpuN4 = Double.MaxValue
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    for (_ <- 1 to trials) {
      val (a, ca) = cpuScan(dfN)
      val (b, cb) = cpuScan(dfN4)
      samples += ((a, b))
      if (a < bestN) bestN = a
      if (b < bestN4) bestN4 = b
      if (ca < cpuN) cpuN = ca
      if (cb < cpuN4) cpuN4 = cb
    }
    val rN = rows / bestN
    val rN4 = rows / bestN4
    val eff = rN4 / (4.0 * rN)

    val sampleStr = samples.map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    println(s"""{"metric":"scaling","rows":$rows,"n":$n,"n4":$n4,"trials":$trials,""" +
      s""""best_secs_n":$bestN,"best_secs_4n":$bestN4,""" +
      s""""rows_per_sec_n":$rN,"rows_per_sec_4n":$rN4,""" +
      s""""scaling_efficiency":$eff,""" +
      s""""cpu_secs_n":$cpuN,"cpu_secs_4n":$cpuN4,""" +
      s""""cpu_per_row_ratio":${cpuN4 / cpuN},"samples":$sampleStr}""")
    spark.stop()
  }
}
