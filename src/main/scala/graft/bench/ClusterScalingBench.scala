package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-JVM N-vs-4N scaling evidence (north_rule hard gate: wall-clock
  * throughput efficiency >= 0.8 from N to 4N executors).
  *
  * Run via spark-submit with a local-cluster master, which spawns SEPARATE
  * EXECUTOR JVMs (own heaps, own GC) — removing the shared-GC/allocator
  * artifact that depressed round-1's single-JVM local[N] wall numbers:
  *
  * {{{
  * sbt package
  * /opt/spark/bin/spark-submit --master 'local-cluster[2,4,3072]' \
  *   --class graft.bench.ClusterScalingBench target/scala-2.13/xmqspark_2.13-0.1.0.jar 200000 3
  * /opt/spark/bin/spark-submit --master 'local-cluster[8,4,3072]' \
  *   --class graft.bench.ClusterScalingBench target/scala-2.13/xmqspark_2.13-0.1.0.jar 200000 3
  * }}}
  *
  * Payload: the xmq round-trip verification scan (parse + reprint + compare
  * every synthesized source file) — the engine's headline per-row transform;
  * embarrassingly parallel, no shuffle, the shape that must scale linearly.
  * Prints one JSON line with cores and best-of-k rows/sec.
  */
object ClusterScalingBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val trials = if (args.length > 1) args(1).toInt else 3

    val expectCores = if (args.length > 2) args(2).toInt else 0

    val spark = SparkSession.builder().appName("graft-cluster-scaling").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // wait for executor registration (defaultParallelism is 2 until the
    // standalone workers connect)
    val deadline = System.nanoTime() + 120L * 1000000000L
    while (expectCores > 0 && spark.sparkContext.defaultParallelism < expectCores &&
           System.nanoTime() < deadline) Thread.sleep(200)
    val cores = spark.sparkContext.defaultParallelism

    val nRepos = math.max(4, math.sqrt(rows.toDouble).toInt)
    // enough partitions that every core has several waves; generation is a
    // pure function of (seed, idx) so the data is identical at every size.
    // An explicit 4th arg FIXES the partition count so the N and 4N runs
    // share the exact same data layout (and per-partition unroll size —
    // cores*4 partitions at 10M rows OOM the small-N executors)
    val parts = if (args.length > 3) args(3).toInt else cores * 4
    val df: DataFrame = spark.range(rows).repartition(parts).as[java.lang.Long]
      .mapPartitions(_.map(id => graft.synth.SourceFiles.row(42L, Long2long(id), nRepos)))
      .toDF().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize on the executors before timing

    // task-metric accounting: CPU and GC time per scan tell apart real work,
    // GC churn, and host contention when reading the wall numbers
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
          gcMs.addAndGet(te.taskMetrics.jvmGCTime)
        }
    })

    def timed(payload: () => Unit): (Double, Double, Double) = {
      cpuNs.set(0); gcMs.set(0)
      val t0 = System.nanoTime()
      payload()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // listener drain
      (secs, cpuNs.get() / 1e9, gcMs.get() / 1e3)
    }

    // payload 1: the xmq round-trip verification scan (no shuffle)
    def scan(): (Double, Double, Double) = timed { () =>
      val ok = df.filter(graft.expr.XmqFunctions.xmq_roundtrip_ok($"content", $"lang")).count()
      require(ok == rows, s"round-trip invariant broken: $ok != $rows")
    }

    // payload 2: a WIDE shuffle — near-unique (repo, path, commit) keys mean
    // the map-side partial cannot reduce, so ~all rows cross the exchange
    // (key strings + hash ≈ 150-200 B/row; at 10M rows the shuffle working
    // set is GBs, far past any LLC — the r4 #8 regime)
    def shuffle(): (Double, Double, Double) = timed { () =>
      val n = df.groupBy($"repo", $"path", $"commit")
        .agg(max(xxhash64($"content")).as("h"))
        // pmod keeps the consuming sum ANSI-safe (raw xxhash64 sums overflow)
        .agg(count(lit(1)), sum(pmod($"h", lit(1000000007L)))).head().getLong(0)
      require(n > 0)
    }

    def series(name: String, payload: () => (Double, Double, Double)): String = {
      payload(); payload() // JIT warmup on every executor JVM
      var best = (Double.MaxValue, 0.0, 0.0)
      val all = (1 to trials).map { _ =>
        val s = payload()
        if (s._1 < best._1) best = s
        s
      }
      s""""${name}rows_per_sec":${rows / best._1},"${name}best_secs":${best._1},""" +
        s""""${name}best_cpu_secs":${best._2},"${name}best_gc_secs":${best._3},""" +
        s""""${name}trials":[${all.map(_._1).mkString(",")}],""" +
        s""""${name}cpu":[${all.map(_._2).mkString(",")}],""" +
        s""""${name}gc":[${all.map(_._3).mkString(",")}]"""
    }

    // 5th arg selects payloads (both|scan|shuffle): a shuffle-only pair is
    // short enough to land entirely inside one quiet gap on the shared host
    val which = if (args.length > 4) args(4) else "both"
    val parts0 = Seq(
      "scan" -> (() => series("", scan)),
      "shuffle" -> (() => series("shuffle_", shuffle)))
      .filter { case (n, _) => which == "both" || which == n }
      .map(_._2())
    println(s"""{"bench":"cluster_scaling","cores":$cores,"rows":$rows,""" +
      parts0.mkString(",") + "}")
    spark.stop()
  }
}
