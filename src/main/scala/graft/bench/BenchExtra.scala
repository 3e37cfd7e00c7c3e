package graft.bench

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Extra, non-contract benchmarks for the optimization rounds (guide §1.4):
  * noop-sink isolation of single queries, phase-level timing of the lake
  * maintenance build, and `.explain("formatted")` dumps for the
  * plans/r06/<query>_{before,after}.txt deliverables.
  *
  * Usage (never part of the driver contract — Bench.scala stays frozen):
  *   sbt "runMain graft.bench.BenchExtra lake"            # phase timing
  *   sbt "runMain graft.bench.BenchExtra q <name> [n]"    # noop-isolated query
  *   sbt "runMain graft.bench.BenchExtra plan <name> <out.txt>"
  */
object BenchExtra {
  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.addSparkListener(new JobTally)
    s
  }

  private val jobCount = new java.util.concurrent.atomic.AtomicInteger
  private val jobNanos = new java.util.concurrent.atomic.AtomicLong
  private val shuffleWrite = new java.util.concurrent.atomic.AtomicLong

  private final class JobTally extends org.apache.spark.scheduler.SparkListener {
    private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      starts.put(js.jobId, System.nanoTime()); jobCount.incrementAndGet(); ()
    }
    override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      Option(starts.remove(je.jobId)).foreach(t0 => jobNanos.addAndGet(System.nanoTime() - t0)); ()
    }
    override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
    }
  }

  private def time[T](label: String)(f: => T): T = {
    val (c0, n0, s0) = (jobCount.get(), jobNanos.get(), shuffleWrite.get())
    val t0 = System.nanoTime()
    val r = f
    val elapsed = (System.nanoTime() - t0) / 1e9 // before the drain sleep
    Thread.sleep(50) // let listener events drain
    println(f"[phase] $label%-40s $elapsed%8.3f s" +
      f"  jobs=${jobCount.get() - c0}%3d jobTime=${(jobNanos.get() - n0) / 1e9}%7.3f s" +
      f"  shuffleWrite=${(shuffleWrite.get() - s0) / 1024}%8d KiB")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    args.headOption.getOrElse("lake") match {
      case "lake" =>
        lakePhases(spark, sfDir); println("[phase] --- warm pass ---")
        lakePhases(spark, sfDir)
      case "q" =>
        val name = args(1)
        val n = if (args.length > 2) args(2).toInt else 1
        val fn = graft.SparkEntry.queries(name)
        (1 to n).foreach { i =>
          spark.sparkContext.setJobDescription(s"$name run $i")
          time(s"$name run $i") {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
        }
      case "plan" =>
        val name = args(1)
        val out = args(2)
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          txt.getBytes("UTF-8"))
        println(s"[plan] $name -> $out (${txt.length} bytes)")
      case "planexec" =>
        // execute (noop sink) FIRST, then dump the FINAL adaptive plan —
        // AQE runtime decisions (ReusedExchange/stage reuse, coalesced
        // reads, join rewrites) only appear post-execution
        val outDir = args(1)
        val suffix = args(2)
        val names = args.drop(3)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { name =>
          try {
            val df = graft.SparkEntry.queries(name)(spark, sfDir)
            df.collect() // executes THIS QueryExecution, finalizing AQE
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plan] $name -> $outDir/${name}_$suffix.txt (final)")
          } catch { case e: Throwable => println(s"[plan] $name FAILED: $e") }
        }
      case "plans" =>
        // dump `.explain("formatted")` for many queries into <dir>/<q>_<suffix>.txt
        val outDir = args(1)
        val suffix = args(2)
        val names = args.drop(3)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
        names.foreach { name =>
          try {
            val df = graft.SparkEntry.queries(name)(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plan] $name -> $outDir/${name}_$suffix.txt")
          } catch { case e: Throwable => println(s"[plan] $name FAILED: $e") }
        }
      case "stream" =>
        // per-microbatch duration breakdown of the q33-shaped stream
        import org.apache.spark.sql.functions.{col => c}
        val staged = java.nio.file.Files.createTempDirectory("bx-stream-in").toString
        val out = java.nio.file.Files.createTempDirectory("bx-stream-out").toString
        val ckpt = java.nio.file.Files.createTempDirectory("bx-stream-ck").toString
        val events = spark.read.parquet(s"$sfDir/events.parquet")
          .withColumn("ts", c("ts").cast("timestamp"))
        events.repartition(4).write.mode("overwrite").parquet(staged)
        val ss = spark.newSession()
        ss.conf.set("spark.sql.shuffle.partitions", "4")
        ss.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            println(s"[batch] id=${p.batchId} rows=${p.numInputRows} " +
              s"durations=${p.durationMs}")
          }
          override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        })
        val t0 = System.nanoTime()
        val stream = ss.readStream.schema(events.schema)
          .option("maxFilesPerTrigger", "1").parquet(staged)
        val agg = graft.streaming.EventStream.windowedCounts(stream)
        agg.writeStream.outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("overwrite").parquet(out))
          .start().awaitTermination()
        Thread.sleep(300)
        println(f"[stream] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
      case "mg" =>
        // pure vs mutable Misra–Gries kernel on a synthetic heavy-tail
        // stream (m and n sized like a corpus n-gram pass)
        val m = 4096
        val n = 2000000
        val rnd = new scala.util.Random(3)
        val stream = Array.fill(n) {
          val r = rnd.nextInt(1000)
          if (r < 100) s"hot_${r % 40}" else s"cold_${rnd.nextInt(500000)}"
        }
        (1 to 3).foreach { round =>
          val t0 = System.nanoTime()
          var pure = Map.empty[String, Long]
          stream.foreach(i => pure = graft.pipeline.HeavyHitters.mgReduce(pure, i, m))
          val tPure = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val mut = new java.util.HashMap[String, java.lang.Long]()
          stream.foreach(graft.pipeline.HeavyHitters.mgReduceMut(mut, _, m))
          val tMut = (System.nanoTime() - t1) / 1e9
          println(f"[mg] round $round n=$n m=$m pure=$tPure%.3f s mutable=$tMut%.3f s speedup=${tPure / tMut}%.1fx" +
            s" identical=${mut.size == pure.size}")
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }

  /** Phase-by-phase timing of the q24 lake build + scan (the single most
    * expensive bench entry), labelled per guide §1.5. */
  private def lakePhases(s: SparkSession, dir: String): Unit = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
    def shaped(df: DataFrame, v2: Boolean) = df.select(
      concat(lit("repo_"), ($"doc_id" % 10).cast("string")).as("repo"),
      concat(lit("f/"), $"doc_id".cast("string"), lit(".txt")).as("path"),
      lit("c0").as("commit"), $"lang",
      (if (v2) concat(lit("v2 "), $"text") else $"text").as("content"))
    val base = shaped(docs.filter($"doc_id" % 3 =!= 0), v2 = false)
    val source = shaped(docs.filter($"doc_id" % 5 === 0), v2 = true)
    val loc = java.nio.file.Files.createTempDirectory("graft-benchextra").toString
    val table = new graft.lake.GraftTable(s, loc)
    time("append(base repartition 8)") { table.append(base.repartition(8)) }
    time("mergeInto") { graft.lake.Maintenance.mergeInto(table, "bx", source) }
    time("compact") { graft.lake.Maintenance.compact(table, "bx",
      smallBytes = Long.MaxValue, targetBytes = 4L << 20) }
    time("cluster") { graft.lake.Maintenance.cluster(table, "bx") }
    time("rewriteManifests") { table.rewriteManifests() }
    time("expireSnapshots") { table.expireSnapshots(System.currentTimeMillis() + 1000) }
    time("scan+sha+orderBy (noop)") {
      table.scan()
        .select($"repo", $"path", $"commit", $"lang", sha2($"content", 256).as("content_sha"))
        .orderBy($"repo", $"path")
        .write.format("noop").mode("overwrite").save()
    }
  }
}
