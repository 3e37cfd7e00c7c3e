package graft

import graft.lake.{GraftTable, MorDelete, MorUpdate}
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** CDC upsert-mode writes (MorUpdate.upsertBatch / upsertSink): retract-by-
  * key + insert in one merge-on-read snapshot — latest version per key wins
  * across batches, pure inserts leave no pending-delete state, counts stay
  * exact, materialization converges to the same rowset, and the foreachBatch
  * adapter never applies an epoch twice. */
class UpsertSpec extends SparkTestBase {

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  private def keyset(t: GraftTable): Set[(String, String, String, String)] = {
    import spark.implicits._
    t.scan().select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256))
      .as[(String, String, String, String)].collect().toSet
  }

  test("pure-insert upsert commits as a plain append, no pending deletes") {
    val t = new GraftTable(spark, Files.createTempDirectory("ups-ins").toString)
    val r = MorUpdate.upsertBatch(t, synthDf(50))
    assert(r.inserted == 50L && r.retracted == 0L)
    assert(!t.hasPendingDeletes, "no key matched — no eqdel shard may exist")
    assert(t.scan().count() == 50)
    // second disjoint batch: still no delete state
    val more = synthDf(10, seed = 7).withColumn("path", concat(lit("x/"), col("path")))
    MorUpdate.upsertBatch(t, more)
    assert(!t.hasPendingDeletes && t.scan().count() == 60)
    assert(t.currentSnapshot.get.recordCount == 60L)
  }

  test("overlapping upsert: latest row per key wins; counts exact; time travel intact") {
    val t = new GraftTable(spark, Files.createTempDirectory("ups-ovl").toString)
    val base = synthDf(40)
    t.append(base)
    val v1 = t.currentVersion
    // update 15 existing keys with new content + insert 5 fresh keys
    val changed = base.limit(15)
      .withColumn("content", concat(lit("v2 "), col("content")))
    val fresh = synthDf(5, seed = 9).withColumn("path", concat(lit("new/"), col("path")))
    val r = MorUpdate.upsertBatch(t, changed.unionByName(fresh))
    assert(r.inserted == 20L && r.retracted == 15L)
    assert(t.hasPendingDeletes)
    assert(t.scan().count() == 45)
    assert(t.currentSnapshot.get.recordCount == 45L)
    val expect = keysetOf(base.join(changed.select("repo", "path", "commit"),
        Seq("repo", "path", "commit"), "left_anti")
      .unionByName(changed).unionByName(fresh))
    assert(keyset(t) == expect)
    // the pre-upsert snapshot still reads the old values
    val old = spark.read.format("graft").option("snapshot", v1).load(t.location)
    assert(old.count() == 40)
    assert(old.filter(col("content").startsWith("v2 ")).count() == 0)
  }

  test("stacked upserts on the same key: the newest batch wins (sequence rule)") {
    val t = new GraftTable(spark, Files.createTempDirectory("ups-stack").toString)
    val base = synthDf(10)
    t.append(base)
    val k = base.limit(1)
    MorUpdate.upsertBatch(t, k.withColumn("content", lit("gen2")))
    MorUpdate.upsertBatch(t, k.withColumn("content", lit("gen3")))
    assert(t.scan().count() == 10)
    val hit = t.scan().join(k.select("repo", "path", "commit"),
      Seq("repo", "path", "commit")).select("content").collect()
    assert(hit.map(_.getString(0)).toSeq == Seq("gen3"))
    // materialization converges to the same rowset and keeps the count
    val before = keyset(t)
    MorDelete.applyDeletes(t)
    assert(!t.hasPendingDeletes)
    assert(keyset(t) == before)
    assert(t.currentSnapshot.get.recordCount == 10L)
  }

  test("upsertSink: a replayed epoch is not applied twice") {
    val loc = Files.createTempDirectory("ups-sink").toString
    val t = new GraftTable(spark, loc)
    val sink = MorUpdate.upsertSink(loc, "cdc-test")
    val b0 = synthDf(20)
    sink(b0, 0L)
    assert(t.scan().count() == 20)
    sink(b0, 0L) // sink-side recovery re-runs the last epoch
    assert(t.scan().count() == 20, "replayed epoch must commit nothing")
    assert(t.currentVersion == 1L)
    // the next epoch updates 5 keys and applies once
    val b1 = b0.limit(5).withColumn("content", concat(lit("e1 "), col("content")))
    sink(b1, 1L)
    sink(b1, 1L)
    assert(t.scan().count() == 20)
    assert(t.scan().filter(col("content").startsWith("e1 ")).count() == 5)
    assert(t.currentVersion == 2L)
  }

  test("upsert through a real MemoryStream via foreachBatch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val loc = Files.createTempDirectory("ups-stream").toString
    val t = new GraftTable(spark, loc)
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(String, String, String, String, String)]
    val q = stream.toDF()
      .toDF("repo", "path", "commit", "lang", "content")
      .writeStream
      .foreachBatch(MorUpdate.upsertSink(loc, "cdc-mem"))
      .option("checkpointLocation", s"$loc-ckpt")
      .start()
    try {
      stream.addData(("r1", "a.txt", "c0", "scala", "one"),
                     ("r1", "b.txt", "c0", "scala", "two"))
      q.processAllAvailable()
      stream.addData(("r1", "a.txt", "c0", "scala", "one-v2"),
                     ("r1", "c.txt", "c0", "scala", "three"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = t.scan().select("path", "content").as[(String, String)]
      .collect().toMap
    assert(rows == Map("a.txt" -> "one-v2", "b.txt" -> "two", "c.txt" -> "three"))
    assert(t.currentSnapshot.get.recordCount == 3L)
  }

  test("changelog expresses an upsert as delete records + inserts from one commit") {
    import spark.implicits._
    val t = new GraftTable(spark, Files.createTempDirectory("ups-cdf").toString)
    val base = synthDf(20)
    t.append(base)                                            // v1
    val changed = base.limit(3)
      .withColumn("content", concat(lit("v2 "), col("content")))
    MorUpdate.upsertBatch(t, changed)                         // v2
    val cdf = t.changelogScan(1)
    val byType = cdf.groupBy($"_change_type").count().as[(String, Long)]
      .collect().toMap
    assert(byType == Map("delete" -> 3L, "insert" -> 3L))
    // both sides of the change carry the SAME commit version (atomicity in
    // the feed) and the same keys
    assert(cdf.select($"_commit_version").distinct().as[Long].collect().toSeq == Seq(2L))
    val delKeys = cdf.filter($"_change_type" === "delete")
      .select("repo", "path", "commit").as[(String, String, String)].collect().toSet
    val insKeys = cdf.filter($"_change_type" === "insert")
      .select("repo", "path", "commit").as[(String, String, String)].collect().toSet
    assert(delKeys == insKeys)
    // a pure-insert upsert commit IS appends-only: the incremental read
    // accepts it; one with retractions is refused loudly
    val fresh = synthDf(4, seed = 11).withColumn("path", concat(lit("n/"), col("path")))
    MorUpdate.upsertBatch(t, fresh)                           // v3, no matches
    assert(t.incrementalScan(2).count() == 4)
    val e = intercept[IllegalArgumentException](t.incrementalScan(1).count())
    assert(e.getMessage.contains("appends-only"))
  }

  private def keysetOf(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256))
      .as[(String, String, String, String)].collect().toSet
  }
}
