package graft

import graft.lake.{Delete, GraftTable, Maintenance, MorDelete, Update}
import graft.synth.SourceFiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThan, StringStartsWith}
import java.nio.file.Files

/** MERGE-ON-READ equality deletes: key-only delete commits, read-time
  * anti-join application (library scans AND the DSv2 connector), the
  * Iceberg sequence rule for re-inserts, materialization via applyDeletes,
  * and the auto-materialize guards on every copy-on-write rewrite path. */
class MorDeleteSpec extends SparkTestBase {

  private def freshTable(prefix: String): GraftTable =
    new GraftTable(spark, Files.createTempDirectory(prefix).toString)

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  private def keyset(df: DataFrame): Set[(String, String, String, String)] = {
    import spark.implicits._
    df.select(col("repo"), col("path"), col("commit"), sha2(col("content"), 256))
      .as[(String, String, String, String)].collect().toSet
  }

  test("morDelete removes matching rows without touching data files") {
    val t = freshTable("graft-mor")
    val df = synthDf(400)
    t.append(df.repartition(8))
    val filesBefore = t.manifest(t.currentSnapshot.get)
      .select("file_path").collect().map(_.getString(0)).toSet
    val repo = df.select("repo").head().getString(0)
    val expectDeleted = df.filter(col("repo") === repo).count()
    assert(expectDeleted > 0)

    val matched = MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    assert(matched == expectDeleted)

    val snap = t.currentSnapshot.get
    assert(snap.operation == "mor-delete")
    assert(t.hasEqDeletes(snap))
    // data files untouched — only metadata moved
    val filesAfter = t.manifest(snap)
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore, "MoR delete must not rewrite data files")
    // reads apply the delete
    assert(t.scan().filter(col("repo") === repo).count() == 0)
    assert(keyset(t.scan()) == keyset(df.filter(col("repo") =!= repo)))
    // arithmetic record count stays exact
    assert(snap.recordCount == 400 - expectDeleted)
  }

  test("sequence rule: a key re-appended after the delete survives reads") {
    val t = freshTable("graft-mor-seq")
    val df = synthDf(200)
    t.append(df)
    val row = df.orderBy("repo", "path", "commit").head()
    val (repo, path) = (row.getString(0), row.getString(1))
    MorDelete.deleteWhere(t,
      Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo), EqualTo("path", path)))
    assert(t.scan().filter(col("repo") === repo && col("path") === path).count() == 0)

    // re-insert the SAME key (higher add seq) — must survive the older delete
    t.append(df.filter(col("repo") === repo && col("path") === path)
      .withColumn("content", lit("<new/>")))
    val back = t.scan().filter(col("repo") === repo && col("path") === path)
    assert(back.count() == 1)
    assert(back.select("content").head().getString(0) == "<new/>")

    // and a SECOND delete of the same key (newer seq) removes the re-insert
    MorDelete.deleteWhere(t,
      Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo), EqualTo("path", path)))
    assert(t.scan().filter(col("repo") === repo && col("path") === path).count() == 0)
  }

  test("stacked deletes: matched counts never double-count; empty match commits nothing") {
    val t = freshTable("graft-mor-stack")
    val df = synthDf(300)
    t.append(df)
    val repo = df.select("repo").head().getString(0)
    val n1 = MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    val v1 = t.currentVersion
    // same predicate again: every match is already deleted — no new commit
    val n2 = MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    assert(n1 > 0 && n2 == 0)
    assert(t.currentVersion == v1, "an empty MoR delete must not commit")
    assert(t.currentSnapshot.get.recordCount == 300 - n1)
  }

  test("time travel through the connector sees pre-delete rows; post-delete reads don't") {
    val t = freshTable("graft-mor-tt")
    val df = synthDf(250)
    t.append(df)
    val vBefore = t.currentVersion
    val repo = df.select("repo").head().getString(0)
    MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))

    val pre = spark.read.format("graft").option("snapshot", vBefore).load(t.location)
    assert(pre.filter(col("repo") === repo).count() > 0)
    val post = spark.read.format("graft").load(t.location)
    assert(post.filter(col("repo") === repo).count() == 0)
    assert(keyset(post) == keyset(df.filter(col("repo") =!= repo)))
  }

  test("DSv2 read with pending deletes: projection without key columns still filters; agg pushdown disabled") {
    val t = freshTable("graft-mor-dsv2")
    val df = synthDf(300, seed = 7)
    t.append(df)
    val repo = df.select("repo").head().getString(0)
    val deleted = MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))

    val r = spark.read.format("graft").load(t.location)
    // content-only projection: the reader must fetch the key columns itself
    assert(r.select("content").count() == 300 - deleted)
    // count(*) must NOT be answered from manifest stats (they over-count)
    val cnt = r.agg(count(lit(1))).head().getLong(0)
    assert(cnt == 300 - deleted)
    val plan = r.groupBy().agg(count(lit(1))).queryExecution.executedPlan.toString
    assert(!plan.contains("GraftAggScan"),
      "aggregate pushdown must be disabled while MoR deletes are pending")
  }

  test("applyDeletes materializes: row set unchanged, eqdel shards gone, only affected files rewritten") {
    val t = freshTable("graft-mor-apply")
    import spark.implicits._
    val df = synthDf(400, seed = 11)
    // range-partition on repo so most files are repo-pure → untouched files exist
    t.append(df.repartitionByRange(8, $"repo"))
    val repo = df.select("repo").orderBy("repo").head().getString(0)
    MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    val expected = keyset(t.scan())
    val rcBefore = t.currentSnapshot.get.recordCount
    val filesBefore = t.manifest(t.currentSnapshot.get)
      .select("file_path").collect().map(_.getString(0)).toSet

    val res = MorDelete.applyDeletes(t)
    assert(res.droppedShards == 1)
    assert(res.affectedFiles > 0 && res.untouchedFiles > 0,
      s"expected a partial rewrite, got $res")
    val snap = t.currentSnapshot.get
    assert(snap.operation == "apply-deletes")
    assert(!t.hasEqDeletes(snap))
    assert(snap.recordCount == rcBefore, "materialization must not change the live count")
    assert(keyset(t.scan()) == expected, "materialization changed the row set")
    val filesAfter = t.manifest(snap).select("file_path").collect().map(_.getString(0)).toSet
    assert((filesBefore intersect filesAfter).size == res.untouchedFiles)
    // idempotent no-op when nothing is pending
    assert(MorDelete.applyDeletes(t) == MorDelete.ApplyResult(0, 0, 0))
  }

  test("CoW rewrite paths auto-materialize pending deletes") {
    import spark.implicits._
    // compact
    val t1 = freshTable("graft-mor-compact")
    val df = synthDf(300, seed = 5)
    t1.append(df.repartition(12))
    val repo = df.select("repo").head().getString(0)
    MorDelete.deleteWhere(t1, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    val expect1 = keyset(t1.scan())
    Maintenance.compact(t1, "mj1", smallBytes = Long.MaxValue, targetBytes = 1L << 20)
    assert(!t1.hasPendingDeletes)
    assert(keyset(t1.scan()) == expect1)

    // update
    val t2 = freshTable("graft-mor-update")
    t2.append(df)
    MorDelete.deleteWhere(t2, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    val survivors = t2.scan().count()
    Update.updateWhere(t2, Array[org.apache.spark.sql.sources.Filter](StringStartsWith("path", "src/")),
      Map("commit" -> lit("c9")))
    assert(!t2.hasPendingDeletes)
    assert(t2.scan().count() == survivors)
    assert(t2.scan().filter(col("repo") === repo).count() == 0)

    // CoW delete on top of a pending MoR delete
    val t3 = freshTable("graft-mor-cowdel")
    t3.append(df)
    MorDelete.deleteWhere(t3, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    val before = keyset(t3.scan())
    Delete.deleteWhere(t3, Array[org.apache.spark.sql.sources.Filter](LessThan("path", "a")))
    assert(!t3.hasPendingDeletes)
    assert(keyset(t3.scan()) == before.filterNot(_._2 < "a"))
  }

  test("rewriteManifests refuses pending deletes; incremental/stream read refuses a mor-delete range") {
    val t = freshTable("graft-mor-guard")
    val df = synthDf(150)
    t.append(df)
    val v1 = t.currentVersion
    val repo = df.select("repo").head().getString(0)
    MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    assertThrows[IllegalArgumentException](t.rewriteManifests())
    assertThrows[IllegalArgumentException](t.incrementalScan(v1 - 1).count())
    // materialize → rewrite proceeds
    MorDelete.applyDeletes(t)
    t.rewriteManifests()
    assert(keyset(t.scan()) == keyset(df.filter(col("repo") =!= repo)))
  }

  test("changelogScan: appends become inserts, mor-deletes become key delete rows, rewrites contribute nothing") {
    import spark.implicits._
    val t = freshTable("graft-cdf")
    val df = synthDf(200, seed = 31)
    val (a, b) = (df.filter($"path" < "src/"), df.filter($"path" >= "src/"))
    val (na, nb) = (a.count(), b.count())
    assert(na > 0 && nb > 0)
    t.append(a)                                     // v1 inserts
    t.append(b)                                     // v2 inserts
    val repo = df.select("repo").head().getString(0)
    val deleted = MorDelete.deleteWhere(t,
      Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))    // v3: deletes
    Maintenance.compact(t, "cdf1", smallBytes = Long.MaxValue)
    // compact auto-materialized (v4 apply-deletes) then compacted (v5):
    // both rowset-preserving — the changelog must skip them
    val cl = t.changelogScan(0L).cache()
    assert(cl.filter($"_change_type" === "insert" && $"_commit_version" === 1).count() == na)
    assert(cl.filter($"_change_type" === "insert" && $"_commit_version" === 2).count() == nb)
    val dels = cl.filter($"_change_type" === "delete")
    assert(dels.count() == deleted)
    assert(dels.select("_commit_version").distinct().head().getLong(0) == 3)
    assert(dels.filter($"lang".isNotNull || $"content".isNotNull).count() == 0)
    // a partial range sees only its slice
    assert(t.changelogScan(1L, 2L).count() == nb)
    // replaying the changelog reproduces the live row set
    val replayed = cl.filter($"_change_type" === "insert")
      .join(cl.filter($"_change_type" === "delete"), Seq("repo", "path", "commit"), "left_anti")
    assert(keyset(replayed.select("repo", "path", "commit", "lang", "content")) == keyset(t.scan()))
    // a CoW rewrite in range refuses loudly
    Update.updateWhere(t, Array[org.apache.spark.sql.sources.Filter](
      StringStartsWith("path", "src/")), Map("commit" -> lit("c8")))
    assertThrows[IllegalArgumentException](t.changelogScan(0L).count())
    cl.unpersist()
  }

  test("prunedScan applies pending deletes on the surviving files") {
    val t = freshTable("graft-mor-pruned")
    import spark.implicits._
    val df = synthDf(400, seed = 23)
    t.append(df.repartitionByRange(8, $"repo"))
    val repos = df.select("repo").distinct().orderBy("repo").as[String].collect()
    val (delRepo, scanRepo) = (repos.head, repos.head) // delete inside the scanned slice
    MorDelete.deleteWhere(t, Array[org.apache.spark.sql.sources.Filter](
      EqualTo("repo", delRepo), StringStartsWith("path", "src/")))
    val (scanDf, total, kept) = t.prunedScan(
      col("min_repo") <= scanRepo && col("max_repo") >= scanRepo)
    assert(kept < total, "pruning must exclude repo-pure files of other repos")
    val got = keyset(scanDf.filter(col("repo") === scanRepo))
    val want = keyset(df.filter(col("repo") === scanRepo && !col("path").startsWith("src/")))
    assert(got == want)
  }
}
