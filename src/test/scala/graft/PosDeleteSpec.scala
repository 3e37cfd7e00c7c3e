package graft

import graft.lake.{GraftTable, Maintenance, MorDelete}
import graft.synth.SourceFiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import java.nio.file.Files

/** MERGE-ON-READ positional deletes: (file, row-ordinal) address shards,
  * read-time application on library scans AND the DSv2 connector, physical
  * re-insert immunity (no sequence rule needed), joint materialization with
  * equality deletes, and full-row recovery in the change-data-feed. */
class PosDeleteSpec extends SparkTestBase {

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

  test("positional delete removes matching rows without touching data files") {
    val t = freshTable("graft-pos")
    val df = synthDf(400)
    t.append(df.repartition(8))
    val filesBefore = t.manifest(t.currentSnapshot.get)
      .select("file_path").collect().map(_.getString(0)).toSet
    val repo = df.select("repo").head().getString(0)
    val expectDeleted = df.filter(col("repo") === repo).count()
    assert(expectDeleted > 0)

    val matched = MorDelete.deleteWherePositional(t,
      Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repo)))
    assert(matched == expectDeleted)

    val snap = t.currentSnapshot.get
    assert(snap.operation == "mor-posdelete")
    assert(t.hasPosDeletes(snap) && !t.hasEqDeletes(snap))
    val filesAfter = t.manifest(snap)
      .select("file_path").collect().map(_.getString(0)).toSet
    assert(filesAfter == filesBefore, "positional delete must not rewrite data files")
    assert(t.scan().filter(col("repo") === repo).count() == 0)
    assert(keyset(t.scan()) == keyset(df.filter(col("repo") =!= repo)))
    assert(snap.recordCount == 400 - expectDeleted)
  }

  test("re-inserted keys survive by construction (addresses bind to files)") {
    val t = freshTable("graft-pos-reinsert")
    val df = synthDf(200)
    t.append(df)
    val repo = df.select("repo").head().getString(0)
    val slice = df.filter(col("repo") === repo)
    val n = MorDelete.deleteWherePositional(t, col("repo") === repo)
    assert(n == slice.count())
    assert(t.scan().filter(col("repo") === repo).count() == 0)
    // re-append the SAME keys: new physical files, untouched by the
    // pending addresses — no sequence machinery involved
    t.append(slice)
    assert(t.scan().filter(col("repo") === repo).count() == n)
    assert(keyset(t.scan()) == keyset(df))
  }

  test("stacked positional deletes never double-count; empty match commits nothing") {
    val t = freshTable("graft-pos-stack")
    t.append(synthDf(150))
    val v1 = t.currentVersion
    val first = MorDelete.deleteWherePositional(t, length(col("content")) % 3 === 0)
    assert(first > 0)
    // the same predicate again matches nothing (pending deletes applied
    // before matching) — and commits nothing
    val v2 = t.currentVersion
    assert(MorDelete.deleteWherePositional(t, length(col("content")) % 3 === 0) == 0)
    assert(t.currentVersion == v2)
    assert(v2 == v1 + 1)
    assert(t.currentSnapshot.get.recordCount == 150 - first)
    assert(t.scan().count() == 150 - first)
  }

  test("DSv2 connector applies positional deletes per task; agg pushdown disabled") {
    val t = freshTable("graft-pos-dsv2")
    val df = synthDf(300)
    t.append(df.repartition(4))
    val repo = df.select("repo").head().getString(0)
    MorDelete.deleteWherePositional(t, col("repo") === repo)
    val expect = df.filter(col("repo") =!= repo).count()
    val read = spark.read.format("graft").load(t.location)
    assert(read.count() == expect)
    assert(read.filter(col("repo") === repo).count() == 0)
    // projection WITHOUT the key columns still position-filters (the
    // posdel-only reader must not widen its read set)
    assert(read.select("lang").count() == expect)
    // manifest counts are an upper bound under pending MoR deletes — the
    // zero-scan aggregate pushdown must refuse and take the row path
    assert(read.groupBy().count().head().getLong(0) == expect)
    // time travel to the pre-delete snapshot still sees every row
    val pre = spark.read.format("graft").option("snapshot", 1).load(t.location)
    assert(pre.count() == 300)
  }

  test("applyDeletes materializes both flavors together; row set unchanged") {
    val t = freshTable("graft-pos-apply")
    val df = synthDf(300)
    t.append(df.repartition(6))
    val repos = df.select("repo").distinct().collect().map(_.getString(0)).sorted
    val eqN = MorDelete.deleteWhere(t,
      Array[org.apache.spark.sql.sources.Filter](EqualTo("repo", repos.head)))
    val posN = MorDelete.deleteWherePositional(t, col("repo") === repos.last)
    assert(eqN > 0 && posN > 0)
    val expected = keyset(t.scan())
    val before = t.currentSnapshot.get.recordCount

    val r = MorDelete.applyDeletes(t)
    assert(r.droppedShards == 2)
    val snap = t.currentSnapshot.get
    assert(snap.operation == "apply-deletes")
    assert(!t.hasMorDeletes(snap), "both shard kinds dropped")
    assert(snap.recordCount == before, "materialization changes no live rows")
    assert(keyset(t.scan()) == expected)
    // a compaction (rewrite) now runs without the materialize guard firing
    Maintenance.compact(t, "pos-apply", smallBytes = Long.MaxValue)
    assert(keyset(t.scan()) == expected)
  }

  test("rewrites auto-materialize pending positional deletes first") {
    val t = freshTable("graft-pos-guard")
    val df = synthDf(200)
    t.append(df.repartition(4))
    MorDelete.deleteWherePositional(t, length(col("content")) % 5 === 0)
    val expected = keyset(t.scan())
    Maintenance.cluster(t, "pos-guard")
    val snap = t.currentSnapshot.get
    assert(!t.hasMorDeletes(snap))
    assert(keyset(t.scan()) == expected)
    // and rewriteManifests refuses while deletes are pending
    val t2 = freshTable("graft-pos-guard2")
    t2.append(synthDf(50))
    MorDelete.deleteWherePositional(t2, lit(true))
    val e = intercept[IllegalArgumentException] { t2.rewriteManifests() }
    assert(e.getMessage.contains("pending merge-on-read deletes"))
  }

  test("changelogScan recovers the FULL deleted rows from their addresses") {
    val t = freshTable("graft-pos-cdf")
    val df = synthDf(120)
    t.append(df)
    val v1 = t.currentVersion
    val repo = df.select("repo").head().getString(0)
    val n = MorDelete.deleteWherePositional(t, col("repo") === repo)
    val cdf = t.changelogScan(v1)
    val dels = cdf.filter(col("_change_type") === "delete")
    assert(dels.count() == n)
    // positional CDF rows carry the retracted VALUES, not just keys
    assert(dels.filter(col("content").isNull || col("lang").isNull).count() == 0)
    assert(keyset(dels.select("repo", "path", "commit", "lang", "content")) ==
      keyset(df.filter(col("repo") === repo)))
  }

  test("prunedScan applies positional deletes on the surviving files") {
    val t = freshTable("graft-pos-pruned")
    val df = synthDf(250)
    t.append(df.repartition(5))
    MorDelete.deleteWherePositional(t, length(col("content")) % 4 === 1)
    val expect = t.scan().count()
    val (pruned, total, kept) = t.prunedScan(lit(true))
    assert(kept == total)
    assert(pruned.count() == expect)
  }
}
