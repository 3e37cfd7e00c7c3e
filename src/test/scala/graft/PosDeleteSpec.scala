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

  test("compactDeleteShards: k shards become one per flavor, semantics intact") {
    val t = freshTable("graft-del-compact")
    val df = synthDf(300)
    t.append(df.repartition(4))
    val repos = df.select("repo").distinct().collect().map(_.getString(0)).sorted
    // three stacked equality deletes + two positional ones
    MorDelete.deleteWhere(t, col("repo") === repos(0))
    MorDelete.deleteWhere(t, col("repo") === repos(1))
    // re-insert a deleted slice BEFORE compaction: the row-level del_seq
    // must keep protecting it through the shard merge (fixed content whose
    // length % 7 == 3 provably dodges the later predicate deletes)
    val reborn = df.filter(col("repo") === repos(0)).limit(5)
      .withColumn("content", lit("reborn!!!!"))
    t.append(reborn)
    MorDelete.deleteWhere(t, length(col("content")) % 7 === 0)
    MorDelete.deleteWherePositional(t, length(col("content")) % 7 === 1)
    MorDelete.deleteWherePositional(t, length(col("content")) % 7 === 2)
    val snap0 = t.currentSnapshot.get
    assert(t.eqDeleteShards(snap0).size == 3 && t.posDeleteShards(snap0).size == 2)
    val expected = keyset(t.scan())
    val rows = t.scan().count()

    val (eqMerged, posMerged) = MorDelete.compactDeleteShards(t)
    assert((eqMerged, posMerged) == (3, 2))
    val snap = t.currentSnapshot.get
    assert(snap.operation == "compact-deletes")
    assert(t.eqDeleteShards(snap).size == 1 && t.posDeleteShards(snap).size == 1)
    assert(snap.recordCount == snap0.recordCount)
    assert(t.scan().count() == rows)
    assert(keyset(t.scan()) == expected, "merge changed the visible row set")
    // the re-inserted slice still survives the merged equality shard
    assert(t.scan().join(reborn.select("repo", "path", "commit"),
      Seq("repo", "path", "commit"), "left_semi").count() >= 5)
    // connector read agrees, and a later materialization still works
    assert(spark.read.format("graft").load(t.location).count() == rows)
    MorDelete.applyDeletes(t)
    assert(!t.hasPendingDeletes)
    assert(keyset(t.scan()) == expected)
    // no-op when already compact
    assert(MorDelete.compactDeleteShards(t) == (0, 0))
  }

  test("CALL compact_delete_shards through SQL") {
    val wh = Files.createTempDirectory("graft-del-compact-sql").toString
    val cat = "gdc" + (System.nanoTime() % 100000)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.lake.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(100))
    MorDelete.deleteWherePositional(t, length(col("content")) % 3 === 0)
    MorDelete.deleteWherePositional(t, length(col("content")) % 3 === 1)
    val before = t.scan().count()
    val r = spark.sql(s"CALL $cat.system.compact_delete_shards(`table` => 'ns.t')").head()
    assert(r.getInt(0) == 0 && r.getInt(1) == 2)
    assert(t.scan().count() == before)
  }

  test("a table LOCATION ending in /data keeps addresses consistent") {
    // the degenerate layout ".../data/data/<batch>/" — the address
    // representation must agree between the library write path
    // (relFileCol), the connector probe (GraftPosDeletes.relOf) and the
    // manifest (LakeIO.relativize), or deletes silently vanish
    val base = Files.createTempDirectory("graft-pos-datadir")
    val t = new GraftTable(spark, base.resolve("data").toString)
    val df = synthDf(120)
    t.append(df.repartition(3))
    val repo = df.select("repo").head().getString(0)
    val expectDeleted = df.filter(col("repo") === repo).count()
    val n = MorDelete.deleteWherePositional(t, col("repo") === repo)
    assert(n == expectDeleted)
    // the shard's file_path matches the manifest's representation exactly
    import spark.implicits._
    val shardPaths = t.posDeleteKeys(t.currentSnapshot.get)
      .select("file_path").distinct().as[String].collect().toSet
    val manifestPaths = t.manifest(t.currentSnapshot.get)
      .select("file_path").as[String].collect().toSet
    assert(shardPaths.subsetOf(manifestPaths),
      s"address paths not in manifest representation: ${shardPaths -- manifestPaths}")
    // both read paths apply the deletes
    assert(t.scan().filter(col("repo") === repo).count() == 0)
    assert(spark.read.format("graft").load(t.location)
      .filter(col("repo") === repo).count() == 0)
    // and materialization actually applies them (the semi-join must match)
    val r = MorDelete.applyDeletes(t)
    assert(r.affectedFiles > 0, "materialization found no affected files")
    assert(t.scan().count() == 120 - expectDeleted)
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
