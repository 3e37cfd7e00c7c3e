package graft

import graft.lake.{GraftTable, Maintenance}
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Iceberg-style metadata tables: `cat.ns.t.snapshots|files|tags` in SQL and
  * `.option("metadata", kind)` through the path connector. `files` must stay
  * a distributed derivation (V1 bridge) and honor snapshot pins. */
class MetadataTablesSpec extends SparkTestBase {

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  test("snapshots / files / tags resolve as SQL suffix tables through the catalog") {
    val wh = Files.createTempDirectory("meta-sql").toString
    spark.conf.set("spark.sql.catalog.mcat", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE mcat.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(60).repartition(3))
    val v1 = t.currentVersion
    t.setTag("rel", v1)
    t.append(synthDf(20, seed = 7).repartition(2))

    val snaps = spark.sql(
      "SELECT version, operation, is_current FROM mcat.ns.t.snapshots ORDER BY version")
      .collect()
    assert(snaps.length == 2)
    assert(snaps.forall(_.getString(1) == "append"))
    assert(snaps.map(r => r.getLong(0) -> r.getBoolean(2)).toSeq ==
      Seq(v1 -> false, t.currentVersion -> true))

    // files: the live manifest — counts must reconcile with the data itself
    val files = spark.sql("SELECT record_count, file_bytes FROM mcat.ns.t.files").collect()
    assert(files.map(_.getLong(0)).sum == 80)
    assert(files.forall(_.getLong(1) > 0))
    assert(files.length ==
      t.manifest(t.currentSnapshot.get).count())

    val tags = spark.sql("SELECT tag, version FROM mcat.ns.t.tags").collect()
    assert(tags.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("rel" -> v1))
  }

  test("files is time-travelable and the connector option serves all kinds") {
    val t = new GraftTable(spark, Files.createTempDirectory("meta-opt").toString)
    t.append(synthDf(50).repartition(5))
    val v1 = t.currentVersion
    val filesBefore = spark.read.format("graft")
      .option("metadata", "files").load(t.location).count()
    assert(filesBefore == 5)

    // compaction rewrites the layout; current files change, pinned don't
    Maintenance.compact(t, "meta", smallBytes = Long.MaxValue, targetBytes = 64L << 20)
    val cur = spark.read.format("graft").option("metadata", "files").load(t.location)
    assert(cur.count() < filesBefore)
    assert(cur.agg(sum("record_count")).head().getLong(0) == 50)
    val pinned = spark.read.format("graft")
      .option("metadata", "files").option("snapshot", v1).load(t.location)
    assert(pinned.count() == filesBefore)

    val snaps = spark.read.format("graft")
      .option("metadata", "snapshots").load(t.location).collect()
    assert(snaps.map(_.getAs[String]("operation")).toSeq == Seq("append", "compact"))
    assert(spark.read.format("graft").option("metadata", "tags").load(t.location).isEmpty)
  }

  test("SQL VERSION AS OF on files resolves snapshots and tags; plan stays distributed") {
    val wh = Files.createTempDirectory("meta-tt").toString
    spark.conf.set("spark.sql.catalog.mtt", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mtt.warehouse", wh)
    spark.sql("CREATE NAMESPACE mtt.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(40).repartition(4))
    t.setTag("first", t.currentVersion)
    Maintenance.compact(t, "mtt", smallBytes = Long.MaxValue, targetBytes = 64L << 20)

    val curN = spark.sql("SELECT count(*) FROM mtt.ns.t.files").head().getLong(0)
    val oldN = spark.sql(
      "SELECT count(*) FROM mtt.ns.t.files VERSION AS OF 'first'").head().getLong(0)
    assert(oldN == 4 && curN < oldN)

    // the live-manifest derivation must not be a LocalScan (driver array):
    // it plans through the V1 bridge as a real distributed scan
    val plan = spark.sql("SELECT * FROM mtt.ns.t.files").queryExecution
      .executedPlan.toString
    assert(!plan.contains("LocalTableScan"), s"files collapsed to a driver scan:\n$plan")
  }

  test("a genuine data table named `files` shadows the metadata suffix") {
    val wh = Files.createTempDirectory("meta-shadow").toString
    spark.conf.set("spark.sql.catalog.msh", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.msh.warehouse", wh)
    spark.sql("CREATE NAMESPACE msh.t")
    val shadow = new GraftTable(spark, s"$wh/t/files")
    shadow.append(synthDf(12))
    assert(spark.sql("SELECT count(*) FROM msh.t.files").head().getLong(0) == 12)
  }

  test("history: linear main stays all-ancestor; branch commits are off-ancestry") {
    val wh = Files.createTempDirectory("meta-hist").toString
    spark.conf.set("spark.sql.catalog.hcat", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.hcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE hcat.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(30))                                      // v1
    t.append(synthDf(10, seed = 7)
      .withColumn("path", concat(lit("bad/"), col("path"))))   // v2 (bad)
    t.rollback(1)                                              // v3
    t.createBranch("wip")
    t.forBranch("wip").append(synthDf(10, seed = 9)
      .withColumn("path", concat(lit("wip/"), col("path"))))   // v4 (branch)
    t.append(synthDf(5, seed = 11)
      .withColumn("path", concat(lit("more/"), col("path"))))  // v5 (main)
    val hist = spark.sql(
      "SELECT version, operation, is_current_ancestor FROM hcat.ns.t.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(hist.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // main's causality is LINEAR (rollback is a new commit on the same
    // line, v2 stays an ancestor even though its rows are gone); the only
    // off-ancestry snapshot is the unpublished branch commit v4
    assert(hist.filter(!_._3).map(_._1).toSeq == Seq(4L))
    assert(hist.find(_._1 == 3L).get._2 == "rollback-to-v1")
    // every row carries a made_current_at timestamp
    assert(spark.sql("SELECT count(*) FROM hcat.ns.t.history WHERE made_current_at > 0")
      .head().getLong(0) == 5)
  }

  test("column_stats surfaces the committed ANALYZE result") {
    val wh = Files.createTempDirectory("meta-cstats").toString
    spark.conf.set("spark.sql.catalog.ccat", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ccat.warehouse", wh)
    spark.sql("CREATE NAMESPACE ccat.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(200))
    // never analyzed → empty, not an error
    assert(spark.sql("SELECT * FROM ccat.ns.t.column_stats").count() == 0)
    Maintenance.analyze(t, Seq("repo", "lang"), k = 512)
    val rows = spark.sql(
      "SELECT column, ndv, null_count, stats_version, row_count " +
      "FROM ccat.ns.t.column_stats ORDER BY column").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("lang", "repo"))
    assert(rows.forall(r => r.getLong(3) == t.currentVersion && r.getLong(4) == 200L))
    val exact = t.scan().select(countDistinct(col("repo")), countDistinct(col("lang"))).head()
    assert(rows.find(_.getString(0) == "repo").get.getLong(1) == exact.getLong(0))
    assert(rows.find(_.getString(0) == "lang").get.getLong(1) == exact.getLong(1))
  }
}
