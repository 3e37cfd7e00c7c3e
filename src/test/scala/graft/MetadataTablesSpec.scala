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
}
