package graft

import graft.lake.GraftTable
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SQL maintenance procedures (`CALL cat.system.proc(...)`) — the
  * orchestrator surface: compaction, expiry, rollback and tags runnable as
  * plain SQL, each returning its summary row, with the table fully
  * queryable throughout (ordinary commit protocol underneath). */
class SqlProceduresSpec extends SparkTestBase {

  private var catN = 0
  private def freshSqlTable(n: Int): (String, GraftTable) = {
    catN += 1
    val cat = s"pcat$catN"
    val wh = Files.createTempDirectory(s"graft-proc-$catN").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.lake.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    import spark.implicits._
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(SourceFiles.generate(n, 42).toDF().repartition(8))
    (cat, t)
  }

  test("CALL compact: bin-packs small files, returns the summary row") {
    val (cat, t) = freshSqlTable(120)
    val before = t.currentSnapshot.get.fileCount
    val r = spark.sql(
      s"CALL $cat.system.compact(`table` => 'ns.t', small_mb => 8, target_mb => 64)")
    assert(r.schema.fieldNames.toSeq == Seq("input_files", "output_files", "rows"))
    val row = r.head()
    assert(row.getInt(0) == before, "all 8 small files are compaction input")
    assert(row.getInt(1) < row.getInt(0))
    assert(row.getLong(2) == 120L)
    assert(t.currentSnapshot.get.fileCount < before)
    assert(t.scan().count() == 120)
  }

  test("CALL rollback + expire_snapshots: versions via SQL only") {
    val (cat, t) = freshSqlTable(40)
    val v1 = t.currentVersion
    import spark.implicits._
    t.append(SourceFiles.generate(10, 7).toDF())
    assert(t.scan().count() == 50)

    val rb = spark.sql(s"CALL $cat.system.rollback(`table` => 'ns.t', version => $v1)").head()
    assert(rb.getLong(0) == t.currentVersion)
    assert(t.scan().count() == 40, "rollback made v1's rowset current")

    // expire everything but the current snapshot
    val ex = spark.sql(
      s"CALL $cat.system.expire_snapshots(`table` => 'ns.t', older_than_ms => ${System.currentTimeMillis() + 60000})").head()
    assert(ex.getInt(0) >= 2, "v1 and the orphaned append line expired")
    assert(t.scan().count() == 40, "current rowset intact after expiry")
  }

  test("CALL set_tag / drop_tag: tags via SQL, readable as VERSION AS OF") {
    val (cat, t) = freshSqlTable(30)
    val v1 = t.currentVersion
    import spark.implicits._
    t.append(SourceFiles.generate(15, 9).toDF())

    spark.sql(s"CALL $cat.system.set_tag(`table` => 'ns.t', tag => 'audit', version => $v1)")
    assert(t.tags == Map("audit" -> v1))
    assert(spark.sql(s"SELECT * FROM $cat.ns.t VERSION AS OF 'audit'").count() == 30)

    val d = spark.sql(s"CALL $cat.system.drop_tag(`table` => 'ns.t', tag => 'audit')").head()
    assert(d.getString(0) == "audit" && t.tags.isEmpty)
  }

  test("CALL rewrite_manifests and remove_orphan_files run through SQL") {
    val (cat, t) = freshSqlTable(40)
    val rw = spark.sql(s"CALL $cat.system.rewrite_manifests(`table` => 'ns.t')").head()
    assert(rw.getLong(0) == t.currentVersion)
    assert(t.scan().count() == 40)

    // plant aged crash debris, sweep it via SQL
    t.io.writeString("data/b-dead/debris.parquet", "junk")
    val old = new java.io.File(t.location, "data/b-dead/debris.parquet")
    old.setLastModified(System.currentTimeMillis() - 7200 * 1000)
    val or = spark.sql(
      s"CALL $cat.system.remove_orphan_files(`table` => 'ns.t', older_than_ms => ${System.currentTimeMillis() - 3600000})").head()
    assert(or.getLong(0) == 1L, "exactly the debris file swept")
    assert(t.scan().count() == 40)
  }

  test("CALL repair_refs: reaps a dead writer's stale edge claim via SQL") {
    val (cat, t) = freshSqlTable(30)
    // simulate a writer that claimed the main edge and died pre-publish
    assert(t.claimEdge("main", t.currentVersion))
    val r = spark.sql(
      s"CALL $cat.system.repair_refs(`table` => 'ns.t', older_than_ms => ${System.currentTimeMillis() + 1})").head()
    assert(r.getInt(0) == 1, "exactly the stale claim reaped")
    // the ref is unwedged: the next append commits normally
    import spark.implicits._
    t.append(SourceFiles.generate(5, 9).toDF())
    assert(t.scan().count() == 35)
    // consumed edges are never reaped
    val r2 = spark.sql(
      s"CALL $cat.system.repair_refs(`table` => 'ns.t', older_than_ms => ${System.currentTimeMillis() + 1})").head()
    assert(r2.getInt(0) == 0)
  }

  test("unknown procedure fails with the available list") {
    val (cat, _) = freshSqlTable(5)
    val err = intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope(`table` => 'ns.t')").collect()
    }
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; the
    // original "no such procedure ... (available: ...)" rides in the cause
    def chain(e: Throwable): List[String] =
      if (e == null) Nil else e.getMessage :: chain(e.getCause)
    assert(chain(err).exists(m => m != null &&
      (m.contains("no such procedure") || m.contains("FAILED_TO_LOAD_ROUTINE"))))
  }
}
