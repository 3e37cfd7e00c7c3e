package graft

import graft.lake.{GraftTable, Maintenance}
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Branches: writable refs — arbitrary work (appends, maintenance) staged on
  * an isolated line, audited, then published atomically by fast-forward.
  * Versions are global and never reused; a live branch pins its ancestry
  * against expiry; a diverged main refuses the publish. */
class BranchSpec extends SparkTestBase {

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  test("branch isolates work from main; fastForward publishes atomically") {
    val t = new GraftTable(spark, Files.createTempDirectory("br").toString)
    t.append(synthDf(40).repartition(4))
    val v1 = t.currentVersion

    t.createBranch("audit")
    val b = t.forBranch("audit")
    b.append(synthDf(20, seed = 7).repartition(2))
    Maintenance.compact(b, "br", smallBytes = Long.MaxValue, targetBytes = 64L << 20)

    // main untouched: same version, same rows; the branch sees everything
    assert(t.currentVersion == v1)
    assert(t.scan().count() == 40)
    assert(b.scan().count() == 60)
    // the branch line's parents chain back through the fork point
    assert(b.ancestorsOf(b.currentVersion).contains(v1))
    // global version allocation: every snapshot version is unique
    val versions = t.listSnapshots().map(_.version)
    assert(versions.distinct.size == versions.size)

    val published = t.fastForward("audit")
    assert(t.currentVersion == published && t.scan().count() == 60)
    t.dropBranch("audit")
    assert(t.branches.isEmpty)
  }

  test("diverged main refuses fast-forward; branch handles refuse a dropped ref") {
    val t = new GraftTable(spark, Files.createTempDirectory("br-div").toString)
    t.append(synthDf(10))
    t.createBranch("b")
    val b = t.forBranch("b")
    b.append(synthDf(5, seed = 2))
    t.append(synthDf(5, seed = 3)) // main moves — lines diverge
    intercept[IllegalArgumentException](t.fastForward("b"))
    t.dropBranch("b")
    intercept[IllegalArgumentException](b.scan()) // ref gone
  }

  test("a live branch pins its ancestry against expiry; drop releases it") {
    val t = new GraftTable(spark, Files.createTempDirectory("br-exp").toString)
    t.append(synthDf(30).repartition(3))
    t.createBranch("keep")
    val b = t.forBranch("keep")
    b.append(synthDf(10, seed = 5))
    val branchHead = b.currentVersion
    t.append(synthDf(10, seed = 6)) // main moves on

    val (e1, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(e1 == 0, "live branch line must survive expiry")
    assert(b.scan().count() == 40)

    t.dropBranch("keep")
    val (e2, deleted) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(e2 > 0 && t.snapshot(branchHead).isEmpty)
    assert(deleted > 0, "the dropped branch's unshared data files are reaped")
    assert(t.scan().count() == 40) // main's line intact

    // version-reuse guard: the reaped branch head's id is never reallocated
    t.append(synthDf(5, seed = 9))
    assert(t.currentVersion > branchHead)
  }

  test("connector reads and writes a branch; SQL resolves branch refs") {
    val wh = Files.createTempDirectory("br-sql").toString
    spark.conf.set("spark.sql.catalog.brc", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.brc.warehouse", wh)
    spark.sql("CREATE NAMESPACE brc.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(25).repartition(2))
    val v1 = t.currentVersion

    spark.sql(s"CALL brc.system.create_branch(`table` => 'ns.t', branch => 'wap', version => -1)")
    // connector write to the branch
    synthDf(15, seed = 4).write.format("graft")
      .option("branch", "wap").mode("append").save(t.location)
    assert(t.scan().count() == 25)
    // connector read of the branch; SQL VERSION AS OF the branch name
    assert(spark.read.format("graft").option("branch", "wap")
      .load(t.location).count() == 40)
    assert(spark.sql("SELECT count(*) FROM brc.ns.t VERSION AS OF 'wap'")
      .head().getLong(0) == 40)
    // the branches metadata table lists the ref
    val refs = spark.sql("SELECT branch, head_version FROM brc.ns.t.branches").collect()
    assert(refs.length == 1 && refs.head.getString(0) == "wap"
      && refs.head.getLong(1) > v1)

    spark.sql("CALL brc.system.fast_forward(`table` => 'ns.t', branch => 'wap')")
    assert(spark.sql("SELECT count(*) FROM brc.ns.t").head().getLong(0) == 40)
    spark.sql("CALL brc.system.drop_branch(`table` => 'ns.t', branch => 'wap')")
    assert(t.branches.isEmpty)
  }

  test("name collisions between tags and branches are refused both ways") {
    val t = new GraftTable(spark, Files.createTempDirectory("br-nm").toString)
    t.append(synthDf(5))
    t.setTag("x", t.currentVersion)
    intercept[IllegalArgumentException](t.createBranch("x"))
    t.createBranch("y")
    intercept[IllegalArgumentException](t.setTag("y", t.currentVersion))
    intercept[IllegalArgumentException](t.createBranch("y"))
  }
}
