package graft

import graft.lake.{GraftTable, Maintenance}
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Named refs (tags): immutable snapshot pins that survive expireSnapshots,
  * readable through the connector option, SQL `VERSION AS OF 'name'`, and
  * released only by dropTag. */
class TagsSpec extends SparkTestBase {

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  test("tag pins a snapshot through churn and expiry; dropTag releases it") {
    val t = new GraftTable(spark, Files.createTempDirectory("tags").toString)
    t.append(synthDf(80).repartition(4))
    val v1 = t.currentVersion
    t.setTag("audit", v1)
    assert(t.tags == Map("audit" -> v1))

    // churn: merge rewrites files, compaction replaces them
    Maintenance.mergeInto(t, "tg", synthDf(20, seed = 5)
      .withColumn("content", concat(lit("v2 "), col("content"))))
    Maintenance.compact(t, "tg2", smallBytes = Long.MaxValue, targetBytes = 4L << 20)

    // expire everything old — the tagged snapshot must survive with its data
    val (expired, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(expired > 0)
    assert(t.snapshot(v1).isDefined, "tagged snapshot was reaped")
    val pinned = spark.read.format("graft").option("tag", "audit").load(t.location)
    assert(pinned.count() == 80)
    assert(pinned.filter(col("content").startsWith("v2 ")).count() == 0)

    // release: dropTag, then expiry reaps it
    t.dropTag("audit")
    val (expired2, _) = t.expireSnapshots(System.currentTimeMillis() + 1000)
    assert(expired2 > 0)
    assert(t.snapshot(v1).isEmpty)
    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("tag", "audit").load(t.location).count()
    }
  }

  test("SQL VERSION AS OF resolves tag names through the catalog") {
    val wh = Files.createTempDirectory("tags-sql").toString
    spark.conf.set("spark.sql.catalog.tagcat", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.tagcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE tagcat.ns")
    val t = new GraftTable(spark, s"$wh/ns/t")
    t.append(synthDf(50).repartition(2))
    t.setTag("baseline", t.currentVersion)
    t.append(synthDf(25, seed = 3).repartition(1))

    assert(spark.sql("SELECT count(*) FROM tagcat.ns.t").head().getLong(0) == 75)
    assert(spark.sql("SELECT count(*) FROM tagcat.ns.t VERSION AS OF 'baseline'")
      .head().getLong(0) == 50)
  }

  test("tag validation: bad names, missing snapshots, overwrite semantics") {
    val t = new GraftTable(spark, Files.createTempDirectory("tags-v").toString)
    t.append(synthDf(10))
    intercept[IllegalArgumentException](t.setTag("9starts-with-digit", 1))
    intercept[IllegalArgumentException](t.setTag("ok", 99))
    intercept[IllegalArgumentException](t.dropTag("missing"))
    t.setTag("v", 1)
    t.append(synthDf(5, seed = 2))
    t.setTag("v", 2) // overwrite moves the pin
    assert(t.snapshotByTag("v").get.version == 2)
  }
}
