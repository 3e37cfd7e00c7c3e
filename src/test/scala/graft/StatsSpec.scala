package graft

import graft.lake.{GraftTable, Maintenance}
import graft.pipeline.{KmvAgg, KmvNdvAgg, Sketch}
import graft.synth.SourceFiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** KMV distinct-count sketch (Sketch.scala) + ANALYZE table statistics:
  * estimator exactness below k, accuracy above k, partition invariance
  * (the partial+final merge is order-insensitive), null skipping, the
  * stats.json commit round-trip, and the DSv2 scan reporting the committed
  * NDV/null counts through connector column statistics into catalyst
  * attribute stats (CBO). */
class StatsSpec extends SparkTestBase {

  test("kmv buffer: insert keeps k smallest distinct, merge == rebuild") {
    val k = 8
    val xs = Array(50L, 10L, 30L, 10L, 70L, 20L, 60L, 40L, 5L, 90L, 35L, 5L)
    var buf = Array.emptyLongArray
    xs.foreach { h => buf = Sketch.insert(buf, h, k) }
    assert(buf.toSeq == Seq(5L, 10L, 20L, 30L, 35L, 40L, 50L, 60L))
    // merge of two halves equals the single-pass build
    var a = Array.emptyLongArray; var b = Array.emptyLongArray
    xs.take(6).foreach { h => a = Sketch.insert(a, h, k) }
    xs.drop(6).foreach { h => b = Sketch.insert(b, h, k) }
    assert(Sketch.mergeSorted(a, b, k).toSeq == buf.toSeq)
    // negative (null sentinel) is skipped
    assert(Sketch.insert(buf, -1L, k).toSeq == buf.toSeq)
  }

  test("ndv estimate is EXACT below k and within 15% above k") {
    import spark.implicits._
    val kmv = udaf(new KmvNdvAgg(256), org.apache.spark.sql.Encoders.scalaLong)
    // 40 distinct < k: exact
    val small = (0 until 200).map(i => s"v${i % 40}").toDF("v")
    val exact = small.agg(kmv(coalesce(Sketch.sha60($"v"), lit(-1L)))).head().getLong(0)
    assert(exact == 40L)
    // 10k distinct > k: the KMV estimate with k=256 has ~1/sqrt(k-2) ≈ 6.3%
    // relative stderr; 15% is a > 2-sigma bound on a deterministic hash set
    val big = (0 until 30000).map(i => s"value_${i % 10000}").toDF("v")
    val est = big.agg(kmv(coalesce(Sketch.sha60($"v"), lit(-1L)))).head().getLong(0)
    assert(math.abs(est - 10000L) < 1500L, s"estimate $est too far from 10000")
  }

  test("estimate is invariant to partitioning and skips nulls") {
    import spark.implicits._
    val kmv = udaf(new KmvNdvAgg(64), org.apache.spark.sql.Encoders.scalaLong)
    val rows = (0 until 5000).map(i =>
      (s"g${i % 3}", if (i % 7 == 0) null else s"t${i % 500}"))
    def run(parts: Int): Map[String, Long] =
      rows.toDF("g", "v").repartition(parts)
        .groupBy($"g").agg(kmv(coalesce(Sketch.sha60($"v"), lit(-1L))).as("e"))
        .as[(String, Long)].collect().toMap
    val one = run(1)
    assert(run(13) == one && run(4) == one)
    // nulls contribute nothing: per group ~167 distinct non-null values < k
    // would be exact only if k were larger; with k=64 the estimate path runs —
    // re-check against an exact DISTINCT (collisions aside, sha60 is injective
    // here) computed the slow way on non-null values
    val exact = rows.toDF("g", "v").filter($"v".isNotNull)
      .groupBy($"g").agg(countDistinct($"v").as("n"))
      .as[(String, Long)].collect().toMap
    one.foreach { case (g, est) =>
      assert(math.abs(est - exact(g)) <= exact(g) / 3,
        s"group $g: est $est vs exact ${exact(g)}")
    }
  }

  test("kmv sketch aggregator exposes the k smallest hashes themselves") {
    import spark.implicits._
    val sk = udaf(new KmvAgg(16), org.apache.spark.sql.Encoders.scalaLong)
    val df = (0 until 1000).map(i => s"x$i").toDF("v")
    val got = df.agg(sk(coalesce(Sketch.sha60($"v"), lit(-1L)))).head()
      .getSeq[Long](0)
    val want = df.select(Sketch.sha60($"v").as("h")).distinct()
      .orderBy($"h").limit(16).as[Long].collect().toSeq
    assert(got == want)
  }

  test("analyze commits stats.json; tableStats round-trips; DSv2 reports it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stats").toString
    val t = new GraftTable(spark, dir)
    val df = SourceFiles.generate(400, 7L).toDF()
    t.append(df.repartition(4))
    val stats = Maintenance.analyze(t, Seq("repo", "path", "content"), k = 1024)
    val (ver, rows, cols) = t.tableStats.get
    assert(ver == t.currentVersion && rows == 400L)
    assert(cols == stats)
    // below k=1024 every NDV is exact — compare against countDistinct
    val exact = t.scan().agg(
      countDistinct($"repo"), countDistinct($"path"), countDistinct($"content")).head()
    assert(cols("repo")._1 == exact.getLong(0))
    assert(cols("path")._1 == exact.getLong(1))
    assert(cols("content")._1 == exact.getLong(2))
    assert(cols.values.forall(_._2 == 0L)) // no nulls in the synth table

    // the connector reports the committed column stats...
    val scan = {
      val rel = spark.read.format("graft").load(dir)
        .queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
        }.head
      rel.scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    }
    val cs = scan.estimateStatistics().columnStats()
    assert(!cs.isEmpty)
    val byName = cs.asInstanceOf[java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]]
    val pathStat = {
      val it = byName.entrySet().iterator()
      var found: Option[Long] = None
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.fieldNames().sameElements(Array("path")))
          found = Some(e.getValue.distinctCount().getAsLong)
      }
      found
    }
    assert(pathStat.contains(cols("path")._1))

    // ...and catalyst turns them into attribute stats when CBO is on
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val plan = spark.read.format("graft").load(dir)
        .filter($"lang" === "scala").queryExecution.optimizedPlan
      val attr = plan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          r.stats.attributeStats
      }.head
      val pathNdv = attr.collectFirst {
        case (a, st) if a.name == "path" => st.distinctCount
      }.flatten
      assert(pathNdv.contains(BigInt(cols("path")._1)))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None => spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
  }

  test("analyze_table is callable as a SQL procedure") {
    val wh = Files.createTempDirectory("graft-stats-proc").toString
    spark.conf.set("spark.sql.catalog.statcat", "graft.lake.GraftCatalog")
    spark.conf.set("spark.sql.catalog.statcat.warehouse", wh)
    try {
      val t = new GraftTable(spark, s"$wh/ns/t")
      t.append(synthDf(120))
      val row = spark.sql(
        s"CALL statcat.system.analyze_table(`table` => 'ns.t', k => 256)").head()
      assert(row.getInt(0) >= 5 && row.getLong(1) == t.currentVersion)
      assert(t.tableStats.isDefined)
    } finally {
      spark.conf.unset("spark.sql.catalog.statcat")
      spark.conf.unset("spark.sql.catalog.statcat.warehouse")
    }
  }

  private def synthDf(n: Int) = {
    import spark.implicits._
    SourceFiles.generate(n, 42L).toDF()
  }
}
