package graft

import graft.lake.{GraftColumnarPartitionReader, GraftTable}
import graft.synth.SourceFiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, In, LessThanOrEqual}
import java.nio.file.Files

/** ROW-GROUP stats pruning inside the columnar connector reader: pushed
  * (always-residual) filters translate to a parquet FilterPredicate, and
  * groups whose stats prove no match are never decoded — the in-file
  * analogue of manifest file pruning. Disabled whenever `_pos` is
  * requested (skipping would shift file ordinals). */
class RowGroupPruneSpec extends SparkTestBase {

  private def synthDf(n: Int, seed: Long = 42) = {
    import spark.implicits._
    SourceFiles.generate(n, seed).toDF()
  }

  /** one data file with MANY row groups, rows sorted by repo so group
    * stats have tight disjoint-ish repo ranges */
  private def multiGroupTable(n: Int): (GraftTable, String) = {
    val hc = spark.sparkContext.hadoopConfiguration
    val old = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    try {
      val t = new GraftTable(spark, Files.createTempDirectory("graft-rg").toString)
      t.append(synthDf(n).coalesce(1).sortWithinPartitions("repo"))
      val path = t.io.abs(t.manifest(t.currentSnapshot.get)
        .select("file_path").head().getString(0)).toString
      (t, path)
    } finally {
      if (old == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", old)
    }
  }

  private def readerRows(path: String, filters: Array[org.apache.spark.sql.sources.Filter]): Long = {
    val r = new GraftColumnarPartitionReader(path,
      graft.lake.GraftTable.dataSchema, filters)
    try {
      var n = 0L
      while (r.next()) n += r.get().numRows()
      n
    } finally r.close()
  }

  test("a point predicate decodes only the row groups that can match") {
    val (t, path) = multiGroupTable(5000)
    val total = readerRows(path, Array.empty)
    assert(total == 5000L)
    val repo = SourceFiles.repoName(3)
    val matching = t.scan().filter(col("repo") === repo).count()
    assert(matching > 0)
    val decoded = readerRows(path, Array(EqualTo("repo", repo)))
    assert(decoded >= matching, "pruning dropped a group holding matches")
    assert(decoded < total,
      s"no row group was skipped (decoded $decoded of $total) — " +
        "either the file has one group or the filter never reached parquet")
  }

  test("IN and range predicates prune; untranslatable filters keep all") {
    val (t, path) = multiGroupTable(4000)
    val total = readerRows(path, Array.empty)
    val repos = Array(SourceFiles.repoName(1), SourceFiles.repoName(6))
    val matching = t.scan().filter(col("repo").isin(repos.toIndexedSeq: _*)).count()
    val decoded = readerRows(path, Array(In("repo", repos.map(x => x: Any))))
    assert(decoded >= matching && decoded < total)
    // an untranslatable leaf must keep everything, never drop
    val kept = readerRows(path,
      Array(org.apache.spark.sql.sources.StringContains("repo", "repo")))
    assert(kept == total)
  }

  test("connector results are exact on a many-row-group file") {
    val (t, path) = multiGroupTable(3000)
    val repo = SourceFiles.repoName(2)
    val viaConnector = spark.read.format("graft").load(t.location)
      .filter(col("repo") === repo)
      .agg(count(lit(1)), sum(length(col("content")))).head()
    val viaLibrary = t.scan().filter(col("repo") === repo)
      .agg(count(lit(1)), sum(length(col("content")))).head()
    assert(viaConnector == viaLibrary)
  }

  test("PAGE-level column-index pruning skips pages inside one row group") {
    // ONE row group (default 128 MB block), many SMALL pages, sorted by
    // repo: group-level stats can't discriminate, but parquet's column
    // index can — the filtered read must decode fewer rows than the file
    // holds while keeping every match (surviving pages carry row indexes
    // the vectorized decoder uses for synchronized cross-column skipping).
    val hc = spark.sparkContext.hadoopConfiguration
    val oldPage = hc.get("parquet.page.size")
    val oldLimit = hc.get("parquet.page.row.count.limit")
    hc.setInt("parquet.page.size", 4 * 1024)
    hc.setInt("parquet.page.row.count.limit", 200)
    val (t, path) = try {
      val t = new GraftTable(spark, Files.createTempDirectory("graft-pg").toString)
      t.append(synthDf(6000).coalesce(1).sortWithinPartitions("repo"))
      (t, t.io.abs(t.manifest(t.currentSnapshot.get)
        .select("file_path").head().getString(0)).toString)
    } finally {
      if (oldPage == null) hc.unset("parquet.page.size") else hc.set("parquet.page.size", oldPage)
      if (oldLimit == null) hc.unset("parquet.page.row.count.limit")
      else hc.set("parquet.page.row.count.limit", oldLimit)
    }
    val groups = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), hc)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try rd.getFooter.getBlocks.size finally rd.close()
    }
    assert(groups == 1, s"expected a single row group, file has $groups")
    val repo = SourceFiles.repoName(5)
    val matching = t.scan().filter(col("repo") === repo).count()
    assert(matching > 0)
    val total = readerRows(path, Array.empty)
    assert(total == 6000L)
    val decoded = readerRows(path, Array(EqualTo("repo", repo)))
    assert(decoded >= matching, "page pruning dropped a page holding matches")
    assert(decoded < total,
      s"no page was skipped inside the single group (decoded $decoded of $total)")
    // and the results stay exact through the connector
    val viaConnector = spark.read.format("graft").load(t.location)
      .filter(col("repo") === repo)
      .agg(count(lit(1)), sum(length(col("content")))).head()
    val viaLibrary = t.scan().filter(col("repo") === repo)
      .agg(count(lit(1)), sum(length(col("content")))).head()
    assert(viaConnector == viaLibrary)
  }

  test("z range predicates prune row groups after clustering") {
    // a Long-column range predicate (the shape a post-`cluster` z-curve
    // scan pushes) must prune groups too, not just the string columns
    val (t, path) = multiGroupTable(4000)
    // re-sort the SAME rows by z into a fresh many-group file
    val hc = spark.sparkContext.hadoopConfiguration
    val old = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024)
    val (t2, p2) = try {
      val t2 = new GraftTable(spark, Files.createTempDirectory("graft-rgz").toString)
      t2.append(t.scan().coalesce(1).sortWithinPartitions("z"))
      (t2, t2.io.abs(t2.manifest(t2.currentSnapshot.get)
        .select("file_path").head().getString(0)).toString)
    } finally {
      if (old == null) hc.unset("parquet.block.size") else hc.set("parquet.block.size", old)
    }
    val zMed = t2.scan().stat.approxQuantile("z", Array(0.5), 0.01)(0).toLong
    val matching = t2.scan().filter(col("z") <= zMed).count()
    assert(matching > 0)
    val total = readerRows(p2, Array.empty)
    val decoded = readerRows(p2, Array(LessThanOrEqual("z", zMed)))
    assert(decoded >= matching && decoded < total,
      s"z-range pruning: decoded $decoded, matches $matching, total $total")
  }

  test("_pos requests disable group skipping so file ordinals stay true") {
    import spark.implicits._
    val (t, path) = multiGroupTable(3000)
    val repo = SourceFiles.repoName(4)
    // truth: ordinals of matching rows in raw file order
    val expect = spark.read.schema(GraftTable.dataSchema).parquet(path)
      .select(col("repo")).as[String].collect().zipWithIndex
      .collect { case (r, i) if r == repo => i.toLong }.toSet
    val got = spark.read.format("graft").load(t.location)
      .filter(col("repo") === repo)
      .select(col("_pos")).as[Long].collect().toSet
    assert(got == expect, "a skipped row group shifted the _pos ordinals")
    // and the reader itself proves the guard: with _pos in the projection
    // nothing is skipped even under a pushed filter
    val posSchema = org.apache.spark.sql.types.StructType(
      GraftTable.dataSchema.fields :+
        org.apache.spark.sql.types.StructField("_pos",
          org.apache.spark.sql.types.LongType))
    val r = new GraftColumnarPartitionReader(path, posSchema, Array(EqualTo("repo", repo)))
    try {
      var n = 0L
      while (r.next()) n += r.get().numRows()
      assert(n == 3000L)
    } finally r.close()
  }
}
