package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Sidecar lineage table (FIXTURES.md §3): one parquet per (job, phase) under
  * <table>/lineage/, recording input files, output files, row count and an
  * order-independent digest. A phase whose lineage exists and whose outputs
  * are all present is skipped on re-run → idempotent resume. */
object Lineage {

  final case class LineageRow(job_id: String, phase: String, partition_id: Int,
                              input_files: Seq[String], output_files: Seq[String],
                              row_count: Long, sha256_digest: String, ts_millis: Long)

  private def dir(table: GraftTable, jobId: String, phase: String) =
    Paths.get(table.location, "lineage", jobId, phase)

  def record(table: GraftTable, jobId: String, phase: String,
             inputFiles: Seq[String], outputFiles: Seq[String],
             rowCount: Long, digest: Long): Unit = {
    val spark = table.spark
    import spark.implicits._
    val row = LineageRow(jobId, phase, 0, inputFiles, outputFiles, rowCount,
      java.lang.Long.toHexString(digest), System.currentTimeMillis())
    Seq(row).toDS().coalesce(1).write.mode("overwrite").parquet(dir(table, jobId, phase).toString)
  }

  def get(table: GraftTable, jobId: String, phase: String): Option[LineageRow] = {
    val d = dir(table, jobId, phase)
    if (!Files.isDirectory(d)) return None
    val spark = table.spark
    import spark.implicits._
    try {
      val rows = spark.read.parquet(d.toString).as[LineageRow].collect()
      rows.headOption
    } catch { case _: Exception => None }
  }

  /** phase complete AND all of its outputs still exist. */
  def isDone(table: GraftTable, jobId: String, phase: String): Boolean =
    get(table, jobId, phase) match {
      case None => false
      case Some(r) =>
        r.output_files.forall(f => Files.exists(Paths.get(table.location, f)))
    }

  /** Order-independent content digest: xor of per-row hashes — deterministic
    * regardless of partitioning/ordering (SURVEY.md §2.5 lineage row). */
  def digestOf(spark: SparkSession, df: DataFrame): Long = {
    if (df.isEmpty) return 0L
    val r = df.select(xxhash64(col("repo"), col("path"), col("commit"),
        sha2(col("content"), 256)).as("h"))
      .agg(expr("bit_xor(h)")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** All lineage rows of a job (reporting). */
  def forJob(table: GraftTable, jobId: String): Seq[LineageRow] = {
    val d = Paths.get(table.location, "lineage", jobId)
    if (!Files.isDirectory(d)) return Seq.empty
    val spark = table.spark
    import spark.implicits._
    spark.read.parquet(d.toString + "/*").as[LineageRow].collect().toSeq
  }
}
