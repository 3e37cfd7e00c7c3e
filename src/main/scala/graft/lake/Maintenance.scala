package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Paths

/** The maintenance jobs over a GraftTable (north_rule): bin-packing
  * compaction, Z-order/Hilbert clustering with salted range repartition,
  * manifest rewrite, snapshot expire, copy-on-write MERGE INTO — all typed
  * DataFrame plans, no RDDs. Each phase checkpoints lineage for idempotent
  * resume (Lineage.scala).
  */
object Maintenance {

  final case class CompactionResult(inputFiles: Int, outputFiles: Int, rows: Long)
  final case class MergeResult(updated: Long, inserted: Long, rewrittenFiles: Int)

  /** Bin-packing small-file compaction: files under `smallBytes` are packed
    * into ~`targetBytes` outputs, range-partitioned on z so clustering
    * survives compaction. One distributed job, no driver-side loops. */
  def compact(table: GraftTable, jobId: String,
              smallBytes: Long = 8L << 20, targetBytes: Long = 64L << 20): CompactionResult = {
    val phase = "compact"
    Lineage.get(table, jobId, phase) match {
      case Some(r) if Lineage.isDone(table, jobId, phase) =>
        return CompactionResult(r.input_files.size, r.output_files.size, r.row_count)
      case _ =>
    }
    val snapOpt = table.currentSnapshot
    if (snapOpt.isEmpty) return CompactionResult(0, 0, 0)
    val entries = table.manifestEntries(snapOpt.get)
    val small = entries.filter(_.file_bytes < smallBytes)
    if (small.size <= 1) {
      Lineage.record(table, jobId, phase, Seq.empty, Seq.empty, 0L, 0L)
      return CompactionResult(small.size, small.size, 0)
    }
    val totalBytes = small.map(_.file_bytes).sum
    val bins = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = table.readFiles(small.map(_.file_path))
    val packed = df.repartitionByRange(bins, col("z")).sortWithinPartitions("z")
    val added = table.writeDataFiles(packed, "compact")
    table.commit(added, small.map(_.file_path).toSet, "compact")
    val rows = added.map(_.record_count).sum
    Lineage.record(table, jobId, phase, small.map(_.file_path), added.map(_.file_path),
      rows, Lineage.digestOf(table.spark, table.readFiles(added.map(_.file_path))))
    CompactionResult(small.size, added.size, rows)
  }

  /** Z-order (or Hilbert) clustering of the whole table: compute the cluster
    * key, salted range repartition (skew: a few giant repos), sort within
    * partitions, rewrite all files. */
  def cluster(table: GraftTable, jobId: String, useHilbert: Boolean = false,
              numFiles: Int = 0, saltBuckets: Int = 8): Long = {
    val phase = if (useHilbert) "cluster_hilbert" else "cluster_zorder"
    Lineage.get(table, jobId, phase) match {
      case Some(r) if Lineage.isDone(table, jobId, phase) => return r.row_count
      case _ =>
    }
    val snapOpt = table.currentSnapshot
    if (snapOpt.isEmpty) return 0L
    val entries = table.manifestEntries(snapOpt.get)
    val df0 = table.readFiles(entries.map(_.file_path)).drop("z")
    val keyed =
      if (useHilbert)
        df0.withColumn("z", graft.expr.XmqFunctions.hilbert_index(
          shiftrightunsigned(xxhash64(col("repo")), 34),
          shiftrightunsigned(xxhash64(col("path")), 34), lit(30)))
      else
        df0.withColumn("z", graft.expr.XmqFunctions.zorder_interleave(
          xxhash64(col("repo")), xxhash64(col("path")),
          pmod(xxhash64(col("lang")), lit(256L))))
    val n = if (numFiles > 0) numFiles
            else math.max(4, table.spark.sparkContext.defaultParallelism)
    // deterministic salt from the path hash spreads a single giant repo
    // across range partitions without rand() (SURVEY.md §4.3 item 4)
    val salted = keyed.withColumn("_salt", pmod(xxhash64(col("path")), lit(8L)))
    val clustered = salted.repartitionByRange(n, col("z"), col("_salt"))
      .sortWithinPartitions("z").drop("_salt")
    val added = table.writeDataFiles(clustered, "cluster")
    table.commit(added, entries.map(_.file_path).toSet, phase)
    val rows = added.map(_.record_count).sum
    Lineage.record(table, jobId, phase, entries.map(_.file_path), added.map(_.file_path),
      rows, Lineage.digestOf(table.spark, table.readFiles(added.map(_.file_path))))
    rows
  }

  /** Copy-on-write MERGE INTO keyed on (repo, path, commit): updates rewrite
    * only the affected files; inserts append new files (SURVEY.md §2.5). */
  def mergeInto(table: GraftTable, jobId: String, source: DataFrame): MergeResult = {
    val phase = "merge"
    Lineage.get(table, jobId, phase) match {
      case Some(r) if Lineage.isDone(table, jobId, phase) =>
        return MergeResult(0, r.row_count, r.input_files.size)
      case _ =>
    }
    val spark = table.spark
    import spark.implicits._
    val keys = Seq("repo", "path", "commit")
    val dataCols = Seq("repo", "path", "commit", "lang", "content")

    if (table.currentSnapshot.isEmpty) {
      val added = table.writeDataFiles(source.select(dataCols.map(col): _*), "merge-insert")
      table.commit(added, Set.empty, "merge")
      val n = added.map(_.record_count).sum
      Lineage.record(table, jobId, phase, Seq.empty, added.map(_.file_path), n, 0L)
      return MergeResult(0, n, 0)
    }

    val src = source.select(dataCols.map(col): _*).cache()
    val target = table.scan().withColumn("_file", input_file_name())

    // 1. locate files containing keys touched by the source (broadcast the
    //    small source key set: this is the only full-scan pass at 100 TB)
    val srcKeys = src.select(keys.map(col): _*).distinct()
    val loc = Paths.get(table.location)
    val affectedRel = target
      .join(broadcast(srcKeys), keys, "left_semi")
      .select($"_file").distinct().as[String].collect().toSeq
      .map(f => loc.relativize(GraftTable.toLocalPath(f)).toString).toSet

    // 2. copy-on-write: affected files keep their untouched rows, matched
    //    keys take the source's row
    val affectedDf =
      if (affectedRel.isEmpty) null else table.readFiles(affectedRel.toSeq)
    val updatedCount =
      if (affectedDf == null) 0L
      else affectedDf.join(broadcast(srcKeys), keys, "left_semi").count()

    // 3. inserts: source keys not present in the target at all
    val targetKeys = table.scan().select(keys.map(col): _*)
    val inserts = src.join(targetKeys, keys, "left_anti")
    val insertedCount = inserts.count()
    val updates = src.join(targetKeys, keys, "left_semi")

    val addedRewrite =
      if (affectedDf == null) Seq.empty
      else {
        val rewritten = affectedDf.select(dataCols.map(col): _*)
          .join(broadcast(srcKeys), keys, "left_anti")
          .unionByName(updates)
        table.writeDataFiles(rewritten, "merge-cow")
      }
    val addedInsert =
      if (insertedCount == 0) Seq.empty
      else table.writeDataFiles(inserts, "merge-insert")

    table.commit(addedRewrite ++ addedInsert, affectedRel, "merge")
    src.unpersist()
    Lineage.record(table, jobId, phase, affectedRel.toSeq,
      (addedRewrite ++ addedInsert).map(_.file_path), updatedCount + insertedCount, 0L)
    MergeResult(updatedCount, insertedCount, affectedRel.size)
  }
}
