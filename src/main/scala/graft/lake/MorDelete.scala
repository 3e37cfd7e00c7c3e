package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.Filter

/** MERGE-ON-READ deletes — the write-cheap complement to [[Delete]]'s
  * copy-on-write path (Iceberg's two delete strategies, re-expressed
  * Spark-first).
  *
  * `deleteWhere` commits only the matching keys (repo, path, commit) as an
  * "eqdel" manifest shard: no data file is opened for writing, so retracting
  * rows scattered across a 100-TB table costs one key-sized write instead of
  * rewriting every touched file. Reads apply pending deletes as a hash
  * anti-join on the key (GraftTable.withEqDeletesApplied); the shard
  * sequence rule — a delete at seq D hits only rows whose add shard seq
  * is < D — keeps later re-inserts of the same key alive.
  *
  * `applyDeletes` is the materialization (Iceberg's rewrite-deletes): only
  * files that can POSSIBLY contain a deleted key (manifest min/max stats vs
  * the key set) are rewritten, the eqdel shards are dropped, and the live
  * row set is — by construction — unchanged.
  *
  * Division of labor with the copy-on-write ops: compact / cluster / merge /
  * update / CoW-delete all materialize pending deletes first (their rewrites
  * re-sequence the files, which would detach the logical deletes), so a
  * table never carries eqdel state through a data rewrite.
  */
object MorDelete {

  final case class ApplyResult(affectedFiles: Int, untouchedFiles: Int,
                               droppedShards: Int)

  /** Merge-on-read DELETE of rows matching the pushed-filter conjunction.
    * Planning prunes the manifest by stats exactly like the CoW path; the
    * matching keys are computed DISTRIBUTED from the pruned live scan
    * (pending earlier deletes applied, so a key never enters two shards)
    * and written as one parquet shard. Returns the matched row count;
    * matching nothing commits nothing. */
  def deleteWhere(table: GraftTable, filters: Array[Filter]): Long = {
    val snap = table.currentSnapshot.getOrElse(return 0L)
    val spark = table.spark
    import spark.implicits._
    val kept = table.manifestWithSeq(snap)
      .filter(GraftScan.manifestPredicate(filters))
      .select($"file_path", $"add_seq").as[(String, Long)].collect().toSeq
    if (kept.isEmpty) return 0L
    val live = table.withEqDeletesApplied(snap, table.readFilesWithSeq(kept))
    deleteMatching(table,
      live.filter(coalesce(Delete.rowPredicate(filters), lit(false))))
  }

  /** Column-predicate variant (library callers): no stats pruning — the
    * predicate may reference any column shape. */
  def deleteWhere(table: GraftTable, condition: Column): Long =
    deleteMatching(table, table.scan().filter(coalesce(condition, lit(false))))

  private def deleteMatching(table: GraftTable, matching: DataFrame): Long = {
    // the basis snapshot fixes the del_seq; commitEqDelete conflicts if the
    // head moves before the commit lands (the stamped seq would be wrong
    // against a different shard sequence)
    val basis = table.currentSnapshot
    val delSeq = table.nextEqDeleteSeq(basis)
    val keys = matching.select(col("repo"), col("path"), col("commit"),
      lit(delSeq).as("del_seq"))
    val uid = java.util.UUID.randomUUID().toString.take(12)
    val shardRel = s"meta/manifest-eqdel-$uid.parquet"
    val abs = table.io.abs(shardRel).toString
    keys.write.mode("overwrite").parquet(abs)
    // matched count from the freshly written shard's parquet footers — a
    // metadata-only job, no second pass over the data
    val matched = table.spark.read.schema(GraftTable.eqDeleteSchema)
      .parquet(abs).count()
    if (matched == 0L) { table.io.delete(shardRel); return 0L }
    table.commitEqDelete(shardRel, matched, basis)
    matched
  }

  /** Materialize pending merge-on-read deletes into data files. Affected
    * files are selected by joining the manifest's per-file (min/max repo,
    * min/max path, add_seq) stats against the delete keys — a broadcast
    * range-containment semi-join over METADATA (one row per file vs the key
    * set; delete key sets are the small side by design — Iceberg holds them
    * whole in task memory). Untouched files keep their shards; the rewrite
    * reads only the affected files, applies the anti-join, and the commit
    * drops every eqdel shard. No-op when nothing is pending. */
  def applyDeletes(table: GraftTable): ApplyResult = {
    val snap = table.currentSnapshot.getOrElse(return ApplyResult(0, 0, 0))
    val shards = table.eqDeleteShards(snap)
    if (shards.isEmpty) return ApplyResult(0, 0, 0)
    val spark = table.spark
    import spark.implicits._
    val m = table.manifestWithSeq(snap)
    val keys = table.eqDeleteKeys(snap)
    val affected = m.join(broadcast(keys),
        keys("repo") >= m("min_repo") && keys("repo") <= m("max_repo") &&
        keys("path") >= m("min_path") && keys("path") <= m("max_path") &&
        m("add_seq") < keys("del_seq"),
        "left_semi")
      .select($"file_path", $"add_seq").as[(String, Long)].collect().toSeq
    val untouched =
      if (snap.fileCount >= 0) (snap.fileCount - affected.size).toInt else -1
    val added =
      if (affected.isEmpty) Seq.empty[ManifestEntry]
      else {
        val kept = table.withEqDeletesApplied(snap, table.readFilesWithSeq(affected))
        table.writeDataFiles(kept, "apply-deletes")
      }
    table.commitApplyDeletes(snap, added, affected.map(_._1).toSet)
    ApplyResult(affected.size, untouched, shards.size)
  }

  /** materialize-if-pending guard for the copy-on-write rewrite paths. */
  def materializeIfPending(table: GraftTable): Unit =
    if (table.hasPendingDeletes) { applyDeletes(table); () }
}
