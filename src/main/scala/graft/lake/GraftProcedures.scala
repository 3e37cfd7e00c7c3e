package graft.lake

import java.util.{Iterator => JIterator, UUID}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance procedures (the Iceberg `CALL catalog.system.proc(...)`
  * surface) wired to the library maintenance kernels:
  *
  * {{{
  * CALL g.system.compact(`table` => 'ns.t', small_mb => 8, target_mb => 64)
  * CALL g.system.cluster(`table` => 'ns.t', hilbert => false)
  * CALL g.system.rewrite_manifests(`table` => 'ns.t')
  * CALL g.system.expire_snapshots(`table` => 'ns.t', older_than_ms => ...)
  * CALL g.system.remove_orphan_files(`table` => 'ns.t', older_than_ms => ...)
  * CALL g.system.rollback(`table` => 'ns.t', version => 3)
  * CALL g.system.set_tag(`table` => 'ns.t', tag => 'audit', version => 3)
  * CALL g.system.drop_tag(`table` => 'ns.t', tag => 'audit')
  * }}}
  *
  * Each CALL returns one result row (counts / versions) through a
  * `LocalScan` — the planning work already ran distributed inside the
  * kernel; only the summary reaches the driver. Procedures are the
  * operational surface a 100-TB table needs on a schedule: the table stays
  * fully queryable during every one of them (ordinary commit protocol), so
  * an orchestrator can run them as plain SQL without linking the library.
  */
private[lake] class GraftProcedure(
    procName: String,
    params: Seq[(String, DataType)],
    out: StructType,
    run: (GraftTable, InternalRow) => Seq[Any],
    warehouse: String)
  extends UnboundProcedure with BoundProcedure {

  override def name(): String = procName
  override def description(): String = s"graft maintenance procedure $procName"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false

  override def parameters(): Array[ProcedureParameter] =
    params.map { case (n, dt) => ProcedureParameter.in(n, dt).build() }.toArray

  override def call(input: InternalRow): JIterator[Scan] = {
    // parameters()(0) is always `table` ('ns.t' under this catalog's warehouse)
    val rel = input.getUTF8String(0).toString.replace('.', '/')
    val table = new GraftTable(SparkSession.active, s"$warehouse/$rel")
    require(table.io.exists("meta"), s"no graft table at $warehouse/$rel")
    val vals = run(table, input).map {
      case s: String => UTF8String.fromString(s)
      case x => x
    }
    val row: InternalRow = new GenericInternalRow(vals.toArray[Any])
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = out
      override def rows(): Array[InternalRow] = Array(row)
      override def description(): String = s"graft.$procName result"
    }).iterator()
  }
}

object GraftProcedures {
  import org.apache.spark.sql.types.{BooleanType => B, IntegerType => I, LongType => L, StringType => S}

  private def out(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = false) })

  private def jobId(): String = "proc-" + UUID.randomUUID().toString.take(8)

  /** procedure name → (params, output schema, kernel). */
  private val defs: Map[String, (Seq[(String, DataType)], StructType, (GraftTable, InternalRow) => Seq[Any])] = Map(
    "compact" -> ((
      Seq("table" -> S, "small_mb" -> I, "target_mb" -> I),
      out("input_files" -> I, "output_files" -> I, "rows" -> L),
      (t, in) => {
        val r = Maintenance.compact(t, jobId(),
          smallBytes = in.getInt(1).toLong << 20, targetBytes = in.getInt(2).toLong << 20)
        Seq[Any](r.inputFiles, r.outputFiles, r.rows)
      })),
    "cluster" -> ((
      Seq("table" -> S, "hilbert" -> B),
      out("rows" -> L),
      (t, in) => Seq[Any](Maintenance.cluster(t, jobId(), useHilbert = in.getBoolean(1))))),
    "rewrite_manifests" -> ((
      Seq("table" -> S),
      out("version" -> L),
      (t, _) => Seq[Any](t.rewriteManifests().version))),
    "expire_snapshots" -> ((
      Seq("table" -> S, "older_than_ms" -> L),
      out("expired_snapshots" -> I, "deleted_files" -> I),
      (t, in) => { val (e, d) = t.expireSnapshots(in.getLong(1)); Seq[Any](e, d) })),
    "remove_orphan_files" -> ((
      Seq("table" -> S, "older_than_ms" -> L),
      out("orphan_files" -> L, "orphan_bytes" -> L),
      (t, in) => { val (f, b) = t.removeOrphanFiles(in.getLong(1)); Seq[Any](f, b) })),
    "rollback" -> ((
      Seq("table" -> S, "version" -> L),
      out("version" -> L),
      (t, in) => Seq[Any](t.rollback(in.getLong(1)).version))),
    // re-apply one append snapshot's delta onto the current head (the
    // post-rollback companion / selective cross-branch promote)
    "cherrypick_snapshot" -> ((
      Seq("table" -> S, "version" -> L),
      out("version" -> L),
      (t, in) => Seq[Any](t.cherryPick(in.getLong(1)).version))),
    "set_tag" -> ((
      Seq("table" -> S, "tag" -> S, "version" -> L),
      out("tag" -> S, "version" -> L),
      (t, in) => {
        val tag = in.getUTF8String(1).toString
        t.setTag(tag, in.getLong(2)); Seq[Any](tag, in.getLong(2))
      })),
    "drop_tag" -> ((
      Seq("table" -> S, "tag" -> S),
      out("tag" -> S),
      (t, in) => {
        val tag = in.getUTF8String(1).toString
        t.dropTag(tag); Seq[Any](tag)
      })),
    // branch lifecycle: fork at a version (-1 = main's head), publish by
    // fast-forward (refuses a diverged main), drop to release the line
    "create_branch" -> ((
      Seq("table" -> S, "branch" -> S, "version" -> L),
      out("branch" -> S, "forked_at" -> L),
      (t, in) => {
        val b = in.getUTF8String(1).toString
        t.createBranch(b, in.getLong(2))
        Seq[Any](b, t.branches(b))
      })),
    "fast_forward" -> ((
      Seq("table" -> S, "branch" -> S),
      out("branch" -> S, "version" -> L),
      (t, in) => {
        val b = in.getUTF8String(1).toString
        Seq[Any](b, t.fastForward(b))
      })),
    "drop_branch" -> ((
      Seq("table" -> S, "branch" -> S),
      out("branch" -> S),
      (t, in) => {
        val b = in.getUTF8String(1).toString
        t.dropBranch(b); Seq[Any](b)
      })),
    // reap stale edge claims left by writers that died between claiming and
    // publishing (appenders on that ref otherwise keep losing their retries)
    "repair_refs" -> ((
      Seq("table" -> S, "older_than_ms" -> L),
      out("reaped_claims" -> I),
      (t, in) => Seq[Any](t.repairRefs(in.getLong(1)).size))),
    // how SQL UPDATE/MERGE/non-filter-DELETE execute: copy-on-write
    // (rewrite matched files now) or merge-on-read (position-delete +
    // append, one snapshot, materialize later)
    "set_dml_mode" -> ((
      Seq("table" -> S, "mode" -> S),
      out("mode" -> S),
      (t, in) => {
        val m = in.getUTF8String(1).toString
        t.setDmlMode(m); Seq[Any](m)
      })),
    // merge pending MoR delete shards (k eqdel → 1, k posdel → 1) so reads
    // stop opening one shard per historical delete commit
    "compact_delete_shards" -> ((
      Seq("table" -> S),
      out("eqdel_merged" -> I, "posdel_merged" -> I),
      (t, _) => {
        val (e, p) = MorDelete.compactDeleteShards(t)
        Seq[Any](e, p)
      })),
    // ANALYZE: one-pass KMV-sketch NDV + null counts → meta/stats.json,
    // reported through the DSv2 scan's column statistics for CBO
    "analyze_table" -> ((
      Seq("table" -> S, "k" -> I),
      out("columns" -> I, "stats_version" -> L),
      (t, in) => {
        Maintenance.analyze(t, k = in.getInt(1))
        val st = t.tableStats.get
        Seq[Any](st._3.size, st._1)
      })))

  def names: Seq[String] = defs.keys.toSeq.sorted

  def load(name: String, warehouse: String): Option[UnboundProcedure] =
    defs.get(name).map { case (params, outSchema, run) =>
      new GraftProcedure(name, params, outSchema, run, warehouse)
    }
}
