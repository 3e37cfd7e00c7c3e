package graft.lake

import java.util
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES — table state introspectable as plain SQL:
  *
  * {{{
  * SELECT * FROM cat.ns.t.snapshots          -- commit history
  * SELECT * FROM cat.ns.t.files              -- live manifest (stats per file)
  * SELECT * FROM cat.ns.t.tags               -- named refs
  * spark.read.format("graft").option("metadata", "files").load(path)
  * }}}
  *
  * `snapshots` and `tags` are driver-small (one json listing) and served as
  * LocalScans. `files` is the LIVE manifest — adds anti-joined with removes,
  * the same distributed derivation every planner read uses — served through
  * the V1 bridge, so a 10^8-entry manifest never materializes on the
  * driver; `.option("snapshot", v)` pins `files` to an old snapshot for
  * debugging time travel. These are the operator's observability surface:
  * file-size histograms, clustering health (min_z/max_z overlap), snapshot
  * cadence — all one GROUP BY away, no library linkage.
  */
class GraftMetadataSparkTable(baseLocation: String, kind: String,
                              snapshot: Option[Long] = None)
  extends Table with SupportsRead {
  require(GraftMetadataTables.kinds.contains(kind), s"unknown metadata table $kind")
  override def name(): String = s"graft.`$baseLocation`.$kind"
  override def schema(): StructType = GraftMetadataTables.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        GraftMetadataTables.scan(baseLocation, kind, snapshot)
    }
}

object GraftMetadataTables {
  val kinds: Set[String] =
    Set("snapshots", "files", "tags", "branches", "history", "column_stats")

  val snapshotsSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("parent", LongType, nullable = false),
    StructField("ts_millis", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("extra_cols", StringType, nullable = false),
    StructField("dropped_cols", StringType, nullable = false),
    StructField("is_current", BooleanType, nullable = false),
    StructField("ref", StringType, nullable = false)))

  val tagsSchema: StructType = StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))

  val branchesSchema: StructType = StructType(Seq(
    StructField("branch", StringType, nullable = false),
    StructField("head_version", LongType, nullable = false)))

  /** history = the Iceberg convention: every snapshot with whether it is on
    * the current head's ancestry. In this engine main's history never forks
    * — rollback and cherry-pick are NEW commits whose parent is the previous
    * head (the restored/picked content is re-listed, causality stays linear)
    * — so `is_current_ancestor = false` marks exactly the commits on
    * not-yet-published branch lines (still time-travelable until their
    * branch is dropped and expire reaps them). */
  val historySchema: StructType = StructType(Seq(
    StructField("made_current_at", LongType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("parent", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("is_current_ancestor", BooleanType, nullable = false)))

  /** column_stats = the committed ANALYZE result (Maintenance.analyze):
    * per-column NDV + null count, stamped with the snapshot version the
    * scan saw and the row count it measured. */
  val columnStatsSchema: StructType = StructType(Seq(
    StructField("column", StringType, nullable = false),
    StructField("ndv", LongType, nullable = false),
    StructField("null_count", LongType, nullable = false),
    StructField("stats_version", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false)))

  def schemaOf(kind: String): StructType = kind match {
    case "snapshots"    => snapshotsSchema
    case "tags"         => tagsSchema
    case "branches"     => branchesSchema
    case "history"      => historySchema
    case "column_stats" => columnStatsSchema
    case "files"        => GraftTable.manifestSchema
  }

  def scan(base: String, kind: String, pinned: Option[Long]): Scan = {
    val t = new GraftTable(SparkSession.active, base)
    kind match {
      case "snapshots" =>
        val cur = t.currentVersion
        local(snapshotsSchema, t.listSnapshots().sortBy(_.version).map(s =>
          new GenericInternalRow(Array[Any](s.version, s.parent, s.tsMillis,
            UTF8String.fromString(s.operation), s.recordCount, s.fileCount,
            UTF8String.fromString(s.extraCols),
            UTF8String.fromString(s.droppedCols),
            s.version == cur,
            UTF8String.fromString(s.ref)))), s"graft.snapshots @ $base")
      case "tags" =>
        local(tagsSchema, t.tags.toSeq.sortBy(_._1).map { case (n, v) =>
          new GenericInternalRow(Array[Any](UTF8String.fromString(n), v))
        }, s"graft.tags @ $base")
      case "branches" =>
        local(branchesSchema, t.branches.toSeq.sortBy(_._1).map { case (n, v) =>
          new GenericInternalRow(Array[Any](UTF8String.fromString(n), v))
        }, s"graft.branches @ $base")
      case "history" =>
        val anc = t.currentSnapshot
          .map(s => t.ancestorsOf(s.version)).getOrElse(Set.empty[Long])
        local(historySchema, t.listSnapshots().sortBy(_.version).map(s =>
          new GenericInternalRow(Array[Any](s.tsMillis, s.version, s.parent,
            UTF8String.fromString(s.operation), anc(s.version)))),
          s"graft.history @ $base")
      case "column_stats" =>
        val rows = t.tableStats.toSeq.flatMap { case (ver, n, cols) =>
          cols.toSeq.sortBy(_._1).map { case (c, (ndv, nulls)) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(c), ndv, nulls, ver, n))
          }
        }
        local(columnStatsSchema, rows, s"graft.column_stats @ $base")
      case "files" => new FilesScan(base, pinned)
    }
  }

  private def local(s: StructType, rs: Seq[InternalRow], desc: String): Scan =
    new LocalScan {
      override def readSchema(): StructType = s
      override def rows(): Array[InternalRow] = rs.toArray
      override def description(): String = desc
    }

  /** the LIVE manifest (adds anti-joined with removes) of the
    * pinned-or-current snapshot through the V1 bridge: the derivation runs
    * distributed, nothing manifest-sized reaches the driver. */
  private class FilesScan(base: String, pinned: Option[Long]) extends V1Scan {
    override def readSchema(): StructType = GraftTable.manifestSchema
    override def description(): String = s"graft.files @ $base"
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = GraftTable.manifestSchema
        override def buildScan(): RDD[Row] = {
          val t = new GraftTable(context.sparkSession, base)
          val s = pinned.map(v => t.snapshot(v).getOrElse(
              throw new IllegalArgumentException(s"no snapshot v$v at $base")))
            .orElse(t.currentSnapshot)
          s.map(t.manifest(_).rdd)
            .getOrElse(context.sparkSession.sparkContext.emptyRDD[Row])
        }
      }.asInstanceOf[T]
  }
}
