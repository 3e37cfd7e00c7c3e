package graft.lake

import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 read path for GraftTable (SURVEY.md §4.3 item 3 /
  * VERDICT r1 Next #7): `spark.read.format("graft").load(location)`.
  *
  * Catalyst pushes WHERE-clause filters into the ScanBuilder
  * (SupportsPushDownFilters); filters over repo/path/lang prune MANIFEST
  * entries against their per-file min/max stats before any data file is
  * opened — the same pruning prunedScan() does, but driven by the query's
  * own predicates, visible in the plan as PushedFilters. Column pruning
  * (SupportsPushDownRequiredColumns) reaches the parquet reader as a
  * projected read schema. Every pushed filter is also kept as a residual
  * (pushFilters returns all), so row-level correctness never depends on the
  * stats. One InputPartition per data file.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Option(options.get("metadata")) match {
      // introspection: .option("metadata", "files"|"snapshots"|"tags")
      case Some(kind) => GraftMetadataTables.schemaOf(kind)
      case None => Option(options.get("path")) match {
        // evolved columns are part of the table's public schema — resolve
        // them from the (pinned or current) snapshot's metadata, one tiny
        // driver read
        case Some(loc) =>
          GraftDataSource.evolvedSchema(loc,
            Option(options.get("snapshot")).map(_.toLong))
        case None => GraftDataSource.schema
      }
    }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val location = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft source requires .load(<table location>)"))
    // time travel: .option("snapshot", v) pins the scan to snapshot v — the
    // same isolation the library API's pinned-snapshot reads give, now
    // reachable through the public connector
    // .option("tag", name) resolves a named ref to its pinned version —
    // the same read path as an explicit snapshot pin
    // .option("branch", name): reads pin to the branch head resolved NOW;
    // writes through the same load advance the branch ref, not main
    val branch = Option(properties.get("branch"))
    val snapshot = Option(properties.get("snapshot")).map(_.toLong)
      .orElse(Option(properties.get("tag")).map { name =>
        new GraftTable(SparkSession.active, location).tags.getOrElse(name,
          throw new IllegalArgumentException(s"no such tag $name at $location"))
      })
      .orElse(branch.map { name =>
        new GraftTable(SparkSession.active, location).branches.getOrElse(name,
          throw new IllegalArgumentException(s"no such branch $name at $location"))
      })
    Option(properties.get("metadata")) match {
      // metadata tables: .option("metadata", kind) serves the table's state
      // (snapshot history / live manifest / tags) instead of its rows;
      // composes with the snapshot/tag pin for time-traveled `files`
      case Some(kind) => new GraftMetadataSparkTable(location, kind, snapshot)
      case None =>
        // incremental read: .option("fromSnapshot", v) restricts the scan to
        // rows APPENDED after snapshot v (exclusive), up to the end snapshot
        // ("snapshot" option, else current) — the Iceberg-style changelog read
        val fromSnapshot = Option(properties.get("fromSnapshot")).map(_.toLong)
        // streaming admission control: at most this many snapshot VERSIONS
        // per microbatch (default: all available) — bounds per-batch work
        // when a stream catches up on a long append backlog
        val maxVersions = Option(properties.get("maxVersionsPerBatch")).map(_.toLong)
        // .option("columnar", false): row-at-a-time fallback reader, kept for
        // A/B measurement and as an escape hatch — default is columnar
        val columnar = Option(properties.get("columnar")).forall(_.toBoolean)
        new GraftSparkTable(location, snapshot, columnar, fromSnapshot, maxVersions,
          writeBranch = branch)
    }
  }

  override def supportsExternalMetadata(): Boolean = true
}

object GraftDataSource {
  val schema: StructType = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType), StructField("z", LongType)))

  /** base schema + the evolved extras of the pinned (time travel sees the
    * schema AS OF that snapshot) or current snapshot. */
  def evolvedSchema(location: String, snapshot: Option[Long]): StructType = {
    val t = new GraftTable(SparkSession.active, location)
    val s = snapshot.flatMap(t.snapshot).orElse(t.currentSnapshot)
    StructType(schema.fields ++ s.toSeq.flatMap(t.extraFields))
  }
}

class GraftSparkTable(location: String, snapshot: Option[Long] = None,
                      columnar: Boolean = true,
                      fromSnapshot: Option[Long] = None,
                      maxVersionsPerBatch: Option[Long] = None,
                      // path-based handles accept subset schemas on write
                      // (the V1 bridge / streaming sink splice z and missing
                      // columns); CATALOG handles are strict — ACCEPT_ANY_
                      // SCHEMA flips MergeIntoTable.skipSchemaResolution,
                      // which leaves vanilla Spark's MERGE resolution to an
                      // engine extension that doesn't exist here, so SQL
                      // MERGE INTO only resolves on a strict-schema table
                      acceptAnySchema: Boolean = true,
                      // when set, appends advance this BRANCH's head
                      // instead of main (reads through the same handle are
                      // pinned to the branch head resolved at load time)
                      writeBranch: Option[String] = None)
  extends Table
  with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  /** `_file` / `_pos` metadata columns (SELECT _file, _pos FROM t works
    * like Iceberg's) — `_file` is also what SQL MERGE/UPDATE's runtime
    * group filter collects, and (_file, _pos) is the delta path's row id. */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(GraftFileColumn, GraftPosColumn)

  /** SQL MERGE INTO / UPDATE (and non-filter DELETE) as row-level
    * operations — group-based copy-on-write by default, delta-based
    * merge-on-read when the table's dml-mode property says so (see
    * GraftRowLevel.scala / GraftTable.dmlMode). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(snapshot.isEmpty, "cannot run DML through a time-travel-pinned read")
    require(fromSnapshot.isEmpty, "cannot run DML through an incremental read")
    val mor = new GraftTable(SparkSession.active, location).dmlMode == "merge-on-read"
    () =>
      if (mor) new GraftDeltaOperation(location, info.command)
      else new GraftRowLevelOperation(location, info.command)
  }
  override def name(): String = s"graft.`$location`"
  // resolved once per table handle; a time-travel-pinned handle reports the
  // schema as of THAT snapshot (pre-evolution reads see the old shape)
  private lazy val evolved: StructType =
    GraftDataSource.evolvedSchema(location, snapshot)
  override def schema(): StructType = evolved
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE)
    if (acceptAnySchema) caps.add(TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(location, snapshot, columnar, fromSnapshot,
      maxVersionsPerBatch, evolved)

  /** SQL `DELETE FROM` (SupportsDelete): metadata-only drop of files whose
    * stats prove every row matches, copy-on-write rewrite of the rest —
    * Delete.deleteWhere. canDeleteWhere is exact: any filter this engine
    * cannot evaluate row-wise refuses the DELETE up front, and a
    * time-travel-pinned table is read-only. TRUNCATE TABLE rides the
    * inherited truncateTable() (deleteWhere over AlwaysTrue). */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    snapshot.isEmpty && filters.forall(Delete.translatable)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    require(snapshot.isEmpty, "cannot DELETE through a time-travel-pinned read")
    val t = new GraftTable(SparkSession.active, location)
    // the dml-mode property governs ALL SQL row-level DML: merge-on-read
    // commits the matched addresses (no file rewritten, stacks on pending
    // deletes without materializing); copy-on-write keeps the two-tier
    // metadata-drop / rewrite split
    if (t.dmlMode == "merge-on-read") MorDelete.deleteWherePositional(t, filters)
    else Delete.deleteWhere(t, filters)
    ()
  }

  /** write path via the V1 bridge: `df.write.format("graft").save(loc)`
    * appends through the SAME GraftTable.append used everywhere — one
    * distributed data write, one distributed stats pass (per-file min/max,
    * langs, z bounds, xor digest), one driver-side O(delta) metadata
    * commit. A bespoke DataWriter would have to replicate Spark's
    * xxhash64/sha2 semantics in-task to produce identical manifest stats —
    * the bridge keeps one implementation of that contract. */
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          // streaming path: df.writeStream.format("graft") — epoch-idempotent
          // task-side parquet writes + one stats pass per microbatch
          override def toStreaming
              : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new GraftStreamingWrite(location, info.queryId(), info.schema())
          override def toInsertableRelation():
              org.apache.spark.sql.sources.InsertableRelation =
            (data: org.apache.spark.sql.DataFrame, overwrite: Boolean) => {
              val table = new GraftTable(data.sparkSession, location, writeBranch)
              require(!overwrite, "graft sink supports append mode only")
              // resolve case-insensitively (Spark's default resolution):
              // a DataFrame column named `Repo` must match graft's `repo`,
              // not be silently dropped from the append
              val byLower = data.columns.map(c => c.toLowerCase -> c).toMap
              val writable = GraftDataSource.schema.fieldNames.toSeq ++
                table.currentSnapshot.toSeq.flatMap(table.extraFields).map(_.name)
              val cols = writable
                .flatMap(f => byLower.get(f.toLowerCase).map(src =>
                  data.col(src).as(f)))
              table.append(data.select(cols: _*))
              ()
            }
        }
    }
}

class GraftScanBuilder(location: String, snapshot: Option[Long] = None,
                       columnar: Boolean = true,
                       fromSnapshot: Option[Long] = None,
                       maxVersionsPerBatch: Option[Long] = None,
                       tableSchema: StructType = GraftDataSource.schema)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit
  with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = tableSchema
  private var aggPushed: Option[Seq[GraftAggScan.PushedAgg]] = None
  private var limit: Option[Int] = None

  /** LIMIT pushdown — `SELECT * FROM t LIMIT k` over a 100-TB table must
    * not plan (or read) every file: planning keeps only the fewest files
    * whose committed record_counts cover k, and each partition reader stops
    * after k rows, so at most one small file is usually opened. Declared
    * PARTIALLY pushed, so Spark always keeps its own global Limit — the
    * scan only has to deliver at least min(k, table rows), which the
    * truncation guarantees because record_count is exact for files with no
    * pending deletes. Refused for incremental reads (the changelog slice
    * has its own row accounting) and while merge-on-read deletes are
    * pending (record_count is then an upper bound on surviving rows, so a
    * truncated plan could under-deliver). Spark only pushes a limit when no
    * Filter sits between it and the scan, so the kept-residual predicates
    * never interact with the truncation. */
  override def pushLimit(l: Int): Boolean = {
    if (fromSnapshot.isDefined || morPending || l <= 0) false
    else { limit = Some(l); true }
  }
  override def isPartiallyPushed(): Boolean = true

  /** TopN pushdown — `ORDER BY c LIMIT k` over a bucket-SORTED table: each
    * bucket file is physically sorted by c (Maintenance.bucketize), so a
    * partition's local top-k under `c ASC NULLS FIRST` is literally its
    * first k rows, and the per-partition reader cap turns a full-table sort
    * feed into k rows per bucket. PARTIALLY pushed: Spark keeps its global
    * TakeOrderedAndProject, so the cap only has to preserve every possible
    * top-k candidate — which sorted-prefix rows do by construction. The
    * SCAN re-verifies at planning time that every planned partition is a
    * single sorted file on exactly this column (appends since bucketize,
    * multi-file buckets, pending deletes all void it) and silently drops
    * the cap otherwise — never a wrong answer, only a missed shortcut. */
  private var topN: Option[(String, Int)] = None
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, NullOrdering}
    if (fromSnapshot.isDefined || morPending || l <= 0 || orders.length != 1)
      return false
    val o = orders(0)
    val col = o.expression() match {
      case nr: NamedReference if nr.fieldNames().length == 1 => nr.fieldNames()(0)
      case _ => return false
    }
    // bucketize sorts ascending (nulls first, Spark's ASC default) — any
    // other requested order can't be served by a file prefix
    if (o.direction() != SortDirection.ASCENDING ||
        o.nullOrdering() != NullOrdering.NULLS_FIRST) return false
    val t = new GraftTable(SparkSession.active, location)
    val ok = t.bucketSorted && t.bucketSpec.exists(_._1 == col)
    if (ok) topN = Some((col, l))
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftScanBuilder.supported)
    filters // all filters stay residual: stats pruning is file-level only
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // with a pushed aggregation the read schema IS the aggregate schema —
    // a later prune call must not clobber it
    if (aggPushed.isEmpty && requiredSchema.nonEmpty) required = requiredSchema
  }

  /** AGGREGATE pushdown — COUNT(*)/MIN/MAX answered ENTIRELY from manifest
    * stats, zero data files opened (the Iceberg-style zero-scan aggregate).
    * Exactness, not estimation: record_count is the committed per-file row
    * count, min/max_{repo,path,z} are full untruncated column bounds over
    * each file's actual rows, and `langs` is the file's exact distinct-lang
    * set (collect_set at append/rewrite) — so Σ/min/max over live manifest
    * entries equal the table-wide aggregates. Only offered COMPLETE (never
    * partial) and only when NO filter reached the scan: stats pruning is
    * file-level may-match, so any predicate forces the row path. At 100 TB
    * this turns `SELECT count(*), max(repo) FROM t` from a full scan into
    * one tiny manifest job. */
  /** pending merge-on-read deletes make manifest record_counts an upper
    * bound, so the zero-scan aggregate would over-count — refuse pushdown
    * and let the row path (which applies the deletes) answer. One tiny
    * driver-side shard-list read, memoized per builder. */
  private lazy val morPending: Boolean = {
    val t = new GraftTable(SparkSession.active, location)
    val s = snapshot.flatMap(t.snapshot).orElse(t.currentSnapshot)
    s.exists(t.hasMorDeletes)
  }

  override def supportCompletePushDown(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    pushed.isEmpty && fromSnapshot.isEmpty && !morPending &&
      GraftAggScan.translate(agg).isDefined

  override def pushAggregation(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) return false
    aggPushed = GraftAggScan.translate(agg)
    aggPushed.isDefined
  }

  override def build(): Scan = aggPushed match {
    case Some(aggs) => new GraftAggScan(location, snapshot, aggs)
    case None =>
      new GraftScan(location, pushed, required, snapshot, columnar, fromSnapshot,
        maxVersionsPerBatch, limit, topN)
  }
}

object GraftScanBuilder {
  /** filters usable against the manifest min/max stats — plus point
    * predicates on `commit`, prunable through a BloomIndex sidecar when one
    * exists (and harmlessly kept-all by manifestPredicate when not). */
  def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Set("repo", "path", "lang", "commit").contains(a)
    case GreaterThan(a, _) => Set("repo", "path").contains(a)
    case GreaterThanOrEqual(a, _) => Set("repo", "path").contains(a)
    case LessThan(a, _) => Set("repo", "path").contains(a)
    case LessThanOrEqual(a, _) => Set("repo", "path").contains(a)
    case In(a, _) => Set("repo", "lang", "commit").contains(a)
    case StringStartsWith(a, _) => Set("repo", "path").contains(a)
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case _ => false
  }
}

class GraftScan(location: String, pushed: Array[Filter], required: StructType,
                snapshot: Option[Long] = None, columnar: Boolean = true,
                fromSnapshot: Option[Long] = None,
                maxVersionsPerBatch: Option[Long] = None,
                limit: Option[Int] = None,
                topN: Option[(String, Int)] = None)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportOrdering {

  /** STORAGE-PARTITIONED JOINS: when the table is bucket-clustered
    * (Maintenance.bucketize) and every surviving file is bucket-pure, the
    * scan reports KeyGroupedPartitioning over the `bucket(n, col)` transform
    * and plans exactly one InputPartition per bucket (all n buckets, empty
    * ones included, so two tables bucketed the same way always expose
    * ALIGNED partition values). A join of two such tables on the bucket
    * column then needs NO shuffle on either side — with
    * spark.sql.sources.v2.bucketing.enabled and the table resolved through
    * GraftCatalog (whose FunctionCatalog serves the bucket function). Any
    * unbucketed file, pending MoR delete, or incremental read degrades to
    * UnknownPartitioning — never to a wrong join. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = {
    planInputPartitions() // cached; sets bucketInfo
    bucketInfo match {
      // the transform must reference a column this scan actually OUTPUTS —
      // a projection that pruned it away can't resolve the expression
      case Some((c, n)) if required.fieldNames.contains(c) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)),
          planInputPartitions().length)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          planInputPartitions().length)
    }
  }

  /** per-partition ORDERING (SupportsReportOrdering): bucketize sorts every
    * bucket by the bucket column and records it in the spec; while each
    * bucket still holds exactly one file (no appends since), the scan
    * reports `col ASC` — a sort-merge join over two such tables then needs
    * neither shuffle (KeyGroupedPartitioning) NOR sort. Degrades to no
    * ordering (never a wrong one) once a bucket has 2+ files, since the
    * chained reader concatenates files without merging.
    *
    * SUPPRESSED while allowCompatibleTransforms is on: under a
    * mismatched-bucket-count join Spark's reducer path concatenates several
    * of this side's buckets into one task (KeyGroupedPartitionedScan
    * .getInputPartitionGrouping groups by REDUCED key), but its
    * ordering-preservation check still looks at the ORIGINAL per-bucket
    * groups — the stale `col ASC` claim would let SortMergeJoin skip a sort
    * the concatenated partition no longer satisfies and silently drop rows
    * (reproduced in SpjSpec; hash join over the same reduced grouping is
    * correct). The scan cannot see the join partner, so the conf is the
    * narrowest safe gate. */
  override def outputOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] = {
    planInputPartitions()
    val reductionPossible = org.apache.spark.sql.internal.SQLConf.get.getConfString(
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled", "false") == "true"
    bucketInfo match {
      case Some((c, _)) if orderInfo && !reductionPossible &&
          required.fieldNames.contains(c) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(c),
          org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      case _ => Array.empty
    }
  }

  @volatile private var bucketInfo: Option[(String, Int)] = None
  @volatile private var orderInfo: Boolean = false

  /** RUNTIME file pruning (the DSv2 analogue of dynamic partition pruning):
    * when this scan sits under a join whose other side produces a runtime
    * filter on repo/path/lang (e.g. a selective broadcast dim), Spark calls
    * filter() at EXECUTION time and the scan re-prunes its file list
    * against the manifest stats — files excluded by the join keys are never
    * opened, the difference between scanning 100 TB and scanning the few
    * TB the join actually touches. */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array("repo", "path", "lang")
      .filter(required.fieldNames.contains) // only columns this scan outputs resolve
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = {
    // a pushed LIMIT/TopN means a Limit operator sits directly above this
    // scan and the plan/readers are truncated to its row budget; pruning
    // files underneath it could under-deliver, so runtime filters are
    // ignored (they are always an optional optimization, never required)
    if (limit.isDefined || topN.isDefined) return
    val usable = filters.filter(GraftScanBuilder.supported)
    if (usable.nonEmpty) {
      runtime = runtime ++ usable
      planned = null // re-plan with the narrowed predicate on next access
    }
  }

  @volatile private var runtime: Array[Filter] = Array.empty
  @volatile private var planned: Array[InputPartition] = _
  // set during planning when the bucket layout can serve the pushed TopN
  @volatile private var topNCap: Option[Int] = None

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** (kept, total) file counts from planning — surfaced in description() so
    * EXPLAIN/plan dumps show the pruning ratio once the scan has planned. */
  @volatile private[lake] var pruneInfo: Option[(Int, Int)] = None
  /** Σ(record_count), Σ(file_bytes) over the files that SURVIVED pruning —
    * accumulated in the same planning collect, no extra job. */
  @volatile private[lake] var statsInfo: Option[(Long, Long)] = None

  /** EXACT post-pruning statistics for Catalyst (SupportsReportStatistics):
    * without them a V2 relation falls back to a spark.sql.defaultSizeInBytes
    * guess and a selective connector read on the small side of a join never
    * broadcasts — the difference between a broadcast hash join and shuffling
    * the 100-TB fact side. Row counts are the committed per-file counts and
    * sizes the committed file bytes, summed over exactly the files this
    * scan's predicate kept. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    planInputPartitions() // ensure the pruning pass ran (result is cached)
    val (rows, bytes) = statsInfo.getOrElse((0L, 0L))
    // ANALYZE-committed per-column NDV/null-count stats (Maintenance.analyze
    // → meta/stats.json): reported through the connector Statistics so
    // Catalyst's transformV2Stats turns them into attribute ColumnStats and
    // CBO join estimation sees distinct counts, not just rows/bytes.
    // Table-level and advisory (stale-allowed, like Iceberg puffin NDV) —
    // skipped for incremental reads, whose slice the table stats don't
    // describe.
    val colStats = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (fromSnapshot.isEmpty) {
      new GraftTable(SparkSession.active, location).tableStats.foreach {
        case (_, _, cols) =>
          required.fields.foreach { f =>
            cols.get(f.name).foreach { case (ndv, nulls) =>
              colStats.put(
                org.apache.spark.sql.connector.expressions.Expressions.column(f.name),
                new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
                  override def distinctCount(): java.util.OptionalLong =
                    java.util.OptionalLong.of(ndv)
                  override def nullCount(): java.util.OptionalLong =
                    java.util.OptionalLong.of(nulls)
                })
            }
          }
      }
    }
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = colStats
    }
  }

  override def description(): String = {
    val files = pruneInfo.map { case (k, t) => s" files=$k/$t" }.getOrElse("")
    val rt = if (runtime.nonEmpty) s" RuntimeFilters=[${runtime.mkString(", ")}]" else ""
    val inc = fromSnapshot.map(v => s" incrementalFrom=v$v").getOrElse("")
    val lim = limit.map(l => s" PushedLimit=$l").getOrElse("")
    val tn = topN.map { case (c, l) =>
      val served = if (topNCap.isDefined) "capped" else "uncapped"
      s" PushedTopN=$c ASC LIMIT $l ($served)"
    }.getOrElse("")
    s"GraftScan location=$location PushedFilters=[${pushed.mkString(", ")}]$rt$inc$lim$tn$files"
  }

  /** Manifest pruning runs DISTRIBUTED: the pushed filters become a Column
    * predicate over the manifest stats and prune the manifest DataFrame
    * BEFORE collecting — only surviving file paths ever reach the driver
    * (same planning cost prunedScan / FileSourceScan pay), never the full
    * entry rows. */
  override def planInputPartitions(): Array[InputPartition] = {
    val p = planned
    if (p != null) return p
    val out = planPartitions()
    planned = out
    out
  }

  /** Bloom-sidecar pruning for pushed POINT predicates (EqualTo/IN on a
    * column with a BloomIndex sidecar, e.g. commit): each file's filter is
    * probed DISTRIBUTED during the manifest-planning join; definite
    * negatives never open. Files newer than the sidecar have no row
    * (left join → kept), so appends after the index build are never
    * wrongly pruned, and the pushed filter stays residual row-level. */
  private def bloomPruned(table: GraftTable,
                          man: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    BloomIndex.prunedManifest(table, man, pushed ++ runtime)

  private def planPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val table = new GraftTable(spark, location)
    val snap = snapshot match {
      case Some(v) => Some(table.snapshot(v).getOrElse(throw new IllegalArgumentException(
        s"graft table $location has no snapshot $v (expired or never committed)")))
      case None => table.currentSnapshot
    }
    snap match {
      case None => Array.empty
      case Some(s) =>
        import spark.implicits._
        // incremental read: only the entries APPENDED in (fromSnapshot, s]
        // — stats pruning and projection apply to the changelog slice the
        // same way they apply to a full read
        val m = fromSnapshot match {
          case Some(from) => table.incrementalEntries(from, s.version)
          case None => table.manifest(s)
        }
        // total for the pruning ratio comes free from the snapshot's
        // arithmetic file count; a count job only for pre-field tables
        val total =
          if (fromSnapshot.isDefined) m.count().toInt
          else if (s.fileCount >= 0) s.fileCount.toInt
          else m.count().toInt
        // pending merge-on-read deletes: plan from the seq-tagged manifest
        // and ship each partition its add seq + the eqdel shard locations so
        // the reader can apply the deletes per task (row-reader path; stats
        // then over-count by the not-yet-materialized deleted rows — an
        // upper bound, same direction Iceberg's stats drift under MoR)
        val eqdels =
          if (fromSnapshot.isDefined) Seq.empty // appends after a delete are unaffected by it
          else table.eqDeleteShards(s).map(sh => table.io.abs(sh.path).toString)
        val posdels =
          if (fromSnapshot.isDefined) Seq.empty
          else table.posDeleteShards(s).map(sh => table.io.abs(sh.path).toString)
        // bucket pruning (distributed, before the collect): point/IN
        // predicates on the bucket column pin the exact candidate buckets
        val spec = if (fromSnapshot.isEmpty) table.bucketSpec else None
        val bucketPred = GraftScan.bucketPredicate(spec.flatMap { case (c, n) =>
          GraftScan.candidateBuckets(pushed ++ runtime, c, n)
        })
        if (eqdels.nonEmpty || posdels.nonEmpty) {
          bucketInfo = None // pending MoR deletes: row path, no key grouping
          topNCap = None    // surviving-row prefixes are not sorted prefixes
          val kept = bloomPruned(table, table.manifestWithSeq(s))
            .filter(GraftScan.manifestPredicate(pushed ++ runtime) && bucketPred)
            .select("file_path", "record_count", "file_bytes", "add_seq")
            .as[(String, Long, Long, Long)].collect()
          pruneInfo = Some((kept.length, total))
          statsInfo = Some((kept.map(_._2).sum, kept.map(_._3).sum))
          kept.map { case (p, _, _, seq) =>
            GraftInputPartition(table.io.abs(p).toString, seq, eqdels, posdels)
              .asInstanceOf[InputPartition]
          }
        } else {
          val keptAll = bloomPruned(table, m)
            .filter(GraftScan.manifestPredicate(pushed ++ runtime) && bucketPred)
            .select("file_path", "record_count", "file_bytes", "bucket")
            .as[(String, Long, Long, Option[Int])].collect()
          // pushed LIMIT: keep only the fewest files whose exact committed
          // record_counts cover it (largest-first, path tiebreak for
          // determinism) — `LIMIT 10` plans one file, not the whole table.
          // Sound because this branch has no pending deletes (counts exact)
          // and a partially-pushed limit keeps Spark's global Limit above.
          val kept = limit match {
            case Some(l) if keptAll.length > 1 =>
              val sorted = keptAll.sortBy(k => (-k._2, k._1))
              var cum = 0L
              var n = 0
              while (n < sorted.length && cum < l) { cum += sorted(n)._2; n += 1 }
              sorted.take(n)
            case _ => keptAll
          }
          pruneInfo = Some((kept.length, total))
          statsInfo = Some((kept.map(_._2).sum, kept.map(_._3).sum))
          // bucket grouping: only for a full-table (non-incremental) batch
          // read whose EVERY surviving file carries a valid bucket id; a
          // limit-truncated plan never reports key grouping (its partition
          // values would be incomplete, and no join sits under a limit)
          val grouped = spec.filter { case (_, n) =>
            limit.isEmpty && kept.forall(_._4.exists(b => b >= 0 && b < n))
          }
          grouped match {
            case Some((c, n)) =>
              bucketInfo = Some((c, n))
              val byBucket = kept.groupBy(_._4.get)
              // ordering is reportable only while every bucket is a single
              // sorted file (concatenated files would break it)
              orderInfo = table.bucketSorted && byBucket.values.forall(_.length <= 1)
              // a pushed TopN caps readers only once planning CONFIRMS the
              // sorted-single-file-per-bucket layout on the TopN's column
              topNCap = topN.collect { case (col, l) if orderInfo && col == c => l }
              // OCCUPIED buckets only: Spark's key-grouped machinery fills
              // value-set gaps between the two join sides itself
              // (pushPartValues); reporting empty phantom partitions instead
              // breaks its duplicate-value grouping under reduced
              // (mismatched-bucket-count) transforms
              byBucket.toArray.sortBy(_._1).map { case (b, ks) =>
                GraftBucketedPartition(b,
                  ks.map(k => table.io.abs(k._1).toString).toSeq): InputPartition
              }
            case None =>
              bucketInfo = None
              orderInfo = false
              topNCap = None
              kept.map { case (p, _, _, _) =>
                GraftInputPartition(table.io.abs(p).toString).asInstanceOf[InputPartition]
              }
          }
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    planInputPartitions() // resolves the TopN cap from the planned layout
    new GraftReaderFactory(required, columnar, limit.orElse(topNCap),
      pushed ++ runtime)
  }

  /** `spark.readStream.format("graft")`: each microbatch is the appends-only
    * changelog between two snapshot versions. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(location, pushed, required, columnar, fromSnapshot,
      maxVersionsPerBatch)
}

/** STREAMING source over the lake table (the Iceberg-style streaming read):
  * offsets are SNAPSHOT VERSIONS, and a microbatch (start, end] plans the
  * same appends-only changelog `incrementalEntries` serves for batch — new
  * appends become microbatches as they commit, rowset-preserving maintenance
  * between them contributes no rows, and a merge/delete fails the stream
  * loudly (start past it with .option("fromSnapshot", v)). Offsets live in
  * the sink checkpoint, so a restarted stream resumes exactly after the last
  * committed snapshot — the lake's own snapshot log IS the source's
  * write-ahead log, no sidecar state. Pushed filters still prune the
  * changelog's files by manifest stats before any file is opened. */
class GraftMicroBatchStream(location: String, pushed: Array[Filter],
                            required: StructType, columnar: Boolean,
                            fromSnapshot: Option[Long],
                            maxVersionsPerBatch: Option[Long] = None)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class V(v: Long) extends Offset { override def json: String = v.toString }
  private def table = new GraftTable(SparkSession.active, location)
  // AvailableNow pins the end version ONCE at query start, so the run drains
  // a consistent prefix even while writers keep committing
  @volatile private var availableNowEnd: Option[Long] = None

  override def initialOffset(): Offset = V(fromSnapshot.getOrElse(0L))
  override def latestOffset(): Offset = V(table.currentVersion)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableNowEnd.getOrElse(table.currentVersion)
    val capped = maxVersionsPerBatch match {
      case Some(k) => math.min(target, start.asInstanceOf[V].v + k)
      case None => target
    }
    V(capped)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(table.currentVersion)
  override def deserializeOffset(json: String): Offset = V(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[V].v
    val to = end.asInstanceOf[V].v
    if (to <= from) return Array.empty
    val spark = SparkSession.active
    import spark.implicits._
    val t = table
    t.incrementalEntries(from, to)
      .filter(GraftScan.manifestPredicate(pushed))
      .select("file_path").as[String].collect()
      .map(p => GraftInputPartition(t.io.abs(p).toString).asInstanceOf[InputPartition])
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, columnar, None, pushed)
}

object GraftScan {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** pushed-filter → manifest-stats predicate translation. Missing stats
    * (null min/max — e.g. a file whose every value is null) must KEEP the
    * file: every comparison is wrapped in coalesce(..., true) so correctness
    * never depends on the stats, matching the residual-filter contract. */
  def manifestPredicate(filters: Array[Filter]): Column =
    filters.map(toCol).foldLeft(lit(true))(_ && _)

  private def keepIfUnknown(c: Column): Column = coalesce(c, lit(true))

  private def toCol(f: Filter): Column = f match {
    case EqualTo("repo", v: String) =>
      keepIfUnknown(col("min_repo") <= v && col("max_repo") >= v)
    case EqualTo("path", v: String) =>
      keepIfUnknown(col("min_path") <= v && col("max_path") >= v)
    case EqualTo("lang", v: String) =>
      keepIfUnknown(array_contains(col("langs"), v))
    case GreaterThan("repo", v: String) => keepIfUnknown(col("max_repo") > v)
    case GreaterThanOrEqual("repo", v: String) => keepIfUnknown(col("max_repo") >= v)
    case LessThan("repo", v: String) => keepIfUnknown(col("min_repo") < v)
    case LessThanOrEqual("repo", v: String) => keepIfUnknown(col("min_repo") <= v)
    case GreaterThan("path", v: String) => keepIfUnknown(col("max_path") > v)
    case GreaterThanOrEqual("path", v: String) => keepIfUnknown(col("max_path") >= v)
    case LessThan("path", v: String) => keepIfUnknown(col("min_path") < v)
    case LessThanOrEqual("path", v: String) => keepIfUnknown(col("min_path") <= v)
    case In("repo", vs) =>
      vs.map {
        case v: String => keepIfUnknown(col("min_repo") <= v && col("max_repo") >= v)
        case _ => lit(true)
      }.foldLeft(lit(false))(_ || _)
    case In("lang", vs) =>
      vs.map {
        case v: String => keepIfUnknown(array_contains(col("langs"), v))
        case _ => lit(true)
      }.foldLeft(lit(false))(_ || _)
    case StringStartsWith("repo", p: String) => startsWithCol("repo", p)
    case StringStartsWith("path", p: String) => startsWithCol("path", p)
    // null-count pruning: a null-free file can't satisfy IS NULL, an
    // all-null file can't satisfy IS NOT NULL (nulls_* null = pre-field
    // manifest → keep, pruning is never optimistic)
    case IsNull(c) if c == "repo" || c == "path" || c == "lang" =>
      keepIfUnknown(col(s"nulls_$c") > 0L)
    case IsNotNull(c) if c == "repo" || c == "path" || c == "lang" =>
      keepIfUnknown(col(s"nulls_$c") < col("record_count"))
    case And(l, r) => toCol(l) && toCol(r)
    case Or(l, r) => toCol(l) || toCol(r)
    case _ => lit(true)
  }

  /** startsWith pruning: strings with prefix p lie in [p, nextPrefix(p)),
    * where nextPrefix increments the last non-U+FFFF char. A prefix composed
    * ENTIRELY of U+FFFF has no finite string upper bound — there emit only
    * the lower-bound conjunct, never a fabricated `min < U+FFFF` that would
    * wrongly prune files whose min is itself >= U+FFFF yet contains
    * prefixed strings (file-level pruning loss is unrepairable by the
    * residual filters). */
  private def startsWithCol(field: String, p: String): Column =
    nextPrefix(p) match {
      case Some(np) =>
        keepIfUnknown(col(s"max_$field") >= p && col(s"min_$field") < np)
      case None => keepIfUnknown(col(s"max_$field") >= p)
    }

  /** smallest string greater than every string with prefix `p`, or None if
    * no such string exists (prefix is all U+FFFF). */
  private def nextPrefix(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) == '\uFFFF') i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  /** BUCKET pruning: on a bucket-clustered table, an equality/IN predicate
    * on the bucket column pins the exact bucket ids that can hold matching
    * rows \u2014 far stronger than min/max stats, which a hash layout spreads to
    * near-uselessness (every bucket-pure file spans most of the key range).
    * Returns the candidate bucket set, or None when the filters cannot bound
    * it. Unbucketed entries (bucket IS NULL) are always kept \u2014 pruning must
    * never lose rows from files written before bucketing. */
  private[lake] def candidateBuckets(filters: Array[Filter], column: String,
                                     n: Int): Option[Set[Int]] = {
    def bucketOf(v: String): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(org.apache.spark.unsafe.types.UTF8String.fromString(v),
          org.apache.spark.sql.types.StringType, 42L)
      (((h % n) + n) % n).toInt
    }
    def of(f: Filter): Option[Set[Int]] = f match {
      case EqualTo(a, v: String) if a == column => Some(Set(bucketOf(v)))
      case In(a, vs) if a == column =>
        val strs = vs.collect { case s: String => s }
        if (strs.length == vs.length) Some(strs.map(bucketOf).toSet) else None
      case And(l, r) => (of(l), of(r)) match {
        case (Some(a), Some(b)) => Some(a intersect b)
        case (a, b) => a.orElse(b)
      }
      case Or(l, r) => for { a <- of(l); b <- of(r) } yield a union b
      case _ => None
    }
    filters.flatMap(of).reduceOption(_ intersect _)
  }

  /** the manifest-DataFrame predicate for candidateBuckets \u2014 applied
    * DISTRIBUTED, before the planning collect. */
  private[lake] def bucketPredicate(cands: Option[Set[Int]]): Column =
    cands match {
      case Some(bs) => col("bucket").isNull || col("bucket").isin(bs.toSeq: _*)
      case None => lit(true)
    }
}

/** addSeq/eqDeletes/posDeletes carry the merge-on-read delete state when
  * the scanned snapshot has pending delete shards: the reader filters rows
  * whose key is equality-deleted at a seq GREATER than the file's add seq
  * (the sequence rule), and rows whose (file, ordinal) address is position-
  * deleted. Defaults mean "no pending deletes" — the common case. */
case class GraftInputPartition(absPath: String, addSeq: Long = Long.MaxValue,
                               eqDeletes: Seq[String] = Nil,
                               posDeletes: Seq[String] = Nil) extends InputPartition

/** One partition per storage bucket (possibly several bucket-pure files,
  * possibly none — empty buckets are still emitted so both sides of a
  * storage-partitioned join expose identical partition-value sets). The
  * partition key is the bucket id, which Spark's KeyGroupedPartitioning
  * machinery aligns across the join. */
case class GraftBucketedPartition(bucket: Int, absPaths: Seq[String])
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** Scan produced when a COMPLETE aggregate pushdown succeeded: the answer is
  * computed by ONE small distributed job over the live manifest entries
  * (Σ record_count / min / max — a few rows per data file, never the data),
  * then shipped to the executor as a single one-row partition. Deliberately
  * NOT SupportsRuntimeFiltering: this scan's output is the aggregate row,
  * not pruneable source rows. */
class GraftAggScan(location: String, snapshot: Option[Long],
                   aggs: Seq[GraftAggScan.PushedAgg])
  extends Scan with Batch {
  import GraftAggScan._

  override def readSchema(): StructType = StructType(aggs.map {
    case CountStarAgg => StructField("count_star", LongType, nullable = false)
    case MinAgg(c, dt) => StructField(s"min_$c", dt)
    case MaxAgg(c, dt) => StructField(s"max_$c", dt)
  })
  override def toBatch: Batch = this

  override def description(): String =
    s"GraftAggScan location=$location PushedAggregates=[${aggs.map(_.sql).mkString(", ")}] (manifest stats only, zero data files read)"

  override def planInputPartitions(): Array[InputPartition] = {
    import org.apache.spark.sql.functions._
    // a global aggregate whose outputs were ALL pruned away (e.g. the query
    // only counts the rows of the one-row agg result) still produces exactly
    // one row — of zero columns, no manifest job needed
    if (aggs.isEmpty) return Array(GraftAggPartition(Array.empty))
    val spark = SparkSession.active
    val table = new GraftTable(spark, location)
    val snap = snapshot match {
      case Some(v) => Some(table.snapshot(v).getOrElse(throw new IllegalArgumentException(
        s"graft table $location has no snapshot $v (expired or never committed)")))
      case None => table.currentSnapshot
    }
    val values: Array[Any] = snap match {
      case None => aggs.map {
        case CountStarAgg => 0L: Any
        case _ => null: Any
      }.toArray
      case Some(s) =>
        val m = table.manifest(s)
        val cols = aggs.zipWithIndex.map { case (a, i) =>
          (a match {
            // empty manifest: count is 0, min/max are null — the exact
            // values Spark's aggregate produces over an empty table
            case CountStarAgg => coalesce(sum(col("record_count")), lit(0L))
            // lang has no scalar min/max stat, but `langs` is the file's
            // EXACT distinct set — its array min/max are exact file bounds
            case MinAgg("lang", _) => min(array_min(col("langs")))
            case MaxAgg("lang", _) => max(array_max(col("langs")))
            case MinAgg(c, _) => min(col(s"min_$c"))
            case MaxAgg(c, _) => max(col(s"max_$c"))
          }).as(s"a$i")
        }
        val row = m.agg(cols.head, cols.tail: _*).head()
        aggs.indices.map(i => row.get(i): Any).toArray
    }
    Array(GraftAggPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftAggReaderFactory
}

object GraftAggScan {
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate._

  sealed trait PushedAgg { def sql: String }
  case object CountStarAgg extends PushedAgg { val sql = "COUNT(*)" }
  case class MinAgg(col: String, dt: DataType) extends PushedAgg { def sql = s"MIN($col)" }
  case class MaxAgg(col: String, dt: DataType) extends PushedAgg { def sql = s"MAX($col)" }

  /** columns whose manifest stats are EXACT table-wide bounds. */
  private val statCols: Map[String, DataType] = Map(
    "repo" -> StringType, "path" -> StringType, "lang" -> StringType,
    "z" -> LongType)

  private def simpleCol(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
      case _ => None
    }

  /** Some(pushed aggs) iff EVERY aggregate is answerable exactly from the
    * manifest; any unsupported function (SUM, AVG, COUNT(col) — no null
    * counts in the stats) or any GROUP BY refuses the whole pushdown. */
  def translate(agg: Aggregation): Option[Seq[PushedAgg]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val out = agg.aggregateExpressions.map {
      case _: CountStar => Some(CountStarAgg)
      case m: Min => simpleCol(m.column).flatMap(c => statCols.get(c).map(MinAgg(c, _)))
      case m: Max => simpleCol(m.column).flatMap(c => statCols.get(c).map(MaxAgg(c, _)))
      case _ => None
    }
    if (out.forall(_.isDefined)) Some(out.toSeq.flatten) else None
  }
}

case class GraftAggPartition(values: Array[Any]) extends InputPartition

class GraftAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val vals = p.asInstanceOf[GraftAggPartition].values
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(
        vals.map {
          case s: String => UTF8String.fromString(s): Any
          case x => x
        })
      override def close(): Unit = ()
    }
}

/** COLUMNAR read path (VERDICT r4 #1): each data file is decoded straight
  * into ColumnarBatches by Spark's own VectorizedParquetRecordReader — the
  * same vectorized decoder FileSourceScan uses, so the connector scan keeps
  * whole-stage codegen's batch iteration instead of materializing one
  * InternalRow object per row through parquet-mr's Group API. Columns
  * missing from a file's footer (schema evolution) are spliced in as
  * constant null vectors; the row-at-a-time Group reader remains only as
  * the non-columnar fallback Spark may request. */
class GraftReaderFactory(required: StructType, columnar: Boolean = true,
                         limit: Option[Int] = None,
                         pushed: Array[Filter] = Array.empty)
  extends PartitionReaderFactory {
  private val columns = required.fieldNames
  // session Hadoop overrides captured at plan time; installed executor-side
  // when a task builds its reader so the static delete-shard loaders (which
  // cannot receive a bag) see them too (LakeConf scaladoc)
  private val confBag = LakeConf.capture()

  /** per-partition, but uniform per scan: a scan either planned with
    * pending MoR deletes (every partition carries them → row path, which
    * can filter) or without (→ columnar). Never mixed. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition match {
      case p: GraftInputPartition =>
        columnar && p.eqDeletes.isEmpty && p.posDeletes.isEmpty
      case _: GraftBucketedPartition => columnar
    }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    LakeConf.install(confBag)
    val inner = partition match {
      case p: GraftInputPartition =>
        new GraftColumnarPartitionReader(p.absPath, required, pushed, confBag)
      case b: GraftBucketedPartition =>
        GraftChainedReader.columnar(b.absPaths, required, pushed, confBag)
    }
    limit.fold(inner)(GraftLimitReaders.columnar(inner, _))
  }

  private val fieldTypes: Map[String, DataType] =
    required.fields.map(f => f.name -> f.dataType).toMap

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    LakeConf.install(confBag)
    val inner = partition match {
      case p: GraftInputPartition =>
        if (p.eqDeletes.isEmpty && p.posDeletes.isEmpty)
          new GraftPartitionReader(p.absPath, columns, fieldTypes, confBag)
        else
          new GraftMorFilteringReader(p.absPath, columns, p.addSeq, p.eqDeletes,
            fieldTypes, p.posDeletes, confBag)
      case b: GraftBucketedPartition =>
        GraftChainedReader.rows(b.absPaths, columns, fieldTypes, confBag)
    }
    limit.fold(inner)(GraftLimitReaders.rows(inner, _))
  }
}

/** Pushed-filter → parquet FilterPredicate translation for ROW-GROUP and
  * PAGE (column-index) stats pruning inside data files. Conservative by
  * construction: untranslatable leaves drop out of an AND (keeping more),
  * void an OR entirely, and the whole translation returns None rather than
  * guess — parquet's statistics/column-index filters then only drop
  * groups/pages whose stats PROVE no match, and string stats compare with
  * the UTF8 (unsigned lexicographic) comparator, the same ordering Spark's
  * UTF8String uses. Scope is the base-schema columns every data file is
  * guaranteed to carry (a predicate on an evolved column would make
  * parquet's schema validator throw on pre-evolution files); `z` rides
  * along as INT64 so post-`cluster` curve-range scans prune too. All
  * filters stay residual row-level in Spark, so this can only skip IO,
  * never rows that matter. */
private[lake] object GraftParquetFilters {
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.io.api.Binary

  private val stringCols = Set("repo", "path", "lang", "commit")
  private val longCols = Set("z")
  private def bin(c: String) = FilterApi.binaryColumn(c)
  private def b(v: String) = Binary.fromString(v)
  private def lng(c: String) = FilterApi.longColumn(c)
  private def l(v: Any): java.lang.Long = v match {
    case x: Long => Long.box(x)
    case x: Int => Long.box(x.toLong)
    case x: java.lang.Long => x
    case x: java.lang.Integer => Long.box(x.longValue())
  }
  private def isLongVal(v: Any): Boolean = v match {
    case _: Long | _: Int | _: java.lang.Long | _: java.lang.Integer => true
    case _ => false
  }

  def translate(filters: Array[Filter]): Option[FilterPredicate] =
    filters.flatMap(toPred).reduceOption(FilterApi.and)

  private def toPred(f: Filter): Option[FilterPredicate] = f match {
    case EqualTo(c, v: String) if stringCols(c) => Some(FilterApi.eq(bin(c), b(v)))
    case GreaterThan(c, v: String) if stringCols(c) => Some(FilterApi.gt(bin(c), b(v)))
    case GreaterThanOrEqual(c, v: String) if stringCols(c) => Some(FilterApi.gtEq(bin(c), b(v)))
    case LessThan(c, v: String) if stringCols(c) => Some(FilterApi.lt(bin(c), b(v)))
    case LessThanOrEqual(c, v: String) if stringCols(c) => Some(FilterApi.ltEq(bin(c), b(v)))
    case In(c, vs) if stringCols(c) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      vs.map(v => FilterApi.eq(bin(c), b(v.asInstanceOf[String])): FilterPredicate)
        .reduceOption(FilterApi.or)
    case EqualTo(c, v) if longCols(c) && isLongVal(v) => Some(FilterApi.eq(lng(c), l(v)))
    case GreaterThan(c, v) if longCols(c) && isLongVal(v) => Some(FilterApi.gt(lng(c), l(v)))
    case GreaterThanOrEqual(c, v) if longCols(c) && isLongVal(v) => Some(FilterApi.gtEq(lng(c), l(v)))
    case LessThan(c, v) if longCols(c) && isLongVal(v) => Some(FilterApi.lt(lng(c), l(v)))
    case LessThanOrEqual(c, v) if longCols(c) && isLongVal(v) => Some(FilterApi.ltEq(lng(c), l(v)))
    case In(c, vs) if longCols(c) && vs.nonEmpty && vs.forall(isLongVal) =>
      vs.map(v => FilterApi.eq(lng(c), l(v)): FilterPredicate).reduceOption(FilterApi.or)
    // null tests prune via per-group/page null counts (eq/notEq against a
    // null value are parquet's is-null / is-not-null forms)
    case IsNull(c) if stringCols(c) =>
      Some(FilterApi.eq(bin(c), null: Binary))
    case IsNotNull(c) if stringCols(c) =>
      Some(FilterApi.notEq(bin(c), null: Binary))
    case IsNull(c) if longCols(c) =>
      Some(FilterApi.eq(lng(c), null: java.lang.Long))
    case IsNotNull(c) if longCols(c) =>
      Some(FilterApi.notEq(lng(c), null: java.lang.Long))
    case And(l, r) => (toPred(l), toPred(r)) match {
      case (Some(a), Some(c)) => Some(FilterApi.and(a, c))
      case (a, c) => a.orElse(c) // the untranslatable side keeps everything
    }
    case Or(l, r) => for { a <- toPred(l); c <- toPred(r) } yield FilterApi.or(a, c)
    case _ => None
  }
}

/** Per-partition row caps for a pushed LIMIT: the limit is PARTIALLY pushed
  * (Spark keeps the global Limit), so each partition may stop after `limit`
  * rows — a partition can never contribute more than the whole query needs.
  * The columnar flavor truncates the final batch in place via setNumRows. */
object GraftLimitReaders {
  def rows(inner: PartitionReader[InternalRow], limit: Int)
      : PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var remaining = limit
      override def next(): Boolean =
        remaining > 0 && inner.next() && { remaining -= 1; true }
      override def get(): InternalRow = inner.get()
      override def close(): Unit = inner.close()
    }

  def columnar(inner: PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch],
               limit: Int)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
      private var remaining = limit
      override def next(): Boolean = remaining > 0 && inner.next()
      override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = {
        val b = inner.get()
        if (b.numRows > remaining) b.setNumRows(remaining)
        remaining -= b.numRows
        b
      }
      override def close(): Unit = inner.close()
    }
}

/** Sequential concatenation of per-file readers — a bucketed partition may
  * hold several bucket-pure files (appends after bucketize); each is opened
  * only when its predecessor is exhausted, so memory stays one-file-bounded. */
object GraftChainedReader {
  def columnar(paths: Seq[String], required: StructType,
               pushed: Array[Filter] = Array.empty,
               confBag: Array[(String, String)] = Array.empty)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    chain(paths, p => new GraftColumnarPartitionReader(p, required, pushed, confBag))

  def rows(paths: Seq[String], columns: Array[String],
           types: Map[String, DataType] = Map.empty,
           confBag: Array[(String, String)] = Array.empty): PartitionReader[InternalRow] =
    chain(paths, p => new GraftPartitionReader(p, columns, types, confBag))

  private def chain[T](paths: Seq[String],
                       open: String => PartitionReader[T]): PartitionReader[T] =
    new PartitionReader[T] {
      private val it = paths.iterator
      private var cur: PartitionReader[T] = _
      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (!it.hasNext) return false
            cur = open(it.next())
          }
          if (cur.next()) return true
          cur.close(); cur = null
        }
        false
      }
      override def get(): T = cur.get()
      override def close(): Unit = if (cur != null) { cur.close(); cur = null }
    }
}

/** Vectorized per-file reader: next()/get() surface one ColumnarBatch per
  * call. Projection is the `required` schema intersected with the file's
  * own footer (order preserved); absent columns become constant null
  * vectors so schema evolution never fails the batch path. */
class GraftColumnarPartitionReader(absPath: String, required: StructType,
                                   pushed: Array[Filter] = Array.empty,
                                   confBag: Array[(String, String)] = Array.empty)
  extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
  import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
  import org.apache.hadoop.conf.Configuration

  private val columns = required.fieldNames
  // ROW-GROUP pruning: the pushed (always-residual) filters translate to a
  // parquet FilterPredicate, and ParquetFileReader drops whole row groups
  // whose stats prove no row can match — inside-the-file pruning the
  // manifest's file-level min/max can't see (a 1-GB file with 8 row groups
  // and a selective predicate decodes 1 group, not 8). Sound because every
  // filter stays residual row-level in Spark, so dropping definite
  // non-matches can never change the result. DISABLED when `_pos` is
  // requested: the file-ordinal metadata column counts rows as read, and a
  // skipped group would shift every later ordinal (positional deletes and
  // delta DML address rows by it).
  private val rowGroupFilter: Option[org.apache.parquet.filter2.predicate.FilterPredicate] =
    if (columns.contains("_pos")) None else GraftParquetFilters.translate(pushed)

  // one ParquetFileReader serves the footer probe AND the page reads (the
  // previous shape opened the footer twice: once to project, once to read)
  private val pfr: org.apache.parquet.hadoop.ParquetFileReader = {
    val conf = LakeConf.restore(confBag)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(absPath), conf)
    val b = org.apache.parquet.HadoopReadOptions.builder(conf)
    rowGroupFilter.foreach(p =>
      b.withRecordFilter(org.apache.parquet.filter2.compat.FilterCompat.get(p)))
    new org.apache.parquet.hadoop.ParquetFileReader(in, b.build())
  }
  private val fileSchema = pfr.getFooter.getFileMetaData.getSchema
  private val present: Array[String] = columns.filter(fileSchema.containsField)
  // post-filter row count: with a filter the PAGE-level (column-index) path
  // is used, so the count is the filtered row-range total; without one it is
  // the footer count
  private val fileRows: Long =
    if (rowGroupFilter.isDefined) pfr.getFilteredRecordCount else pfr.getRecordCount
  private val allPresent = present.length == columns.length
  private val presentIdx: Map[String, Int] = present.zipWithIndex.toMap
  @volatile private var pfrClosed = false
  private def closePfr(): Unit = if (!pfrClosed) { pfrClosed = true; pfr.close() }

  private val reader: VectorizedParquetRecordReader =
    if (present.isEmpty) { closePfr(); null }
    else {
      val req = new org.apache.parquet.schema.MessageType(fileSchema.getName,
        present.map(c => fileSchema.getType(Seq(c): _*)): _*)
      pfr.setRequestedSchema(req) // column projection for the page reads
      val r = new VectorizedParquetRecordReader(
        /* useOffHeap = */ false, /* capacity = */ 4096)
      // with a filter, read FILTERED row groups: parquet applies the
      // row-group statistics filter AND the column-index (page-level)
      // filter, and the surviving pages carry row indexes the vectorized
      // decoder uses for synchronized row skipping across columns — the
      // exact read path Spark's own parquet source drives (its
      // ParquetRowGroupReaderImpl delegates to readNextFilteredRowGroup)
      val nextGroup: () => org.apache.parquet.column.page.PageReadStore =
        if (rowGroupFilter.isDefined) () => pfr.readNextFilteredRowGroup()
        else () => pfr.readNextRowGroup()
      org.apache.spark.sql.execution.datasources.parquet.GraftVectorizedReaderBridge
        .init(r, fileSchema, req, nextGroup, () => closePfr(), fileRows.toInt)
      r.resultBatch() // allocates the column vectors (initBatch) — nextBatch
      r               // NPEs if called before the batch exists
    }
  private var emittedEmpty = false

  override def next(): Boolean =
    if (reader != null) reader.nextBatch()
    else if (!emittedEmpty && fileRows > 0) { emittedEmpty = true; true }
    else false

  override def get(): ColumnarBatch = {
    if (reader == null) {
      // no requested column exists in this file: all-null constant vectors
      // carrying the footer's row count (O(1) memory regardless of rows)
      val n = fileRows.toInt
      val b = new ColumnarBatch(
        columns.indices.map(i => missingVec(i, n)).toArray, n)
      posOffset += n
      return b
    }
    val inner = reader.resultBatch()
    if (allPresent) inner
    else {
      val n = inner.numRows()
      val vecs = new Array[ColumnVector](columns.length)
      var i = 0
      while (i < columns.length) {
        vecs(i) = presentIdx.get(columns(i)) match {
          case Some(j) => inner.column(j)
          case None => missingVec(i, n)
        }
        i += 1
      }
      posOffset += n
      new ColumnarBatch(vecs, n)
    }
  }

  // running file-ordinal offset for the `_pos` metadata column — the
  // vectorized reader never skips rows (no parquet filter pushed), so batch
  // row counts sum to exact file positions
  private var posOffset = 0L

  /** a requested column absent from the file's footer: `_file` is the
    * reader's own path, `_pos` the row's file ordinal (metadata columns),
    * anything else reads as null (schema evolution). */
  private def missingVec(fieldIdx: Int, n: Int): ColumnVector = {
    if (columns(fieldIdx) == "_pos") {
      val v = new org.apache.spark.sql.execution.vectorized.OnHeapColumnVector(n, LongType)
      var i = 0
      while (i < n) { v.putLong(i, posOffset + i); i += 1 }
      return v
    }
    val v = new ConstantColumnVector(n, required.fields(fieldIdx).dataType)
    if (columns(fieldIdx) == "_file")
      v.setUtf8String(UTF8String.fromString(absPath))
    else v.setNull()
    v
  }

  override def close(): Unit = {
    if (reader != null) reader.close()
    closePfr()
  }
}

class GraftPartitionReader(absPath: String, columns: Array[String],
                           types: Map[String, DataType] = Map.empty,
                           confBag: Array[(String, String)] = Array.empty)
  extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group
  import org.apache.hadoop.conf.Configuration

  // per-column Spark type for the typed Group accessors; base columns are
  // strings apart from z, evolved columns carry their declared type
  private val dts: Array[DataType] = columns.map { c =>
    types.getOrElse(c, if (c == "z") LongType else StringType)
  }

  private val conf = LakeConf.restore(confBag)
  locally {
    // projection pushdown: request only the needed columns, with each
    // field's type/repetition taken from the FILE's own footer — files
    // written by different writers disagree on e.g. z's requiredness, and
    // parquet-mr rejects a projection whose repetition mismatches
    if (columns.nonEmpty) {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(absPath), conf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val fileSchema = try rd.getFooter.getFileMetaData.getSchema finally rd.close()
      val fields = columns.toSeq.filter(fileSchema.containsField)
        .map(c => fileSchema.getType(fileSchema.getFieldIndex(c)))
      if (fields.nonEmpty) {
        val proj = new org.apache.parquet.schema.MessageType("graft", fields: _*)
        conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
          proj.toString)
      }
    }
  }
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(absPath))
      .withConf(conf).build()
  private var cur: Group = _
  // `_pos` metadata column: this reader walks the file sequentially with
  // nothing skipped, so its row count IS the file ordinal
  private var ordinal = -1L

  override def next(): Boolean = { cur = reader.read(); ordinal += 1; cur != null }

  // `_file` metadata column: the reader knows its own file
  private val filePathUtf8 = UTF8String.fromString(absPath)

  override def get(): InternalRow = {
    val row = new GenericInternalRow(columns.length)
    var i = 0
    while (i < columns.length) {
      val c = columns(i)
      if (c == "_file") { row.update(i, filePathUtf8); i += 1 }
      else if (c == "_pos") { row.setLong(i, ordinal); i += 1 }
      else {
      val present = cur.getType.containsField(c) &&
        cur.getFieldRepetitionCount(cur.getType.getFieldIndex(c)) > 0
      if (!present) row.setNullAt(i)
      else dts(i) match {
        case LongType    => row.setLong(i, cur.getLong(c, 0))
        case IntegerType => row.setInt(i, cur.getInteger(c, 0))
        case DoubleType  => row.setDouble(i, cur.getDouble(c, 0))
        case FloatType   => row.setFloat(i, cur.getFloat(c, 0))
        case BooleanType => row.setBoolean(i, cur.getBoolean(c, 0))
        case _           => row.update(i, UTF8String.fromString(cur.getString(c, 0)))
      }
      i += 1
      }
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** Row reader applying pending MERGE-ON-READ deletes per task (the Iceberg
  * equality-delete read shape: the key set is loaded into task memory once
  * per executor and each row probes it). The key columns are read in
  * addition to the projection when the query didn't ask for them, used for
  * the probe, and dropped from the emitted row. A row is deleted when its
  * (repo, path, commit) key appears with del_seq > the file's add seq. */
class GraftMorFilteringReader(absPath: String, outColumns: Array[String],
                              addSeq: Long, eqDeletes: Seq[String],
                              types: Map[String, DataType] = Map.empty,
                              posDeletes: Seq[String] = Nil,
                              confBag: Array[(String, String)] = Array.empty)
  extends PartitionReader[InternalRow] {
  // equality probing needs the key columns; a posdel-only scan must NOT
  // widen its read set for keys it will never compare
  private val keyCols =
    if (eqDeletes.isEmpty) Array.empty[String] else Array("repo", "path", "commit")
  private val readCols = (outColumns ++ keyCols).distinct
  private val inner = new GraftPartitionReader(absPath, readCols, types, confBag)
  private val identity = readCols.sameElements(outColumns)
  private val outIdx = outColumns.map(c => readCols.indexOf(c))
  private val keyIdx = keyCols.map(c => readCols.indexOf(c))
  private lazy val dels = GraftEqDeletes.keyMap(eqDeletes)
  // position deletes for THIS file: the inner reader walks the parquet file
  // sequentially with nothing skipped, so its row count IS the file ordinal
  private lazy val posDels: java.util.HashSet[java.lang.Long] =
    GraftPosDeletes.forFile(posDeletes, GraftPosDeletes.relOf(absPath))
  private var ordinal = -1L
  private var cur: InternalRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      ordinal += 1
      if (posDeletes.isEmpty || !posDels.contains(ordinal)) {
      val row = inner.get()
      val r = row.asInstanceOf[GenericInternalRow]
      val key = if (eqDeletes.isEmpty) null else GraftEqDeletes.key(
        strOf(r, keyIdx(0)), strOf(r, keyIdx(1)), strOf(r, keyIdx(2)))
      val d = if (key == null) null else dels.get(key)
      // a null key column can never equal a delete key - keep the row
      if (d == null || addSeq >= d.longValue()) {
        cur =
          if (identity) row
          else {
            val out = new GenericInternalRow(outColumns.length)
            var i = 0
            while (i < outColumns.length) {
              out.update(i, valueAt(r, outIdx(i)))
              i += 1
            }
            out
          }
        return true
      }
      }
    }
    false
  }

  // values are read back type-agnostically (the row holds UTF8String or
  // java.lang.Long); isNullAt/get with the right ordinal avoids the
  // protected genericGet accessor
  private def valueAt(r: GenericInternalRow, i: Int): Any =
    if (r.isNullAt(i)) null
    else r.values(i)

  private def strOf(r: GenericInternalRow, i: Int): String = {
    val v = valueAt(r, i)
    if (v == null) null else v.toString
  }

  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
}

/** Executor-side cache of equality-delete key maps: one load per (executor,
  * eqdel shard set), shared by every task of the scan - the same "load the
  * delete file once, probe per row" shape Iceberg's readers use. */
/** Executor-side cache of position-delete address sets: one load per
  * (executor, posdel shard set), file→ordinal-set, probed per row by the
  * filtering reader — Iceberg's "load the delete file once" shape, with a
  * long probe instead of a string-key compare. */
object GraftPosDeletes {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.HashMap[String, java.util.HashSet[java.lang.Long]]]()

  private val empty = new java.util.HashSet[java.lang.Long]()

  /** manifest-relative path of a data file from its absolute scan path —
    * data files always live under the table's data/ directory, so this
    * matches the representation posdel shards store. */
  def relOf(absPath: String): String = {
    val i = absPath.lastIndexOf("/data/")
    if (i < 0) absPath else "data/" + absPath.substring(i + "/data/".length)
  }

  def forFile(shardDirs: Seq[String], relPath: String): java.util.HashSet[java.lang.Long] = {
    if (shardDirs.isEmpty) return empty
    val k = shardDirs.sorted.mkString("\u0001")
    if (cache.size > 32) cache.clear() // stale shard sets from old snapshots
    cache.computeIfAbsent(k, _ => load(shardDirs)).getOrDefault(relPath, empty)
  }

  private def load(shardDirs: Seq[String])
      : java.util.HashMap[String, java.util.HashSet[java.lang.Long]] = {
    val m = new java.util.HashMap[String, java.util.HashSet[java.lang.Long]]()
    val conf = LakeConf.installedConf()
    for (dir <- shardDirs) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      val parts =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
        else Seq(p)
      for (part <- parts) {
        val reader: ParquetReader[org.apache.parquet.example.data.Group] =
          ParquetReader.builder(new GroupReadSupport(), part).withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            m.computeIfAbsent(g.getString("file_path", 0),
                _ => new java.util.HashSet[java.lang.Long]())
              .add(java.lang.Long.valueOf(g.getLong("pos", 0)))
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    m
  }
}

object GraftEqDeletes {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.HashMap[String, java.lang.Long]]()

  /** composite probe key; null when any component is null (SQL equality
    * with null never matches). NUL separators cannot collide: the key
    * columns come from parquet strings, which never contain NUL here. */
  def key(repo: String, path: String, commit: String): String =
    if (repo == null || path == null || commit == null) null
    else repo + "\u0000" + path + "\u0000" + commit

  def keyMap(shardDirs: Seq[String]): java.util.HashMap[String, java.lang.Long] = {
    val k = shardDirs.sorted.mkString("\u0001")
    if (cache.size > 32) cache.clear() // stale shard sets from old snapshots
    cache.computeIfAbsent(k, _ => load(shardDirs))
  }

  private def load(shardDirs: Seq[String]): java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    val conf = LakeConf.installedConf()
    for (dir <- shardDirs) {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(conf)
      val parts =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).toSeq.map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
        else Seq(p)
      for (part <- parts) {
        val reader: ParquetReader[org.apache.parquet.example.data.Group] =
          ParquetReader.builder(new GroupReadSupport(), part).withConf(conf).build()
        try {
          var g = reader.read()
          while (g != null) {
            val kk = key(g.getString("repo", 0), g.getString("path", 0),
              g.getString("commit", 0))
            if (kk != null) {
              val seq = g.getLong("del_seq", 0)
              m.merge(kk, java.lang.Long.valueOf(seq),
                (a, b) => if (a.longValue() >= b.longValue()) a else b)
            }
            g = reader.read()
          }
        } finally reader.close()
      }
    }
    m
  }
}
