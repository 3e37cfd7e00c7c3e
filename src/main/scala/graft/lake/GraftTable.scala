package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** Iceberg-style table format built from scratch (no lakehouse jars in this
  * environment — SURVEY.md §7.1): parquet data files + parquet manifests +
  * json snapshots + an atomically-renamed version-hint.
  *
  * Layout:
  * {{{
  *   <location>/data/<uuid>.parquet          one file per data file
  *   <location>/meta/manifest-v<N>.parquet   per-file stats entries for snapshot N
  *   <location>/meta/snapshot-v<N>.json      snapshot metadata
  *   <location>/meta/version-hint.text       current version (atomic rename commit)
  *   <location>/lineage/...                  sidecar lineage table (Lineage.scala)
  * }}}
  *
  * Readers resolve the version hint once, then only read files referenced by
  * that snapshot's manifest → snapshot isolation for concurrent maintenance.
  */
final case class Snapshot(version: Long, parent: Long, tsMillis: Long,
                          operation: String, manifest: String, recordCount: Long)

final case class ManifestEntry(file_path: String, partition: String,
                               record_count: Long, file_bytes: Long,
                               min_repo: String, max_repo: String,
                               min_path: String, max_path: String,
                               langs: Seq[String], min_z: Long, max_z: Long,
                               min_rh: Long, max_rh: Long) // xxhash64(repo) bounds

object GraftTable {
  /** input_file_name() returns a file: URI; normalize to a local Path. */
  def toLocalPath(f: String): Path =
    if (f.startsWith("file:")) Paths.get(java.net.URI.create(f)) else Paths.get(f)
}

class GraftTable(val spark: SparkSession, val location: String) {
  import spark.implicits._

  private val metaDir = Paths.get(location, "meta")
  private val dataDir = Paths.get(location, "data")

  def exists: Boolean = Files.exists(metaDir.resolve("version-hint.text"))

  def init(): Unit = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
  }

  def currentVersion: Long = {
    val hint = metaDir.resolve("version-hint.text")
    if (!Files.exists(hint)) 0L
    else new String(Files.readAllBytes(hint)).trim.toLong
  }

  def snapshot(version: Long): Option[Snapshot] = {
    val p = metaDir.resolve(s"snapshot-v$version.json")
    if (!Files.exists(p)) None
    else {
      val m = parseJsonFlat(new String(Files.readAllBytes(p)))
      Some(Snapshot(m("version").toLong, m("parent").toLong, m("tsMillis").toLong,
        m("operation"), m("manifest"), m("recordCount").toLong))
    }
  }

  def currentSnapshot: Option[Snapshot] = {
    val v = currentVersion
    if (v == 0) None else snapshot(v)
  }

  def listSnapshots(): Seq[Snapshot] = {
    if (!Files.isDirectory(metaDir)) return Seq.empty
    Files.list(metaDir).iterator().asScala
      .filter(_.getFileName.toString.matches("snapshot-v\\d+\\.json"))
      .flatMap { p =>
        val v = p.getFileName.toString.stripPrefix("snapshot-v").stripSuffix(".json").toLong
        snapshot(v)
      }.toSeq.sortBy(_.version)
  }

  /** Manifest entries of a snapshot (small parquet; driver or executor side). */
  def manifest(s: Snapshot): DataFrame =
    spark.read.parquet(Paths.get(location, s.manifest).toString)

  def manifestEntries(s: Snapshot): Seq[ManifestEntry] =
    manifest(s).as[ManifestEntry].collect().toSeq

  /** Full-table scan pinned to the current snapshot. */
  def scan(): DataFrame = currentSnapshot match {
    case None => emptyDf
    case Some(s) => readFiles(manifestEntries(s).map(_.file_path))
  }

  /** Pruned scan: prune file list with a predicate over manifest min/max stats
    * BEFORE building the DataFrame (SURVEY.md §4.3 item 3); the same predicate
    * should also be applied to rows by the caller (files may contain more). */
  def prunedScan(manifestPredicate: org.apache.spark.sql.Column): (DataFrame, Int, Int) =
    currentSnapshot match {
      case None => (emptyDf, 0, 0)
      case Some(s) =>
        val all = manifestEntries(s)
        val kept = manifest(s).filter(manifestPredicate)
          .select("file_path").as[String].collect().toSeq
        (readFiles(kept), all.size, kept.size)
    }

  private def emptyDf: DataFrame = {
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("repo", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("commit", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.StringType))))
  }

  def readFiles(files: Seq[String]): DataFrame = {
    if (files.isEmpty) emptyDf
    else spark.read.parquet(files.map(f => Paths.get(location, f).toString): _*)
  }

  /** Write df rows as new data files (one parquet file per spark partition),
    * returning manifest entries. Expects source_files schema + optional z col. */
  def writeDataFiles(df: DataFrame, tag: String): Seq[ManifestEntry] = {
    val batch = s"b-${UUID.randomUUID().toString.take(8)}-$tag"
    val outDir = dataDir.resolve(batch)
    val cols = df.columns
    val withZ = if (cols.contains("z")) df else df.withColumn("z",
      graft.expr.XmqFunctions.zorder_interleave(
        xxhash64(col("repo")), xxhash64(col("path")),
        pmod(xxhash64(col("lang")), lit(256L))))
    withZ.write.parquet(outDir.toString)

    // one stats pass over the freshly written batch
    val written = spark.read.parquet(outDir.toString)
    val stats = written.groupBy(input_file_name().as("abs_path"))
      .agg(count(lit(1)).as("record_count"),
           min($"repo").as("min_repo"), max($"repo").as("max_repo"),
           min($"path").as("min_path"), max($"path").as("max_path"),
           collect_set($"lang").as("langs"),
           min($"z").as("min_z"), max($"z").as("max_z"),
           min(xxhash64($"repo")).as("min_rh"), max(xxhash64($"repo")).as("max_rh"))
      .collect()

    stats.toSeq.map { r =>
      val absPath = GraftTable.toLocalPath(r.getString(0))
      val rel = Paths.get(location).relativize(absPath).toString
      val bytes = Files.size(absPath)
      ManifestEntry(rel, tag, r.getLong(1), bytes,
        r.getString(2), r.getString(3), r.getString(4), r.getString(5),
        r.getSeq[String](6), r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))
    }
  }

  /** Commit: previous entries minus removed plus added → new manifest +
    * snapshot + atomic version-hint rename (single-writer protocol). */
  def commit(added: Seq[ManifestEntry], removedPaths: Set[String], operation: String): Snapshot = {
    init()
    val prev = currentSnapshot.map(manifestEntries).getOrElse(Seq.empty)
    val entries = prev.filterNot(e => removedPaths.contains(e.file_path)) ++ added
    val newVersion = currentVersion + 1
    val manifestRel = s"meta/manifest-v$newVersion.parquet"
    entries.toDS().coalesce(1).write.mode("overwrite")
      .parquet(Paths.get(location, manifestRel).toString)

    val snap = Snapshot(newVersion, currentVersion, System.currentTimeMillis(),
      operation, manifestRel, entries.map(_.record_count).sum)
    val json =
      s"""{"version": ${snap.version}, "parent": ${snap.parent}, "tsMillis": ${snap.tsMillis},
         | "operation": "${snap.operation}", "manifest": "${snap.manifest}",
         | "recordCount": ${snap.recordCount}}""".stripMargin
    Files.write(metaDir.resolve(s"snapshot-v$newVersion.json"), json.getBytes("UTF-8"))

    // atomic commit
    val tmp = metaDir.resolve(s"version-hint.text.tmp-${UUID.randomUUID()}")
    Files.write(tmp, newVersion.toString.getBytes("UTF-8"))
    Files.move(tmp, metaDir.resolve("version-hint.text"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  def append(df: DataFrame): Snapshot = {
    init()
    val added = writeDataFiles(df, "append")
    commit(added, Set.empty, "append")
  }

  /** Timestamp-based snapshot expire: drop old snapshot json + manifests,
    * delete data files referenced only by expired snapshots. Metadata-only
    * except the final unreferenced-file deletion (SURVEY.md §2.5). */
  def expireSnapshots(olderThanMillis: Long): (Int, Int) = {
    val cur = currentVersion
    val all = listSnapshots()
    val (expired, kept) = all.partition(s => s.tsMillis < olderThanMillis && s.version != cur)
    if (expired.isEmpty) return (0, 0)
    val keptFiles: Set[String] = kept.flatMap(s => manifestEntries(s).map(_.file_path)).toSet
    val expiredFiles: Set[String] = expired.flatMap(s => manifestEntries(s).map(_.file_path)).toSet
    val toDelete = expiredFiles -- keptFiles
    toDelete.foreach(f => Files.deleteIfExists(Paths.get(location, f)))
    expired.foreach { s =>
      Files.deleteIfExists(metaDir.resolve(s"snapshot-v${s.version}.json"))
      deleteRecursively(Paths.get(location, s.manifest))
    }
    (expired.size, toDelete.size)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  /** Rewrite the manifest tree: re-sort entries by (partition, min_z) and
    * drop entries for vanished files; metadata-only commit. */
  def rewriteManifests(): Snapshot = {
    val entries = currentSnapshot.map(manifestEntries).getOrElse(Seq.empty)
      .filter(e => Files.exists(Paths.get(location, e.file_path)))
      .sortBy(e => (e.partition, e.min_z, e.file_path))
    commitFull(entries, "manifest_rewrite")
  }

  /** Commit an explicit full entry list (used by compaction/cluster jobs). */
  def commitFull(entries: Seq[ManifestEntry], operation: String): Snapshot = {
    val prev = currentSnapshot.map(manifestEntries).getOrElse(Seq.empty)
    val removed = prev.map(_.file_path).toSet
    commit(entries, removed, operation)
  }

  // tiny flat-json parser for our own snapshot files
  private def parseJsonFlat(s: String): Map[String, String] = {
    val re = """"(\w+)"\s*:\s*("([^"]*)"|[-\d]+)""".r
    re.findAllMatchIn(s).map { m =>
      val v = if (m.group(3) != null) m.group(3) else m.group(2)
      m.group(1) -> v
    }.toMap
  }
}
