package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.util.AccumulatorV2
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass write statistics (guide §1.2 "remove unnecessary passes"):
  * the per-file manifest stats writeDataFiles needs (min/max/null-counts/
  * langs/digest) are computed WHILE the write job streams rows into parquet,
  * tee'd into a per-partition accumulator, instead of re-reading the whole
  * freshly-written batch in a second Spark job. One file per write task, so
  * partition-id ↔ `part-NNNNN-*` file name is exact; task retries overwrite
  * their own partition slot (stats are order-insensitive aggregates of a
  * deterministic row set, so last-write-wins is idempotent).
  *
  * String min/max use UTF8String comparison — parquet/Spark binary order,
  * NOT java.lang.String's UTF-16 code-unit order (they differ for
  * supplementary characters) — so the fused stats are bit-identical to the
  * old read-back `groupBy(input_file_name)` pass.
  */
object WriteStats {

  /** order-insensitive per-partition (= per output file) stats. */
  final case class PartStats(records: Long,
                             minRepo: String, maxRepo: String,
                             minPath: String, maxPath: String,
                             langs: Seq[String],
                             minZ: Long, maxZ: Long, hasZ: Boolean,
                             minRh: Long, maxRh: Long,
                             digest: Long,
                             nullsRepo: Long, nullsPath: Long, nullsLang: Long,
                             bMin: Int, bMax: Int)

  /** mutable in-task collector; indices refer to the teed row layout:
    * data columns ++ (__h: long, __rh: long, __b: int). */
  final class Collector(repoIdx: Int, pathIdx: Int, langIdx: Int, zIdx: Int,
                        hIdx: Int, rhIdx: Int, bIdx: Int) extends Serializable {
    private var n = 0L
    private var minRepo: UTF8String = null; private var maxRepo: UTF8String = null
    private var minPath: UTF8String = null; private var maxPath: UTF8String = null
    private val langs = scala.collection.mutable.HashSet.empty[String]
    private var minZ = Long.MaxValue; private var maxZ = Long.MinValue; private var sawZ = false
    private var minRh = Long.MaxValue; private var maxRh = Long.MinValue
    private var digest = 0L
    private var nullsRepo = 0L; private var nullsPath = 0L; private var nullsLang = 0L
    private var bMin = Int.MaxValue; private var bMax = Int.MinValue

    def update(r: Row): Unit = {
      n += 1
      if (r.isNullAt(repoIdx)) nullsRepo += 1
      else {
        val u = UTF8String.fromString(r.getString(repoIdx))
        if (minRepo == null || u.compareTo(minRepo) < 0) minRepo = u
        if (maxRepo == null || u.compareTo(maxRepo) > 0) maxRepo = u
      }
      if (r.isNullAt(pathIdx)) nullsPath += 1
      else {
        val u = UTF8String.fromString(r.getString(pathIdx))
        if (minPath == null || u.compareTo(minPath) < 0) minPath = u
        if (maxPath == null || u.compareTo(maxPath) > 0) maxPath = u
      }
      if (r.isNullAt(langIdx)) nullsLang += 1
      else langs += r.getString(langIdx)
      if (zIdx >= 0 && !r.isNullAt(zIdx)) {
        val z = r.getLong(zIdx); sawZ = true
        if (z < minZ) minZ = z
        if (z > maxZ) maxZ = z
      }
      val rh = r.getLong(rhIdx)
      if (rh < minRh) minRh = rh
      if (rh > maxRh) maxRh = rh
      digest ^= r.getLong(hIdx)
      if (bIdx >= 0) {
        val b = r.getInt(bIdx)
        if (b < bMin) bMin = b
        if (b > bMax) bMax = b
      }
    }

    def result: PartStats = PartStats(n,
      if (minRepo == null) null else minRepo.toString,
      if (maxRepo == null) null else maxRepo.toString,
      if (minPath == null) null else minPath.toString,
      if (maxPath == null) null else maxPath.toString,
      langs.toSeq.sorted, minZ, maxZ, sawZ, minRh, maxRh, digest,
      nullsRepo, nullsPath, nullsLang, bMin, bMax)

    def count: Long = n
  }

  /** pid → stats map accumulator. Retried tasks overwrite their own slot
    * (same deterministic partition ⇒ same stats), so double counting is
    * structurally impossible. */
  final class Acc extends AccumulatorV2[(Int, PartStats), Map[Int, PartStats]] {
    private val m = new java.util.concurrent.ConcurrentHashMap[Int, PartStats]()
    override def isZero: Boolean = m.isEmpty
    override def copy(): Acc = {
      val c = new Acc; c.m.putAll(m); c
    }
    override def reset(): Unit = m.clear()
    override def add(v: (Int, PartStats)): Unit = { m.put(v._1, v._2); () }
    override def merge(other: AccumulatorV2[(Int, PartStats), Map[Int, PartStats]]): Unit =
      other.value.foreach { case (k, v) => m.put(k, v) }
    override def value: Map[Int, PartStats] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toMap
    }
  }

  /** Fused per-file stats for the TASK-SIDE parquet writers (streaming sink
    * and SQL CoW rewrite): same aggregates as the batch Collector, computed
    * from InternalRow while writing, replicating the batch Column kernels
    * bit for bit — UTF8String binary order for min/max, and the per-row
    * content hash xxhash64(repo, path, commit, sha2(content,256)) with
    * Spark's null-skip rule. */
  final class TaskStats(repoIdx: Int, pathIdx: Int, commitIdx: Int,
                        langIdx: Int, contentIdx: Int) {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    private val sha = java.security.MessageDigest.getInstance("SHA-256")
    private val hexDigits = "0123456789abcdef".toCharArray
    private var n = 0L
    private var minRepo: UTF8String = null; private var maxRepo: UTF8String = null
    private var minPath: UTF8String = null; private var maxPath: UTF8String = null
    private val langs = scala.collection.mutable.HashSet.empty[String]
    private var minZ = Long.MaxValue; private var maxZ = Long.MinValue
    private var minRh = Long.MaxValue; private var maxRh = Long.MinValue
    private var digest = 0L
    private var nullsRepo = 0L; private var nullsPath = 0L; private var nullsLang = 0L

    private def shaHexUtf8(content: UTF8String): UTF8String = {
      sha.reset()
      val d = sha.digest(content.getBytes)
      val out = new Array[Byte](64)
      var i = 0
      while (i < 32) {
        out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
        out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
        i += 1
      }
      UTF8String.fromBytes(out)
    }

    private def hashInto(row: InternalRow, idx: Int, h: Long): Long =
      if (idx < 0 || row.isNullAt(idx)) h
      else XxHash64Function.hash(row.getUTF8String(idx), StringType, h)

    /** xxhash64 of one string column (seed 42, null keeps the seed). */
    def colHash(row: InternalRow, idx: Int): Long = hashInto(row, idx, 42L)

    /** record one written row; `z` is the z value written (null = none). */
    def update(row: InternalRow, z: java.lang.Long): Unit = {
      n += 1
      if (repoIdx < 0 || row.isNullAt(repoIdx)) nullsRepo += 1
      else {
        // getUTF8String may point into a reused buffer — copy when retained
        val u = row.getUTF8String(repoIdx)
        if (minRepo == null || u.compareTo(minRepo) < 0) minRepo = u.clone()
        if (maxRepo == null || u.compareTo(maxRepo) > 0) maxRepo = u.clone()
      }
      if (pathIdx < 0 || row.isNullAt(pathIdx)) nullsPath += 1
      else {
        val u = row.getUTF8String(pathIdx)
        if (minPath == null || u.compareTo(minPath) < 0) minPath = u.clone()
        if (maxPath == null || u.compareTo(maxPath) > 0) maxPath = u.clone()
      }
      if (langIdx < 0 || row.isNullAt(langIdx)) nullsLang += 1
      else langs += row.getUTF8String(langIdx).toString
      if (z != null) {
        if (z.longValue() < minZ) minZ = z.longValue()
        if (z.longValue() > maxZ) maxZ = z.longValue()
      }
      val rh = colHash(row, repoIdx)
      if (rh < minRh) minRh = rh
      if (rh > maxRh) maxRh = rh
      var h = hashInto(row, repoIdx, 42L)
      h = hashInto(row, pathIdx, h)
      h = hashInto(row, commitIdx, h)
      if (contentIdx >= 0 && !row.isNullAt(contentIdx))
        h = XxHash64Function.hash(shaHexUtf8(row.getUTF8String(contentIdx)), StringType, h)
      digest ^= h
    }

    def entry(relPath: String, tag: String, bytes: Long): ManifestEntry =
      ManifestEntry(relPath, tag, n, bytes,
        if (minRepo == null) null else minRepo.toString,
        if (maxRepo == null) null else maxRepo.toString,
        if (minPath == null) null else minPath.toString,
        if (maxPath == null) null else maxPath.toString,
        langs.toSeq.sorted,
        if (minZ == Long.MaxValue) 0L else minZ,
        if (maxZ == Long.MinValue) 0L else maxZ,
        minRh, maxRh, digest,
        Some(nullsRepo), Some(nullsPath), Some(nullsLang), None)
  }

  /** partition index of a Spark output file name ("part-00007-<uuid>..."),
    * or -1 when the name doesn't follow the FileFormatWriter pattern. */
  def filePartIdx(name: String): Int = {
    if (!name.startsWith("part-")) return -1
    val rest = name.substring(5)
    val dash = rest.indexOf('-')
    if (dash <= 0) return -1
    try rest.substring(0, dash).toInt catch { case _: NumberFormatException => -1 }
  }
}
