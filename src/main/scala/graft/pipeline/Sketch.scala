package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values (KMV) distinct-count sketch, as a Spark typed
  * Aggregator — the table-statistics primitive (Iceberg ships the same idea
  * as puffin NDV sketches; the estimator is the classic KMV/bottom-k one:
  * with k distinct uniform hashes observed, NDV ≈ (k-1) / h_(k) for h
  * normalized to [0,1)).
  *
  * Scale shape: the buffer is a bounded sorted array of the k smallest
  * DISTINCT 60-bit hashes. Map-side each partition folds its rows into one
  * such array — once the buffer is full only hashes BELOW the current max
  * mutate it (expected k·ln(n/k) mutations per partition, every other row
  * is a single binary search) — and the merge combines two sorted arrays.
  * So a full-table NDV costs one scan plus partitions × k longs of
  * shuffle, never a distinct-shuffle of the values themselves.
  *
  * Determinism: the hash is the corpus-wide sha60 bridge (15 hex chars of
  * sha256 = 60 bits), so sketches are bit-identical across runs, partition
  * layouts and engines — the DuckDB oracle replays the identical k-th
  * smallest distinct hash and the identical integer-floor estimate.
  */
object Sketch {
  /** sha60 domain: hashes live in [0, 2^60). */
  val DomainBits = 60

  /** The Spark side of the sha60 bridge (same value as TextOps.sha60 and
    * DuckDB's `('0x' || substr(sha256(c), 1, 15))::BIGINT`). Codegen'd
    * built-ins only. Null input → null (callers map null to -1L, which the
    * aggregator skips — null is not a distinct value, matching SQL
    * count(DISTINCT) and DuckDB's DISTINCT-over-non-null oracle). */
  def sha60(c: Column): Column =
    conv(substring(sha2(c.cast("string"), 256), 1, 15), 16, 10).cast("long")

  /** Insert `h` into the ascending distinct buffer (capacity k). Negative
    * h is the null sentinel and is skipped. Returns the (possibly new)
    * buffer; never mutates in place so a shared zero array is safe. */
  private[graft] def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    if (h < 0) return buf
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) return buf // already present — sketch holds distinct hashes
    val ins = -i - 1
    if (buf.length < k) {
      val out = new Array[Long](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
      out
    } else if (ins < k) { // displaces the current maximum
      val out = new Array[Long](k)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
      out
    } else buf
  }

  /** Distinct two-pointer merge of ascending arrays, truncated at k. */
  private[graft] def mergeSorted(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    if (a.isEmpty) return if (b.length <= k) b else b.take(k)
    if (b.isEmpty) return if (a.length <= k) a else a.take(k)
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** KMV estimator, exact integer floor math (bit-identical to the DuckDB
    * HUGEINT replay): fewer than k distinct hashes seen → that exact count;
    * else floor((k-1) · 2^60 / h_(k)). h_(k) ≥ k-1 ≥ 1 since the buffer
    * holds k distinct non-negative values. */
  def ndvEstimate(sorted: Array[Long], k: Int): Long =
    if (sorted.length < k) sorted.length.toLong
    else ((BigInt(k - 1) << DomainBits) / BigInt(sorted(k - 1))).toLong

  /** Per-group NDV estimate of `valueCol` (any type — hashed via its
    * canonical string form): one ObjectHashAggregate, partial+final, the
    * shuffle is groups × k longs. */
  def ndvByGroup(df: DataFrame, valueCol: String, k: Int, groupCols: String*): DataFrame = {
    val agg = udaf(new KmvNdvAgg(k), Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(coalesce(sha60(col(valueCol)), lit(-1L))).as("ndv_est"))
  }
}

/** The sketch itself: k smallest distinct sha60 hashes, ascending. */
class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2, "KMV needs k >= 2")
  def zero: Array[Long] = Array.emptyLongArray
  def reduce(buf: Array[Long], h: Long): Array[Long] = Sketch.insert(buf, h, k)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = Sketch.mergeSorted(a, b, k)
  def finish(buf: Array[Long]): Array[Long] = buf
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Same buffer, finished straight to the NDV estimate (one BIGINT out). */
class KmvNdvAgg(k: Int) extends Aggregator[Long, Array[Long], Long] {
  require(k >= 2, "KMV needs k >= 2")
  def zero: Array[Long] = Array.emptyLongArray
  def reduce(buf: Array[Long], h: Long): Array[Long] = Sketch.insert(buf, h, k)
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = Sketch.mergeSorted(a, b, k)
  def finish(buf: Array[Long]): Long = Sketch.ndvEstimate(buf, k)
  def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: org.apache.spark.sql.Encoder[Long] = Encoders.scalaLong
}
