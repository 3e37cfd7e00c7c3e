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

/** Misra–Gries heavy-hitters summary + exact candidate verification — the
  * frequency-sketch sibling of the KMV distinct sketch above (top-k
  * frequent tokens/shingles/URLs is the other corpus statistic a curation
  * policy reads: stop-shingle lists, boilerplate n-grams, hot domains).
  *
  * Scale shape: the naive exact top-k shuffles one row per DISTINCT item
  * (fine until item cardinality itself is huge — corpus n-grams). The
  * sketch pass instead folds each partition into a BOUNDED m-counter
  * Misra–Gries summary (classic guarantee: any item with true frequency
  * > N/(m+1) survives, and every kept count sits within N/(m+1) of truth);
  * partials merge by counter-wise sum then subtracting the (m+1)-th
  * largest count (the mergeable-summaries construction — the error bounds
  * add), so the wire carries partitions × m entries, never the item
  * cardinality. The verify pass recounts ONLY the ≤ m candidates exactly
  * (broadcast semi-join + one hash aggregate) and takes the true top-k —
  * exact whenever the k-th true frequency clears the N/(m+1) survival
  * bound, and two linear scans total.
  */
object HeavyHitters {

  /** one stream item into a bounded summary. Classic Misra–Gries: full
    * buffer + unseen item → every counter decrements (zeros evicted) and
    * the item is NOT inserted; each such event retires m+1 units of total
    * count, hence the N/(m+1) bound. */
  private[graft] def mgReduce(buf: Map[String, Long], item: String, m: Int): Map[String, Long] = {
    if (item == null) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + 1)
      case None if buf.size < m => buf.updated(item, 1L)
      case None => buf.flatMap { case (k, v) =>
        if (v > 1) Some(k -> (v - 1)) else None }
    }
  }

  /** mergeable-summaries merge: counter-wise sum, then subtract the
    * (m+1)-th largest count from every counter and evict non-positives —
    * at most m survive and the per-summary error bounds add. */
  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long], m: Int): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (sum.size <= m) sum
    else {
      val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
      sum.flatMap { case (k, v) => if (v > cut) Some(k -> (v - cut)) else None }
    }
  }

  // ---- mutable kernel (the aggregator's hot path — r5 VERDICT #5):
  // identical arithmetic to the pure kernel above (PipelineSpec asserts
  // equality), but counters update IN PLACE: O(1) per present/new item, and
  // the full-buffer decrement walks the map once without rebuilding it —
  // the pure version's per-row `updated` copy made corpus-scale n-gram
  // streams pay O(m) allocations per unseen item.

  private[graft] def mgReduceMut(c: java.util.HashMap[String, java.lang.Long],
                                 item: String, m: Int): Unit = {
    if (item == null) return
    val cur = c.get(item)
    if (cur != null) { c.put(item, cur + 1L); () }
    else if (c.size < m) { c.put(item, 1L); () }
    else {
      val it = c.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - 1L
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }

  /** merge b into a (counter-wise sum, cut at the (m+1)-th largest). */
  private[graft] def mgMergeMut(a: java.util.HashMap[String, java.lang.Long],
                                b: java.util.HashMap[String, java.lang.Long],
                                m: Int): Unit = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val cur = a.get(e.getKey)
      a.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (a.size > m) {
      val vals = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (m + 1)) // the (m+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue - cut
        if (v <= 0L) it.remove() else e.setValue(v)
      }
    }
  }

  /** Exact corpus-wide top-k frequent items via sketch-then-verify:
    * pass 1 folds `items` into one m-counter summary (ObjectHashAggregate,
    * partial per partition + one merge); pass 2 recounts the candidates
    * exactly behind a broadcast semi-join and takes the top k by
    * (freq DESC, item ASC — deterministic under ties). Output is the true
    * top-k whenever the k-th frequency > N/(m+1); size m accordingly
    * (m = 100·k is the usual skew-safe choice). */
  def topKExact(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame = {
    require(m > k, s"summary capacity m=$m must exceed k=$k")
    val agg = udaf(new MisraGriesAgg(m), Encoders.STRING)
    val cands = items.agg(agg(col(itemCol)).as("cands"))
      .select(explode(col("cands")).as(itemCol))
    items.join(broadcast(cands), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col(itemCol).asc)
      .limit(k)
  }
}

/** mutable Misra–Gries buffer: a plain java HashMap wrapper, held as an
  * OBJECT by ObjectHashAggregate for the whole partition and kryo-encoded
  * only at the partial→merge shuffle boundary. */
final class MgBuffer extends Serializable {
  val counts = new java.util.HashMap[String, java.lang.Long]()
}

/** The bounded Misra–Gries summary; finishes to its candidate item set
  * (counts are sketch lower-ish estimates — the verify pass recounts).
  * Mutable in-place buffer (r5 VERDICT #5): reduce/merge return the same
  * instance after updating it, so the hot path allocates nothing per row —
  * the previous immutable-Map buffer copied up to m entries per unseen
  * item. Arithmetic is the pure kernel's, asserted equal in PipelineSpec. */
class MisraGriesAgg(m: Int) extends Aggregator[String, MgBuffer, Array[String]] {
  require(m >= 1, "MisraGries needs m >= 1")
  def zero: MgBuffer = new MgBuffer
  def reduce(buf: MgBuffer, item: String): MgBuffer = {
    HeavyHitters.mgReduceMut(buf.counts, item, m); buf
  }
  def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    HeavyHitters.mgMergeMut(a.counts, b.counts, m); a
  }
  def finish(buf: MgBuffer): Array[String] = {
    import scala.jdk.CollectionConverters._
    buf.counts.asScala.toArray
      .sortBy { case (i, c) => (-c.longValue(), i) }.map(_._1)
  }
  def bufferEncoder: org.apache.spark.sql.Encoder[MgBuffer] =
    org.apache.spark.sql.Encoders.kryo[MgBuffer]
  def outputEncoder: org.apache.spark.sql.Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
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
