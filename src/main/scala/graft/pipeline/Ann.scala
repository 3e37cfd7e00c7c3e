package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the correctness baseline and
  * sign-random-projection LSH bucketing as the scale path (probe only buckets
  * within a small hamming ball of the query's bucket instead of the full
  * corpus).
  */
object Ann {

  /** sign-bit LSH bucket id from `planes` ±1 hyperplanes — one native
    * expression (LshBucketsExpr), not planes x dim unrolled Catalyst nodes. */
  def lshBucket(vecCol: Column, planes: Int, seed: Long = 0L): Column =
    element_at(TextFunctions.lsh_buckets(vecCol, planes, 1, seed), 1)

  /** brute-force top-k by cosine vs one query vector (exact baseline).
    * One scan, one TakeOrderedAndProject — no shuffle of the corpus. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    df.select(col(idCol), Dedup.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-flat ANN — the second scale path besides LSH: a coarse quantizer
    * partitions the corpus into inverted lists, the query probes only the
    * `nProbe` nearest lists. The quantizer here is DETERMINISTIC — every
    * corpus vector with id ≡ residue (mod every) IS a centroid (coarse
    * centroids drawn from the data itself, no training iterations), so a
    * cross-engine oracle can rebuild the identical index; swap in k-means
    * centroids at deployment without touching the plan shape. Assignment is
    * one broadcast-join map pass over the corpus (n×K cosines, no shuffle of
    * vectors) ranked per vector; at scale the centroid count grows ~√n and
    * the assigned list column persists as table state across queries. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, centroidEvery: Int = 50,
              centroidResidue: Int = 1, nProbe: Int = 4): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cents = v.filter(pmod(col("id"), lit(centroidEvery)) === centroidResidue)
      .select(col("id").as("cid"), col("v").as("cv"))
    // nearest centroid per vector as a PARTIAL-AGGREGABLE argmax: max over
    // struct(ccos, -cid, v) is lexicographic, so (cos desc, cid asc) ties
    // stay deterministic, and the map-side partial collapses each vector's
    // K centroid rows to ONE before the exchange — the shuffle moves ~n
    // rows, not n×K (a row_number window would shuffle all n×K). v rides in
    // the struct tail: it is only compared on a full (ccos, cid) tie, which
    // implies the same cid and therefore an identical v.
    val assigned = v.join(broadcast(cents))
      .select(col("id"),
        struct(Dedup.cosine(col("v"), col("cv")).as("ccos"),
               (-col("cid")).as("ncid"), col("v").as("v")).as("cand"))
      .groupBy("id").agg(max(col("cand")).as("best"))
      .select(col("id"), col("best.v").as("v"), (-col("best.ncid")).as("cid"))
    // probe list: the nProbe centroids nearest the query (tiny, collected)
    val q = typedLit(query.toSeq)
    val probes = cents.select(col("cid"), Dedup.cosine(col("cv"), q).as("qcos"))
      .orderBy(col("qcos").desc, col("cid").asc).limit(nProbe)
      .select("cid").collect().map(_.getLong(0))
    // no corpus id hits the residue class (tiny/sparse/non-contiguous ids):
    // an empty inverted index must degrade to the exact scan, not silently
    // return zero neighbors
    if (probes.isEmpty) return bruteForceTopK(df, idCol, vecCol, query, k)
    assigned.filter(col("cid").isin(probes.toSeq: _*))
      .select(col("id").as(idCol), Dedup.cosine(col("v"), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Build the IVF inverted index ONCE as a persistable DataFrame
    * (id, v, cid): at scale this is written back as a table column /
    * bucketed table, so every subsequent query pays only the probe —
    * no per-query assignment pass over the corpus. Same deterministic
    * quantizer and partial-aggregable argmax as ivfTopK. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroidEvery: Int = 50, centroidResidue: Int = 1): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val cents = v.filter(pmod(col("id"), lit(centroidEvery)) === centroidResidue)
      .select(col("id").as("cid"), col("v").as("cv"))
    v.join(broadcast(cents))
      .select(col("id"),
        struct(Dedup.cosine(col("v"), col("cv")).as("ccos"),
               (-col("cid")).as("ncid"), col("v").as("v")).as("cand"))
      .groupBy("id").agg(max(col("cand")).as("best"))
      .select(col("id"), col("best.v").as("v"), (-col("best.ncid")).as("cid"))
  }

  /** Query a PRE-BUILT index from ivfAssign: rank the query against the
    * distinct centroid set (derived from the index — no corpus scan),
    * then scan only the nProbe nearest inverted lists. The per-query cost
    * is sublinear in the corpus once the index DataFrame is persisted.
    *
    * Probe-set nuance vs [[ivfTopK]]: when two quantizer rows carry
    * IDENTICAL vectors, the cosine tie makes every assignment prefer the
    * smaller cid, so the larger cid's inverted list is empty and its row
    * is assigned cid = the smaller one — it drops out of the probe ranking
    * here (id == cid finds no row) while ivfTopK still ranks it. Both
    * probe orders are deterministic; this one skips only a provably empty
    * list, so recall is never lower than ivfTopK's on the same nProbe. */
  def ivfTopKAssigned(index: DataFrame, idCol: String,
                      query: Array[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val q = typedLit(query.toSeq)
    // centroid vectors ride in the index: the row whose id == cid is the
    // centroid itself (the quantizer draws centroids from the data)
    val probes = index.filter(col("id") === col("cid"))
      .select(col("cid"), Dedup.cosine(col("v"), q).as("qcos"))
      .orderBy(col("qcos").desc, col("cid").asc).limit(nProbe)
      .select("cid").collect().map(_.getLong(0))
    if (probes.isEmpty)
      return index.select(col("id").as(idCol), Dedup.cosine(col("v"), q).as("cos"))
        .orderBy(col("cos").desc, col(idCol).asc).limit(k)
    index.filter(col("cid").isin(probes.toSeq: _*))
      .select(col("id").as(idCol), Dedup.cosine(col("v"), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: bucket the corpus, probe every bucket within hamming
    * distance `probeRadius` of the query's bucket (multi-probe), rank the
    * candidates exactly. True near neighbors flip few sign bits, so they land
    * in low-hamming buckets with high probability; candidate set is sub-linear
    * for clustered corpora. The bucket column is a plain derived column — at
    * scale, persist it once (e.g. as a table column) and reuse across queries. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, planes: Int = 10,
              probeRadius: Int = 2, seed: Long = 0L): DataFrame = {
    val qb = TextOps.lshBucketLocal(query, planes, band = 0, seed)
    val cand = df.filter(
      bit_count(lshBucket(col(vecCol), planes, seed).bitwiseXOR(lit(qb))) <= probeRadius)
    val q = typedLit(query.toSeq)
    cand.select(col(idCol), Dedup.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Lloyd's k-means over the embedding column, as Spark partial
    * aggregates: assignment = broadcast-centroid argmax (the ivfAssign
    * shape — map-side partial collapses each vector's k candidate rows, ~n
    * rows cross the exchange), update = per-centroid vector mean via a
    * typed Aggregator (map-side partial sums — k x partitions buffer rows
    * shuffle, never the vectors). Driver state is k x dim floats and never
    * grows with the corpus. Init is deterministic (the k rows with the
    * smallest mix64(id)); float summation order can vary run-to-run, so
    * convergence is deterministic in structure but means can differ in the
    * last ulps — fine for a coarse quantizer. Empty clusters keep their
    * previous centroid (standard Lloyd fallback). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int = 5): Array[Array[Float]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    var cents: Array[Array[Float]] = v
      .orderBy(TextFunctions.mix64(col("id")), col("id")).limit(k)
      .select("v").as[Array[Float]].collect()
    require(cents.nonEmpty, "kmeansCentroids: empty corpus")
    val dim = cents.head.length
    val mean = new VecMeanAgg(dim)
    for (_ <- 1 to iters) {
      val means = assignTo(v, cents)
        .select(col("cid"), col("v")).as[(Long, Array[Float])]
        .groupByKey(_._1).agg(mean.toColumn.name("m"))
        .collect().toMap
      cents = cents.indices.map(i => means.getOrElse(i.toLong, cents(i))).toArray
    }
    cents
  }

  /** Assign every corpus vector to its nearest external centroid (cid =
    * centroid array index). Same persistable (id, v, cid) index shape as
    * ivfAssign, same partial-aggregable argmax — use after kmeansCentroids
    * to build the trained inverted index. */
  def ivfAssignCentroids(df: DataFrame, idCol: String, vecCol: String,
                         centroids: Array[Array[Float]]): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    assignTo(v, centroids)
  }

  /** Query a centroid-index built by ivfAssignCentroids: probe ranking is
    * pure driver arithmetic over the k x dim centroid array (no job), then
    * one filtered scan of the nProbe inverted lists. */
  def ivfTopKCentroids(index: DataFrame, centroids: Array[Array[Float]],
                       idCol: String, query: Array[Float], k: Int,
                       nProbe: Int = 4): DataFrame = {
    val q = typedLit(query.toSeq)
    val probes = centroids.zipWithIndex
      .map { case (c, i) => (i.toLong, TextOps.cosineLocal(c, query)) }
      .sortBy { case (cid, cos) => (-cos, cid) }.take(nProbe).map(_._1)
    if (probes.isEmpty)
      return index.select(col("id").as(idCol), Dedup.cosine(col("v"), q).as("cos"))
        .orderBy(col("cos").desc, col(idCol).asc).limit(k)
    index.filter(col("cid").isin(probes.toSeq: _*))
      .select(col("id").as(idCol), Dedup.cosine(col("v"), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** nearest-centroid argmax against a driver-local centroid array:
    * broadcast the (cid, cv) rows, max over struct(ccos, -cid, v) — the
    * deterministic partial-aggregable shape shared by every IVF path. */
  private def assignTo(v: DataFrame, centroids: Array[Array[Float]]): DataFrame = {
    val spark = v.sparkSession
    import spark.implicits._
    val cents = spark.createDataset(
      centroids.toSeq.zipWithIndex.map { case (c, i) => (i.toLong, c) })
      .toDF("cid", "cv")
    v.join(broadcast(cents))
      .select(col("id"),
        struct(Dedup.cosine(col("v"), col("cv")).as("ccos"),
               (-col("cid")).as("ncid"), col("v").as("v")).as("cand"))
      .groupBy("id").agg(max(col("cand")).as("best"))
      .select(col("id"), col("best.v").as("v"), (-col("best.ncid")).as("cid"))
  }
}

/** typed partial aggregate for per-centroid vector means: double-precision
  * running sums merged associatively across partitions. */
private[pipeline] class VecMeanAgg(dim: Int)
  extends org.apache.spark.sql.expressions.Aggregator[
    (Long, Array[Float]), VecMeanAgg.Buf, Array[Float]] {
  import VecMeanAgg.Buf
  def zero: Buf = Buf(new Array[Double](dim), 0L)
  def reduce(b: Buf, a: (Long, Array[Float])): Buf = {
    var i = 0; while (i < dim) { b.sum(i) += a._2(i); i += 1 }
    Buf(b.sum, b.n + 1)
  }
  def merge(x: Buf, y: Buf): Buf = {
    var i = 0; while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
    Buf(x.sum, x.n + y.n)
  }
  def finish(b: Buf): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0; while (i < dim) { out(i) = (b.sum(i) / b.n).toFloat; i += 1 }
    out
  }
  def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
    org.apache.spark.sql.Encoders.product[Buf]
  def outputEncoder: org.apache.spark.sql.Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}

private[pipeline] object VecMeanAgg {
  final case class Buf(sum: Array[Double], n: Long)
}
