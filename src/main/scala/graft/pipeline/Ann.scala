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
    * is sublinear in the corpus once the index DataFrame is persisted. */
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
}
