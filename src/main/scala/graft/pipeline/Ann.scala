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
