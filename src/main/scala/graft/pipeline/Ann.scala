package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the correctness baseline and
  * a random-hyperplane LSH bucketing as the scale path (probe only matching
  * buckets instead of the full corpus).
  */
object Ann {

  /** deterministic pseudo-random hyperplanes: plane p, dim d from splitmix. */
  private def planeComponent(p: Int, d: Int): Double = {
    val h = TextOps.mix(p.toLong * 1000003L + d)
    // map to [-1, 1)
    (h >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** sign-bit LSH bucket id from `planes` random hyperplanes. */
  def lshBucket(vecCol: Column, planes: Int, dim: Int): Column = {
    val terms = (0 until planes).map { p =>
      val dot = (0 until dim).map { d =>
        element_at(vecCol, d + 1).cast("double") * lit(planeComponent(p, d))
      }.reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    terms.reduce(_ + _)
  }

  /** brute-force top-k by cosine vs one query vector (exact baseline).
    * One scan, one TakeOrderedAndProject — no shuffle of the corpus. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query.toSeq)
    df.select(col(idCol), Dedup.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN: pre-bucket the corpus; probe the query's bucket and
    * all buckets within hamming distance 2 (multi-probe) then rank exactly.
    * True near neighbors (high cosine) land in low-hamming buckets with high
    * probability; sub-linear scan for clustered corpora. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Array[Float], k: Int, planes: Int = 10): DataFrame = {
    val dim = query.length
    val bucketed = df.withColumn("_bucket", lshBucket(col(vecCol), planes, dim))
    // query bucket computed driver-side with the same plane function
    var qb = 0L
    for (p <- 0 until planes) {
      var dot = 0.0
      for (d <- 0 until dim) dot += query(d) * planeComponent(p, d)
      if (dot >= 0) qb |= (1L << p)
    }
    val probes = (qb +: (0 until planes).flatMap(p =>
      (qb ^ (1L << p)) +: (p + 1 until planes).map(p2 => qb ^ (1L << p) ^ (1L << p2)))).distinct
    val cand = bucketed.filter(col("_bucket").isin(probes: _*))
    val q = typedLit(query.toSeq)
    cand.select(col(idCol), Dedup.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
