package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines (builder-prompt
  * first-class components). All are shuffle-conscious:
  * - exact: one hash-aggregate
  * - minhash-LSH: per-row signatures (no shuffle) → band explode →
  *   bucket join on (band, bandHash) → jaccard verify on candidates only
  * - simhash: per-row 64-bit hash → chunk-band blocking → hamming verify
  */
object Dedup {

  /** exact dedup: one row per distinct text, keeping the smallest id. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** latest-wins variant via window (keeps whole rows). */
  def exactKeepRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** minhash-LSH candidate pairs with exact jaccard verification.
    * numHashes = bands * rowsPerBand. Returns (id_a, id_b, jaccard). */
  def minHashPairs(df: DataFrame, idCol: String, textCol: String,
                   bands: Int = 16, rowsPerBand: Int = 4,
                   shingleSize: Int = 5, threshold: Double = 0.7): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", TextFunctions.minhash_sig(col("text"), lit(numHashes), lit(shingleSize)))

    // explode into (band, bandHash) buckets — one row per band per doc
    val banded = sigs.select(col("id"), col("text"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
          s"xxhash64(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

    // candidates: same (band, band_hash); dedupe pairs across bands
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("text").as("text_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("text").as("text_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "text_a", "text_b").distinct()

    cand.withColumn("jaccard",
        TextFunctions.ngram_jaccard(col("text_a"), col("text_b"), lit(shingleSize)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** simhash near-dup pairs: 4x16-bit chunk blocking (any pair within hamming
    * distance <= maxHamming shares at least one exact chunk when maxHamming < 4). */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sh", TextFunctions.simhash(col("text")))
    val chunked = hashed.select(col("id"), col("sh"),
        posexplode(expr("transform(sequence(0,3), c -> (sh >> (c * 16)) & 65535)")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("chunk_val"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sh_a ^ sh_b")).as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** cosine similarity of two float-array embedding columns (double math,
    * native expression — see CosineSimExpr). */
  def cosine(a: Column, b: Column): Column = TextFunctions.cosine_sim(a, b)

  /** EXACT embedding all-pairs above a cosine threshold via triangle-block
    * self-join: vectors are assigned block g = id % blocks; the unordered
    * block pair (i, j), i <= j, is one join key, so every vector pair lands
    * in exactly one join group. An equi-join on the block-pair key (not a
    * CartesianProduct/BroadcastNestedLoopJoin) spreads the O(n²) compute
    * evenly over blocks(blocks+1)/2 shuffle groups. Exact all-pairs is
    * inherently quadratic — for 100-TB corpora use embeddingPairsLsh. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, blocks: Int = 16): DataFrame = {
    val B = blocks
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
        pmod(col(idCol), lit(B)).cast("int").as("ba"))
      // left row in block i joins keys (i, j) for j in i..B-1 (contiguous)
      .withColumn("k", explode(expr(s"sequence(ba * $B + ba, ba * $B + ${B - 1})")))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
        pmod(col(idCol), lit(B)).cast("int").as("bb"))
      // right row in block j joins keys (i, j) for i in 0..j
      .withColumn("k", explode(expr(s"transform(sequence(0, bb), i -> i * $B + bb)")))
    a.join(b, "k")
      // intra-block groups see both orientations; keep one. Cross-block
      // groups see each pair once, in arbitrary id order — canonicalize.
      .filter(col("ba") =!= col("bb") || col("id_a") < col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
              greatest(col("id_a"), col("id_b")).as("id_b"),
              cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** APPROXIMATE embedding near-dup pairs — the 100-TB scale path: `bands`
    * independent sign-random-projection tables of `planes` bits each;
    * candidates share a band bucket, then exact cosine verify. Work is
    * ~bands × corpus (linear), not corpus². Recall for a pair at cosine c is
    * 1-(1-p^planes)^bands with p = 1 - acos(c)/π. */
  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 8, bands: Int = 4,
                        seed: Long = 0L): DataFrame = {
    val banded = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        posexplode(TextFunctions.lsh_buckets(col(vecCol), planes, bands, seed)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .distinct() // a pair colliding in several bands appears once
  }
}
