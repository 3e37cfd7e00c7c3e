package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation: deterministic stratified sampling under a
  * per-language token budget — the "data mixing" step of a pretraining
  * pipeline (take N tokens of each language/source, chosen uniformly at
  * random but reproducibly, after quality filtering and dedup).
  *
  * Semantics: within each stratum (language), documents are ordered by a
  * deterministic pseudo-random key `mix64(id)` (ties broken by id) and
  * taken greedily until the token budget is exhausted — a document is kept
  * iff the total tokens of all documents BEFORE it in that order is still
  * under the budget (so the last kept document may overflow the budget by a
  * fraction of one document; no document is split).
  *
  * Scale shape: the textbook formulation is one window —
  * `sum(tokens) over (partition by lang order by mix64(id))` — which puts
  * an ENTIRE language through a single task's sort: a non-starter when one
  * stratum is 40 TB. This implementation computes the same prefix sum in
  * two distributed passes:
  *
  *   1. bucket each row by the TOP bits of its sort key (bucket order ==
  *      key order), aggregate per-(lang, bucket) token totals — a partial
  *      aggregate shuffling langs x buckets rows, i.e. KBs;
  *   2. turn the tiny per-bucket totals into per-bucket starting offsets
  *      (a window over the langs x buckets frame), broadcast them back,
  *      and window only WITHIN each (lang, bucket) — parallelism = buckets
  *      per language, each task sorting ~1/buckets of a stratum.
  *
  * offset(bucket) + local prefix == the global per-language prefix sum
  * exactly, because the bucket is monotone in the sort key (top bits,
  * arithmetic shift) and ties in the key share a bucket. The full data
  * crosses the exchange once (keyed by lang, bucket), same bytes as the
  * naive window, but no single-task stratum sort and no driver collect.
  */
object Curation {

  /** Greedy token-budget sample per stratum; returns the kept rows of `df`
    * with two extra columns: `tokens` (the per-row count, as given) and
    * `cum_before` (exact tokens taken in this stratum before this row).
    * `buckets` must be a power of two; raise it until one stratum's rows /
    * buckets fits a task sort comfortably (1024 buckets at 40 TB/stratum =
    * ~40 GB per task pre-projection; 64k buckets = ~600 MB). */
  def tokenBudgetSample(df: DataFrame, idCol: String, langCol: String,
                        tokens: Column, budgetPerLang: Long,
                        buckets: Int = 1024): DataFrame =
    prefixSums(df, idCol, langCol, tokens, buckets)
      .filter(col("cum_before") < budgetPerLang)

  /** Weighted multi-source mixture (epoch weighting): source s with weight
    * w contributes floor(w) full copies of every row plus one
    * frac(w)-Bernoulli-sampled partial copy — "repeat Wikipedia 2.5x, take
    * a quarter of CommonCrawl". Copy selection is deterministic: the
    * uniform draw for (row, copy) is the top 53 bits of
    * splitmix64(id * 1000003 + copy, xor seed) scaled to [0, 1) — a value
    * both engines (and any re-run) reproduce bit-exactly, so the mixture
    * is a pure function of (corpus, weights, seed).
    *
    * Scale shape: one narrow per-row explode of at most ceil(max weight)
    * copies — no shuffle, no sampling state, no driver collect; the output
    * is written shard-parallel exactly like the input. Returns
    * (id, source, copy). */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
              weights: Map[String, Double], defaultWeight: Double,
              seed: Long): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 64),
      "weights must be in [0, 64]")
    val wt = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, w)) =>
      when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    val u = shiftrightunsigned(
      TextFunctions.mix64((col(idCol).cast("long") * 1000003L + col("copy"))
        .bitwiseXOR(lit(seed))), 11).cast("double") / lit(9007199254740992.0)
    df.select(col(idCol), col(sourceCol), wt.as("wt"))
      .withColumn("copy", explode(
        // weight 0 → no copies (sequence(0,-1) would count DOWN in Spark)
        when(ceil(col("wt")) >= 1,
          sequence(lit(0L), ceil(col("wt")).cast("long") - 1))
          .otherwise(typedLit(Array.empty[Long]))))
      .filter(col("copy") < floor(col("wt")) || u < col("wt") - floor(col("wt")))
      .select(col(idCol), col(sourceCol), col("copy"))
  }

  /** Greedy contiguous sequence packing: assign documents (in the same
    * deterministic mix64(id) order as the sampler) to fixed token-capacity
    * training windows — bin = floor(running token total / window), offset =
    * running total mod window. A document spanning a bin boundary starts a
    * continuation in the next bin (`spans_next` marks it), the contiguous
    * layout a sequence-packing loader consumes (documents are not split
    * across SHUFFLE boundaries — the bin/offset pair IS the split plan).
    *
    * Same two-pass distributed prefix sum as tokenBudgetSample, so no
    * stratum ever sorts in one task; packing 100 TB is one bounded-memory
    * pass. Output adds `tokens`, `bin`, `bin_offset`, `spans_next`. */
  def packSequences(df: DataFrame, idCol: String, langCol: String,
                    tokens: Column, windowTokens: Long,
                    buckets: Int = 1024): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val cum = prefixSums(df, idCol, langCol, tokens, buckets)
    cum
      // DIV: exact long division (Column./ is floating and loses exactness
      // past 2^53 cumulative tokens — reachable at corpus scale)
      .withColumn("bin", expr(s"cum_before DIV $windowTokens"))
      .withColumn("bin_offset", col("cum_before") % windowTokens)
      .withColumn("spans_next",
        col("bin_offset") + col("tokens") > windowTokens)
      .drop("cum_before")
  }

  /** The shared two-pass distributed prefix sum (see object doc): every
    * row of `df` plus `tokens` and `cum_before` = the exact token total of
    * all same-stratum rows earlier in (mix64(id), id) order. */
  private def prefixSums(df: DataFrame, idCol: String, langCol: String,
                         tokens: Column, buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    val base = df
      .withColumn("tokens", tokens.cast("long"))
      .withColumn("__h", TextFunctions.mix64(col(idCol).cast("long")))
      // arithmetic shift keeps bucket order == signed key order; +B/2
      // maps [-B/2, B/2) onto [0, B). buckets=1 needs the constant: a
      // 64-bit shift count is masked to 0 by the JVM/Spark, which would
      // leave the raw hash (truncated to int) as the "bucket"
      .withColumn("__b",
        if (buckets == 1) lit(0)
        else (shiftright(col("__h"), shift) + buckets / 2).cast("int"))
    val perBucket = base
      .groupBy(col(langCol).as("__l"), col("__b").as("__bb"))
      .agg(sum("tokens").as("__bt"))
    val acrossBuckets = Window.partitionBy("__l").orderBy("__bb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__off", coalesce(sum("__bt").over(acrossBuckets), lit(0L)))
      .select("__l", "__bb", "__off")
    val withinBucket = Window.partitionBy(col(langCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      // null-safe on the stratum: groupBy keeps a NULL-language group, and
      // a === join would silently drop those rows from the sample/packing
      .join(broadcast(offsets),
        col(langCol) <=> col("__l") && col("__b") === col("__bb"))
      .withColumn("cum_before",
        col("__off") + coalesce(sum(col("tokens")).over(withinBucket), lit(0L)))
      .drop("__l", "__bb", "__off", "__b", "__h")
  }

  /** Quantile-threshold filtering: DROP the bottom `qNumer/qDenom` fraction
    * of each stratum by an integer score (ties broken by id) — the
    * "keep the top 75% by quality per language" curation step. The cut is
    * rank-exact: per stratum exactly floor(q·n) rows drop, the kept set is
    * `rank > floor(q·n)` under the deterministic (score, id) order, and q
    * is a RATIONAL so the threshold rank is integer arithmetic end to end
    * (bit-replayable in any engine; a float q times a 10^11 row count is
    * not).
    *
    * Scale shape mirrors the prefix-sum sampler above — no per-stratum
    * global sort: per-stratum (min, max, n) in one tiny agg (broadcast),
    * score range split into order-preserving buckets, per-(stratum, bucket)
    * row counts prefix-summed over the tiny bucket frame (broadcast back),
    * and a row_number only WITHIN each (stratum, bucket). offset + local
    * rank == the exact global rank because buckets are monotone in score.
    * Degenerate strata (constant score) collapse to one bucket — the same
    * single-task sort any rank-exact method pays when every key ties.
    *
    * Returns the KEPT rows of `df` plus `score` and `rank` (1-based within
    * the stratum, ascending score = worst first). */
  def dropBottomQuantile(df: DataFrame, idCol: String, strataCol: String,
                         score: Column, qNumer: Long, qDenom: Long,
                         buckets: Int = 1024): DataFrame = {
    require(qDenom > 0 && qNumer >= 0 && qNumer <= qDenom,
      s"q must be a fraction in [0,1], got $qNumer/$qDenom")
    require(buckets > 0, "buckets must be positive")
    val base = df.withColumn("score", score.cast("long"))
    // pass 1: per-stratum score range + row count — strata-many rows, tiny
    val ranges = base.groupBy(col(strataCol).as("__s"))
      .agg(min("score").as("__lo"), max("score").as("__hi"),
           count(lit(1)).as("__n"))
      // DIV throughout: Column./ is floating and loses exactness for
      // 60-bit score ranges
      .withColumn("__w", greatest(lit(1L),
        expr(s"(__hi - __lo + 1) DIV $buckets")))
      // rows to drop: floor(q * n) in exact integer arithmetic
      .withColumn("__drop", expr(s"(__n * $qNumer) DIV $qDenom"))
    val bucketed = base
      // null-safe: a NULL stratum is its own quantile group, not a drop
      .join(broadcast(ranges), col(strataCol) <=> col("__s"))
      .withColumn("__b", expr("(score - __lo) DIV __w"))
    // pass 2: per-(stratum, bucket) counts → starting offsets (tiny frame)
    val perBucket = bucketed.groupBy(col(strataCol).as("__s2"), col("__b").as("__bb"))
      .agg(count(lit(1)).as("__bn"))
    val acrossBuckets = Window.partitionBy("__s2").orderBy("__bb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("__off", coalesce(sum("__bn").over(acrossBuckets), lit(0L)))
      .select("__s2", "__bb", "__off")
    val withinBucket = Window.partitionBy(col(strataCol), col("__b"))
      .orderBy(col("score"), col(idCol))
    bucketed
      .join(broadcast(offsets),
        col(strataCol) <=> col("__s2") && col("__b") === col("__bb"))
      .withColumn("rank", col("__off") + row_number().over(withinBucket))
      .filter(col("rank") > col("__drop"))
      .drop("__s", "__lo", "__hi", "__n", "__w", "__drop", "__b", "__s2", "__bb", "__off")
  }

  /** Reference single-window formulation of dropBottomQuantile (identical
    * result; serializes each stratum through one task — test use only). */
  private[graft] def dropBottomQuantileNaive(
      df: DataFrame, idCol: String, strataCol: String,
      score: Column, qNumer: Long, qDenom: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col("score"), col(idCol))
    df.withColumn("score", score.cast("long"))
      .withColumn("rank", row_number().over(w))
      .withColumn("__drop", expr(s"(count(1) OVER (PARTITION BY $strataCol) * $qNumer) DIV $qDenom"))
      .filter(col("rank") > col("__drop"))
      .drop("__drop")
  }

  /** Reference single-window formulation (identical result; serializes each
    * stratum through one task — test/verification use only). */
  private[graft] def tokenBudgetSampleNaive(
      df: DataFrame, idCol: String, langCol: String,
      tokens: Column, budgetPerLang: Long): DataFrame = {
    val w = Window.partitionBy(col(langCol))
      .orderBy(TextFunctions.mix64(col(idCol).cast("long")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens", tokens.cast("long"))
      .withColumn("cum_before", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .filter(col("cum_before") < budgetPerLang)
  }
}
