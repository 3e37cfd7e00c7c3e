package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic exactly-k weighted sampling per stratum — the "pick k
  * representative documents per language/source, favouring the ones the
  * curation policy weighs higher" step of a pretraining pipeline (the
  * sibling of [[Curation.tokenBudgetSample]], which is budget-greedy and
  * returns a variable-size prefix; this returns exactly min(k, |stratum|)
  * rows).
  *
  * Algorithm: weighted random sampling by key ordering (the
  * Efraimidis–Spirakis family). The textbook key is u^(1/w); for INTEGER
  * weights the same selection distribution comes from giving each row w
  * independent uniform keys and keeping its MINIMUM (min of w uniforms ~
  * Beta(1, w), the u^(1/w) order statistic mirrored), which stays in exact
  * 64-bit integer arithmetic end to end: key(row) = min over copy < w of
  * splitmix64(id * 1000003 + copy XOR seed) >>> 11. No transcendental
  * functions means any engine (and the DuckDB oracle) reproduces the
  * selected set bit-exactly — the same determinism stance as
  * [[Curation.mixture]], which uses the identical (id, copy, seed) draw.
  *
  * Scale shape: the keys are a narrow per-row map (w ≤ 64 hash
  * evaluations inside one codegen'd projection — no explode, no shuffle);
  * the per-stratum top-k is a rank window that Spark's
  * InferWindowGroupLimit rewrites into a WindowGroupLimit pair (map-side
  * per-partition top-k before the exchange, final top-k after), so the
  * shuffle carries at most k rows per stratum per input partition — never
  * the corpus. One exchange keyed by stratum, output k rows per stratum.
  */
object Sampling {

  /** Exactly min(k, stratum size) rows per stratum, chosen with probability
    * proportional to the integer `weight` (clamped to [1, 64]), fully
    * deterministic in (corpus, seed). Returns (stratum, id, wt, key) with
    * `key` the winning 53-bit draw — integer-exact, so it belongs in the
    * oracle comparison. */
  def weightedSample(df: DataFrame, idCol: String, stratumCol: String,
                     weight: Column, k: Int, seed: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val wt = least(greatest(weight.cast("long"), lit(1L)), lit(64L))
    val key = array_min(transform(
      sequence(lit(0L), wt - 1),
      c => shiftrightunsigned(
        TextFunctions.mix64((col(idCol).cast("long") * 1000003L + c)
          .bitwiseXOR(lit(seed))), 11)))
    val rn = row_number().over(
      Window.partitionBy(col("stratum")).orderBy(col("key"), col("id")))
    df.select(col(stratumCol).as("stratum"), col(idCol).as("id"),
        wt.as("wt"), key.as("key"))
      .withColumn("rn", rn)
      .filter(col("rn") <= k)
      .drop("rn")
  }
}

/** Per-document salient-term extraction — the log-free member of the
  * tf–idf family: score(term, doc) = tf(term, doc) / df(term), term
  * frequency over document frequency. Like ln(N/df)-idf it is monotone
  * decreasing in df (corpus-common terms rank low, document-specific terms
  * rank high); unlike it the score is a ratio of two small integers, so
  * Spark and any SQL oracle compute bit-identical doubles (one IEEE
  * division each — no transcendental functions, the repo-wide oracle
  * discipline).
  *
  * Scale shape, all linear in the token count: one hash aggregate to
  * (doc, term, tf); one hash aggregate to (term, df) — tf rows are already
  * distinct per (doc, term), so df is a COUNT, not a COUNT DISTINCT; one
  * equi-join on term (shuffle-hash/sort-merge at vocabulary scale — the
  * vocabulary of a 100-TB corpus does not broadcast); and a per-doc rank
  * window that InferWindowGroupLimit turns into a map-side top-k, so the
  * final exchange carries k rows per document per partition. No cartesian,
  * no driver collect, no corpus-sized window state.
  */
object Salience {

  /** Top-k salient terms per document over whitespace tokens. Returns
    * (id, term, tf, df, score, rank) with score = round(tf/df, 6). */
  def salientTerms(df: DataFrame, idCol: String, textCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df.select(col(idCol).as("id"),
        explode(split(col(textCol), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val score = col("tf").cast("double") / col("df").cast("double")
    val rn = row_number().over(
      Window.partitionBy(col("id")).orderBy(score.desc, col("term")))
    tf.join(dfreq, "term")
      .withColumn("rank", rn)
      .filter(col("rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"),
        round(score, 6).as("score"), col("rank").cast("long").as("rank"))
  }
}
