package graft.pipeline

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Reference-bigram coverage — the log-free member of the LM-quality-filter
  * family (CCNet/Gopher-style "does this document look like the reference
  * corpus" scoring, re-expressed so every engine computes the identical
  * result).
  *
  * A real pretraining pipeline trains a small n-gram LM on a trusted corpus
  * (Wikipedia in CCNet) and keeps documents whose perplexity under it is
  * low. Perplexity needs logs and order-dependent float accumulation — not
  * cross-engine reproducible. The same signal, made exact: build the bigram
  * VOCABULARY of the reference slice (adjacent-word-pair shingles seen in at
  * least `minRefDocs` distinct reference documents), then score each
  * document by what fraction of its own bigram stream the vocabulary covers:
  *
  *   coverage(doc) = |{i : bigram_i(doc) ∈ vocab}| / #bigrams(doc)
  *
  * Both counts are integers and the score is ONE IEEE division per row, so
  * Spark and the DuckDB oracle agree bit-exactly (the q91 discipline). A
  * document of in-distribution prose scores near 1; gibberish, wrong-language
  * and boilerplate-free noise score near 0 — monotone in the same direction
  * as negative perplexity.
  *
  * Scale shape, all linear in token count: bigrams are the codegen'd
  * [[TextFunctions.shingle_hashes]](text, 2) projection (60-bit sha hashes —
  * ids only ride the shuffles, never the strings); the vocabulary is one
  * hash aggregate over the reference slice; hits are one equi-join (the
  * vocabulary of a 100-TB reference does not broadcast — Spark picks SMJ/SHJ
  * by stats, both linear) plus one hash aggregate back to one row per
  * document. No window, no cartesian, no driver collect.
  */
object LmScore {

  /** Score `docs` against the bigram vocabulary of `ref`.
    *
    * @param minRefDocs a bigram enters the vocabulary when it appears in at
    *                   least this many DISTINCT reference documents (doc
    *                   frequency, not raw count — one spammy reference doc
    *                   cannot mint vocabulary).
    * @return one row per input row: (id, n_bigrams, n_hits, coverage) with
    *         coverage = round(n_hits / n_bigrams, 6). Empty/whitespace-only/
    *         null text scores (0, 0, 0.0) — a document with no bigram stream
    *         has zero coverage, it does not vanish from the output (a
    *         downstream keep-filter must SEE it to reject it).
    */
  def bigramCoverage(docs: DataFrame, idCol: String, textCol: String,
                     ref: DataFrame, refIdCol: String, refTextCol: String,
                     minRefDocs: Int = 2): DataFrame = {
    require(minRefDocs >= 1, "minRefDocs must be >= 1")
    // the total needs no explode or aggregate: each doc is one row and its
    // bigram count is the shingle-array length (null text → empty array)
    val tot = docs.select(col(idCol).cast("long").as("id"),
      size(TextFunctions.shingle_hashes(coalesce(col(textCol), lit("")), lit(2)))
        .cast("long").as("n_bigrams"))
    // duplicates kept: coverage weighs each POSITION of the bigram stream,
    // exactly like a unigram-backoff LM weighs each token position.
    val ex = docs.select(col(idCol).cast("long").as("id"),
      explode(TextFunctions.shingle_hashes(col(textCol), lit(2))).as("sh"))
    // vocabulary by reference DOC frequency: distinct per doc, then count.
    val vocab = ref.select(col(refIdCol).cast("long").as("rid"),
        explode(array_distinct(
          TextFunctions.shingle_hashes(col(refTextCol), lit(2)))).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("refdf"))
      .filter(col("refdf") >= minRefDocs)
      .select("sh")
    val perDoc = ex.join(vocab, Seq("sh"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_hits"))
    tot.join(perDoc, Seq("id"), "left_outer")
      .select(col("id"), col("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(col("n_bigrams") === 0L, lit(0.0)).otherwise(
          round(coalesce(col("n_hits"), lit(0L)).cast("double") /
            col("n_bigrams").cast("double"), 6)).as("coverage"))
  }
}
