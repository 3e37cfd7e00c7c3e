package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scale-proof for the LLM-pipeline queries (r2 VERDICT Next #9): run the
  * near-dup / ANN / text-analysis suite at sf0.1 and at a synthesized
  * FACTOR× corpus, recording wall time and shuffle read/write bytes per
  * query, and assert the shuffle volume of the near-dup paths stays
  * ~linear in the input (the quadratic failure mode would show up here
  * long before a 100-TB deployment).
  *
  * The FACTOR× corpus derives from sf0.1 deterministically — each copy k
  * Caesar-rotates the text by k (word/char structure and intra-copy
  * similarity preserved; cross-copy shingle hashes fully decorrelated) and
  * sign-flips embedding dimensions by hash(k,i) (an orthogonal diagonal
  * transform: intra-copy cosines exact, cross-copy cosines scrambled), so
  * near-dup group sizes scale linearly instead of exploding quadratically
  * the way verbatim copies would.
  *
  * Test/runMain graft.bench.ScaleProof [factor] [baseDir] [workDir]
  */
object ScaleProof {

  private val QUERIES = Seq(
    "q13_dedup_exact", "q14_token_stats", "q16_text_analysis",
    "q18_minhash_pairs", "q19_simhash_pairs", "q23_lsh_neardup",
    "q23s_lsh_p16", "q17_ann_topk", "q20_embedding_neardup", "q21_ann_lsh",
    "q35_ann_ivf", "q32_neardup_groups", "q32s_lsh_groups",
    "q44_neardup_star", "q44s_lsh_stargroups", "q73_canonical_keep",
    "q41_corpus_sample", "q42_pack_sequences", "q43_ngram_jaccard",
    "q49_decontaminate", "q50_dup_ratio",
    "q52_repetition", "q53_chunk_dedup", "q54_incremental_dedup",
    "q56_shard_export", "q57_mixture",
    // lake delete lifecycles: table build + MoR retraction + connector read
    // must all scale linearly in the corpus (the delete shard volume is the
    // matched-row count; application is one hash anti-join / probe pass)
    "q58_mor_delete", "q69_pos_delete", "q70_mor_update",
    // rewrite-under-ingest lifecycle: appends + planned re-pack + interleaved
    // append + validated-rebase commit — the rewrite's cost is the re-pack
    // itself, so the lifecycle must scale linearly in the corpus
    "q72_rewrite_rebase",
    // round-5 additions: KMV NDV sketch (shuffle is partitions × k longs —
    // should be FLAT, not linear), bucketed quantile rank (one full-data
    // exchange keyed by (lang, bucket)), cherry-pick and CDC-upsert
    // lifecycles (delete shard ∝ matched keys, appends ∝ corpus)
    "q74_ndv_sketch", "q74s_sketch_only", "q75_quantile_filter",
    "q76_cherrypick", "q77_cdc_upsert",
    // round-5 additions: normalized exact dedup (one hash-agg — linear) and
    // SemDeDup semantic dedup (fixed quantizer density ⇒ centroid count ∝ n,
    // cluster size ~constant ⇒ within-cluster join volume linear)
    "q80_norm_dedup", "q81_semantic_dedup",
    // streaming lifecycles through the real engine (events synthesized with
    // disjoint per-copy users): interval-join state and per-batch dimension
    // joins are keyed per user, so both must scale linearly
    "q82_stream_join", "q83_stream_enrich",
    // round-5 close-out: as-of join (one |l|+|r| exchange keyed by user —
    // disjoint per-copy users keep per-key state constant, so shuffle must
    // be ~linear); URL dedup / domain stats (hash aggregates whose
    // post-partial shuffle is capped at map-partitions × distinct keys —
    // the canonical URL space is constant across copies, so absolute
    // shuffle must stay ~distinct-key-sized however large the corpus,
    // growing only with the partition count)
    "q84_asof_join", "q85_url_dedup", "q86_domain_stats",
    // line filter is a pure per-row map — its only exchange is the
    // presentation sort, so shuffle must be ~linear in the output rows
    // and wall ~linear in the corpus
    "q87_line_filter",
    // heavy hitters: sketch shuffle is CAPPED at partitions × m entries
    // (verify adds one row per candidate, also ≤ m per partition). The
    // base corpus sits under the cap; the 5× and 10× corpora (Caesar-
    // rotated copies multiply distinct bigrams past m) both saturate it —
    // the proof is 5× vs 10×: corpus doubles, shuffle bytes identical
    "q88_heavy_hitters",
    // exact quantile profile: one partial+final agg keyed by lang — the
    // wire carries every row once (no combiner for exact percentile), so
    // shuffle must be ~linear and the per-group buffer sort local
    "q89_length_quantiles",
    // weighted sample: keys are map-side, WindowGroupLimit caps the stratum
    // exchange at k rows per partition — shuffle must be ~FLAT (k × strata ×
    // partitions), wall ~linear in the scan
    "q90_weighted_sample",
    // salient terms: (doc, term) tf agg + vocab df agg + term equi-join +
    // per-doc group-limited window — every exchange ∝ tokens/vocab/docs,
    // so shuffle must be ~linear
    "q91_salient_terms",
    // lm coverage: bigram-hash explode + reference-vocab agg + hash-only
    // equi-join + per-doc count agg — every exchange ∝ bigrams/vocab/docs,
    // so shuffle must be ~linear (Caesar-rotated copies multiply the
    // vocabulary linearly too — no stop-bigram blowup)
    "q92_lm_coverage")

  /** q23 with scale-appropriate band width: collision probability per band
    * is 2^-planes, so candidate volume stays linear only when planes grows
    * ~log2(n) — 8 bits is tuned for the 2k-vector base corpus, 16 bits is
    * the 20k-vector setting. The pair shows the knob, with q23 left as the
    * mis-tuned contrast. */
  private val extraQueries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "q23s_lsh_p16" -> ((s: SparkSession, dir: String) => {
        import s.implicits._
        graft.pipeline.Dedup.embeddingPairsLsh(
            s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
            threshold = 0.3, planes = 16, bands = 4)
          .select($"id_a", $"id_b", round($"cos", 4).as("cos_sim"))
          .orderBy($"id_a", $"id_b")
      }),
      // (member, representative) output over the SAME θ=0.3 LSH pair path:
      // output rows == |corpus| by construction, however cliquey the pair
      // set gets — the default 100-TB output shape (VERDICT r3 Next #5)
      "q32s_lsh_groups" -> ((s: SparkSession, dir: String) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val pairs = graft.pipeline.Dedup.embeddingPairsLsh(
          emb, "vec_id", "embedding", threshold = 0.3, planes = 8, bands = 4)
        graft.pipeline.Dedup.nearDupGroups(emb, "vec_id", pairs)
      }),
      // q74 without the oracle's exact countDistinct companion: the KMV
      // sketch ALONE — its shuffle is partitions × k longs, so the 10×
      // corpus must show a ~FLAT shuffle ratio (the driver query's 10×
      // ratio is the exact-count column, not the sketch)
      "q74s_sketch_only" -> ((s: SparkSession, dir: String) => {
        graft.pipeline.Sketch.ndvByGroup(
          s.read.parquet(s"$dir/documents.parquet"), "text", 64, "lang")
      }),
      // SAME θ=0.3 pair set, grouped by large-star/small-star instead of
      // pointer doubling — the head-to-head shuffle contrast between the
      // two CC regimes on an identical dense pair graph
      "q44s_lsh_stargroups" -> ((s: SparkSession, dir: String) => {
        val emb = s.read.parquet(s"$dir/embeddings.parquet")
        val pairs = graft.pipeline.Dedup.embeddingPairsLsh(
          emb, "vec_id", "embedding", threshold = 0.3, planes = 8, bands = 4)
        graft.pipeline.Dedup.nearDupGroupsStar(emb, "vec_id", pairs)
      }))

  private def queryFn(q: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    extraQueries.getOrElse(q, graft.SparkEntry.queries(q))

  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val base = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val work = if (args.length > 2) args(2) else s"/tmp/graft-scale-${factor}x"
    // optional 4th arg: comma-separated query filter (one-off measurements
    // without re-running the whole suite)
    val only = if (args.length > 3) args(3).split(",").toSet else Set.empty[String]

    val spark = SparkSession.builder().master("local[32]").appName("scaleproof")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufRead = new AtomicLong(); val shufWrite = new AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    synthesize(spark, base, work, factor)

    val queries = if (only.isEmpty) QUERIES else QUERIES.filter(only)
    def runSuite(dir: String, tag: String): Map[String, (Double, Long, Long, Long)] =
      queries.map { q =>
        shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        queryFn(q)(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val (sr, sw) = (shufRead.get(), shufWrite.get()) // before the row count
        val n = queryFn(q)(spark, dir).count()
        println(f"$tag $q%-24s $sec%7.2f s  shufR=${sr / 1e6}%9.1f MB shufW=${sw / 1e6}%9.1f MB rows=$n")
        q -> ((sec, sr, sw, n))
      }.toMap

    // warmup pass (codegen + parquet footers), untimed
    graft.SparkEntry.queries("q13_dedup_exact")(spark, base).count()

    val b = runSuite(base, "base ")
    val s = runSuite(work, s"x$factor  ")

    println(s"""{"metric":"scaleproof","factor":$factor,"queries":{""" +
      queries.map { q =>
        val (bt, br, bw, _) = b(q); val (st, sr, sw, sn) = s(q)
        f""""$q":{"base_sec":$bt%.2f,"x_sec":$st%.2f,"time_ratio":${st / bt}%.1f,""" +
        f""""base_shuffle_mb":${(br + bw) / 1e6}%.1f,"x_shuffle_mb":${(sr + sw) / 1e6}%.1f,""" +
        f""""shuffle_ratio":${(sr + sw).toDouble / math.max(1L, br + bw)}%.1f,"x_rows":$sn}"""
      }.mkString(",") + "}}")
    spark.stop()
  }

  /** copies 1..factor-1 of documents+embeddings+events appended to copy 0.
    * Guarded per table so adding a table to the proof later only
    * synthesizes the missing one. */
  private def synthesize(spark: SparkSession, base: String, work: String,
                         factor: Int): Unit = {
    def missing(t: String) = !new java.io.File(s"$work/$t.parquet/_SUCCESS").exists()
    import spark.implicits._
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rot(s: String, k: Int) = { val m = k % s.length; s.drop(m) + s.take(m) }
    if (missing("documents")) {
      val docs = spark.read.parquet(s"$base/documents.parquet")
      val docCopies = (0 until factor).map { k =>
        docs.select(($"doc_id" + lit(k.toLong * 100000000L)).as("doc_id"),
          (if (k == 0) $"text"
           else translate($"text", lower + upper + digits,
             rot(lower, k) + rot(upper, k) + rot(digits, k))).as("text"),
          $"lang", $"source", $"n_chars")
      }.reduce(_ unionByName _)
      docCopies.repartition(32).write.mode("overwrite").parquet(s"$work/documents.parquet")
    }
    if (missing("embeddings")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      val embCopies = (0 until factor).map { k =>
        emb.select(($"vec_id" + lit(k.toLong * 100000000L)).as("vec_id"),
          (if (k == 0) $"embedding"
           else expr(s"transform(embedding, (x, i) -> x * (cast(pmod(hash($k, i), 2) as float) * 2.0f - 1.0f))"))
            .as("embedding"),
          $"label")
      }.reduce(_ unionByName _)
      embCopies.repartition(8).write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    }
    // events: copies carry DISJOINT user ids (and offset event ids), so
    // per-user join/session/state cardinality stays constant and stream
    // lifecycles must scale linearly in the corpus
    if (missing("events")) {
      val ev = spark.read.parquet(s"$base/events.parquet")
      val evCopies = (0 until factor).map { k =>
        ev.select(($"event_id" + lit(k.toLong * 100000000L)).as("event_id"), $"ts",
          ($"user_id" + lit(k.toLong * 1000000L)).as("user_id"),
          $"event_type", $"value", $"props")
      }.reduce(_ unionByName _)
      evCopies.repartition(8).write.mode("overwrite").parquet(s"$work/events.parquet")
    }
  }
}
