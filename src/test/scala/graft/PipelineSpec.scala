package graft

import graft.pipeline.{Dedup, Ann, TextOps, Multimodal, MediaCodec, MediaFunctions, Curation}
import org.apache.spark.sql.functions._

/** Correctness checks for the training-data operators beyond rows>0:
  * LSH vs brute-force agreement, dedup exactness, stub decode fidelity. */
class PipelineSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup finds injected duplicates") {
    import spark.implicits._
    val withDups = docs.select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 100000).as("doc_id"), $"text").limit(5))
    val dups = Dedup.exact(withDups, "doc_id", "text").filter($"dup_count" > 1)
    assert(dups.count() == 5)
    // keep_id is always the original (smaller) id
    assert(dups.filter($"keep_id" >= 100000).count() == 0)
  }

  test("PII scrub: ordered redaction and per-type counts") {
    import spark.implicits._
    import graft.pipeline.TextFunctions
    val df = Seq(
      (1L, "write to a.b+c@mail.example.org or 192.168.0.1 call 5551234567 now"),
      (2L, "no pii here"),
      (3L, "two mails x@y.io z@w.co one ip 8.8.8.8"),
      (4L, "digits 123456 are short, 1234567 is a phone")
    ).toDF("id", "text")
    val out = df.select($"id", TextFunctions.pii_counts($"text").as("c"),
        TextFunctions.scrub_pii($"text").as("s"))
      .select($"id", $"c.n_emails", $"c.n_ips", $"c.n_phones", $"s")
      .orderBy("id").collect()
    assert(out(0).toSeq.drop(1) ==
      Seq(1, 1, 1, "write to <email> or <ip> call <phone> now"))
    assert(out(1).toSeq.drop(1) == Seq(0, 0, 0, "no pii here"))
    assert(out(2).toSeq.drop(1) == Seq(2, 1, 0, "two mails <email> <email> one ip <ip>"))
    assert(out(3).toSeq.drop(1) ==
      Seq(0, 0, 1, "digits 123456 are short, <phone> is a phone"))
  }

  test("decontaminate flags exactly the docs sharing shingles with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma zeta eta"),       // shares 2+ shingles with bench 10
      (3L, "one two three four five"),          // disjoint
      (4L, "beta gamma delta theta iota")       // shares "beta gamma delta" region
    ).toDF("doc_id", "text")
    val bench = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(corpus, "doc_id", "text",
        bench, "doc_id", "text", n = 3, minShared = 1)
      .orderBy("doc_id").collect()
    // shingles of bench: {abg, bgd}; doc1 shares both, doc2 shares abg,
    // doc4 shares bgd; doc3 none
    assert(hits.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (2L, 1L), (4L, 1L)))
    // minShared=2 keeps only doc1
    val strict = Dedup.decontaminate(corpus, "doc_id", "text",
      bench, "doc_id", "text", n = 3, minShared = 2).collect()
    assert(strict.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("duplicationRatio matches a local shingle-docfreq kernel") {
    import spark.implicits._
    val rows = docs.select($"doc_id", $"text").limit(60)
      .as[(Long, String)].collect()
    // local kernel over the same distinct-shingle space
    val perDoc = rows.map { case (id, tx) =>
      id -> TextOps.shingleHashes(tx, 3).distinct }
    val freq = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.length).toMap
    val expect = perDoc.map { case (id, shs) =>
      id -> ((shs.length.toLong, shs.count(freq(_) >= 2).toLong)) }.toMap
    val got = Dedup.duplicationRatio(rows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", n = 3)
      .select($"id", $"nsh", $"dup_sh").as[(Long, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (id, nsh, dup) =>
      assert((nsh, dup) == expect(id), s"doc $id: got ($nsh,$dup) want ${expect(id)}") }
  }

  test("minhash-LSH finds an injected near-duplicate with high jaccard") {
    import spark.implicits._
    val base = docs.select($"doc_id", $"text").limit(30)
    // near-dup: copy of doc 0 with one word appended
    val near = base.filter($"doc_id" === 0)
      .select(lit(900000L).as("doc_id"), concat($"text", lit(" extra")).as("text"))
    val pairs = Dedup.minHashPairs(base.unionByName(near), "doc_id", "text",
      bands = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.8)
    val hit = pairs.filter($"id_a" === 0 && $"id_b" === 900000L).collect()
    assert(hit.length == 1, "LSH missed the injected near-duplicate")
    assert(hit.head.getDouble(2) > 0.8)
  }

  test("exact n-gram jaccard pairs: count algebra equals the local set kernel") {
    import spark.implicits._
    val base = docs.select($"doc_id", $"text").limit(30)
    val near = base.filter($"doc_id" === 0)
      .select(lit(900000L).as("doc_id"), concat($"text", lit(" extra tail")).as("text"))
    val all = base.unionByName(near)
    val pairs = Dedup.ngramJaccardPairs(all, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 1000) // cutoff inactive at 31 docs
    val hit = pairs.filter($"id_a" === 0 && $"id_b" === 900000L).collect()
    assert(hit.length == 1, "exact jaccard missed the injected near-duplicate")
    val texts = all.filter($"doc_id".isin(0L, 900000L)).orderBy($"doc_id")
      .select($"text").as[String].collect()
    val local = TextOps.ngramJaccard(texts(0), texts(1), 3)
    assert(math.abs(hit.head.getDouble(2) - local) < 1e-12,
      s"distributed ${hit.head.getDouble(2)} != local $local")
    // boilerplate cutoff: with maxDocFreq 0 every shingle is dropped → no pairs
    assert(Dedup.ngramJaccardPairs(all, "doc_id", "text", 3, 0.0, maxDocFreq = 0).count() == 0)
  }

  test("token-budget sample: two-pass distributed prefix sum equals the global window") {
    import spark.implicits._
    val toks = (length($"text") - length(regexp_replace($"text", " ", "")) + 1).cast("long")
    val naive = Curation.tokenBudgetSampleNaive(docs, "doc_id", "lang", toks, 4000L)
      .select($"doc_id", $"lang", $"tokens", $"cum_before")
      .collect().map(_.toSeq).sortBy(_.toString)
    // the result must be invariant in the bucket count (2 buckets forces
    // multi-bucket offsets even on the small corpus; 256 leaves most empty)
    for (b <- Seq(2, 16, 256)) {
      val got = Curation.tokenBudgetSample(docs, "doc_id", "lang", toks, 4000L, buckets = b)
        .select($"doc_id", $"lang", $"tokens", $"cum_before")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == naive.toSeq, s"buckets=$b diverged from the global window")
    }
    assert(naive.nonEmpty)
  }

  test("prefix-sum curation: NULL strata kept, buckets=1 degenerate") {
    import spark.implicits._
    val df = Seq((1L, "en", 10L), (2L, null.asInstanceOf[String], 10L),
      (3L, null.asInstanceOf[String], 10L), (4L, "en", 10L))
      .toDF("doc_id", "lang", "tk")
    // NULL is its own stratum, not a silent drop (the === join would lose it)
    val kept = Curation.tokenBudgetSample(df, "doc_id", "lang", $"tk",
      budgetPerLang = 100L, buckets = 8)
    assert(kept.count() == 4)
    assert(kept.filter($"lang".isNull).count() == 2)
    val q = Curation.dropBottomQuantile(df, "doc_id", "lang", $"tk", 0L, 1L, buckets = 8)
    assert(q.count() == 4, "q=0 must drop nothing, including NULL strata")
    // buckets=1: the 64-bit shift is masked to 0 by the JVM — the constant
    // bucket keeps cum_before exact
    val one = Curation.tokenBudgetSample(docs, "doc_id", "lang",
        (length($"text")).cast("long"), budgetPerLang = 400000L, buckets = 1)
      .select($"doc_id", $"cum_before").collect().map(_.toSeq).sortBy(_.toString)
    val ref = Curation.tokenBudgetSampleNaive(docs, "doc_id", "lang",
        (length($"text")).cast("long"), budgetPerLang = 400000L)
      .select($"doc_id", $"cum_before").collect().map(_.toSeq).sortBy(_.toString)
    assert(one.toSeq == ref.toSeq)
  }

  test("token-budget sample: greedy budget semantics per stratum") {
    import spark.implicits._
    val toks = (length($"text") - length(regexp_replace($"text", " ", "")) + 1).cast("long")
    val kept = Curation.tokenBudgetSample(docs, "doc_id", "lang", toks, 3000L, buckets = 8)
    // every kept row started under budget; totals may overflow by < one doc
    assert(kept.filter($"cum_before" >= 3000L).count() == 0)
    val perLang = kept.groupBy($"lang")
      .agg(sum($"tokens").as("total"), max($"cum_before" + $"tokens").as("hi"),
        count(lit(1)).as("n")).collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("total") == r.getAs[Long]("hi"), "prefix sums inconsistent")
    }
    // a language with more than budget available must stop near the budget:
    // the last kept doc crosses it, so total >= budget whenever any doc was cut
    val totalByLang = docs.withColumn("t", toks).groupBy($"lang")
      .agg(sum($"t").as("avail")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { r =>
      val lang = r.getString(0)
      if (totalByLang(lang) > 3500L) // clearly over budget
        assert(r.getAs[Long]("total") >= 3000L, s"$lang under-filled its budget")
    }
  }

  test("quantile filter: bucketed rank equals the global window, drop count exact") {
    import spark.implicits._
    val toks = (length($"text") - length(regexp_replace($"text", " ", "")) + 1).cast("long")
    val naive = Curation.dropBottomQuantileNaive(docs, "doc_id", "lang", toks, 1L, 4L)
      .select($"doc_id", $"lang", $"score", $"rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(naive.nonEmpty)
    for (b <- Seq(2, 16, 256)) {
      val got = Curation.dropBottomQuantile(docs, "doc_id", "lang", toks, 1L, 4L, buckets = b)
        .select($"doc_id", $"lang", $"score", $"rank")
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(got.toSeq == naive.toSeq, s"buckets=$b diverged from the global window")
    }
    // per-stratum arithmetic: exactly n - floor(n/4) rows survive
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Curation.dropBottomQuantile(docs, "doc_id", "lang", toks, 1L, 4L, buckets = 16)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    n.foreach { case (l, c) => assert(kept(l) == c - c / 4, s"lang $l") }
    // partition-layout invariance
    val re = Curation.dropBottomQuantile(docs.repartition(13), "doc_id", "lang",
        toks, 1L, 4L, buckets = 16)
      .select($"doc_id", $"lang", $"score", $"rank")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(re.toSeq == naive.toSeq)
  }

  test("quantile filter: degenerate strata — constant scores, tiny n, q edges") {
    import spark.implicits._
    val df = Seq(
      // constant score: range collapses to one bucket, ties break by id —
      // with n=4 and q=1/4 exactly id 1 (rank 1) drops
      (1L, "c", 7L), (2L, "c", 7L), (3L, "c", 7L), (4L, "c", 7L),
      // n=1..3 with q=1/4: floor(n/4)=0 → everything survives
      (10L, "a", 5L),
      (20L, "b", 9L), (21L, "b", 3L)).toDF("doc_id", "lang", "sc")
    val kept = Curation.dropBottomQuantile(df, "doc_id", "lang", $"sc", 1L, 4L, buckets = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 10L, 20L, 21L))
    // q = 1 (drop all) and q = 0 (keep all)
    assert(Curation.dropBottomQuantile(df, "doc_id", "lang", $"sc", 1L, 1L).count() == 0)
    assert(Curation.dropBottomQuantile(df, "doc_id", "lang", $"sc", 0L, 1L).count() == 7)
  }

  test("sequence packing: bin/offset arithmetic matches the global-window prefix sums") {
    import spark.implicits._
    val toks = (length($"text") - length(regexp_replace($"text", " ", "")) + 1).cast("long")
    val W = 1500L
    // expected: naive global window (budget = unlimited), bin math locally
    val expected = Curation.tokenBudgetSampleNaive(docs, "doc_id", "lang", toks, Long.MaxValue)
      .select($"doc_id", $"lang", $"tokens", $"cum_before")
      .collect().map { r =>
        val cum = r.getLong(3); val t = r.getLong(2)
        (r.getLong(0), r.getString(1), t, cum / W, cum % W, cum % W + t > W)
      }.sortBy(_.toString)
    val got = Curation.packSequences(docs, "doc_id", "lang", toks, W, buckets = 16)
      .select($"doc_id", $"lang", $"tokens", $"bin", $"bin_offset", $"spans_next")
      .as[(Long, String, Long, Long, Long, Boolean)]
      .collect().sortBy(_.toString)
    assert(got.toSeq == expected.toSeq)
    // structural sanity: within a language, bins are contiguous from 0 and
    // every row fits its window start
    assert(got.forall { case (_, _, _, bin, off, _) => bin >= 0 && off >= 0 && off < W })
    val binsByLang = got.groupBy(_._2).map { case (l, rs) =>
      l -> rs.map(_._4).distinct.sorted.toVector }
    binsByLang.foreach { case (l, bins) =>
      assert(bins == (0L until bins.length).toVector,
        s"$l bins not contiguous: ${bins.mkString(",")}")
    }
  }

  test("k-means recovers well-separated synthetic clusters") {
    import spark.implicits._
    // three orthogonal-ish cluster directions in 8 dims, 40 points each
    // with small deterministic jitter
    val dirs = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val pts = (0 until 120).map { i =>
      val d = dirs(i % 3)
      val v = d.indices.map(j =>
        d(j) + 0.05f * (((TextOps.mix(i * 8 + j) % 1000) / 1000.0f))).toArray
      (i.toLong, v)
    }
    val df = pts.toDF("vec_id", "embedding")
    val cents = graft.pipeline.Ann.kmeansCentroids(df, "vec_id", "embedding", k = 3, iters = 5)
    // each true direction must have a centroid at cosine > 0.98
    dirs.foreach { d =>
      val best = cents.map(c => TextOps.cosineLocal(c, d)).max
      assert(best > 0.98, s"no centroid recovered direction ${d.mkString(",")}: best=$best")
    }
    // assignment must put each cluster's points under one centroid
    val idx = graft.pipeline.Ann.ivfAssignCentroids(df, "vec_id", "embedding", cents)
    val groups = idx.select($"id" % 3, $"cid").distinct().count()
    assert(groups == 3, s"cluster membership fragmented: $groups (id%3, cid) pairs")
  }

  test("sha60 matches the DuckDB oracle definition ('0x'||substr(sha256,1,15))::BIGINT") {
    // sha256('hello') = 2cf24dba5fb0a30e...; DuckDB evaluates the cast to
    // 202421034056092208 — the two engines must agree bit-for-bit
    assert(TextOps.sha60("hello") == 202421034056092208L)
    assert(TextOps.sha60("hello") == java.lang.Long.parseLong("2cf24dba5fb0a30", 16))
  }

  test("simhash blocking is pigeonhole-complete: every pair within maxHamming is found") {
    import spark.implicits._
    // craft ids whose simhashes differ in exactly h bits via controlled text
    val base = docs.select($"doc_id", $"text").limit(50)
    val pairs = Dedup.simHashPairs(base, "doc_id", "text", maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // brute force: compute simhash locally for all rows, all pairs
    val local = base.as[(Long, String)].collect().map { case (id, t) => id -> TextOps.simHash(t) }
    val want = (for {
      (ia, ha) <- local; (ib, hb) <- local
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs == want, s"blocked=${pairs.size} brute=${want.size}")
  }

  test("simhash of a near-duplicate is within small hamming distance") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val h = java.lang.Long.bitCount(TextOps.simHash(t1) ^ TextOps.simHash(t2))
    assert(h <= 16, s"hamming $h too large")
    assert(TextOps.simHash(t1) == TextOps.simHash(t1)) // deterministic
  }

  test("ANN: LSH recalls injected true near neighbors of the query") {
    import spark.implicits._
    val query = emb.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    // inject 10 vectors that are genuinely close to the query (cos > 0.99)
    val near = (1 to 10).map { i =>
      val v = query.zipWithIndex.map { case (x, d) =>
        x + (TextOps.mix(i * 131L + d) % 1000).toFloat / 100000f
      }
      (10000L + i, v.toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = emb.filter($"vec_id" =!= 0).select($"vec_id", $"embedding").unionByName(near)

    val bf = Ann.bruteForceTopK(corpus, "vec_id", "embedding", query, 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(bf.count(_ >= 10000L) == 10, "brute force must rank the injected neighbors first")
    val lsh = Ann.lshTopK(corpus, "vec_id", "embedding", query, 10)
      .select($"vec_id").as[Long].collect()
    val recall = lsh.count(bf.contains)
    assert(recall >= 8, s"LSH recall too low: $recall/10")
  }

  test("embeddingPairs triangle-block join is exact: equals the naive cross join") {
    import spark.implicits._
    val small = emb.filter($"vec_id" < 100).select($"vec_id", $"embedding")
    val naive = {
      val a = small.select($"vec_id".as("id_a"), $"embedding".as("v_a"))
      val b = small.select($"vec_id".as("id_b"), $"embedding".as("v_b"))
      a.crossJoin(b).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", round(Dedup.cosine($"v_a", $"v_b"), 6).as("cos"))
        .filter($"cos" >= 0.2)
        .as[(Long, Long, Double)].collect().toSet
    }
    val blocked = Dedup.embeddingPairs(small, "vec_id", "embedding", 0.2, blocks = 7)
      .select($"id_a", $"id_b", round($"cos", 6).as("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(blocked == naive, s"blocked=${blocked.size} naive=${naive.size}")
    // and every pair appears exactly once
    val n = Dedup.embeddingPairs(small, "vec_id", "embedding", -1.0, blocks = 7).count()
    val rows = small.count()
    assert(n == rows * (rows - 1) / 2, s"pair multiplicity wrong: $n")
  }

  test("embeddingPairsLsh candidates are a verified subset of exact pairs") {
    import spark.implicits._
    val small = emb.filter($"vec_id" < 200).select($"vec_id", $"embedding")
    val exact = Dedup.embeddingPairs(small, "vec_id", "embedding", 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingPairsLsh(small, "vec_id", "embedding", 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(lsh.length == lsh.distinct.length, "LSH emitted duplicate pairs")
    assert(lsh.forall(exact.contains), "LSH produced a pair below the verify threshold")
  }

  test("language id: CJK and stopword heuristics") {
    assert(TextOps.languageId("这是一个中文句子 它有很多汉字") == "zh")
    assert(TextOps.languageId("the cat sat on the mat and it was happy") == "en")
    assert(TextOps.languageId("der hund ist nicht in der küche und das ist gut") == "de")
    assert(TextOps.languageId("xyzzy plugh") == "und")
  }

  test("token estimate splits camelCase, digits and punctuation") {
    assert(TextOps.tokenEstimate("helloWorld42!") == 4) // hello World 42 !
    assert(TextOps.tokenEstimate("a b c") == 3)
    assert(TextOps.tokenEstimate("") == 0)
  }

  test("multimodal: REAL codecs recover encoded params; frame sampling bounded") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, 100)
    val decoded = Multimodal.decode(media)
    // every image's ImageIO-decoded dims, every audio's javax.sound-decoded
    // rate+frames, every video's header must match what was synthesized
    val bad = decoded.filter(!$"decode_ok" ||
        ($"kind" === "image" && ($"decoded_width" =!= $"meta.width" ||
                                 $"decoded_height" =!= $"meta.height")) ||
        ($"kind" === "audio" && ($"decoded_rate" =!= $"meta.sample_rate" ||
                                 $"decoded_frames" =!= $"meta.n_frames")) ||
        ($"kind" === "video" && $"decoded_frames" =!= $"meta.n_frames")).count()
    assert(bad == 0)
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() > 0)
    val perVideo = frames.groupBy($"media_id").agg(count(lit(1)).as("n"))
      .agg(max($"n")).head().getLong(0)
    assert(perVideo <= 4, s"sampled too many frames (k=4): $perVideo")
    // feature extraction keeps batch shape: one row per media, fixed width
    val feats = Multimodal.features(media, dim = 8)
    assert(feats.count() == 100)
    assert(feats.select($"feat").as[Seq[Float]].head().length == 8)
  }

  test("media codec: animated GIF frames round-trip pixel-exact; count via real reader") {
    val blob = MediaCodec.encodeAnimatedGif(5L, 33, 21, 7)
    val d = MediaCodec.decode(blob, "video")
    assert(d.ok && d.width == 33 && d.height == 21 && d.nFrames == 7)
    // grayscale palette is lossless: every pixel of every frame survives
    for (f <- Seq(0, 3, 6)) {
      val img = MediaCodec.decodeGifFrame(blob, f)
      assert(img != null && img.getWidth == 33 && img.getHeight == 21)
      for (y <- 0 until 21; x <- 0 until 33)
        assert((img.getRGB(x, y) & 0xff) == MediaCodec.pixelGray(5L, f, x, y, 33, 21),
          s"frame $f pixel mismatch at ($x,$y)")
    }
    // frames genuinely differ
    val a = MediaCodec.frameFeatures(blob, 0, 8)
    val b = MediaCodec.frameFeatures(blob, 6, 8)
    assert(a.toSeq != b.toSeq, "distinct frames produced identical histograms")
    assert(math.abs(a.sum - 1.0f) < 1e-3)
  }

  test("sampleFrameFeatures: per-frame decode under the frame-index generate") {
    import spark.implicits._
    val media = Multimodal.synthesize(spark, 40)
    val ff = Multimodal.sampleFrameFeatures(media, k = 4, dim = 8)
    val rows = ff.select($"media_id", $"frame_idx", $"frame_feat")
      .as[(Long, Int, Seq[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, fi, feat) =>
      assert(math.abs(feat.sum - 1.0f) < 1e-3, s"media $id frame $fi not a histogram")
    }
    // the distributed expression equals the local kernel on a probe row
    val (pid, pfi, pfeat) = rows.head
    val blob = MediaCodec.synthRow(pid, 42).blob
    assert(pfeat == MediaCodec.frameFeatures(blob, pfi, 8).toSeq)
  }

  test("media codec: PNG round-trip is pixel-exact") {
    val blob = MediaCodec.encodePng(7L, 40, 30, 42)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
    assert(img.getWidth == 40 && img.getHeight == 30)
    for (y <- 0 until 30; x <- 0 until 40)
      assert((img.getRGB(x, y) & 0xffffff) == MediaCodec.pixelRgb(7L, x, y, 40, 30),
        s"pixel mismatch at ($x,$y)")
  }

  test("media codec: JPEG decodes with correct dimensions") {
    val blob = MediaCodec.encodeJpeg(8L, 50, 20, 42)
    val d = MediaCodec.decode(blob, "image")
    assert(d.ok && d.width == 50 && d.height == 20)
  }

  test("media codec: WAV round-trip recovers rate, frames and exact samples") {
    val blob = MediaCodec.encodeWav(3L, 16000, 1234, 42)
    val d = MediaCodec.decode(blob, "audio")
    assert(d.ok && d.sampleRate == 16000 && d.nFrames == 1234)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    val bytes = ais.readNBytes(1234 * 2)
    val expected = MediaCodec.pcmSamples(3L, 1234)
    for (i <- 0 until 1234) {
      val got = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
      assert(got == expected(i), s"sample mismatch at $i")
    }
  }

  test("media codec: corrupted blobs fail closed; features are deterministic") {
    assert(!MediaCodec.decode(Array[Byte](1, 2, 3), "image").ok)
    assert(!MediaCodec.decode(Array[Byte](1, 2, 3), "audio").ok)
    assert(!MediaCodec.decode(Array[Byte](1, 2, 3), "video").ok)
    val png = MediaCodec.encodePng(11L, 64, 64, 42)
    val f1 = MediaCodec.imageFeatures(png, 8)
    val f2 = MediaCodec.imageFeatures(png, 8)
    assert(f1.toSeq == f2.toSeq)
    assert(math.abs(f1.sum - 1.0f) < 1e-3, s"histogram sums to ${f1.sum}")
    val wav = MediaCodec.encodeWav(11L, 8000, 900, 42)
    val a = MediaCodec.audioFeatures(wav, 8)
    assert(math.abs(a.map(v => v * v).sum - 1.0f) < 1e-3, "RMS profile not L2-normalized")
  }

  test("media resize: pixel-exact nearest-neighbor downscale, distributed") {
    import spark.implicits._
    // kernel check: every output pixel equals the mapped source pixel
    val blob = MediaCodec.encodePng(7L, 40, 30, 42)
    val small = MediaCodec.resizeImage(blob, 20, 15)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(small))
    assert(img.getWidth == 20 && img.getHeight == 15)
    for (y <- 0 until 15; x <- 0 until 20)
      assert((img.getRGB(x, y) & 0xffffff) == MediaCodec.pixelRgb(7L, x * 2, y * 2, 40, 30),
        s"resize pixel mismatch at ($x,$y)")
    // corrupted input fails closed
    assert(MediaCodec.resizeImage(Array[Byte](1, 2, 3), 8, 8).isEmpty)

    // column operator over a corpus: resized blobs re-decode at target dims
    val media = Multimodal.synthesize(spark, 60).filter($"kind" === "image")
    val resized = media.withColumn("small",
        MediaFunctions.media_resize($"blob", 16, 12))
      .withColumn("d", MediaFunctions.media_decode($"small", lit("image")))
    val ok = resized.filter($"d.ok" && $"d.width" === 16 && $"d.height" === 12).count()
    assert(ok == resized.count() && ok > 0)
  }

  test("nearDupGroups: connected components over chain, clique and singletons") {
    import spark.implicits._
    // graph: chain 1-2-3-4-5 (diameter 4 — exercises pointer doubling),
    // clique {10,11,12}, cross-edge 20-12, singletons 30, 31
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 30L, 31L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (10L, 12L), (11L, 12L), (20L, 12L))
      .toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.nearDupGroups(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 10L, 30L -> 30L, 31L -> 31L)
    assert(got == expected, s"got $got")
  }

  test("canonicalPerGroup: highest score kept, ties to smallest id, singletons self-keep") {
    import spark.implicits._
    // group {1,2,3}: 2 has the top score; group {10,11}: scores tie → 10;
    // singleton 30 keeps itself
    val docs = Seq((1L, 5.0), (2L, 9.0), (3L, 7.0),
        (10L, 4.0), (11L, 4.0), (30L, 1.0)).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.canonicalPerGroup(
        docs, "doc_id", pairs, org.apache.spark.sql.functions.col("score"))
      .select("member_id", "keep_id", "kept")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (10L, 10L, true), (11L, 10L, false), (30L, 30L, true)), s"got $got")
    // exactly one keeper per group
    val keepers = got.groupBy(_._2).map { case (k, ms) => k -> ms.count(_._3) }
    assert(keepers.values.forall(_ == 1), s"keepers $keepers")
  }

  test("nearDupGroups: output restricted to df's ids even when pairs mention others") {
    import spark.implicits._
    // pairs computed over a superset: 99 is not in df but links 1-99-2;
    // the closure must still merge {1,2} while 99 itself stays out of the
    // output (one row per id in df, as documented)
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 99L), (99L, 2L)).toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.nearDupGroups(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), s"got $got")
  }

  test("nearDupGroups: reliable-checkpoint mode produces identical groups") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 30L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (11L, 12L), (20L, 12L)).toDF("id_a", "id_b")
    val local = graft.pipeline.Dedup.nearDupGroups(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val reliable = graft.pipeline.Dedup.nearDupGroups(ids, "doc_id", pairs,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local, s"reliable=$reliable local=$local")
    // the reliable mode actually wrote RDD checkpoints to the dir
    val wrote = new java.io.File(dir).listFiles()
    assert(wrote != null && wrote.nonEmpty, "no reliable checkpoints written")
  }

  test("nearDupGroupsStar: chain, clique, cross-edge, singletons — same contract") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 20L, 30L, 31L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (10L, 12L), (11L, 12L), (20L, 12L))
      .toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.nearDupGroupsStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 10L, 30L -> 30L, 31L -> 31L)
    assert(got == expected, s"got $got")
  }

  test("nearDupGroupsStar: superset pairs route connectivity, output stays df's ids") {
    import spark.implicits._
    // 99 is absent from df but links 1-99-2: groups must merge THROUGH it
    // (the consistency certificate labels every graph node, not just df's)
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((1L, 99L), (99L, 2L)).toDF("id_a", "id_b")
    val got = graft.pipeline.Dedup.nearDupGroupsStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), s"got $got")
  }

  test("nearDupGroupsStar ≡ nearDupGroups on adversarial graph shapes") {
    import spark.implicits._
    // the shapes that separate the two algorithms: a long path (deep
    // diameter), a high-degree hub star (the skew case large-star
    // contracts), a broom (hub + tail), and random noise edges — both
    // algorithms must produce identical (member → min) maps
    val n = 400
    val rng = new scala.util.Random(7)
    val path = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val star = (1 to 150).map(i => (1000L, 1000L + i))       // hub 1000
    val broom = (0 until 50).map(i => (2000L + i, 2001L + i)) :+ (2000L, 1000L)
    val noise = Seq.fill(120)((rng.nextInt(n).toLong, 3000L + rng.nextInt(80)))
    val pairs = (path ++ star ++ broom ++ noise).toDF("id_a", "id_b")
    val ids = ((0L until n.toLong) ++ (1000L to 1150L) ++
        (2000L to 2051L) ++ (3000L until 3080L)).toDF("doc_id")
    val a = graft.pipeline.Dedup.nearDupGroups(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val b = graft.pipeline.Dedup.nearDupGroupsStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(a == b, s"pointer vs star differ: ${(a.toSet diff b.toSet).take(5)}")
    // the broom tail reaches the hub: star+broom is one component rooted at
    // the hub id; 2051 sits past the tail's last edge — a singleton
    assert(b(1150L) == 1000L && b(2050L) == 1000L && b(2051L) == 2051L)
  }

  test("nearDupGroupsStar: reliable-checkpoint mode produces identical groups") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
        (10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val local = graft.pipeline.Dedup.nearDupGroupsStar(ids, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-star-ckpt").toString
    val reliable = graft.pipeline.Dedup.nearDupGroupsStar(ids, "doc_id", pairs,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local, s"reliable=$reliable local=$local")
  }

  test("repetition stats: totals, runs, and top-bigram counts") {
    assert(TextOps.repetitionStats("a a a b").toSeq == Seq(4, 2, 3, 3, 2))
    assert(TextOps.repetitionStats("").toSeq == Seq(0, 0, 0, 0, 0))
    assert(TextOps.repetitionStats("x").toSeq == Seq(1, 1, 1, 0, 0))
    // "a b a b a": bigrams (a b) x2, (b a) x2 -> top 2; no consecutive runs
    assert(TextOps.repetitionStats("a b a b a").toSeq == Seq(5, 2, 1, 4, 2))
  }

  test("chunk grid: hashes and slice reassembly") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val h = TextOps.chunkHashes(text, 4)
    assert(h.length == 3)
    assert(h(0) == TextOps.sha60("w1 w2 w3 w4"))
    assert(h(2) == TextOps.sha60("w9 w10"))
    assert(TextOps.chunkSlice(text, Array(0, 2), 4) == "w1 w2 w3 w4 w9 w10")
    assert(TextOps.chunkSlice(text, Array.empty[Int], 4) == "")
    assert(TextOps.chunkHashes("", 4).isEmpty)
  }

  test("dedupChunks keeps first corpus-wide occurrence of each span") {
    import spark.implicits._
    val a = (1 to 8).map(i => s"a$i").mkString(" ")   // one chunk
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val df = Seq(
      (1L, a),                 // doc1: chunk A (first occurrence)
      (2L, s"$a $b"),          // doc2: A (dup of doc1) + B (new)
      (3L, s"$c $c")           // doc3: C + C (within-doc dup)
    ).toDF("doc_id", "text")
    val out = Dedup.dedupChunks(df, "doc_id", "text", w = 8)
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 1 && out(0).getLong(2) == 1)         // doc1 keeps A
    assert(out(1).getLong(1) == 2 && out(1).getLong(2) == 1 &&
      out(1).getString(3) == b)                                      // doc2 keeps only B
    assert(out(2).getLong(1) == 2 && out(2).getLong(2) == 1 &&
      out(2).getString(3) == c)                                      // doc3 keeps one C
  }

  test("bloom filter: zero false negatives, bounded false positives") {
    import graft.pipeline.Bloom
    val members = (0L until 2000L).map(i => TextOps.mix(i)).toArray
    val agg = new graft.pipeline.BloomFilterAgg(1 << 16, 5)
    var buf = agg.zero
    members.foreach(h => buf = agg.reduce(buf, h))
    // merge path: second half folded separately then OR'd in
    val bytes = agg.finish(buf)
    members.foreach(h => assert(Bloom.containsLocal(bytes, h, 1 << 16, 5)))
    val fp = (0 until 10000).count(i =>
      Bloom.containsLocal(bytes, TextOps.mix(0xdead0000L + i), 1 << 16, 5))
    assert(fp < 300, s"false-positive rate too high: $fp / 10000") // ~0.35% expected
  }

  test("incrementalExact equals the plain anti-join") {
    import spark.implicits._
    val corpus = docs.select($"doc_id", $"text")
    val batch = corpus.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"),
        when($"doc_id" % 3 === 0, $"text")
          .otherwise(concat($"text", lit(" new"), $"doc_id".cast("string"))).as("text"))
    val inc = Dedup.incrementalExact(batch, corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    val anti = batch.join(corpus.select($"text"), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(inc == anti)
    assert(inc.nonEmpty && inc.size < batch.count())  // both paths exercised
  }

  test("mixture: integral weights exact, fractional rates converge, deterministic") {
    import spark.implicits._
    val df = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val weights = Map("s0" -> 2.0, "s1" -> 0.5, "s2" -> 0.0)
    val out = Curation.mixture(df, "id", "src", weights, defaultWeight = 1.5, seed = 7L)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("s0") == 2000)          // exactly 2 copies each of 1000 rows
    assert(!bySrc.contains("s2"))        // weight 0 → nothing
    assert(math.abs(bySrc("s1") - 500) < 80)   // 0.5-Bernoulli of 1000
    assert(math.abs(bySrc("s3") - 1500) < 80)  // 1 full + 0.5-Bernoulli
    // copies are indexed 0..ceil(w)-1 and full copies always survive
    assert(out.filter($"src" === "s0" && $"copy" >= 2).count() == 0)
    assert(out.filter($"src" === "s3" && $"copy" === 0).count() == 1000)
    val again = Curation.mixture(df, "id", "src", weights, 1.5, 7L)
    assert(out.collect().toSet == again.collect().toSet)
    // different seed → different fractional selection
    val other = Curation.mixture(df, "id", "src", weights, 1.5, 8L)
    assert(other.collect().toSet != out.collect().toSet)
  }

  test("normalizeForDedup: case, digits, punctuation and whitespace fold") {
    import spark.implicits._
    val out = Seq(
      "  Hello,   WORLD!! 42 times?  ",
      "hello world 00 times",
      "a-b_c",
      ""
    ).toDF("t").select(Dedup.normalizeForDedup($"t")).as[String].collect()
    assert(out(0) == "hello world 00 times")
    assert(out(1) == out(0)) // variants collapse to the same key
    assert(out(2) == "a b c")
    assert(out(3) == "")
  }

  test("normalizedExact merges raw-distinct variants that exact dedup keeps apart") {
    import spark.implicits._
    val base = docs.select($"doc_id", $"text")
    val messy = base.select(($"doc_id" + 100000L).as("doc_id"),
      concat(lit("  "), upper($"text"), lit(" !!")).as("text"))
    val corpus = base.unionByName(messy)
    // plain exact dedup sees the variants as distinct
    assert(Dedup.exact(corpus, "doc_id", "text").count() == 2 * Dedup.exact(base, "doc_id", "text").count())
    val norm = Dedup.normalizedExact(corpus, "doc_id", "text")
    // normalized groups = raw-distinct originals; every group absorbed >= 2
    // raw variants and kept the original (smaller) id
    assert(norm.count() == Dedup.exact(base, "doc_id", "text").count())
    assert(norm.filter($"raw_variants" < 2).count() == 0)
    assert(norm.filter($"keep_id" >= 100000).count() == 0)
  }

  test("semanticDedup: one representative per within-cluster epsilon-ball") {
    import spark.implicits._
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", 0.35)
    // one row per input id, keepers + dups partition the corpus
    assert(out.count() == emb.count())
    assert(out.filter($"kept" =!= $"dup_of".isNull).count() == 0)
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // dup_of always names an EARLIER doc in the SAME cluster that is kept
    // or itself a dup of something even earlier (chains allowed), and the
    // named doc really is cosine >= tau away
    val vecs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    rows.foreach { case (id, (cid, dupOf)) =>
      if (dupOf >= 0) {
        assert(dupOf < id && rows(dupOf)._1 == cid)
        assert(TextOps.cosineLocal(vecs(id), vecs(dupOf)) >= 0.35)
      }
    }
    // raising tau above the max within-cluster cosine keeps everything
    assert(Dedup.semanticDedup(emb, "vec_id", "embedding", 0.9999)
      .filter(!$"kept").count() == 0)
  }

  test("semanticDedupAssigned composes with a trained k-means index") {
    import spark.implicits._
    val cents = Ann.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    val index = Ann.ivfAssignCentroids(emb, "vec_id", "embedding", cents)
    val out = Dedup.semanticDedupAssigned(index, 0.35)
    assert(out.count() == emb.count())
    assert(out.filter($"kept" =!= $"dup_of".isNull).count() == 0)
    // same-cluster + earlier invariants hold under the trained quantizer too
    val cid = index.select($"id", $"cid").as[(Long, Long)].collect().toMap
    out.filter(!$"kept").select($"id", $"dup_of").as[(Long, Long)].collect()
      .foreach { case (id, dupOf) =>
        assert(dupOf < id && cid(dupOf) == cid(id))
      }
  }

  // ---- backward as-of join ----

  private def asofSides() = {
    import spark.implicits._
    // right: prices for key "a" at t=10,20,20(dup),40; key "b" at t=5
    val right = Seq(
      ("a", 10L, 100L, 1.0), ("a", 20L, 200L, 2.0), ("a", 20L, 201L, 2.5),
      ("a", 40L, 400L, 4.0), ("b", 5L, 500L, 5.0)
    ).toDF("k", "price_ts", "price_id", "price")
      .withColumn("price_ts", $"price_ts".cast("timestamp"))
    // left: trades at t=9 (before any), 10 (exact tie), 25, 39, 1000 (stale)
    val left = Seq(
      ("a", 1L, 9L), ("a", 2L, 10L), ("a", 3L, 25L), ("a", 4L, 39L),
      ("a", 5L, 1000L), ("c", 6L, 50L)
    ).toDF("k", "trade_id", "trade_ts")
      .withColumn("trade_ts", $"trade_ts".cast("timestamp"))
    (left, right)
  }

  test("asof join: backward pick, <= tie, tolerance, unmatched drop/keep") {
    import spark.implicits._
    val (left, right) = asofSides()
    val inner = pipeline.AsOf.join(left, right, Seq("k"), "trade_ts", "price_ts",
        toleranceSeconds = 30, rightTiebreak = Some("price_id"))
      .select($"trade_id", $"price_id").as[(Long, Long)].collect().toMap
    // trade 1 precedes all prices -> dropped; trade 2 matches the t=10 price
    // exactly (<= not <); trade 3 takes the LATER of the t=20 duplicates by
    // tiebreak; trade 4 skips t=40 (future) back to t=20; trade 5's only
    // candidate is 960s stale -> tolerance drops it; trade 6 has no key.
    assert(inner == Map(2L -> 100L, 3L -> 201L, 4L -> 201L))

    val outer = pipeline.AsOf.join(left, right, Seq("k"), "trade_ts", "price_ts",
        toleranceSeconds = 30, joinType = "left", rightTiebreak = Some("price_id"))
    assert(outer.count() == left.count())
    val nulls = outer.filter($"price_id".isNull)
      .select($"trade_id").as[Long].collect().toSet
    assert(nulls == Set(1L, 5L, 6L))
    // all right fields come from the SAME matched row (id and value agree)
    assert(outer.filter($"price_id" === 201L && $"price" =!= 2.5).count() == 0)
  }

  test("asof join: unbounded tolerance matches any age; collisions rejected") {
    import spark.implicits._
    val (left, right) = asofSides()
    val all = pipeline.AsOf.join(left, right, Seq("k"), "trade_ts", "price_ts",
      rightTiebreak = Some("price_id"))
    // trade 5 now matches the newest price (t=40) despite being 960s stale
    assert(all.filter($"trade_id" === 5L).select($"price_id").as[Long].head() == 400L)
    val clash = left.withColumn("price", lit(0.0))
    assertThrows[IllegalArgumentException] {
      pipeline.AsOf.join(clash, right, Seq("k"), "trade_ts", "price_ts")
    }
  }

  test("asof join: NULL right timestamps never match (no universal fallback)") {
    import spark.implicits._
    val (left, right) = asofSides()
    // a null-ts price would sort NULLS FIRST at the partition head and,
    // with unbounded tolerance, silently match every otherwise-unmatched
    // left row — it must behave as if absent instead
    val withNull = right.unionByName(Seq(("a", 999L, 9.9))
      .toDF("k", "price_id", "price")
      .withColumn("price_ts", lit(null).cast("timestamp"))
      .select("k", "price_ts", "price_id", "price"))
    val all = pipeline.AsOf.join(left, withNull, Seq("k"), "trade_ts", "price_ts",
      rightTiebreak = Some("price_id"))
    // trade 1 (t=9, before every real price) must stay unmatched
    assert(all.filter($"trade_id" === 1L).count() == 0)
    assert(all.filter($"price_id" === 999L).count() == 0)
  }

  // ---- heavy hitters (Misra–Gries sketch + exact verify) ----

  test("Misra–Gries kernel: survival and error bounds hold on a skewed stream") {
    import graft.pipeline.HeavyHitters
    val m = 16
    val rnd = new scala.util.Random(7)
    // 8 heavy items (freq ~200 each) drowned in 4000 singleton-ish items
    val stream = rnd.shuffle(
      (0 until 8).flatMap(h => Seq.fill(200)(s"hot_$h")) ++
      (0 until 4000).map(i => s"cold_${i % 2000}")).toList
    val n = stream.size
    val truth = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // single-summary fold
    val one = stream.foldLeft(Map.empty[String, Long])(HeavyHitters.mgReduce(_, _, m))
    // partitioned fold + pairwise merge (the distributed shape)
    val merged = stream.grouped(500)
      .map(_.foldLeft(Map.empty[String, Long])(HeavyHitters.mgReduce(_, _, m)))
      .reduce(HeavyHitters.mgMerge(_, _, m))
    for (buf <- Seq(one, merged)) {
      assert(buf.size <= m)
      val bound = n.toDouble / (m + 1)
      truth.foreach { case (item, f) =>
        if (f > bound) assert(buf.contains(item), s"$item freq=$f > $bound missing")
      }
      buf.foreach { case (item, c) =>
        val f = truth(item)
        assert(c <= f && c >= f - bound, s"$item count=$c truth=$f bound=$bound")
      }
    }
  }

  test("mutable Misra–Gries kernel computes exactly the pure kernel's summary") {
    import graft.pipeline.HeavyHitters
    import scala.jdk.CollectionConverters._
    val m = 16
    val rnd = new scala.util.Random(11)
    val stream = rnd.shuffle(
      (0 until 8).flatMap(h => Seq.fill(150)(s"hot_$h")) ++
      (0 until 3000).map(i => s"cold_${i % 1500}")).toList
    def pureFold(xs: Seq[String]) =
      xs.foldLeft(Map.empty[String, Long])(HeavyHitters.mgReduce(_, _, m))
    def mutFold(xs: Seq[String]) = {
      val c = new java.util.HashMap[String, java.lang.Long]()
      xs.foreach(HeavyHitters.mgReduceMut(c, _, m))
      c
    }
    def toScala(c: java.util.HashMap[String, java.lang.Long]): Map[String, Long] =
      c.asScala.map { case (k, v) => k -> v.longValue() }.toMap
    // single fold identical
    assert(toScala(mutFold(stream)) == pureFold(stream))
    // partitioned fold + pairwise merge identical (the distributed shape)
    val parts = stream.grouped(400).toList
    val pureMerged = parts.map(pureFold).reduce(HeavyHitters.mgMerge(_, _, m))
    val mutMerged = parts.map(mutFold).reduce { (a, b) =>
      HeavyHitters.mgMergeMut(a, b, m); a
    }
    assert(toScala(mutMerged) == pureMerged)
  }

  test("topKExact returns the true top-k when cardinality overflows the summary") {
    import spark.implicits._
    // 50 heavy items (freq 100) + 5000 distinct light items (freq 1):
    // distinct = 5050 >> m = 256, but 100 > N/(m+1) = 10000/257 ≈ 39,
    // so every heavy item must survive the sketch and the verify pass
    // recovers its exact count
    val data = (0 until 50).flatMap(h => Seq.fill(100)(f"hot_$h%02d")) ++
      (0 until 5000).map(i => s"cold_$i")
    val items = data.toDF("item").repartition(8)
    val top = graft.pipeline.HeavyHitters.topKExact(items, "item", k = 50, m = 256)
      .as[(String, Long)].collect()
    assert(top.toSeq == (0 until 50).map(h => (f"hot_$h%02d", 100L)))
  }

  // ---- web-corpus curation ----

  test("canonicalUrl: each rule collapses exactly its own noise class") {
    import spark.implicits._
    val cases = Seq(
      // (raw, expected canonical)
      ("https://Example.com/A/B", "https://example.com/a/b"),
      ("https://example.com/a/b#section-2", "https://example.com/a/b"),
      ("https://example.com:443/a", "https://example.com/a"),
      ("http://example.com:80/a", "http://example.com/a"),
      ("https://example.com:8443/a", "https://example.com:8443/a"), // real port kept
      ("https://www.example.com/a", "https://example.com/a"),
      ("https://wwwx.example.com/a", "https://wwwx.example.com/a"), // not a www. label
      ("https://example.com/a/", "https://example.com/a"),
      ("https://example.com/a?utm_source=x&q=1&fbclid=z", "https://example.com/a?q=1"),
      ("https://example.com/a?utm_source=x", "https://example.com/a"),
      ("https://example.com/a?b=2&a=1", "https://example.com/a?b=2&a=1"), // order kept
      ("HTTPS://WWW.EXAMPLE.COM:443/P/?utm_campaign=c&x=1#f",
        "https://example.com/p?x=1")
    )
    val out = cases.toDF("raw", "expected")
      .withColumn("got", pipeline.Web.canonicalUrl($"raw"))
      .filter($"got" =!= $"expected")
      .select($"raw", $"expected", $"got").collect()
    assert(out.isEmpty, out.mkString("\n"))
  }

  test("keepLine/cleanLines: each line rule fires exactly on its noise class") {
    import spark.implicits._
    val cases = Seq(
      ("a normal sentence of content", true),
      ("OK", false),                       // < 3 words
      ("", false),                         // empty
      ("   ", false),                      // whitespace-only
      ("one  two   three", true),          // multi-space collapse still 3 words
      ("HOME | ABOUT | CONTACT US", false),// uppercase-majority letters
      ("NASA launched a new mission today", true), // acronym ok: minority upper
      ("123 456 789 000", true),           // no letters: exempt from case rule
      ("Please accept cookies to continue", false),
      ("Copyright (c) 2024 Example Inc", false),
      ("read our privacy policy here", false),
      ("All Rights Reserved", false),      // boilerplate beats word count
      ("the cook booked a table", true)    // 'cook' != 'cookie'
    )
    val out = cases.toDF("line", "expected")
      .withColumn("got", pipeline.Web.keepLine($"line"))
      .filter($"got" =!= $"expected").collect()
    assert(out.isEmpty, out.mkString("\n"))
    // cleanLines keeps survivor order and bytes
    val doc = "MENU | HOME\nfirst real line here\nOK\nsecond real line here"
    val cleaned = Seq(doc).toDF("t")
      .select(pipeline.Web.cleanLines($"t")).as[String].head()
    assert(cleaned == "first real line here\nsecond real line here")
  }

  test("urlDedup collapses variants; domainStats counts pages per domain") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://www.site.com/p?utm_source=a", 10L),
      (2L, "https://site.com/p/", 20L),
      (3L, "https://site.com/p?x=1", 30L),
      (4L, "https://other.com/q", 40L)
    ).toDF("doc_id", "url", "n")
    val dd = pipeline.Web.urlDedup(df, "doc_id", "url")
      .orderBy($"keep_id").collect()
    assert(dd.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      ("https://site.com/p", 1L, 2L),
      ("https://site.com/p?x=1", 3L, 1L),
      ("https://other.com/q", 4L, 1L)))
    val ds = pipeline.Web.domainStats(df, "url", "n").orderBy($"domain").collect()
    assert(ds.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq == Seq(
      ("other.com", 1L, 1L), ("site.com", 3L, 2L)))
  }

  test("weightedSample: exactly-k per stratum, deterministic, weight-sensitive") {
    import spark.implicits._
    import graft.pipeline.Sampling
    // 200 ids in one stratum, id 7 weighted 64x everything else
    val df = (0L until 200L).map(id => (id, "en")).toDF("doc_id", "lang")
    val wt = when($"doc_id" === 7L, lit(64L)).otherwise(lit(1L))
    def ids(seed: Long) =
      Sampling.weightedSample(df, "doc_id", "lang", wt, k = 10, seed = seed)
        .select("id").as[Long].collect().toSet
    // exactly k rows, stable across reruns of the same seed
    assert(ids(1L).size == 10 && ids(1L) == ids(1L))
    // k >= stratum size degenerates to the whole stratum
    assert(Sampling.weightedSample(df.limit(5), "doc_id", "lang", wt,
      k = 10, seed = 1L).count() == 5)
    // weight sensitivity: across 40 seeds the 64x row must be selected far
    // more often than a unit row's 10/200 base rate (P[miss all 40] under
    // even half-weighting is < 1e-9 — deterministic in the fixed seeds)
    val hits7 = (1L to 40L).count(s => ids(s).contains(7L))
    val hits11 = (1L to 40L).count(s => ids(s).contains(11L))
    assert(hits7 >= 30, s"64x-weighted row selected only $hits7/40")
    assert(hits7 > hits11, s"weighting had no effect ($hits7 vs $hits11)")
    // two strata never mix: per-stratum counts are independent
    val two = (0L until 100L).map(id => (id, if (id < 50) "a" else "b"))
      .toDF("doc_id", "lang")
    val per = Sampling.weightedSample(two, "doc_id", "lang", lit(1L), 10, 3L)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(per == Map("a" -> 10L, "b" -> 10L))
  }

  test("salientTerms: exact tf/df scores, rank order, k cutoff") {
    import spark.implicits._
    import graft.pipeline.Salience
    val df = Seq(
      (1L, "alpha alpha beta common"),
      (2L, "beta gamma common"),
      (3L, "common common gamma")).toDF("doc_id", "text")
    val out = Salience.salientTerms(df, "doc_id", "text", k = 2)
      .orderBy($"id", $"rank")
      .as[(Long, String, Long, Long, Double, Long)].collect().toSeq
    // doc 1: alpha tf=2 df=1 -> 2.0; beta tf=1 df=2 -> 0.5; common 1/3
    // doc 2: gamma tf=1 df=2 -> 0.5 ties beta 0.5 -> term asc breaks it
    // doc 3: common tf=2 df=3 -> 0.666667; gamma 0.5
    assert(out == Seq(
      (1L, "alpha", 2L, 1L, 2.0, 1L), (1L, "beta", 1L, 2L, 0.5, 2L),
      (2L, "beta", 1L, 2L, 0.5, 1L), (2L, "gamma", 1L, 2L, 0.5, 2L),
      (3L, "common", 2L, 3L, 0.666667, 1L), (3L, "gamma", 1L, 2L, 0.5, 2L)))
  }

  test("bigramCoverage: exact hit/total counts, vocab df threshold, edges") {
    import spark.implicits._
    import graft.pipeline.LmScore
    // reference: "a b" appears in both ref docs (df=2, enters vocab);
    // "b c" and "c a" in one each (df=1, excluded at minRefDocs=2).
    val ref = Seq((10L, "a b c"), (20L, "a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c a b"),   // bigrams: ab bc ca ab -> hits ab,ab = 2/4
      (2L, "x y z"),       // xy yz -> 0/2
      (3L, "a b"),         // ab -> 1/1
      (4L, "solo"),        // <2 words: one whole-text shingle, not in vocab
      (5L, ""),            // zero words: no bigram stream — scores (0,0,0.0)
      (6L, null)           // null text: same
    ).toDF("doc_id", "text")
    val out = LmScore.bigramCoverage(docs, "doc_id", "text",
        ref, "doc_id", "text", minRefDocs = 2)
      .orderBy($"id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 4L, 2L, 0.5), (2L, 2L, 0L, 0.0),
      (3L, 1L, 1L, 1.0), (4L, 1L, 0L, 0.0), (5L, 0L, 0L, 0.0),
      (6L, 0L, 0L, 0.0)))
    // at minRefDocs=1 "b c" (ref df=1) joins the vocab; "c a" never occurs
    // in the reference, so doc 1 scores 3/4
    val loose = LmScore.bigramCoverage(docs, "doc_id", "text",
        ref, "doc_id", "text", minRefDocs = 1)
      .orderBy($"id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(loose.head == (1L, 4L, 3L, 0.75))
  }
}
