package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftInternal.{col => mkCol, expr => exprOf}
import org.apache.spark.sql.functions.{regexp_replace, regexp_count, struct, lit}

/** Text-analysis expressions for training-data pipelines: minhash signatures,
  * simhash, n-gram jaccard, language-ID, rolling-hash fingerprints. All are
  * single-pass per-row computations (no shuffle) so signature generation
  * scales linearly with the corpus.
  */
object TextOps {

  // xxhash-style avalanche for shingle hashing (splitmix64 finalizer)
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }

  /** 60-bit feature hash: first 15 hex chars of sha256 — chosen because the
    * identical value is cheap in the DuckDB oracle
    * (`('0x' || substr(sha256(s),1,15))::BIGINT`), so the whole
    * minhash/simhash pipeline is verifiable cross-engine. Always positive. */
  def sha60(s: String): Long = {
    val d = digestTL.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 7.5 bytes = 15 hex chars = 60 bits
    ((h(0) & 0xffL) << 52) | ((h(1) & 0xffL) << 44) | ((h(2) & 0xffL) << 36) |
      ((h(3) & 0xffL) << 28) | ((h(4) & 0xffL) << 20) | ((h(5) & 0xffL) << 12) |
      ((h(6) & 0xffL) << 4) | ((h(7) & 0xffL) >> 4)
  }

  /** word shingles of size k: sha60 of the space-joined k consecutive words
    * (texts shorter than k words hash as one whole-text shingle). */
  def shingleHashes(text: String, k: Int): Array[Long] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.length < k) {
      if (words.isEmpty) return Array.empty
      return Array(sha60(words.mkString(" ")))
    }
    val out = new Array[Long](words.length - k + 1)
    var i = 0
    while (i + k <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      out(i) = sha60(sb.toString)
      i += 1
    }
    out
  }

  /** minhash signature: numHashes permutations via h_i(x) = mix(x ^ seed_i). */
  def minHashSig(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val shingles = shingleHashes(text, shingleSize)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var s = 0
    while (s < shingles.length) {
      val x = shingles(s)
      var i = 0
      while (i < numHashes) {
        val h = mix(x ^ (0xabcdef1234L * (i + 1)))
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    sig
  }

  /** simhash bit width: 60 (= the sha60 feature-hash width). */
  val SimHashBits = 60

  /** 60-bit simhash over word-level sha60 features (per-occurrence weighted). */
  def simHash(text: String): Long = {
    val counts = new Array[Int](SimHashBits)
    text.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        val h = sha60(w)
        var b = 0
        while (b < SimHashBits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < SimHashBits) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** exact word n-gram jaccard similarity of two texts. */
  def ngramJaccard(a: String, b: String, n: Int): Double = {
    val sa = shingleHashes(a, n).toSet
    val sb = shingleHashes(b, n).toSet
    if (sa.isEmpty && sb.isEmpty) return 1.0
    if (sa.isEmpty || sb.isEmpty) return 0.0
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** character n-gram language-ID heuristic over a fixed stopword table. */
  private val stopwords: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"),
    "es" -> Set("el", "la", "los", "y", "es", "un", "una", "de", "que", "por"),
    "zh" -> Set.empty)

  def languageId(text: String): String = {
    // CJK codepoints dominate → zh
    var cjk = 0
    var total = 0
    var i = 0
    while (i < text.length) {
      val c = text.codePointAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      }
      i += Character.charCount(c)
    }
    if (total > 0 && cjk * 3 > total) return "zh"
    val words = text.toLowerCase.split("\\W+").filter(_.nonEmpty)
    if (words.isEmpty) return "und"
    // deterministic tie-break: first language in fixed order wins
    var best = "und"
    var bestScore = 0
    for (lang <- Seq("en", "de", "fr", "es")) {
      val sc = words.count(stopwords(lang).contains)
      if (sc > bestScore) { best = lang; bestScore = sc }
    }
    best
  }

  /** quality heuristics: (chars, words, avgWordLen, punctRatio, upperRatio, stopwordRatio) */
  def qualityScore(text: String): Double = {
    if (text.isEmpty) return 0.0
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return 0.0
    val avgLen = words.map(_.length).sum.toDouble / words.length
    val punct = text.count(c => ".,;:!?".indexOf(c) >= 0).toDouble / text.length
    val upper = text.count(_.isUpper).toDouble / text.length
    val sw = stopwords("en")
    val swRatio = words.count(w => sw.contains(w.toLowerCase)).toDouble / words.length
    // crude composite in [0,1]: reasonable word length, some punctuation, not shouting
    val lenScore = math.max(0.0, 1.0 - math.abs(avgLen - 5.0) / 10.0)
    val punctScore = math.min(1.0, punct * 10)
    val caseScore = math.max(0.0, 1.0 - upper * 4)
    val swScore = math.min(1.0, swRatio * 4)
    (lenScore + punctScore + caseScore + swScore) / 4.0
  }

  /** rolling (polynomial) hash fingerprint of the word sequence, over sha60
    * word features (SQL-replicable — see the q16 oracle). */
  def fingerprint(text: String): Long = {
    var h = 1125899906842597L
    text.split("\\s+").foreach { w =>
      if (w.nonEmpty) h = h * 31 + mix(sha60(w))
    }
    h
  }

  /** BPE-ish token estimate: whitespace words plus sub-word splits on
    * case/digit/punct boundaries (a deterministic proxy for a real BPE). */
  def tokenEstimate(text: String): Int = {
    var count = 0
    val m = java.util.regex.Pattern
      .compile("[A-Z]?[a-z]+|[A-Z]+(?![a-z])|\\d{1,4}|[^\\sA-Za-z0-9]").matcher(text)
    while (m.find()) count += 1
    count
  }

  // ---- sign-random-projection LSH (Charikar 2002; ±1 sparse planes per
  // Achlioptas 2001). Components are ±1 so the identical plane matrix is
  // cheap to replicate as SQL literals in the DuckDB oracle. ----

  /** driver-local cosine similarity (same double-loop as CosineSimExpr). */
  def cosineLocal(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** deterministic ±1 hyperplane component for (seed, band, plane, dim). */
  /** Gopher-style within-document repetition signals over whitespace words:
    * (total_words, distinct_words, max_run, n_bigrams, top_bigram_count).
    * max_run = longest streak of the SAME word repeated consecutively;
    * top_bigram_count = occurrences of the most frequent word bigram (only
    * the count is reported, so bigram ties cannot make it nondeterministic).
    * Single pass per row, no shuffle — the repetition filter runs as a scan
    * projection at any corpus size. */
  def repetitionStats(text: String): Array[Int] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    val total = words.length
    val seen = new java.util.HashSet[String]()
    var maxRun = if (total == 0) 0 else 1
    var run = 1
    var i = 0
    while (i < total) {
      seen.add(words(i))
      if (i > 0) {
        if (words(i) == words(i - 1)) { run += 1; if (run > maxRun) maxRun = run }
        else run = 1
      }
      i += 1
    }
    val nBigrams = math.max(total - 1, 0)
    var topBigram = 0
    if (nBigrams > 0) {
      val counts = new java.util.HashMap[String, Int]()
      i = 0
      while (i < total - 1) {
        val g = words(i) + " " + words(i + 1)
        val c = counts.merge(g, 1, (a, b) => a + b)
        if (c > topBigram) topBigram = c
        i += 1
      }
    }
    Array(total, seen.size, maxRun, nBigrams, topBigram)
  }

  /** sha60 hashes of consecutive w-word chunks (the last chunk may be
    * shorter). Chunk i covers words [i*w, min((i+1)*w, total)). Empty text
    * yields zero chunks. The chunk grid is the unit of corpus-level exact
    * span dedup: identical 8-word chunks across documents collapse to one
    * surviving occurrence. */
  def chunkHashes(text: String, w: Int): Array[Long] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Array.empty
    val n = (words.length + w - 1) / w
    val out = new Array[Long](n)
    var c = 0
    while (c < n) {
      val from = c * w
      val until = math.min(from + w, words.length)
      val sb = new java.lang.StringBuilder(words(from))
      var j = from + 1
      while (j < until) { sb.append(' ').append(words(j)); j += 1 }
      out(c) = sha60(sb.toString)
      c += 1
    }
    out
  }

  /** reassembles the kept chunks of `text` (chunk grid of width w, kept
    * 0-based indices sorted ascending) into a space-joined string — the
    * post-dedup document body. Recomputing the slice from the original text
    * means the dedup shuffle carries only (hash, id, idx) triples, never
    * chunk text. */
  def chunkSlice(text: String, kept: Array[Int], w: Int): String = {
    if (kept.isEmpty) return ""
    val words = text.split("\\s+").filter(_.nonEmpty)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < kept.length) {
      val from = kept(k) * w
      val until = math.min(from + w, words.length)
      var j = from
      while (j < until) {
        if (sb.length > 0) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      k += 1
    }
    sb.toString
  }

  @inline def planeSign(seed: Long, band: Int, plane: Int, d: Int): Double =
    if (mix(mix(mix(seed + band) + plane) + d) < 0) -1.0 else 1.0

  /** bucket id of one band: bit p set iff dot(vec, plane_p) >= 0. */
  def lshBucketLocal(vec: Array[Float], planes: Int, band: Int, seed: Long): Long = {
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += vec(d).toDouble * planeSign(seed, band, p, d); d += 1 }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

// ---- expressions ----

case class MinHashSigExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any, n: Any, k: Any): Any =
    new GenericArrayData(TextOps.minHashSig(t.toString, n.asInstanceOf[Int], k.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "minhash_sig"
}

case class SimHashExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any = TextOps.simHash(t.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash"
}

case class NgramJaccardExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any, n: Any): Any =
    TextOps.ngramJaccard(a.toString, b.toString, n.asInstanceOf[Int])
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "ngram_jaccard"
}

case class LanguageIdExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(t: Any): Any =
    UTF8String.fromString(TextOps.languageId(t.toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "language_id"
}

case class QualityScoreExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(t: Any): Any = TextOps.qualityScore(t.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "quality_score"
}

case class FingerprintExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(t: Any): Any = TextOps.fingerprint(t.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "text_fingerprint"
}

case class TokenEstimateExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(t: Any): Any = TextOps.tokenEstimate(t.toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "token_estimate"
}

/** shingle_hashes(text, k): the sha60 word-k-shingle set of a document as
  * array<long> (with duplicates; callers array_distinct as needed) — the
  * feature basis shared by minhash and exact n-gram jaccard. */
case class ShingleHashesExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any, k: Any): Any =
    new GenericArrayData(
      TextOps.shingleHashes(t.toString, k.asInstanceOf[Int]).map(x => x: Any))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "shingle_hashes"
}

/** splitmix64 finalizer over a long — the deterministic pseudo-random
  * shuffle key for corpus sampling (same avalanche the minhash permutations
  * use; cross-engine oracles replicate it with HUGEINT modular arithmetic).
  * Codegen'd: one static call, stays inside whole-stage codegen. */
case class Mix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any): Any = TextOps.mix(x.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.TextOps.mix($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "mix64"
}

/** cosine_sim(a, b) over two float-array embeddings — a tight primitive loop
  * instead of interpreted zip_with/aggregate lambdas (~50x faster on
  * brute-force pair scans). Generates code (doGenCode) so the near-dup
  * verify step stays inside whole-stage codegen instead of forcing the
  * interpreted row path around every pair. */
case class CosineSimExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val vb = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(va.numElements(), vb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = va.getFloat(i).toDouble; val y = vb.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: the expression can occur several times in one projection —
      // fixed identifiers would collide and kick the whole stage back to the
      // interpreter ("Redefinition of local variable")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** lsh_buckets(vec, planes, bands, seed): array of `bands` independent
  * sign-random-projection bucket ids. A single native expression replacing
  * the planes x dim unrolled Catalyst tree that dominated round-1 q21
  * (~50 s of plan optimization for 640 nodes — VERDICT.md What's-wrong #3). */
case class LshBucketsExpr(child: Expression, planes: Int, bands: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toFloatArray()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) { out(b) = TextOps.lshBucketLocal(vec, planes, b, seed); b += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "lsh_buckets"
}

/** repetition_stats(text): struct of the five Gopher-style within-document
  * repetition signals (see TextOps.repetitionStats). One pass per row. */
case class RepetitionStatsExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StructType(Seq(
    StructField("total_words", IntegerType, nullable = false),
    StructField("distinct_words", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any): Any = {
    val s = TextOps.repetitionStats(t.toString)
    org.apache.spark.sql.catalyst.InternalRow(s(0), s(1), s(2), s(3), s(4))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** chunk_hashes(text, w): sha60 of consecutive w-word chunks (chunk grid for
  * corpus-level exact span dedup). */
case class ChunkHashesExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any, w: Any): Any =
    new GenericArrayData(TextOps.chunkHashes(t.toString, w.asInstanceOf[Int]))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "chunk_hashes"
}

/** chunk_slice(text, kept, w): the surviving document body after chunk
  * dedup — kept chunk indices resliced out of the original text. */
case class ChunkSliceExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any = {
    val kept = k.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    UTF8String.fromString(
      TextOps.chunkSlice(t.toString, kept, w.asInstanceOf[Int]))
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "chunk_slice"
}

object TextFunctions {
  def repetition_stats(text: Column): Column = mkCol(RepetitionStatsExpr(exprOf(text)))
  def chunk_hashes(text: Column, w: Column): Column =
    mkCol(ChunkHashesExpr(exprOf(text), exprOf(w)))
  def chunk_slice(text: Column, kept: Column, w: Column): Column =
    mkCol(ChunkSliceExpr(exprOf(text), exprOf(kept), exprOf(w)))
  def minhash_sig(text: Column, numHashes: Column, shingleSize: Column): Column =
    mkCol(MinHashSigExpr(exprOf(text), exprOf(numHashes), exprOf(shingleSize)))
  def simhash(text: Column): Column = mkCol(SimHashExpr(exprOf(text)))
  def ngram_jaccard(a: Column, b: Column, n: Column): Column =
    mkCol(NgramJaccardExpr(exprOf(a), exprOf(b), exprOf(n)))
  def language_id(text: Column): Column = mkCol(LanguageIdExpr(exprOf(text)))
  def quality_score(text: Column): Column = mkCol(QualityScoreExpr(exprOf(text)))
  def text_fingerprint(text: Column): Column = mkCol(FingerprintExpr(exprOf(text)))
  def token_estimate(text: Column): Column = mkCol(TokenEstimateExpr(exprOf(text)))
  def mix64(x: Column): Column = mkCol(Mix64Expr(exprOf(x)))
  def shingle_hashes(text: Column, k: Column): Column =
    mkCol(ShingleHashesExpr(exprOf(text), exprOf(k)))
  def cosine_sim(a: Column, b: Column): Column = mkCol(CosineSimExpr(exprOf(a), exprOf(b)))
  def lsh_buckets(vec: Column, planes: Int, bands: Int, seed: Long = 0L): Column =
    mkCol(LshBucketsExpr(exprOf(vec), planes, bands, seed))

  // ---- PII scrubbing (the redaction pass every training pipeline runs
  // before the data leaves curation). Pure Column compositions over
  // codegen'd regexp functions; patterns restricted to the RE2-compatible
  // subset (no lookaround) so external engines reproduce them verbatim.
  // Scrub ORDER matters and is part of the contract: emails first (their
  // local parts contain digits), then IPv4s (dotted digits), then long
  // digit runs (phone-ish) over what remains.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\d{7,}"

  /** text with emails → <email>, IPv4s → <ip>, 7+-digit runs → <phone>. */
  def scrub_pii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<email>"),
        Ipv4Re, "<ip>"),
      PhoneRe, "<phone>")

  /** (n_emails, n_ips, n_phones) found by the same ordered pass. */
  def pii_counts(text: Column): Column = {
    val deEmail = regexp_replace(text, EmailRe, "<email>")
    val deIp = regexp_replace(deEmail, Ipv4Re, "<ip>")
    struct(
      regexp_count(text, lit(EmailRe)).as("n_emails"),
      regexp_count(deEmail, lit(Ipv4Re)).as("n_ips"),
      regexp_count(deIp, lit(PhoneRe)).as("n_phones"))
  }
}
