package graft.synth

import graft.xmq._
import graft.expr.XmqExprs
import scala.collection.mutable.ArrayBuffer

/** Deterministic, skew-preserving synthesizer of the north-star input table
  * (repo:string, path:string, commit:string, lang:string, content:string)
  * per BASELINE.json input_hint / FIXTURES.md §1.
  *
  * - repos are Zipf-ish: the top repo holds ≈20% of rows (FIXTURES.md §1)
  * - contents are random xml/html/json/xmq documents, normalized once through
  *   the round-trip so that sha256(roundtrip(content)) == sha256(content)
  *   holds by construction (the per-row invariant the engine must preserve)
  * - everything is a pure function of (seed, index): no RNG state shared
  *   across rows, so generation can run inside mapPartitions at any scale.
  */
object SourceFiles {

  final case class SourceFile(repo: String, path: String, commit: String,
                              lang: String, content: String)

  // splitmix64 — public-domain mixing function
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private val langs = Array("xml", "json", "xmq", "html")
  private val dirs = Array("src/main", "src/test", "web/static", "cfg", "docs", "build", "api/v2")
  private val words = Array(
    "alpha", "beta", "gamma", "delta", "config", "server", "client", "widget",
    "engine", "parser", "printer", "index", "table", "column", "shard",
    "commit", "branch", "merge", "status", "result", "error", "value", "total")

  private def word(r: Long, salt: Int): String = words(((mix(r + salt) >>> 33) % words.length).toInt)
  private def num(r: Long, salt: Int, mod: Int): Int = (((mix(r + salt) >>> 33) % mod).toInt)

  // cumulative 1/k weights for repos 1..nRepos-1, cached per nRepos: the
  // mapPartitions hot path calls repoIdFor once per generated row, and
  // recomputing the harmonic sum inline was O(nRepos) per row (~3e10 flops
  // for a 10M-row generation). Same sequential accumulation order, so every
  // cached prefix equals the old loop's float value bit for bit.
  private val cumCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def cumWeights(nRepos: Int): Array[Double] =
    cumCache.computeIfAbsent(nRepos, n => {
      val a = new Array[Double](n - 1) // a(i) = sum of 1/k for k = 1..i+1
      var acc = 0.0
      var k = 1
      while (k < n) { acc += 1.0 / k; a(k - 1) = acc; k += 1 }
      a
    })

  /** Zipf-ish repo id for row index: repo 0 gets ~20%, tail ~1/k.
    * Binary search over the cached cumulative weights — picks the identical
    * repo the original sequential scan did (same sums, same >= compare). */
  def repoIdFor(h: Long, nRepos: Int): Int = {
    val u = (h >>> 11).toDouble / (1L << 53).toDouble // uniform [0,1)
    if (u < 0.20 || nRepos <= 1) return 0
    // remaining 80% over repos 1..nRepos-1 with 1/k weights
    val cum = cumWeights(nRepos)
    val target = (u - 0.20) / 0.80 * cum(cum.length - 1)
    var lo = 1
    var hi = nRepos - 2
    var ans = nRepos - 1 // the scan's fall-through default
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (cum(mid - 1) >= target) { ans = mid; hi = mid - 1 } else lo = mid + 1
    }
    ans
  }

  def repoName(id: Int): String = f"org${id % 97}%02d/repo-${word(id.toLong * 7919L, 1)}-$id"

  /** Generate one row as a pure function of (seed, idx). */
  def row(seed: Long, idx: Long, nRepos: Int): SourceFile = {
    val h = mix(seed ^ mix(idx))
    val repoId = repoIdFor(h, nRepos)
    val lang = langs(num(h, 2, langs.length))
    val ext = lang match {
      case "xml" => ".xml"; case "json" => ".json"; case "xmq" => ".xmq"; case "html" => ".html"
    }
    val dir = dirs(num(h, 3, dirs.length))
    // several commits can touch the same (repo, path)
    val fileId = num(h, 4, 500)
    val path = s"$dir/${word(h, 5)}_${word(h, 6)}_$fileId$ext"
    val commit = f"${mix(h + 7)}%016x${mix(h + 8)}%016x${(mix(h + 9) & 0xffffffffL)}%08x"
    val content = genContent(h, lang)
    SourceFile(repoName(repoId), path, commit, lang, content)
  }

  def generate(n: Int, seed: Long = 42L, nRepos: Int = 0): Seq[SourceFile] = {
    val repos = if (nRepos > 0) nRepos else math.max(4, math.sqrt(n.toDouble).toInt)
    (0 until n).map(i => row(seed, i.toLong, repos))
  }

  // ---- content generation: random tree → print → normalize via roundtrip ----

  private def genTree(h: Long, depth: Int, branch: Int): XElem = {
    val e = new XElem(word(h, 10 + depth) + "_" + num(h, 11 + depth, 50))
    val nAttrs = num(h, 12 + depth, 3)
    for (a <- 0 until nAttrs) {
      val at = new XAttr(null, word(h, 20 + a) + a)
      at.appendText(word(mix(h + a), 21) + " " + num(h, 22 + a, 1000))
      e.attrs += at
    }
    val nKids = if (depth >= 3) 0 else num(h, 30 + depth, branch + 1)
    if (nKids == 0) {
      num(h, 31, 4) match {
        case 0 => e.appendChild(new XText(s"${word(h, 32)} ${word(h, 33)} ${num(h, 34, 100000)}"))
        case 1 => e.appendChild(new XText(s"line one ${word(h, 35)}\nline two ${word(h, 36)}"))
        case 2 => e.appendChild(new XText(s"it's a ${word(h, 37)} \"quoted\" thing"))
        case _ => e.appendChild(new XText(num(h, 38, 1000000).toString))
      }
    } else {
      for (k <- 0 until nKids) {
        val hh = mix(h + 100L * (depth + 1) + k)
        if (num(hh, 40, 6) == 0) e.appendChild(new XComment(s"note ${word(hh, 41)}"))
        e.appendChild(genTree(hh, depth + 1, branch))
      }
    }
    e
  }

  def genContent(h: Long, lang: String): String = {
    val doc = new XDoc
    doc.appendChild(genTree(h, 0, 3))
    val raw = lang match {
      case "xml" => XmlPrinter.printXml(doc)
      case "html" => wrapHtml(doc)
      case "json" => JsonPrinter.print(doc)
      case _ => XmqPrinter.print(doc)
    }
    // normalize to a round-trip fixed point; a null means the engine could
    // not re-parse its OWN print — fail HERE, at the generator, rather than
    // shipping a row that silently violates the sha256(roundtrip(content))
    // == sha256(content) invariant and masquerades as an engine regression
    val normalized = XmqExprs.roundtrip(raw, lang)
    require(normalized != null,
      s"synthesizer produced a non-round-trippable $lang document (h=$h)")
    normalized
  }

  private def wrapHtml(doc: XDoc): String = {
    val html = new XElem("html")
    val body = new XElem("body")
    doc.children.foreach(body.appendChild)
    html.appendChild(body)
    val d = new XDoc
    d.appendChild(new XDoctype("html", "html"))
    d.appendChild(html)
    HtmlPrinter.printHtml(d)
  }
}
