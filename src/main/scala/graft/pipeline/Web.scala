package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus curation: URL canonicalization, canonical-URL dedup and
  * per-domain statistics — stage one of a CCNet/RefinedWeb-style pipeline,
  * where the same page arrives under utm-tagged / fragment / www / default
  * -port / trailing-slash variants and must collapse BEFORE any content
  * hashing (URL dedup is orders of magnitude cheaper than text dedup and
  * typically removes the bulk of crawl duplicates).
  *
  * All ops are pure Column compositions (regexp + higher-order array
  * functions — whole-stage codegen'd, no UDFs), and the rule set is
  * deliberately small and exactly specified so an independent engine can
  * replay it (the driver oracle re-derives canonical URLs in DuckDB).
  */
object Web {

  /** query parameters dropped during canonicalization (tracking noise). */
  private val TrackingParam = "^(utm_|fbclid|gclid|ref=)"

  /** Canonical form of a URL:
    *  1. lowercase;
    *  2. drop the #fragment;
    *  3. drop an explicit default port (https :443, http :80);
    *  4. drop a leading "www." host label;
    *  5. drop tracking query params (utm_*, fbclid, gclid, ref) and empty
    *     params, keeping the survivors' relative order;
    *  6. drop a trailing slash on the path.
    * One scan's worth of string ops per row, no shuffle. */
  def canonicalUrl(url: Column): Column = {
    val lowered = lower(url)
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // RE2-safe (no lookahead): capture the boundary char / end-of-string
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(https://[^/?#:]*):443($|[/?#])", "$1$2"),
      "^(http://[^/?#:]*):80($|[/?#])", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val parts = split(noWww, "\\?", 2)
    val pre = regexp_replace(element_at(parts, 1), "/$", "")
    val q = when(size(parts) > 1, element_at(parts, 2)).otherwise(lit(""))
    val kept = array_join(
      filter(split(q, "&"), p => length(p) > 0 && !p.rlike(TrackingParam)), "&")
    when(length(kept) > 0, concat(pre, lit("?"), kept)).otherwise(pre)
  }

  /** registrable host part of an (already canonical) URL. */
  def domainOf(canonicalUrl: Column): Column =
    regexp_extract(canonicalUrl, "^https?://([^/?#]+)", 1)

  /** Collapse rows sharing a canonical URL: keep the smallest id, count the
    * variants. One hash-aggregate (partial+final) — shuffle is one row per
    * DISTINCT canonical URL, linear in the corpus at any scale. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Per-domain corpus profile: document count, distinct canonical pages,
    * mean of `sizeCol` — the signal a domain blocklist / sampling policy
    * reads. Same single hash-aggregate shape as urlDedup (count_distinct
    * expands to a two-phase partial aggregate, still keyed by domain). */
  def domainStats(df: DataFrame, urlCol: String, sizeCol: String): DataFrame = {
    val canon = canonicalUrl(col(urlCol))
    df.select(domainOf(canon).as("domain"), canon.as("canonical_url"), col(sizeCol))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical_url")).as("n_pages"),
        round(avg(col(sizeCol)), 2).as(s"avg_$sizeCol"))
  }

  /** boilerplate line markers (matched case-insensitively, partial). */
  private val BoilerplateLine =
    "cookie|copyright|all rights reserved|terms of (use|service)|privacy policy"

  /** RefinedWeb-style LINE-level quality verdict: keep a line iff
    *  1. it has >= 3 whitespace-separated words (kills nav stubs, buttons,
    *     bare dates and the empty lines extraction leaves behind);
    *  2. letters are NOT majority-uppercase (kills SHOUTED headings and
    *     menu bars; lines with no letters are exempt from this rule);
    *  3. it carries no boilerplate marker (cookie banners, copyright
    *     footers, terms/privacy links).
    * Document-level quality scores (q15/q16) rate whole pages; this is the
    * stage BEFORE that — repairing extraction noise inside pages worth
    * keeping. Exactly specified so an independent engine replays it. */
  def keepLine(l: Column): Column = {
    val norm = trim(regexp_replace(l, " +", " "))
    val words = when(norm === "", lit(0)).otherwise(size(split(norm, " ")))
    val letters = length(regexp_replace(l, "[^A-Za-z]", ""))
    val uppers = length(regexp_replace(l, "[^A-Z]", ""))
    words >= 3 &&
      !(letters > 0 && uppers * 2 > letters) &&
      !lower(l).rlike(BoilerplateLine)
  }

  /** the document with its rejected lines removed (surviving lines keep
    * their order and original bytes). Pure higher-order-array Column ops —
    * per-row map, codegen'd, no shuffle, linear at any corpus size. */
  def cleanLines(text: Column): Column =
    array_join(filter(split(text, "\n"), keepLine _), "\n")
}
