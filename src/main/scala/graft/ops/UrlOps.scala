package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL/domain-aware curation (r7 verdict task #5) — the curation
  * signal class a crawl pipeline keys on: canonical-URL normalization,
  * per-URL exact dedup, and per-registered-domain quality rollups that
  * feed [[Corpus.domainCap]]. Composes the component extractors from
  * [[graft.functions.UriOps]] (reference:
  * src/carnot/funcs/builtins/uri_ops.h) — everything here is built
  * from `regexp_extract`/`filter`/`array_sort` Catalyst expressions,
  * so the whole canonicalizer stays inside WholeStageCodegen; no UDF.
  *
  * Scale shape: canonicalization is map-only; dedup/rollup are single
  * hash-keyed aggregates on the canonical key. At 100 TB the only
  * shuffle is by canonical_url / domain — exactly the keys the data is
  * skewed-safe on (a pathological mega-domain serializes only its own
  * aggregate partition, and AQE skew-split handles the rest).
  */
object UrlOps {

  /** Params any crawl canonicalizer strips: click/campaign trackers. */
  val trackingParamRe = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Crawl-grade canonical URL:
    *  - scheme + host lowercased, leading "www." stripped
    *  - default ports dropped (http:80, https:443); others kept
    *  - trailing slashes stripped from the path (root becomes empty)
    *  - fragment dropped
    *  - tracking params ([[trackingParamRe]]) dropped; survivors
    *    SORTED by name so param order never splits a URL's identity
    *
    * Mirrored token-for-token by the DuckDB SQL in the q349/q350
    * oracles; every step is deterministic string algebra.
    */
  def canonicalUrl(url: Column): Column = {
    val schemeC = lower(regexp_extract(url, "^([^:/?#]+):", 1))
    val auth = regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)
    val hostC = regexp_replace(
      lower(regexp_extract(auth, "^(?:[^@]*@)?([^:]*)", 1)), "^www\\.", "")
    val portRaw = regexp_extract(auth, ":([0-9]+)$", 1)
    val portC = when(portRaw === "", lit(""))
      .when(schemeC === "http" && portRaw === "80", lit(""))
      .when(schemeC === "https" && portRaw === "443", lit(""))
      .otherwise(concat(lit(":"), portRaw))
    val pathC = regexp_replace(
      regexp_extract(url, "^[^:/?#]+://[^/?#]*(/[^?#]*)?", 1), "/+$", "")
    val qRaw = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(qRaw, "&"),
      p => !(p rlike trackingParamRe) && p =!= "")), "&")
    // identity fallback: a schemeless/protocol-relative/otherwise
    // unparseable URL passes through UNCHANGED — collapsing them all
    // onto a shared "://" junk key would make urlDedup declare
    // unrelated pages copies and urlSeenFilter report phantom hits
    when(schemeC === "" || hostC === "", url)
      .otherwise(concat(schemeC, lit("://"), hostC, portC, pathC,
        when(kept === "", lit("")).otherwise(concat(lit("?"), kept))))
  }

  /** Registered domain (simplified public-suffix rule: the last two
    * dot-labels of the canonical host — example.com, example.org).
    * A production build swaps in the PSL table as a broadcast join;
    * the rollup shape is identical.
    */
  def registeredDomain(url: Column): Column = {
    val host = regexp_extract(canonicalUrl(url), "^[^:/?#]+://([^:/?#]*)", 1)
    regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
  }

  /** Per-canonical-URL exact dedup: one hash agg keyed by the
    * canonical form. Reports copies, how many RAW spellings collapsed
    * into the key (the "tracking-param explosion" measure), and the
    * min-id keeper.
    */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(canonicalUrl(col(urlCol)).as("canonical_url"),
        col(urlCol).as("raw"), col(idCol).as("id"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("raw")).as("n_raw_forms"),
        min(col("id")).as("keeper_id"))

  /** Crawl-frontier seen-URL check (the 100 TB shape of "have we
    * fetched this before"): a Bloom filter built over the SEEN
    * canonical set in one aggregate and broadcast as bytes; candidate
    * URLs map-filter through it so only bloom-POSITIVES pay the exact
    * keyed join that kills false positives — a frontier that is
    * mostly-new never shuffles against the seen set at all (the
    * [[Corpus.contaminationBloom]] prefilter shape applied to URLs).
    */
  def urlSeenFilter(seen: DataFrame, candidates: DataFrame, urlCol: String,
                    idCol: String,
                    estimatedItems: Long = 1000000L): DataFrame = {
    val seenCu = seen.select(canonicalUrl(col(urlCol)).as("cu")).distinct()
    val bf = seenCu
      .agg(graft.expressions.Bloom.agg(xxhash64(col("cu")),
        estimatedItems, math.max(64L, estimatedItems * 8L)).as("bf"))
      .head().getAs[Array[Byte]](0)
    val cand = candidates.select(col(idCol).as("__cid"),
      canonicalUrl(col(urlCol)).as("canonical_url"))
    val confirmed = cand
      .where(graft.expressions.Bloom.mightContain(lit(bf),
        xxhash64(col("canonical_url"))))
      .join(seenCu.select(col("cu").as("canonical_url")), Seq("canonical_url"))
      .select(col("__cid")).withColumn("__seen", lit(true))
    cand.join(confirmed, Seq("__cid"), "left")
      .select(col("__cid").as(idCol), col("canonical_url"),
        coalesce(col("__seen"), lit(false)).as("seen"))
  }

  /** Domain-stratified train/val/test split: the split key is the
    * REGISTERED DOMAIN, so no domain ever straddles train/test — the
    * web-data analog of [[Dedup.leakageSafeSplit]]'s cluster-keyed
    * rule (near-identical boilerplate, templates, and style leak
    * across pages of one site even when no page is a near-dup).
    * Deterministic md5 assignment: reproducible at any partitioning,
    * engine, or rerun; map-only, zero shuffle.
    */
  def domainSafeSplit(df: DataFrame, urlCol: String, idCol: String,
                      valPct: Int, testPct: Int): DataFrame = {
    val h = pmod(graft.ops.Dedup.h60(registeredDomain(col(urlCol))),
      lit(100L))
    df.select(col(idCol), registeredDomain(col(urlCol)).as("domain"),
      when(h < testPct, lit("test"))
        .when(h < testPct + valPct, lit("val"))
        .otherwise(lit("train")).as("split"))
  }

  /** Per-registered-domain rollup: doc count, distinct canonical URLs,
    * URL-dup rate, and the exact quality mean. The quality column is
    * MICRO-QUANTIZED per row before the cross-row long sum (the
    * engine-exactness contract), so fractional [0,1] model scores —
    * the common quality signal — roll up exactly instead of
    * truncating to zero (the r7 keepBestQuality bug class). The frame
    * [[Corpus.domainCap]] reads to budget a crawl.
    */
  def domainQualityRollup(df: DataFrame, urlCol: String,
                          qualityCol: String): DataFrame =
    df.select(registeredDomain(col(urlCol)).as("domain"),
        canonicalUrl(col(urlCol)).as("cu"),
        floor(col(qualityCol).cast("double") * 1e6 + 0.5).cast("long")
          .as("q"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cu")).as("n_urls"),
        sum(col("q")).as("quality_sum"))
      .select(col("domain"), col("n_docs"), col("n_urls"),
        round(lit(1.0) - col("n_urls").cast("double") / col("n_docs"), 6)
          .as("url_dup_rate"),
        round(col("quality_sum").cast("double") / 1e6 / col("n_docs"), 6)
          .as("mean_quality"))
}
