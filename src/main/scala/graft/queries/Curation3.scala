package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextOps, UrlOps}
import Q._

/** Round-8 tranche (q348+): incremental index maintenance for BOTH
  * persisted indexes (SQ8 ANN append + compaction, dedup-index
  * append), URL/domain-aware curation (canonical-URL dedup, domain
  * quality rollup), and the Gopher-style intra/inter-doc repetition
  * battery (repetition signals, segment-level dup fraction,
  * unigram-LM surprisal). Oracle SQL is generated from the same
  * constants as the Scala operators (the NorthStar pattern).
  */
object Curation3 {

  private val K = 16; private val BANDS = 4; private val NGRAM = 3

  /** Deterministic messy-URL augment both engines re-derive (the
    * documents fixture has no URL column — same pattern as Curation2's
    * dirty-corpus augment): scheme/host case mess, www/blog
    * subdomains, default and non-default ports, trailing slashes,
    * tracking params, unsorted params, fragments.
    */
  private[graft] def rawUrlCol = {
    val id = col("doc_id")
    def m(k: Int) = pmod(id, lit(k.toLong))
    concat(
      when(m(5) === 0, lit("HTTP")).otherwise(lit("https")), lit("://"),
      when(m(7) < 2, lit("WWW."))
        .when(m(7).isin(2L, 3L), lit("blog.")).otherwise(lit("")),
      when(m(3) === 0, upper(col("source"))).otherwise(col("source")),
      lit(".com"),
      when(m(11) === 0,
          when(m(5) === 0, lit(":80")).otherwise(lit(":443")))
        .when(m(13) === 0, lit(":8080")).otherwise(lit("")),
      lit("/p/"), m(40).cast("string"),
      when(m(2) === 0, lit("/")).otherwise(lit("")),
      when(m(4) === 0, concat(lit("?utm_source=feed&id="),
          m(10).cast("string"), lit("&utm_campaign=x")))
        .when(m(4) === 1, lit("?b=2&a=1")).otherwise(lit("")),
      when(m(6) === 0, lit("#frag")).otherwise(lit("")))
  }

  private val rawUrlSql =
    """(CASE WHEN doc_id % 5 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
      |(CASE WHEN doc_id % 7 < 2 THEN 'WWW.'
      |      WHEN doc_id % 7 IN (2, 3) THEN 'blog.' ELSE '' END) ||
      |(CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END) ||
      |'.com' ||
      |(CASE WHEN doc_id % 11 = 0 THEN
      |        (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE ':443' END)
      |      WHEN doc_id % 13 = 0 THEN ':8080' ELSE '' END) ||
      |'/p/' || CAST(doc_id % 40 AS VARCHAR) ||
      |(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
      |(CASE WHEN doc_id % 4 = 0 THEN
      |        '?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR) ||
      |        '&utm_campaign=x'
      |      WHEN doc_id % 4 = 1 THEN '?b=2&a=1' ELSE '' END) ||
      |(CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END)""".stripMargin

  /** The ANALYTICALLY-derived canonical form of [[rawUrlCol]] — the
    * oracle pins the regex canonicalizer against ground truth computed
    * straight from the synthesis constants, not a second regex
    * implementation: scheme/host lowered, www stripped (blog kept),
    * default ports gone, :8080 kept, trailing slash gone, fragment
    * gone, utm_* stripped, surviving params name-sorted.
    */
  private val canonUrlSql =
    """(CASE WHEN doc_id % 5 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |(CASE WHEN doc_id % 7 IN (2, 3) THEN 'blog.' ELSE '' END) ||
      |lower(source) || '.com' ||
      |(CASE WHEN doc_id % 11 <> 0 AND doc_id % 13 = 0
      |      THEN ':8080' ELSE '' END) ||
      |'/p/' || CAST(doc_id % 40 AS VARCHAR) ||
      |(CASE WHEN doc_id % 4 = 0 THEN '?id=' || CAST(doc_id % 10 AS VARCHAR)
      |      WHEN doc_id % 4 = 1 THEN '?a=1&b=2' ELSE '' END)""".stripMargin

  val queries: Map[String, QFn] = Map(
    // Incremental SQ8 maintenance: index built on the 80% snapshot, the
    // 20% delta folded in WITHOUT re-encoding the corpus (bounds-drift
    // check -> append with stored bounds, or rebuild if violated).
    // Either path must equal a full rebuild over snapshot+delta — so
    // this shares q326's full-corpus oracle verbatim.
    "q348_sq8_index_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(pmod(col("vec_id"), lit(5L)) =!= 0)
      val delta = emb.where(pmod(col("vec_id"), lit(5L)) === 0)
      val idx = Curation2.tempIndexDir("graft_sq8_append_")
      Similarity.writeSq8Index(corpus, "vec_id", "embedding", idx)
      Similarity.appendSq8Index(s, idx, delta, "vec_id", "embedding", corpus)
      try Similarity.sq8TopKIndexed(s, idx, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
        .localCheckpoint(true)
      finally Curation2.deleteDir(idx)
    }),

    // URL dedup: canonicalize the messy raw forms, one hash agg per
    // canonical key; copies, collapsed raw spellings, min-id keeper.
    "q349_url_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url", rawUrlCol)
      UrlOps.urlDedup(docs, "url", "doc_id").orderBy("canonical_url")
    }),

    // Per-registered-domain rollup: doc/URL counts, URL-dup rate, and
    // the exact quality mean — the frame domainCap budgets a crawl on.
    "q350_domain_rollup" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url", rawUrlCol)
      UrlOps.domainQualityRollup(docs, "url", "n_chars").orderBy("domain")
    }),

    // Index compaction after appends: the append leaves small files;
    // compaction rewrites the codes into right-sized partitions and
    // must not change a single answer — shares q326's oracle too.
    "q351_sq8_index_compact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val corpus = emb.where(pmod(col("vec_id"), lit(5L)) =!= 0)
      val delta = emb.where(pmod(col("vec_id"), lit(5L)) === 0)
      val idx = Curation2.tempIndexDir("graft_sq8_compact_")
      Similarity.writeSq8Index(corpus, "vec_id", "embedding", idx)
      Similarity.appendSq8Index(s, idx, delta, "vec_id", "embedding", corpus)
      Similarity.compactSq8Index(s, idx, 4)
      try Similarity.sq8TopKIndexed(s, idx, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
        .localCheckpoint(true)
      finally Curation2.deleteDir(idx)
    }),

    // Dedup-index append: ingest batch1 into the persisted index, then
    // serve batch2's decisions from the appended index. The oracle
    // re-derives batch2's decisions against the GROWN corpus directly
    // (corpus' = %5 != 1) — proving appended index == rebuilt index.
    "q352_dedup_index_append" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus0 = docs.where(pmod(col("doc_id"), lit(5L)).isin(2L, 3L, 4L))
      val batch1 = docs.where(pmod(col("doc_id"), lit(5L)) === 0)
      val batch2 = docs.where(pmod(col("doc_id"), lit(5L)) === 1)
      val grown = docs.where(pmod(col("doc_id"), lit(5L)) =!= 1)
      val idx = Curation2.tempIndexDir("graft_dedup_append_")
      Dedup.writeDedupIndex(corpus0, "text", "doc_id", idx, NGRAM, K, BANDS)
      Dedup.appendDedupIndex(batch1, "text", "doc_id", idx, NGRAM, K, BANDS)
      try Dedup.incrementalDedupIndexed(idx, grown, batch2, "text", "doc_id",
          NGRAM, K, BANDS, 0.8)
        .orderBy("doc_id")
        .localCheckpoint(true)
      finally Curation2.deleteDir(idx)
    }),

    // Gopher repetition filters, intra-doc: duplicate-2-gram fraction
    // and top-gram share per doc — map-only (sorted-array fold).
    "q353_repetition_signals" -> ((s, dir) =>
      TextOps.repetitionSignals(t(s, dir, "documents"), "text", "doc_id",
          n = 2)
        .orderBy("doc_id")),

    // Inter-doc segment dedup: 20-word segments, a segment seen in >1
    // doc flags every holder; per-doc duplicated-segment fraction.
    "q354_segment_dup" -> ((s, dir) =>
      TextOps.segmentDupFraction(t(s, dir, "documents"), "text", "doc_id",
          w = 20)
        .orderBy("doc_id")),

    // Unigram-LM surprisal (perplexity-proxy quality): mean -ln p(w)
    // per doc under the corpus's own unigram model, micro-nat exact.
    "q355_unigram_surprisal" -> ((s, dir) =>
      TextOps.unigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")),

    // Streaming ingest-time URL dedup: the canonicalizer is a
    // stateless map inside the stream, the per-canonical rollup is the
    // stateful agg (collect_set for the raw-form count — streaming
    // forbids COUNT DISTINCT, and the set's SIZE equals it exactly).
    // AvailableNow replay == the batch q349 answer, shared oracle.
    "q356_streaming_url_dedup" -> ((s, dir) => {
      val docs = graft.core.Tables.stream(s, dir, "documents")
        .withColumn("url", rawUrlCol)
      val agg = docs
        .select(UrlOps.canonicalUrl(col("url")).as("canonical_url"),
          col("url").as("raw"), col("doc_id"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_copies"),
          size(collect_set(col("raw"))).cast("long").as("n_raw_forms"),
          min(col("doc_id")).as("keeper_id"))
      val qn = "q356_mem_" + java.util.UUID.randomUUID().toString
        .replace("-", "")
      val q = agg.writeStream.format("memory").queryName(qn)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try s.table(qn).orderBy("canonical_url").localCheckpoint(true)
      finally s.catalog.dropTempView(qn)
    }),

    // Crawl-frontier seen-URL check: bloom prefilter over the seen
    // canonical set, exact join only for bloom-positives.
    "q357_url_frontier" -> ((s, dir) => {
      val docs = t(s, dir, "documents").withColumn("url", rawUrlCol)
      val seen = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0)
      val frontier = docs.where(pmod(col("doc_id"), lit(5L)) === 0)
      UrlOps.urlSeenFilter(seen, frontier, "url", "doc_id")
        .orderBy("doc_id")
    })
  )

  private val q349OracleSql =
    s"""WITH u AS (SELECT doc_id, $rawUrlSql AS raw, $canonUrlSql AS cu
       |  FROM documents)
       |SELECT cu AS canonical_url, count(*) AS n_copies,
       |  count(DISTINCT raw) AS n_raw_forms, min(doc_id) AS keeper_id
       |FROM u GROUP BY cu ORDER BY cu""".stripMargin

  val oracles: Map[String, String] = Map(
    "q348_sq8_index_append" -> Curation2.oracles("q326_ann_sq8"),
    "q351_sq8_index_compact" -> Curation2.oracles("q326_ann_sq8"),
    // the streaming replay must equal the batch q349 answer exactly
    "q356_streaming_url_dedup" -> q349OracleSql,
    "q357_url_frontier" ->
      s"""WITH u AS (SELECT doc_id, $canonUrlSql AS cu FROM documents),
         |seen AS (SELECT DISTINCT cu FROM u WHERE doc_id % 5 <> 0)
         |SELECT doc_id, cu AS canonical_url,
         |  cu IN (SELECT cu FROM seen) AS seen
         |FROM u WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin,
    "q352_dedup_index_append" ->
      Curation.incrementalDedupOracle("doc_id % 5 <> 1", "doc_id % 5 = 1"),

    "q349_url_dedup" -> q349OracleSql,

    "q350_domain_rollup" ->
      s"""WITH u AS (SELECT doc_id, n_chars,
         |    lower(source) || '.com' AS domain, $canonUrlSql AS cu
         |  FROM documents)
         |SELECT domain, count(*) AS n_docs, count(DISTINCT cu) AS n_urls,
         |  round(1.0 - CAST(count(DISTINCT cu) AS DOUBLE) / count(*), 6)
         |    AS url_dup_rate,
         |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS mean_quality
         |FROM u GROUP BY domain ORDER BY domain""".stripMargin,

    "q353_repetition_signals" ->
      s"""WITH g AS (SELECT doc_id,
         |    unnest(${Dedup.shinglesSql("text", 2)}) AS g FROM documents),
         |cnt AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
         |    count(*) AS dist, CAST(max(c) AS BIGINT) AS mx
         |  FROM cnt GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(total, 0) AS total_grams,
         |  coalesce(dist, 0) AS distinct_grams,
         |  round(CAST(coalesce(total, 0) - coalesce(dist, 0) AS DOUBLE)
         |    / greatest(coalesce(total, 0), 1), 6) AS dup_gram_frac,
         |  round(CAST(coalesce(mx, 0) AS DOUBLE)
         |    / greatest(coalesce(total, 0), 1), 6) AS top_gram_frac
         |FROM documents d LEFT JOIN agg USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "q354_segment_dup" ->
      """WITH wl AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
        |  FROM documents),
        |sg AS (SELECT doc_id, ws,
        |    unnest(range(0, CAST(ceil(len(ws) / 20.0) AS INT))) AS seg
        |  FROM wl WHERE len(ws) > 0),
        |st AS (SELECT doc_id, md5(array_to_string(
        |    list_slice(ws, seg * 20 + 1, seg * 20 + 20), ' ')) AS h
        |  FROM sg),
        |sh AS (SELECT h, count(DISTINCT doc_id) AS nd FROM st GROUP BY h)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_segments,
        |  round(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_segment_frac
        |FROM st JOIN sh USING (h) GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q355_unigram_surprisal" ->
      """WITH wx AS (SELECT doc_id, w FROM
        |    (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |     FROM documents) WHERE w <> ''),
        |c AS (SELECT w, count(*) AS c FROM wx GROUP BY w),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM c),
        |q AS (SELECT doc_id,
        |    CAST(floor(-ln(CAST(c AS DOUBLE) / nn) * 1e6 + 0.5) AS BIGINT)
        |      AS q
        |  FROM wx JOIN c USING (w), n)
        |SELECT doc_id, count(*) AS n_words,
        |  round(CAST(sum(q) AS DOUBLE) / 1e6 / count(*), 6)
        |    AS mean_surprisal_nats
        |FROM q GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
