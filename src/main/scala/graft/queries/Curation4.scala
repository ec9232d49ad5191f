package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Classify, Events, Graph, Scale, TextOps}
import graft.queries.Q._

/** Round-8 batch 2: behavioral event analytics (funnel, retention),
  * classifier trust audits (reliability/ECE, Cohen's kappa), and
  * scale-engineering diagnostics (hot-key skew profile, syndication
  * PageRank). Every query ships with a full DuckDB re-derivation;
  * ratios are exact integer ppm per the [[graft.ops.Corpus]] rules.
  */
object Curation4 {

  private def idivc(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column) =
    call_function("div", a, b)

  /** q32's stopword list (== the `en` marker set) — the shared
    * English-ness signal for the calibration query.
    */
  private val stops = Seq("the", "a", "of", "to", "and", "in", "is")
  private val stopsSqlList = stops.map("'" + _ + "'").mkString(",")

  val queries: Map[String, QFn] = Map(

    // Strict ordered funnel view -> click -> purchase, 7-day window:
    // per-stage distinct-user conversion over the event log.
    "q373_funnel" -> ((s, dir) => {
      Events.funnel(t(s, dir, "events"), "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"), windowSec = 7L * 86400L)
        .orderBy("stage")
    }),

    // Weekly retention cohort matrix: first-event epoch-week cohorts x
    // week offsets, distinct active users + retained ppm.
    "q374_retention" -> ((s, dir) => {
      Events.retention(t(s, dir, "events"), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    }),

    // Reliability diagram + ECE for a ppm-probability predictor of
    // "document is English" (stopword load, integer-scaled) — is the
    // filter's confidence trustworthy enough to use as a sampling
    // weight?
    "q375_calibration" -> ((s, dir) => {
      val w = split(col("text"), " ")
      val scored = t(s, dir, "documents").select(
        least(idivc(size(filter(w, x => x.isin(stops: _*))).cast("long")
          * 3000000L, size(w).cast("long")), lit(1000000L)).as("prob_ppm"),
        (col("lang") === "en").cast("long").as("y"))
      Classify.calibration(scored, "prob_ppm", "y", bins = 10)
        .orderBy("bin")
    }),

    // Cohen's kappa of the marker-word language identifier vs the
    // ground-truth lang column: chance-corrected agreement, the
    // label-noise audit for classifier-labeled training data.
    "q376_label_kappa" -> ((s, dir) => {
      Classify.kappa(
        TextOps.langId(t(s, dir, "documents"), "text")
          .select(col("lang_pred"), col("lang")),
        "lang_pred", "lang")
    }),

    // Hot-key profile for event_type as a prospective shuffle key at
    // 32-way partitioning: share, deterministic hash bucket, and the
    // salt factor that would level each key.
    "q377_skew_profile" -> ((s, dir) => {
      Scale.skewProfile(t(s, dir, "events"), "event_type",
        topK = 10, partitions = 32)
    }),

    // Crawl-frontier prioritization: 3 rounds of damped weighted
    // PageRank over the lexical-affinity graph (sources joined by the
    // integer dot product of their hashed word profiles — the q343
    // fingerprint, unnormalized). Which source is most central to the
    // corpus's vocabulary, hence where recrawl budget goes first.
    "q378_profile_pagerank" -> ((s, dir) => {
      Graph.pageRank(
          Graph.profileEdges(t(s, dir, "documents"), "text", "source"),
          "src", "dst", "w", iters = 3)
        .orderBy("node")
    }))

  // ---- generated oracle SQL ------------------------------------------

  /** q31's lang-vote CASE (NorthStar oracle), reused verbatim for the
    * kappa oracle's predicted column.
    */
  private val langVoteSql = {
    val scores = TextOps.langMarkers.map { case (lang, ms) =>
      lang -> s"len(list_filter(string_split(text,' '), x -> x IN (${
        ms.map("'" + _ + "'").mkString(",")})))"
    }
    val langs = scores.map(_._1)
    val cond = langs.map { l =>
      val others = langs.filter(_ != l)
        .map(o => s"(${scores.find(_._1 == l).get._2}) >= (${
          scores.find(_._1 == o).get._2})")
        .mkString(" AND ")
      s"WHEN $others THEN '$l'"
    }.mkString("\n       ")
    s"""CASE WHEN ${scores.map(s => s"(${s._2})").mkString(" + ")} = 0
       | THEN 'unknown'
       |       $cond
       |       ELSE 'unknown' END""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "q373_funnel" ->
      """WITH base AS (SELECT user_id AS u, event_type AS et,
        |    epoch_us(ts) AS ts FROM events),
        |s0 AS (SELECT u, min(ts) AS t0 FROM base WHERE et = 'view' GROUP BY u),
        |c1 AS (SELECT b.u, min(s0.t0) AS t0, min(b.ts) AS tk
        |  FROM base b JOIN s0 ON b.u = s0.u
        |  WHERE b.et = 'click' AND b.ts > s0.t0
        |    AND b.ts <= s0.t0 + 604800000000 GROUP BY b.u),
        |c2 AS (SELECT b.u, min(c1.t0) AS t0, min(b.ts) AS tk
        |  FROM base b JOIN c1 ON b.u = c1.u
        |  WHERE b.et = 'purchase' AND b.ts > c1.tk
        |    AND b.ts <= c1.t0 + 604800000000 GROUP BY b.u),
        |cnts AS (
        |  SELECT CAST(0 AS BIGINT) AS stage, 'view' AS event_type,
        |    (SELECT CAST(count(*) AS BIGINT) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'click',
        |    (SELECT CAST(count(*) AS BIGINT) FROM c1)
        |  UNION ALL SELECT 2, 'purchase',
        |    (SELECT CAST(count(*) AS BIGINT) FROM c2))
        |SELECT stage, event_type, n_users,
        |  CASE WHEN lag(n_users) OVER w IS NULL THEN CAST(1000000 AS BIGINT)
        |       WHEN lag(n_users) OVER w = 0 THEN CAST(0 AS BIGINT)
        |       ELSE n_users * 1000000 // lag(n_users) OVER w
        |  END AS conv_prev_ppm,
        |  CASE WHEN first_value(n_users) OVER w = 0 THEN CAST(0 AS BIGINT)
        |       ELSE n_users * 1000000 // first_value(n_users) OVER w
        |  END AS conv_first_ppm
        |FROM cnts WINDOW w AS (ORDER BY stage) ORDER BY stage""".stripMargin,

    "q374_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |coh AS (SELECT u, min(wk) AS cw FROM uw GROUP BY u),
        |cells AS (SELECT cw AS cohort_week, wk - cw AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM uw JOIN coh USING (u) GROUP BY 1, 2),
        |sizes AS (SELECT cohort_week, n_users AS c0 FROM cells
        |  WHERE week_offset = 0)
        |SELECT cohort_week, week_offset, n_users,
        |  n_users * 1000000 // c0 AS retained_ppm
        |FROM cells JOIN sizes USING (cohort_week)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "q375_calibration" ->
      s"""WITH d AS (SELECT
         |    least(len(list_filter(string_split(text,' '),
         |        x -> x IN ($stopsSqlList))) * 3000000
         |      // len(string_split(text,' ')), 1000000) AS prob_ppm,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         |  FROM documents),
         |bins AS (SELECT least(prob_ppm * 10 // 1000000, 9) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(sum(prob_ppm) AS BIGINT) AS conf_sum
         |  FROM d GROUP BY 1),
         |pb AS (SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
         |    conf_sum // n AS conf_ppm,
         |    n_pos * 1000000 // n AS acc_ppm FROM bins),
         |pb2 AS (SELECT *, abs(conf_ppm - acc_ppm) AS gap_ppm FROM pb),
         |e AS (SELECT CAST(sum(n * gap_ppm) AS BIGINT)
         |    // CAST(sum(n) AS BIGINT) AS ece_ppm FROM pb2)
         |SELECT bin, n, n_pos, conf_ppm, acc_ppm, gap_ppm, ece_ppm
         |FROM pb2, e ORDER BY bin""".stripMargin,

    "q376_label_kappa" ->
      s"""WITH d AS (SELECT $langVoteSql AS a, lang AS b FROM documents),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
         |  FROM d),
         |ma AS (SELECT a AS c, CAST(count(*) AS BIGINT) AS na FROM d GROUP BY 1),
         |mb AS (SELECT b AS c, CAST(count(*) AS BIGINT) AS nb FROM d GROUP BY 1),
         |pe AS (SELECT CAST(sum(coalesce(na, 0) * coalesce(nb, 0)) AS BIGINT)
         |    AS pe_num FROM ma FULL OUTER JOIN mb USING (c))
         |SELECT n, agree,
         |  agree * 1000000 // n AS po_ppm,
         |  pe_num * 1000000 // (n * n) AS pe_ppm,
         |  CASE WHEN n * n = pe_num THEN NULL
         |       ELSE (agree * n - pe_num) * 1000000 // (n * n - pe_num)
         |  END AS kappa_ppm
         |FROM tot, pe""".stripMargin,

    "q377_skew_profile" ->
      """WITH c AS (SELECT CAST(event_type AS VARCHAR) AS key,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        |SELECT key, n,
        |  n * 1000000 // total AS share_ppm,
        |  CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) % 32 AS bucket,
        |  (n * 32 + total - 1) // total AS salt_factor
        |FROM c, t ORDER BY n DESC, key LIMIT 10""".stripMargin,

    "q378_profile_pagerank" -> {
      val contrib = (p: String) =>
        s"""SELECT e.dst AS node,
           |    CAST(sum((850000 * p.pr // 1000000) * e.w // o.out_w)
           |      AS BIGINT) AS in_w
           |  FROM e JOIN outw o ON o.src = e.src
           |  JOIN $p p ON p.node = e.src GROUP BY e.dst""".stripMargin
      val step = (prev: String, cur: String) =>
        s"""$cur AS (SELECT nodes.node,
           |    150000 // nn.n + coalesce(c.in_w, 0) AS pr
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (${contrib(prev)}) c ON c.node = nodes.node)""".stripMargin
      val bkt = s"(${graft.ops.Dedup.h60Sql("w")}) % 256"
      s"""WITH prof AS (SELECT src, $bkt AS b, count(*) AS c FROM
         |  (SELECT source AS src, unnest(string_split(text, ' ')) AS w
         |   FROM documents) WHERE w <> '' GROUP BY 1, 2),
         |e AS (SELECT a.src AS src, b2.src AS dst,
         |    CAST(sum(a.c * b2.c) AS BIGINT) AS w
         |  FROM prof a JOIN prof b2 ON a.b = b2.b AND a.src <> b2.src
         |  GROUP BY 1, 2),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e
         |  GROUP BY src),
         |p0 AS (SELECT node, 1000000 // nn.n AS pr
         |  FROM nodes CROSS JOIN nn),
         |${step("p0", "p1")},
         |${step("p1", "p2")},
         |${step("p2", "p3")}
         |SELECT node, CAST(pr AS BIGINT) AS pr_ppm FROM p3
         |ORDER BY node""".stripMargin
    })
}
