package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Events, Quality, Scale}
import graft.queries.Q._

/** Round-9 batch: the HLL twin of the incremental-distinct state
  * (q454's approximate sibling — per-shard sketches folded
  * register-wise at a fraction of the state size), gap-based
  * sessionization (the session TABLE itself, the pre-step for every
  * session-level feature), and the winsorized robust mean (exact
  * order-statistic capping). Oracles follow the house exactness rules:
  * integer cents/ranks end-to-end, ONE final double formula, zero-sign
  * normalized ([[graft.core.Exact]]).
  */
object Curation7 {

  val queries: Map[String, QFn] = Map(

    // HLL distinct-state fold: bootstrap sketches from the snapshot,
    // fold two disjoint deltas in BOTH orders (each through a persisted
    // round-trip), and report the calibration row: the exact
    // cardinality (oracle-checked), the 5%-tolerance contract on the
    // folded estimate, and fold-order invariance (register-wise max is
    // batch-invariant; the HIP estimator a one-pass sketch serves is
    // not — the q440 caveat — so the pin is fold-vs-fold, never
    // fold-vs-one-pass).
    "q455_hll_distinct_fold" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_id").isNotNull && col("user_id").isNotNull)
      val snap = ev.where(pmod(col("event_id"), lit(5L)) =!= 0)
      val d1 = ev.where(pmod(col("event_id"), lit(10L)) === 0)
      val d2 = ev.where(pmod(col("event_id"), lit(10L)) === 5)
      val p0 = Curation2.tempIndexDir("graft_hll_a_")
      val p12 = Curation2.tempIndexDir("graft_hll_b_")
      val p21 = Curation2.tempIndexDir("graft_hll_c_")
      try {
        Scale.writeHllState(snap, "event_type", "user_id", 16, p0)
        Scale.foldHllState(s, p0, d1, "event_type", "user_id", 16)
          .write.parquet(s"$p12/sketches")
        val est12 = Scale.hllEstimate(
          Scale.foldHllState(s, p12, d2, "event_type", "user_id", 16),
          "event_type")
        Scale.foldHllState(s, p0, d2, "event_type", "user_id", 16)
          .write.parquet(s"$p21/sketches")
        val est21 = Scale.hllEstimate(
          Scale.foldHllState(s, p21, d1, "event_type", "user_id", 16),
          "event_type")
        val exact = ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        exact
          .join(est12.select(col("event_type"),
            col("n_unique_est").as("__e12")), "event_type")
          .join(est21.select(col("event_type"),
            col("n_unique_est").as("__e21")), "event_type")
          .select(col("event_type"), col("n_exact"),
            (abs(col("__e12") - col("n_exact")) * 20L <= col("n_exact"))
              .as("est_err_ok"),
            (col("__e12") === col("__e21")).as("fold_order_invariant"))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally {
        Curation2.deleteDir(p0); Curation2.deleteDir(p12)
        Curation2.deleteDir(p21)
      }
    }),

    // 30-minute gap sessions per user — one row per session.
    "q456_sessionize" -> ((s, dir) =>
      Events.sessionize(t(s, dir, "events"), "user_id", "ts", 1800000000L)
        .orderBy("user_id", "session_id")),

    // Winsorized mean of value per event type, capped at the exact
    // [p05, p95] cent order statistics.
    "q457_winsorized_mean" -> ((s, dir) =>
      Quality.winsorizedMean(
          t(s, dir, "events").where(col("event_type").isNotNull),
          "event_type", col("value"))
        .orderBy("event_type")))

  val oracles: Map[String, String] = Map(

    "q455_hll_distinct_fold" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
        |  true AS est_err_ok, true AS fold_order_invariant
        |FROM events
        |WHERE event_id IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q456_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events
        |  WHERE user_id IS NOT NULL),
        |m AS (SELECT user_id, tus,
        |    CASE WHEN tus - lag(tus)
        |        OVER (PARTITION BY user_id ORDER BY tus) <= 1800000000
        |      THEN 0 ELSE 1 END AS new_s
        |  FROM e),
        |s AS (SELECT user_id, tus,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY tus
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
        |  min(tus) AS start_us, max(tus) AS end_us,
        |  max(tus) - min(tus) AS dur_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin,

    "q457_winsorized_mean" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |k AS (SELECT g, c, CAST(count(*) AS BIGINT) AS k FROM v
        |  GROUP BY 1, 2),
        |ct AS (SELECT g, c, k,
        |    CAST(sum(k) OVER (PARTITION BY g ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    CAST(sum(k) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM k),
        |b AS (SELECT g, max(n) AS n,
        |    min(CASE WHEN cum >= (n * 50000 + 999999) // 1000000
        |      THEN c END) AS lo,
        |    min(CASE WHEN cum >= (n * 950000 + 999999) // 1000000
        |      THEN c END) AS hi
        |  FROM ct GROUP BY g)
        |SELECT k.g AS event_type, b.n, b.lo AS lo_cents,
        |  b.hi AS hi_cents,
        |  round(CAST(sum(k.k * k.c) AS DOUBLE) / 100.0 / b.n, 6) + 0.0
        |    AS mean_raw,
        |  round(CAST(sum(k.k * greatest(least(k.c, b.hi), b.lo))
        |    AS DOUBLE) / 100.0 / b.n, 6) + 0.0 AS mean_winsorized
        |FROM k JOIN b ON k.g = b.g
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin)
}
