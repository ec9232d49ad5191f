package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event analytics over a `(user, event_type, ts)` stream —
  * the product-analytics operators an observability platform runs next
  * to its infra queries (funnels, retention cohorts). Reference scope:
  * pixie's event tables expose exactly this shape through PxL
  * (`src/carnot/docstring` examples group http_events by attributes and
  * time); the funnel/retention layer is the standard downstream read.
  *
  * Scale design: everything is keyed by user — per-stage min-aggregates
  * and user-keyed joins, so a 100 TB event log shuffles each stage's
  * MATCHING events once on `user`, never materializes per-user event
  * arrays, and the outputs are O(#stages) / O(#cohorts x #offsets).
  *
  * Determinism contract ([[Corpus]] rules): timestamp comparisons and
  * counts only; ratios are ppm-quantized integer divisions
  * (`a * 1000000 div b`) so every engine computes the identical value.
  */
object Events {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Strict ordered funnel: a user converts to stage k when an event of
    * `stages(k)` exists STRICTLY AFTER their stage-(k-1) conversion and
    * within `windowSec` of their stage-0 entry (the classic "complete
    * the journey within N days" constraint; stage 0 has no window).
    *
    * Output: one row per stage — `stage` (0-based), `event_type`,
    * `n_users`, ppm conversion vs previous stage and vs stage 0.
    *
    * Shape: one filtered scan per stage, each aggregated to one row per
    * user BEFORE the user-keyed equi-join with the previous stage's
    * conversions — the join inputs are already user-unique, so fan-out
    * is impossible and the widest shuffle is |users| rows. The
    * stage-k result reuses the stage-(k-1) frame (a linear chain, not
    * k self-joins of the raw log).
    */
  def funnel(df: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String],
             windowSec: Long): DataFrame = {
    require(stages.nonEmpty, "funnel: at least one stage")
    // epoch-micros longs end-to-end: comparisons and the window bound
    // are integer arithmetic, identical in any engine (no interval
    // types, no timezone re-interpretation). Input is the engine's
    // TIME64NS convention (epoch-ns long, [[graft.core.Tables]]).
    val base = df.select(col(userCol).as("u"), col(typeCol).as("et"),
      graft.functions.PixieFunctions.nsToUs(col(tsCol)).as("ts"))
    // stage 0: first entry per user
    val s0 = base.where(col("et") === stages.head)
      .groupBy("u").agg(min(col("ts")).as("t0"))
    // chain: conv(k) = min ts of stage-k events STRICTLY after t(k-1),
    // within window of t0; each step carries (u, t0, tk). Stage k's
    // lineage contains the whole k-step chain (k is the funnel length,
    // 3-5 — the re-scan cost is k filtered scans of the log, each
    // pruned to one event_type before its user-keyed aggregate).
    val convs = stages.zipWithIndex.tail.scanLeft(
        s0.select(col("u"), col("t0"), col("t0").as("tk"))) {
      case (prev, (st, _)) =>
        base.where(col("et") === st)
          .join(prev, "u")
          .where(col("ts") > col("tk") &&
            col("ts") <= col("t0") + lit(windowSec * 1000000L))
          .groupBy("u").agg(min(col("t0")).as("t0"), min(col("ts")).as("tk"))
    }
    val counts = convs.zip(stages).zipWithIndex.map {
      case ((c, st), i) =>
        c.agg(count(lit(1)).as("n_users"))
          .select(lit(i.toLong).as("stage"), lit(st).as("event_type"),
            col("n_users").cast("long").as("n_users"))
    }.reduce(_.unionByName(_))
    // single tiny frame (|stages| rows): a window over it is fine —
    // the single-partition exchange moves k rows, not data
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
    val first = first_value(col("n_users")).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    val prev = lag(col("n_users"), 1).over(w)
    counts.select(col("stage"), col("event_type"), col("n_users"),
      when(prev.isNull, lit(1000000L))
        .otherwise(when(prev === 0, lit(0L))
          .otherwise(idiv(col("n_users") * 1000000L, prev)))
        .as("conv_prev_ppm"),
      when(first === 0, lit(0L))
        .otherwise(idiv(col("n_users") * 1000000L, first))
        .as("conv_first_ppm"))
  }

  /** Weekly retention cohort matrix: users are cohorted by the epoch
    * week (`floor(unix_seconds / 604800)`) of their FIRST event; each
    * (cohort, week-offset) cell counts the distinct users active that
    * week. `retained_ppm` is the cell vs the cohort's own size
    * (offset 0 is 1e6 by construction).
    *
    * Shape: one scan -> (user, week) distinct pairs -> a user-keyed
    * min-aggregate for the cohort -> one user-keyed join back -> a
    * (cohort, offset)-keyed count. Epoch-week arithmetic (not
    * date_trunc) keeps the bucketing engine-independent.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val uw = df.select(col(userCol).as("u"),
        idiv(graft.functions.PixieFunctions.nsToUs(col(tsCol)),
          lit(604800L * 1000000L)).as("wk"))
      .distinct()
    val cohort = uw.groupBy("u").agg(min(col("wk")).as("cw"))
    val cells = uw.join(cohort, "u")
      .groupBy(col("cw").as("cohort_week"),
        (col("wk") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.where(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("__c0"))
    cells.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        idiv(col("n_users") * 1000000L, col("__c0")).as("retained_ppm"))
  }
}
