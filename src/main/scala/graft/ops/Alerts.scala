package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PixieFunctions.idiv

/** Alerting-layer analytics over a keyed event stream — the
  * detection ladder an observability platform runs ON TOP of its
  * metric queries (reference scope: pixie's alert-feeding PxL scripts
  * compute exactly these rate/ratio series; the hysteresis/burn/apdex
  * layer is the standard consumer). Everything follows the
  * [[Corpus]] exactness rules: integer ppm rates, zero-filled
  * TIME-bound bucket grids, no interpolation — so alert decisions are
  * bit-reproducible across engines, which is what makes an alerting
  * backtest trustworthy.
  *
  * Scale shape (shared by every op here): one keyed aggregate to the
  * (key, bucket) grid, windows ONLY over that grid — whose size is
  * bounded by the time span, never by event volume.
  */
object Alerts {

  /** Zero-filled per-key error-rate grid: `(k, b, n, n_err, err_ppm)`
    * over the GLOBAL bucket range — the series every detector below
    * consumes. `isError` marks the bad events (e.g.
    * `col("event_type") === "error"`).
    */
  def errorRates(df: DataFrame, keyCol: String, tsCol: String,
                 isError: Column, binUs: Long): DataFrame = {
    require(binUs > 0, "errorRates: binUs > 0")
    val counts = df.select(col(keyCol).as("k"),
        idiv(graft.functions.PixieFunctions.nsToUs(col(tsCol)),
          lit(binUs)).as("b"),
        isError.cast("long").as("e"))
      .groupBy("k", "b")
      .agg(count(lit(1)).as("n"), sum(col("e")).as("n_err"))
    Grids.zeroFill(counts, "k", "b", Seq("n", "n_err"))
      .drop("__N")
      .withColumn("err_ppm",
        when(col("n") > 0, idiv(col("n_err") * 1000000L, col("n")))
          .otherwise(lit(0L)))
  }

  /** Threshold alerting WITH HYSTERESIS over an error-rate grid: the
    * alert turns ON when the rate exceeds `hiPpm` and OFF only when it
    * falls to `loPpm` or below — rates in the dead band keep the prior
    * state, so a series oscillating around one threshold cannot flap.
    * The state recurrence is window-expressible: each bucket's signal
    * is up (+1), down (0), or neutral (null), and the state is the
    * LAST non-null signal so far (`last(..., ignoreNulls)` over the
    * per-key ordered grid) — no iterative scan, no UDF state.
    *
    * Output per (k, b): the rate, `alert` (0/1), and the `fired` /
    * `cleared` edge flags a notifier consumes.
    */
  def alertHysteresis(rates: DataFrame, hiPpm: Long,
                      loPpm: Long): DataFrame = {
    require(loPpm <= hiPpm, "alertHysteresis: loPpm <= hiPpm")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("k").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val signal = when(col("err_ppm") > hiPpm, lit(1L))
      .when(col("err_ppm") <= loPpm, lit(0L))
    val st = rates.withColumn("alert",
      coalesce(last(signal, ignoreNulls = true).over(w), lit(0L)))
    val wl = Window.partitionBy("k").orderBy("b")
    st.withColumn("__prev", coalesce(lag(col("alert"), 1).over(wl), lit(0L)))
      .select(col("k"), col("b"), col("n"), col("n_err"), col("err_ppm"),
        col("alert"),
        (col("alert") === 1 && col("__prev") === 0).cast("long").as("fired"),
        (col("alert") === 0 && col("__prev") === 1).cast("long").as("cleared"))
  }

  /** Multi-window SLO burn rate over an error-rate grid: for each
    * trailing window length (in buckets), the rate at which the error
    * budget `1 - slo` burns — `burn_x100 = 100 * windowed_err_rate /
    * budget` (integer, x100 so burn 1.0 = "exactly on budget" = 100).
    * The standard page rule reads two windows at once (fast + slow
    * both burning hot); this emits one column per requested window so
    * that conjunction is a WHERE clause.
    */
  def burnRate(rates: DataFrame, sloPpm: Long,
               windows: Seq[Int]): DataFrame = {
    require(sloPpm < 1000000L, "burnRate: slo must leave a budget")
    import org.apache.spark.sql.expressions.Window
    val budgetPpm = 1000000L - sloPpm
    val ord = Window.partitionBy("k").orderBy("b")
    windows.foldLeft(rates) { (acc, wlen) =>
      val f = ord.rowsBetween(-(wlen - 1), Window.currentRow)
      acc
        .withColumn(s"__e$wlen", sum(col("n_err")).over(f))
        .withColumn(s"__n$wlen", sum(col("n")).over(f))
        .withColumn(s"burn${wlen}_x100",
          when(col(s"__n$wlen") > 0,
            idiv(col(s"__e$wlen") * 100000000L,
              col(s"__n$wlen") * budgetPpm))
            .otherwise(lit(0L)))
        .drop(s"__e$wlen", s"__n$wlen")
    }.select(col("k") +: col("b") +: col("err_ppm") +:
      windows.map(wl => col(s"burn${wl}_x100")): _*)
  }

  /** Apdex score per (key, bucket): `(satisfied + tolerating/2) / n`
    * with the standard T / 4T latency thresholds, kept exact as
    * `(2*sat + tol) * 1e6 // (2*n)` ppm. Latencies compare in integer
    * cents (`round(value*100)`), so the threshold test is identical in
    * every engine.
    */
  def apdex(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
            tCents: Long, binUs: Long): DataFrame = {
    require(tCents > 0 && binUs > 0, "apdex: tCents > 0, binUs > 0")
    val cents = round(col(valCol) * lit(100.0)).cast("long")
    df.select(col(keyCol).as("k"),
        idiv(graft.functions.PixieFunctions.nsToUs(col(tsCol)),
          lit(binUs)).as("b"),
        cents.as("c"))
      .groupBy("k", "b")
      .agg(count(lit(1)).as("n"),
        sum((col("c") <= tCents).cast("long")).as("n_satisfied"),
        sum((col("c") > tCents && col("c") <= 4 * tCents).cast("long"))
          .as("n_tolerating"))
      .withColumn("apdex_ppm",
        idiv((col("n_satisfied") * 2 + col("n_tolerating")) * 1000000L,
          col("n") * 2))
  }

  /** Latency heatmap: counts on a (key, time bucket, value bucket)
    * grid — the density behind every latency-heatmap dashboard panel.
    * Value buckets are `cents // cellCents` capped at `maxBucket`
    * (the overflow row), so the output is O(keys x time buckets x
    * (maxBucket+1)) whatever the event volume; share is ppm of the
    * (key, time-bucket) column total.
    */
  def latencyHeatmap(df: DataFrame, keyCol: String, tsCol: String,
                     valCol: String, binUs: Long, cellCents: Long,
                     maxBucket: Int): DataFrame = {
    // cellCents = 0 would NULL the division and least() would silently
    // dump EVERY event into the overflow bucket — refuse loudly
    require(cellCents > 0 && binUs > 0 && maxBucket >= 0,
      "latencyHeatmap: cellCents > 0, binUs > 0, maxBucket >= 0")
    val cents = round(col(valCol) * lit(100.0)).cast("long")
    val cell = df.select(col(keyCol).as("k"),
        idiv(graft.functions.PixieFunctions.nsToUs(col(tsCol)),
          lit(binUs)).as("b"),
        least(idiv(cents, lit(cellCents)), lit(maxBucket.toLong)).as("vb"))
      .groupBy("k", "b", "vb").agg(count(lit(1)).as("n"))
    val tot = cell.groupBy("k", "b").agg(sum(col("n")).as("__t"))
    cell.join(tot, Seq("k", "b"))
      .select(col("k"), col("b"), col("vb"), col("n"),
        idiv(col("n") * 1000000L, col("__t")).as("share_ppm"))
  }
}
