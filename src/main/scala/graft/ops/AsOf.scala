package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins Spark lacks as built-ins: backward as-of join and
  * bounded range join. Both are expressed as ONE equi-shuffle keyed by
  * the join keys — never a broadcast-nested-loop or cartesian — so they
  * hold at any corpus size; the as-of variant is the batch analog of
  * the point-in-time metadata resolution the streaming path does in
  * [[graft.meta.K8sMetadata]].
  */
object AsOf {

  /** Backward as-of join: each left row picks up the value columns of
    * the LATEST right row with the same keys and `rightTime` <=
    * `leftTime` (inclusive), or nulls when none precedes it.
    *
    * Implementation: union both sides tagged, one window sorted by
    * (time, side, tieBreak) per key group, `last(_, ignoreNulls)` over
    * the unbounded-preceding frame — a single shuffle + sort on the
    * keys, the standard distributed as-of shape. Right rows sort before
    * left rows at equal time (inclusive semantics); among right rows at
    * the exact same time the GREATEST `tieBreak` value wins, so results
    * are deterministic under any partitioning.
    *
    * The back-fill carries ONE struct of all right value columns, not
    * one window per column: every right_* output column comes from the
    * same (latest) right row, so a NULL inside that row stays NULL
    * instead of being back-filled from an older row — the DuckDB
    * ASOF JOIN row semantics, never chimera rows.
    *
    * Right's non-key columns are emitted prefixed with `rightPrefix`.
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   rightPrefix: String = "right_",
                   tieBreak: Option[String] = None): DataFrame = {
    val lVals = left.columns.filterNot(keys.contains).toSeq
    val rVals = right.columns.filterNot(keys.contains).toSeq
    val tie = tieBreak.getOrElse(rightTime)
    val rStructType = org.apache.spark.sql.types.StructType(
      rVals.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(right.schema(tie).dataType).as("__tie")) ++
        lVals.map(col) :+
        lit(null).cast(rStructType).as("__r"): _*)
    val r2 = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"),
        col(tie).as("__tie")) ++
        lVals.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rVals.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(keys.map(col) ++ lVals.map(col) ++
        rVals.map(c => col("__r").getField(c).as(rightPrefix + c)): _*)
  }

  /** Bounded range join: all (left, right) pairs with equal keys and
    * `rightTime` in [leftTime - before, leftTime + after].
    *
    * Implementation: time-bucketing with width `before + after` — each
    * right row is emitted to the (at most two) buckets any matching
    * left row can occupy, the join is a pure equi-join on
    * (keys, bucket) with the exact range as a post-filter. Duplicate
    * (bucket k, bucket k+1) matches are impossible because each left
    * row reads ONE bucket. Never quadratic: candidate volume is bounded
    * by true matches per bucket, the knob a 100 TB run tunes via the
    * window width itself.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                before: Long, after: Long,
                rightPrefix: String = "right_"): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      "window [leftTime-before, leftTime+after] must be non-empty")
    val w = before + after
    // All bucket math in exact int64 (`div`) — double division corrupts
    // epoch-ns-scale longs past 2^53.
    def bucket(c: org.apache.spark.sql.Column) =
      graft.functions.PixieFunctions.idiv(c.cast("long"), w)
    val rVals = right.columns.filterNot(keys.contains).toSeq
    val l2 = left.withColumn("__b", bucket(col(leftTime)))
    val r2 = right.select(
        keys.map(col) ++ rVals.map(c => col(c).as(rightPrefix + c)) :+
          explode(array_distinct(array(
            bucket(col(rightTime) - after),
            bucket(col(rightTime) + before)))).as("__b"): _*)
    l2.join(r2, keys :+ "__b")
      .where(col(rightPrefix + rightTime)
        .between(col(leftTime) - before, col(leftTime) + after))
      .drop("__b")
  }
}
