package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared zero-filled keyed-grid scaffolding behind every
  * time-bucketed series op ([[Events]] count grids, [[Alerts]] rate
  * grids): given per-(key, bucket) aggregate cells, fill the GLOBAL
  * [min, max] bucket range for every key with zeros — one place for
  * the grid contract, so the Spark ops and their DuckDB grid CTEs
  * can't drift copy-by-copy.
  *
  * Scale: the grid is (#keys x #buckets) — TIME-bound, not
  * data-bound; the range/keys frames are broadcast 1-row / O(#keys).
  * Appends `__N` = grid width (b1 - b0 + 1) on every row for
  * consumers that need the bucket count.
  */
private[ops] object Grids {

  def zeroFill(cells: DataFrame, keyCol: String, binCol: String,
               fillCols: Seq[String]): DataFrame = {
    val rng = cells.agg(min(col(binCol)).as("__b0"),
      max(col(binCol)).as("__b1"))
    val grid = cells.select(keyCol).distinct().crossJoin(broadcast(rng))
      .select(col(keyCol),
        explode(sequence(col("__b0"), col("__b1"))).as(binCol))
    grid.join(cells, Seq(keyCol, binCol), "left")
      .na.fill(0L, fillCols)
      .crossJoin(broadcast(
        rng.select((col("__b1") - col("__b0") + 1).as("__N"))))
  }
}
