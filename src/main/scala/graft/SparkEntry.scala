package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PxTable
import graft.functions.PixieFunctions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The canonical reference workload shape
    * (src/pxl_scripts/px/http_request_stats/stats.pxl): time-range scan ->
    * px.bin tumbling window -> two-level group-by aggregation -> self-join
    * of the per-window totals -> map (rate/share) -> filter -> capped,
    * time-ordered result.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = PxTable.timeRange(spark, dir, "events", "ts", "2024-01-01", "2024-02-01")
      .withCol("bucket", timeBinNs(col("ts"), 3600))
    val perType = ev.groupbyAgg(Seq("bucket", "event_type"),
      "n" -> count(lit(1)),
      "sum_value" -> sum(col("value")))
    val perBucket = perType.groupbyAgg(Seq("bucket"),
      "total" -> sum(col("n")))
    perType.merge(perBucket, "inner", Seq("bucket"), Seq("bucket"))
      .withCol("share", col("n").cast("double") / col("total"))
      .where(col("n") > 0)
      .orderedByTime("bucket", "event_type")
      .resultCap()
      .df
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++ graft.queries.Functions.queries ++
      graft.queries.NorthStar.queries ++ graft.queries.Meta.queries ++
      graft.queries.Surface.queries ++ graft.queries.Ml.queries ++
      graft.queries.Extended.queries ++ graft.queries.Pxl.queries ++
      graft.queries.Pxl2.queries ++ graft.queries.Pxl3.queries ++
      graft.queries.Pxl4.queries ++ graft.queries.Pxl5.queries ++
      graft.queries.Pxl6.queries ++ graft.queries.Pxl7.queries ++
      graft.queries.Pxl8.queries ++ graft.queries.Pxl9.queries ++
      graft.queries.Pxl10.queries ++ graft.queries.Pxl11.queries ++
      graft.queries.Pxl12.queries ++ graft.queries.Pxl13.queries ++ graft.queries.Pxl14.queries ++ graft.queries.Pxl15.queries ++ graft.queries.Pxl16.queries ++
      graft.queries.Curation.queries ++ graft.queries.Curation2.queries ++
      graft.queries.Curation3.queries ++ graft.queries.Curation4.queries ++
      graft.queries.Curation5.queries ++ graft.queries.Curation6.queries ++
      graft.queries.Curation7.queries ++ graft.queries.Curation8.queries ++
      graft.queries.Curation9.queries ++ graft.queries.Curation10.queries ++
      graft.queries.Curation11.queries ++ graft.queries.Curation12.queries ++
      graft.queries.Curation13.queries ++ graft.queries.Curation14.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++ graft.queries.Functions.oracles ++
      graft.queries.NorthStar.oracles ++ graft.queries.Meta.oracles ++
      graft.queries.Surface.oracles ++ graft.queries.Ml.oracles ++
      graft.queries.Extended.oracles ++ graft.queries.Pxl.oracles ++
      graft.queries.Pxl2.oracles ++ graft.queries.Pxl3.oracles ++
      graft.queries.Pxl4.oracles ++ graft.queries.Pxl5.oracles ++
      graft.queries.Pxl6.oracles ++ graft.queries.Pxl7.oracles ++
      graft.queries.Pxl8.oracles ++ graft.queries.Pxl9.oracles ++
      graft.queries.Pxl10.oracles ++ graft.queries.Pxl11.oracles ++
      graft.queries.Pxl12.oracles ++ graft.queries.Pxl13.oracles ++ graft.queries.Pxl14.oracles ++ graft.queries.Pxl15.oracles ++ graft.queries.Pxl16.oracles ++
      graft.queries.Curation.oracles ++ graft.queries.Curation2.oracles ++
      graft.queries.Curation3.oracles ++ graft.queries.Curation4.oracles ++
      graft.queries.Curation5.oracles ++ graft.queries.Curation6.oracles ++
      graft.queries.Curation7.oracles ++ graft.queries.Curation8.oracles ++
      graft.queries.Curation9.oracles ++ graft.queries.Curation10.oracles ++
      graft.queries.Curation11.oracles ++ graft.queries.Curation12.oracles ++
      graft.queries.Curation13.oracles ++ graft.queries.Curation14.oracles
}
