package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.TimestampType

/** Named-table catalog over the harness parquet layout.
  *
  * Mirrors the reference's TableStore (name -> Table registry,
  * reference: src/table_store/table_store.h) re-expressed as a thin
  * resolver over partitioned parquet. At 100 TB the same API points at a
  * partitioned table (e.g. date-partitioned parquet / Delta); nothing in
  * the query layer changes because all access goes through `Tables(...)`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Batch scan of a named table. Column pruning + predicate pushdown are
    * delegated to the parquet datasource (verify with explain: PushedFilters).
    *
    * The event-time column `ts` is surfaced as LongType epoch-ns — exactly
    * the reference's TIME64NS convention (SURVEY §1.2): time is int64 ns
    * everywhere in the engine, converted only at edges. The on-disk layout
    * stores it as a parquet TIMESTAMP (µs precision; ns in older drops —
    * both normalize here), so the scan itself carries a timestamp column
    * and `NsEpochPushdown` folds engine-side ns predicates back onto it
    * to keep them inside the parquet reader's PushedFilters.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureTimeConfig(spark)
    nsView(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** int64-ns view of the event-time column. `withColumn` replaces in
    * place, so column order (and every downstream schema expectation) is
    * unchanged. Session tz is UTC, so unix_micros reinterprets the stored
    * wall-clock micros verbatim — no zone shift on either engine side.
    */
  private def nsView(df: DataFrame): DataFrame =
    if (df.schema.fields.exists(f => f.name == "ts" && f.dataType == TimestampType))
      df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    else df

  /** Per-session time handling, set once on first table resolve:
    *  - parquet TIMESTAMP(NANOS) (older data drops) reads as LongType ns;
    *  - parquet timestamps without the UTC-adjusted flag read as
    *    TimestampType (not NTZ) so epoch extraction is expressible and the
    *    TPC-H date columns keep their TIMESTAMP-typed relation contract;
    *  - the NsEpochPushdown optimizer rule is registered so ns-literal
    *    range predicates over the `ts` ns-view still prune at the scan.
    */
  private def ensureTimeConfig(spark: SparkSession): Unit = {
    val nanosK = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(nanosK).contains("true")) spark.conf.set(nanosK, "true")
    val ntzK = "spark.sql.parquet.inferTimestampNTZ.enabled"
    if (!spark.conf.getOption(ntzK).contains("false")) spark.conf.set(ntzK, "false")
    if (!spark.experimental.extraOptimizations.contains(graft.plans.NsEpochPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.NsEpochPushdown
  }

  /** Streaming tail of a named table — the analog of PxL df.stream()
    * (reference: src/carnot/planner/objects/dataframe.h:404-420). The file
    * source replays existing data then tails new files; in production this
    * would be Kafka or a Delta streaming source behind the same name.
    */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureTimeConfig(spark)
    val schema = spark.read.parquet(s"$dir/$name.parquet").schema
    // FileStreamSource requires a directory base path; a {name} glob keeps
    // the parent dir as base while matching just this table's file.
    nsView(spark.readStream.schema(schema).parquet(s"$dir/{$name}.parquet"))
  }
}
