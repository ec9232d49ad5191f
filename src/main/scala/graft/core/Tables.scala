package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * Parquet TIMESTAMP(NANOS) columns (events.ts) are read as LongType
    * epoch-ns — exactly the reference's TIME64NS convention (SURVEY §1.2):
    * time is int64 ns everywhere in the engine, converted only at edges.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosAsLong(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** TIMESTAMP(NANOS) -> LongType needs this legacy flag; set it once per
    * session instead of mutating RuntimeConfig on every table resolve.
    */
  private def ensureNanosAsLong(spark: SparkSession): Unit = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(k).contains("true")) spark.conf.set(k, "true")
  }

  /** Streaming tail of a named table — the analog of PxL df.stream()
    * (reference: src/carnot/planner/objects/dataframe.h:404-420). The file
    * source replays existing data then tails new files; in production this
    * would be Kafka or a Delta streaming source behind the same name.
    */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val schema = apply(spark, dir, name).schema
    // FileStreamSource requires a directory base path; a {name} glob keeps
    // the parent dir as base while matching just this table's file.
    spark.readStream.schema(schema).parquet(s"$dir/{$name}.parquet")
  }
}
