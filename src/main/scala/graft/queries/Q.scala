package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers keeping the Spark query and its DuckDB oracle in
  * lockstep. Pattern: every floating-point aggregate is quantized to 1e-6
  * BEFORE summation (per-row IEEE ops are deterministic and identical in
  * both engines; the integer sum is exact and order-independent), so
  * results hash-match regardless of partitioning / summation order — at
  * any scale factor.
  */
object Q {
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.core.Tables(s, dir, name)

  /** Order-independent exact sum of a double column (quantized at 1e-6). */
  def qsum(c: Column): Column =
    sum(floor(c * lit(1000000.0) + lit(0.5))) / lit(1000000.0)
  def qsumSql(x: String): String =
    s"SUM(CAST(floor($x * 1000000.0 + 0.5) AS BIGINT)) / 1000000.0"

  /** Order-independent mean built from the quantized sum. */
  def qavg(c: Column): Column = qsum(c) / count(c)
  def qavgSql(x: String): String = s"(${qsumSql(x)}) / COUNT($x)"

  /** Spread CPU-heavy per-row work across cores ONLY when the scan
    * arrives under-parallel (the single-row-group fixture parquet scans
    * as 1 partition). At 100 TB the scan is already thousands of
    * partitions and an unconditional repartition would be a gratuitous
    * full shuffle of the fact table — so this is a no-op there.
    */
  def spreadIfNarrow(s: SparkSession, df: DataFrame): DataFrame = {
    val cores = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
