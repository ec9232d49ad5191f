package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-engineering diagnostics — operators whose OUTPUT is advice
  * about how a dataset will behave on a large cluster. At 100 TB the
  * difference between a 20-minute and a 20-hour job is usually one
  * skewed key; this profiler is the measurement that decision needs,
  * run as a cheap keyed aggregate ahead of the expensive join/agg.
  */
object Scale {

  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Hot-key profile for a prospective shuffle key: the top-k heaviest
    * keys with their corpus share, the hash bucket each lands in under
    * `partitions`-way hash partitioning (the engine-independent
    * [[Dedup.h60]] hash, so the report is reproducible anywhere), and
    * the salt factor that would level each key — `ceil(n_key *
    * partitions / total)`, i.e. how many sub-partitions this key needs
    * so no split exceeds the average partition's row budget. A key
    * with salt 1 is harmless; salt 40 means "this key alone overflows
    * 40 average partitions — salt it or AQE-skew-split it".
    *
    * Shape: ONE key-keyed count aggregate (map-side combinable), a
    * broadcast 1-row total, and a top-k (TakeOrdered — no global
    * sort). Output is O(k) at any input size.
    */
  def skewProfile(df: DataFrame, keyCol: String, topK: Int,
                  partitions: Int): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        idiv(col("n") * 1000000L, col("__total")).as("share_ppm"),
        pmod(Dedup.h60(col("key")), lit(partitions.toLong)).as("bucket"),
        idiv(col("n") * partitions + col("__total") - 1L, col("__total"))
          .as("salt_factor"))
      .orderBy(col("n").desc, col("key"))
      .limit(topK)
  }
}
