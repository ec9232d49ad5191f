package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality assertion suite — the dbt/Great-Expectations-style
  * check layer a pipeline runs before promoting a snapshot: not-null,
  * uniqueness, accepted ranges, and referential integrity, each
  * reported as one (check, target, n_violations, n_total, pass) row.
  * All counts are exact keyed aggregates; a full suite over N tables
  * is N scans regardless of how many checks share a table's frame
  * (Catalyst collapses same-frame checks into shared scans under the
  * union).
  */
object Quality {

  private def report(check: String, target: String, violations: Column,
                     df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n_total"),
        sum(violations.cast("long")).as("n_violations"))
      .select(lit(check).as("check"), lit(target).as("target"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        col("n_total"),
        (coalesce(col("n_violations"), lit(0L)) === 0).as("pass"))

  /** Rows where `colName` is null. */
  def notNull(df: DataFrame, table: String, colName: String): DataFrame =
    report("not_null", s"$table.$colName", col(colName).isNull, df)

  /** Rows beyond the first occurrence of their key tuple (0 iff the
    * key is unique); counted via one key-keyed aggregate.
    */
  def unique(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val dups = df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .select((col("__c") - 1).as("__extra"))
    dups.agg(sum(col("__extra")).as("n_violations"),
        (sum(col("__extra")) + count(lit(1))).as("n_total"))
      .select(lit("unique").as("check"),
        lit(s"$table.(${cols.mkString(",")})").as("target"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        coalesce(col("n_total"), lit(0L)).as("n_total"),
        (coalesce(col("n_violations"), lit(0L)) === 0).as("pass"))
  }

  /** Rows whose value falls outside the CLOSED range [lo, hi] (nulls
    * count as violations — a range check implies presence).
    */
  def acceptedRange(df: DataFrame, table: String, colName: String,
                    lo: Double, hi: Double): DataFrame =
    report("accepted_range", s"$table.$colName",
      col(colName).isNull || col(colName) < lo || col(colName) > hi, df)

  /** Child rows whose key has no match in the parent (orphans); null
    * child keys are orphans too. One left join keyed by the key —
    * broadcast-eligible when the parent key set is dimension-sized.
    */
  def referential(child: DataFrame, childTable: String, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
      .withColumn("__hit", lit(1L))
    report("referential", s"$childTable.$childKey",
      col("__hit").isNull,
      child.select(col(childKey).as("__pk")).join(p, Seq("__pk"), "left"))
  }

  /** Union a suite of check reports into the promotion gate table. */
  def suite(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
