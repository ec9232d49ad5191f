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

  /** K-anonymity audit: quasi-identifier combinations observed for
    * fewer than k distinct subjects — the re-identification risk
    * report a release gate runs before publishing event-level data
    * (Sweeney 2002). Emits one row per VIOLATING combination with its
    * subject and row counts; an empty result means the projection is
    * k-anonymous as-is.
    *
    * Scale: one aggregate keyed by the QI tuple (count-distinct over
    * subjects inside each group is Spark's two-level partial
    * aggregate); output is bounded by the violating combinations, not
    * the data.
    */
  def kAnonymity(df: DataFrame, subjectCol: String, qiCols: Seq[String],
                 k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "kAnonymity: QI cols and k >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(countDistinct(col(subjectCol)).as("n_subjects"),
        count(lit(1)).as("n_rows"))
      .where(col("n_subjects") < k)
  }

  /** Benford first-significant-digit audit per group: observed digit
    * share (ppm) vs the Benford expectation log10(1 + 1/d) — the
    * fabricated-numbers screen for ingested numeric feeds. The
    * leading digit comes from a fixed threshold LADDER over
    * [0.001, 10000) (identical IEEE comparisons in every engine — no
    * log10/floor boundary hazards); values outside the ladder or
    * non-positive are excluded from the digit population. Expected
    * shares are precomputed ppm literals, so dev_ppm is exact integer
    * arithmetic end-to-end. One keyed aggregate; 9 rows per group.
    */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val digit = Seq(1000.0, 100.0, 10.0, 1.0, 0.1, 0.01, 0.001)
      .foldLeft(lit(null).cast("long")) { (acc, scale) =>
        when(v >= scale && v < scale * 10, floor(v / scale).cast("long"))
          .otherwise(acc)
      }
    val digits = df.where(v.isNotNull && v > 0)
      .select(col(groupCol).as("grp"), digit.as("d"))
      .where(col("d").isNotNull)
    val totals = digits.groupBy("grp").agg(count(lit(1)).as("__n"))
    digits.groupBy("grp", "d").agg(count(lit(1)).as("n"))
      .join(totals, "grp")
      .select(col("grp"), col("d"), col("n"),
        graft.functions.PixieFunctions.idiv(col("n") * 1000000L, col("__n"))
          .as("share_ppm"),
        benfordPpm(col("d")).as("benford_ppm"))
      .withColumn("dev_ppm", col("share_ppm") - col("benford_ppm"))
  }

  /** round(log10(1 + 1/d) * 1e6) for d = 1..9 — fixed literals shared
    * with the oracle SQL (no runtime logarithms on either side).
    */
  val benfordPpmTable: Seq[Long] =
    Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L,
      51153L, 45757L)

  private def benfordPpm(d: Column): Column =
    benfordPpmTable.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (ppm, i)) => when(d === (i + 1).toLong, lit(ppm)).otherwise(acc)
    }
}
