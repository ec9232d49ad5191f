package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column access control (reference: RestrictColumnsRule,
  * src/carnot/planner/compiler/analyzer/ — the data-privacy hook that
  * limits which columns a query may read). Spark-native enforcement point:
  * the catalog boundary — every table access flows through
  * `graft.core.Tables`, so applying the policy there guarantees no
  * downstream operator can observe a restricted column (Catalyst column
  * pruning then ensures restricted columns are never even scanned).
  */
object RestrictColumns {

  /** Per-table policy: columns to drop entirely and columns to redact
    * (kept, value replaced) — redaction preserves schema for scripts that
    * project them.
    */
  final case class Policy(
      dropped: Map[String, Set[String]] = Map.empty,
      redacted: Map[String, Set[String]] = Map.empty,
      redactionValue: String = "<redacted>")

  def apply(df: DataFrame, table: String, policy: Policy): DataFrame = {
    val drop = policy.dropped.getOrElse(table, Set.empty)
    val redact = policy.redacted.getOrElse(table, Set.empty)
    val kept = df.columns.filterNot(drop)
    df.select(kept.map { c =>
      if (redact(c)) lit(policy.redactionValue).cast("string").as(c)
      else col(c)
    }.toSeq: _*)
  }

  /** Analysis-time guard: fail fast if a query's output exposes a
    * restricted column — the VerifyFilterExpressionRule-style check.
    */
  def verify(df: DataFrame, table: String, policy: Policy): Unit = {
    val bad = df.columns.toSet & policy.dropped.getOrElse(table, Set.empty)
    require(bad.isEmpty, s"restricted columns exposed from $table: ${bad.mkString(",")}")
  }
}
