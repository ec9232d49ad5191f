package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture materialization — the snapshot/history builders
  * every warehouse ingestion runs on top of a changelog stream
  * (Debezium-style (key, ts, op, value) rows), expressed as plain
  * key-keyed windows so they hold at any scale without a table format:
  * [[apply]] is the "latest state" merge (what `MERGE INTO` computes),
  * [[scd2]] the slowly-changing-dimension type-2 validity intervals
  * (what an as-of join resolves against — [[AsOf.joinBackward]] over
  * the result reproduces point-in-time lookup).
  */
object Cdc {

  /** Latest-state snapshot from a changelog: per key, the op with the
    * greatest (ts, tie) wins; a final delete drops the key. One
    * key-keyed window — no shuffle beyond the key partitioning, and
    * the changelog is read once. `tie` breaks equal timestamps
    * deterministically (a changelog position / event id).
    *
    * `valueName` defaults to "value_cents" — the column name this op
    * shipped with (r10 briefly defaulted it to "value"; restored so
    * existing callers keep their contract — pass it explicitly to
    * rename).
    */
  def apply(changes: DataFrame, keyCol: String, tsCol: Column,
            tieCol: Column, opCol: Column, valueCol: Column,
            deleteOp: String = "D",
            valueName: String = "value_cents"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol.desc, tieCol.desc)
    changes.where(col(keyCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__nops",
        count(lit(1)).over(Window.partitionBy(keyCol)))
      .where(col("__rn") === 1 && opCol =!= deleteOp)
      .select(col(keyCol), col("__nops").as("n_ops"),
        valueCol.as(valueName))
  }

  /** SCD type-2 history from a changelog: one row per version with
    * its validity interval [valid_from_us, valid_to_us) — `valid_to`
    * is the NEXT change's timestamp (null = current). The standard
    * warehouse dimension-history build; one key-keyed window pass.
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: Column,
           tieCol: Column, opCol: Column, valueCol: Column,
           valueName: String = "value_cents"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol.asc, tieCol.asc)
    changes.where(col(keyCol).isNotNull)
      .select(col(keyCol),
        row_number().over(w).cast("long").as("version"),
        tsCol.as("valid_from_us"),
        lead(tsCol, 1).over(w).as("valid_to_us"),
        opCol.as("op"), valueCol.as(valueName))
      .withColumn("is_current", col("valid_to_us").isNull)
  }
}
