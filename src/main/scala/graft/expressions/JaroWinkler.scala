package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen expression — the
  * edit-distance-free fuzzy matcher entity resolution uses when
  * Levenshtein's O(|a|·|b|) DP is too heavy for the verify stage
  * (Winkler, 1990 census linkage). Runs once per candidate pair inside
  * blocked self-joins — the [[graft.ops.Dedup.recordLinkage]] hot path
  * — so it's a Catalyst `Expression` with `doGenCode` (the [[Md5Long60]]
  * pattern), not a UDF.
  *
  * Exactness: the arithmetic mirrors DuckDB's `jaro_winkler_similarity`
  * operation-for-operation — jaro = (m/l1 + m/l2 + (m−t)/m)/3 with the
  * greedy left-to-right match within the ⌊max/2⌋−1 window, the Winkler
  * prefix boost sim + pl·0.1·(1−sim) applied only when sim > 0.7 with
  * prefix capped at 4, and EMPTY input (either side, including both)
  * scoring 0.0. Matching runs over UTF-8 BYTES — DuckDB's actual
  * domain (its similarity functions are byte-wise, NOT code-point-
  * wise) — so parity covers arbitrary Unicode, fuzz-verified
  * bit-identical on 14,000 pairs including multi-byte/astral input;
  * `round(jw, 6)` is therefore oracle-checkable cross-engine.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires string inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaroWinkler$$.MODULE$$.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes; val s2 = b.getBytes
    val sim = jaro(s1, s2)
    if (sim > 0.7) {
      var pl = 0
      val cap = math.min(4, math.min(s1.length, s2.length))
      while (pl < cap && s1(pl) == s2(pl)) pl += 1
      sim + pl * 0.1 * (1.0 - sim)
    } else sim
  }

  /** Plain Jaro similarity over UTF-8 bytes (DuckDB conventions:
    * byte-wise matching; either side empty → 0.0).
    */
  def jaro(s1: Array[Byte], s2: Array[Byte]): Double = {
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
  }

  def column(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
