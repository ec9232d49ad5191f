package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native codegen expression for the engine's cross-engine-reproducible
  * 60-bit content hash: the first 15 hex digits of md5 as a long —
  * semantically identical to `conv(substring(md5(x), 1, 15), 16, 10)` but
  * with no hex-string materialization or radix parse per row. This is the
  * hot inner operation of every dedup/minhash/simhash pipeline (ops.Dedup)
  * where it runs once per shingle — O(total tokens) times at 100 TB — so
  * it's a custom Catalyst `Expression` with `doGenCode` (SURVEY §2.10
  * preference order) rather than a UDF or a 4-expression chain.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_long60 requires binary input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long60"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long60.hash60(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.Md5Long60$$.MODULE$$.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(b) as a long: bytes 0-6 then the high
    * nibble of byte 7 (= parsing hex chars [0,15) base 16).
    */
  def hash60(b: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(b)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0) >>> 4)
  }

  def column(c: Column): Column =
    ColumnBridge.column(Md5Long60(ColumnBridge.expression(c)))
}
