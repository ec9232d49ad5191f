package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expressions.Md5Long60

class Md5Long60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native hash equals the conv(substring(md5)) reference chain") {
    val docs = Seq("", "a", "hello world", "日本語 text", "x" * 5000)
      .toDF("s")
    val both = docs.select(
      Md5Long60.column(col("s").cast("binary")).as("native"),
      conv(substring(md5(col("s").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("chain"))
    both.collect().foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("interpreted eval matches codegen eval") {
    // Force both paths: collect via a plan with codegen (projection over
    // parquet read) and direct literal eval (constant folding runs the
    // interpreted nullSafeEval).
    val lit60 = Seq(1).toDF("x")
      .select(Md5Long60.column(lit("probe").cast("binary"))).as[Long].head()
    val col60 = Seq("probe").toDF("s").repartition(2)
      .select(Md5Long60.column(col("s").cast("binary"))).as[Long].head()
    assert(lit60 == col60)
  }

  test("null propagates") {
    val r = Seq[Option[String]](None).toDF("s")
      .select(Md5Long60.column(col("s").cast("binary"))).collect()(0)
    assert(r.isNullAt(0))
  }
}
