package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The reference's UDA surface (src/carnot/udf/udf.h:104 —
  * Update/Merge/Finalize/Serialize) as Spark `Aggregator`s. Update=reduce,
  * Merge=merge, Finalize=finish, Serialize/Deserialize = buffer Encoder;
  * Spark then runs them as partial+final HashAggregate across the shuffle,
  * which is exactly the reference's PEM/Kelvin partial-agg split
  * (splitter/partial_op_mgr/partial_op_mgr.h:91-94) — for free.
  */
object Aggregators {

  /** `quantiles` UDA (math_sketches.h:42-129): t-digest sketch reported as
    * the reference's ST_QUANTILES JSON {p01,p10,p25,p50,p75,p90,p99}.
    *
    * The buffer IS the mutable digest: Spark's ScalaAggregator keeps the
    * buffer object live per group and only serializes it at the
    * partial/final exchange, so per-row cost is the digest's amortized
    * buffered insert — not a decode + full compress per row.
    */
  class QuantilesAgg extends Aggregator[Double, TDigest, String] {
    def zero: TDigest = new TDigest(100.0)
    def reduce(d: TDigest, x: Double): TDigest = { d.add(x); d }
    def merge(a: TDigest, b: TDigest): TDigest = a.merge(b)
    def finish(d: TDigest): String = {
      val ps = Seq("p01" -> 0.01, "p10" -> 0.10, "p25" -> 0.25, "p50" -> 0.50,
        "p75" -> 0.75, "p90" -> 0.90, "p99" -> 0.99)
      ps.map { case (k, q) => s""""$k": ${d.quantile(q)}""" }
        .mkString("{", ", ", "}")
    }
    def bufferEncoder: Encoder[TDigest] = Encoders.javaSerialization[TDigest]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Deterministic DISTINCT-VALUE sample: bottom-k by hash over the
    * distinct value set — duplicate input values share one hash and
    * collapse to a single sample slot (min-wise sampling of the value
    * SET, not of rows). The reference's `sample` is a row reservoir
    * (ml_ops.h:145-160 ReservoirSampleUDA) whose output depends on row
    * order — unreproducible under Spark partitioning; a row-uniform
    * order-independent variant would need a per-row id salted into the
    * hash, which the single-argument UDA input doesn't carry. The
    * distinct-value contract is mergeable and stable at any
    * scale/partitioning, and the oracle replicates it exactly.
    */
  case class BottomK(k: Int, items: Array[Long], hashes: Array[Long])

  class SampleAgg(k: Int) extends Aggregator[Long, BottomK, Array[Long]] {
    // LCG-style mix, chosen to be expressible in plain SQL (no 64-bit
    // wraparound) so oracles can replicate the sample exactly.
    private def h64(x: Long): Long = SampleAgg.hash(x)
    private def take(items: Array[(Long, Long)]): BottomK = {
      val top = items.distinct.sorted.take(k)
      BottomK(k, top.map(_._2), top.map(_._1))
    }
    def zero: BottomK = BottomK(k, Array.empty, Array.empty)
    def reduce(b: BottomK, x: Long): BottomK =
      take(b.hashes.zip(b.items) :+ ((h64(x), x)))
    def merge(a: BottomK, b: BottomK): BottomK =
      take(a.hashes.zip(a.items) ++ b.hashes.zip(b.items))
    def finish(b: BottomK): Array[Long] = b.items.sorted
    def bufferEncoder: Encoder[BottomK] = Encoders.product[BottomK]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoders.arrayLong
  }

  object SampleAgg {
    /** (1103515245*x + 12345) mod (2^31-1): products stay < 2^63 for ids
      * < 2^32, so the identical expression runs in any SQL dialect.
      */
    def hash(x: Long): Long = (1103515245L * x + 12345L) % 2147483647L
    def hashSql(x: String): String = s"(1103515245 * $x + 12345) % 2147483647"
  }

  /** Column-level entry points. */
  def quantiles(c: Column): Column = udaf(new QuantilesAgg).apply(c)
  def sampleK(c: Column, k: Int): Column = udaf(new SampleAgg(k)).apply(c)
}

private object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  implicit val arrayLong: org.apache.spark.sql.Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
