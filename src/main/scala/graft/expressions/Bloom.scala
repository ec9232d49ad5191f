package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Spark's OWN runtime-filter bloom primitives
  * (BloomFilterAggregate / BloomFilterMightContain — what
  * InjectRuntimeFilter builds for join pruning), driven explicitly.
  * They are not in the public function registry, so this exposes them
  * through the ColumnBridge like the repo's other native expressions.
  * Inputs are xxhash64 longs on both the build and probe side.
  */
object Bloom {
  /** Aggregate a bloom filter (binary) over a LongType hash column. */
  def agg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe: may return false positives, never false negatives. */
  def mightContain(bloom: Column, hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hash)))
}
