package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import scala.collection.concurrent.TrieMap

/** Per-query execution stats (reference: exec/exec_metrics.h + the
  * QueryExecutionAndTimingInfo carried in the result stream,
  * carnotpb/carnot.proto:62-71 — rows/bytes processed per node, timing).
  * Spark-native: `df.observe` metrics evaluated inline by the executors
  * (no extra pass) + a QueryExecutionListener collecting them per action.
  */
object ExecStats {

  val ObservationName = "graft_stats"

  /** Attach row/byte counters to a result frame; metrics arrive at the
    * listener when the action completes.
    */
  def observed(df: DataFrame, approxRowBytes: Int = 0): DataFrame =
    df.observe(ObservationName,
      count(lit(1)).as("output_rows"),
      (count(lit(1)) * approxRowBytes).as("approx_bytes"))

  final class Collector extends QueryExecutionListener {
    val metrics = new TrieMap[String, Row]()
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.get(ObservationName)
        .foreach(r => metrics.put(s"$funcName@${qe.id}", r))
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
  }

  /** Install a collector on the session; returns it for reading. */
  def install(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }
}
