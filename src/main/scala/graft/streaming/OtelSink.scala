package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** OTelExportSink analog (SURVEY §2.1 #13; reference
  * exec/otel_export_sink_node.cc + plan.proto:363-549): map each result
  * row to an OpenTelemetry signal via declarative column bindings and
  * hand batches to a transport. In Spark this is a foreachBatch sink —
  * each micro-batch is mapped row->signal and exported; exactly-once per
  * batch id is the streaming contract.
  *
  * The wire transport (OTLP/HTTP protobuf POST) is intentionally behind
  * the [[Transport]] trait — no network egress in this environment — with
  * an in-memory transport for tests.
  */
object OtelSink {

  /** Column bindings for a Gauge metric (plan.proto OTelMetricGauge). */
  case class GaugeSpec(name: String, valueCol: String, timeNsCol: String,
                       attributeCols: Seq[String])

  case class MetricRecord(name: String, timeNs: Long, value: Double,
                          attributes: Map[String, String])

  trait Transport extends Serializable {
    def send(batch: Seq[MetricRecord]): Unit
  }

  /** Test/collector transport (driver-side accumulation). */
  class InMemoryTransport extends Transport {
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[MetricRecord]()
    def send(batch: Seq[MetricRecord]): Unit = batch.foreach(sent.add)
  }

  def rowToGauge(spec: GaugeSpec)(r: Row): MetricRecord = MetricRecord(
    spec.name,
    r.getAs[Long](spec.timeNsCol),
    r.getAs[Double](spec.valueCol),
    spec.attributeCols.map(c => c -> String.valueOf(r.getAs[Any](c))).toMap)

  /** Batch export: one-shot mapping of a result DataFrame. */
  def exportGauges(df: DataFrame, spec: GaugeSpec, transport: Transport): Long = {
    val rows = df.collect()
    transport.send(rows.map(rowToGauge(spec)).toSeq)
    rows.length.toLong
  }

  /** Streaming export: foreachBatch sink (the cron/script-runner analog —
    * reference src/vizier/services/query_broker/script_runner/).
    */
  def streamGauges(df: DataFrame, spec: GaugeSpec, transport: Transport,
                   checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        transport.send(batch.collect().map(rowToGauge(spec)).toSeq)
      }
      .start()
}
