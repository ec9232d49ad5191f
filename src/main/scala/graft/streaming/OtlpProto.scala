package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** OTLP/HTTP protobuf encoding — the wire half of the OTelExportSink
  * (reference: exec/otel_export_sink_node.cc:525 builds
  * opentelemetry-proto Export*ServiceRequest messages; endpoint/header
  * config in planpb/plan.proto:363-549).
  *
  * Encoded by hand against the PUBLIC opentelemetry-proto schema (v1:
  * common.proto, resource.proto, metrics.proto, trace.proto, logs.proto)
  * — the protobuf wire format is 3 primitives (varint, fixed64,
  * length-delimited), so a dependency-free writer keeps the export path
  * self-contained; StreamingSpec round-trips the bytes through an
  * independent decoder to pin byte-compatibility.
  *
  * Proto field numbers used (opentelemetry-proto v1.x):
  *  - ExportMetricsServiceRequest.resource_metrics = 1
  *    ResourceMetrics{resource=1, scope_metrics=2}
  *    ScopeMetrics{scope=1, metrics=2}
  *    Metric{name=1, gauge=5, summary=11}
  *    Gauge.data_points=1; NumberDataPoint{time_unix_nano=3 fixed64,
  *      as_double=4, attributes=7}
  *    Summary.data_points=1; SummaryDataPoint{time_unix_nano=3 fixed64,
  *      count=4 fixed64, quantile_values=6 {quantile=1, value=2},
  *      attributes=7}
  *  - ExportTraceServiceRequest.resource_spans = 1
  *    ResourceSpans{resource=1, scope_spans=2}
  *    ScopeSpans{scope=1, spans=2}
  *    Span{trace_id=1, span_id=2, name=5, start_time_unix_nano=7 fixed64,
  *      end_time_unix_nano=8 fixed64, attributes=9}
  *  - ExportLogsServiceRequest.resource_logs = 1
  *    ResourceLogs{resource=1, scope_logs=2}
  *    ScopeLogs{scope=1, log_records=2}
  *    LogRecord{time_unix_nano=1 fixed64, severity_text=3,
  *      body=5 AnyValue, attributes=6}
  *  - Resource.attributes=1; InstrumentationScope.name=1;
  *    KeyValue{key=1, value=2 AnyValue{string_value=1}}
  */
object OtlpProto {
  import OtelSink._

  // ---- minimal protobuf writer ---------------------------------------

  final class Writer {
    private val out = new ByteArrayOutputStream()
    def bytes: Array[Byte] = out.toByteArray

    def varint(v: Long): Writer = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt); this
    }
    private def key(field: Int, wire: Int): Writer = varint((field << 3) | wire)
    def int64(field: Int, v: Long): Writer = { key(field, 0); varint(v) }
    def fixed64(field: Int, v: Long): Writer = {
      key(field, 1)
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v).array()); this
    }
    def double(field: Int, v: Double): Writer =
      fixed64(field, java.lang.Double.doubleToLongBits(v))
    def bytes(field: Int, b: Array[Byte]): Writer = {
      key(field, 2); varint(b.length.toLong); out.write(b); this
    }
    def string(field: Int, s: String): Writer = bytes(field, s.getBytes("UTF-8"))
    def message(field: Int, w: Writer): Writer = bytes(field, w.bytes)
  }

  private def anyString(s: String): Writer = new Writer().string(1, s)

  private def keyValue(k: String, v: String): Writer =
    new Writer().string(1, k).message(2, anyString(v))

  private def attrs(field: Int, w: Writer, m: Map[String, String]): Writer = {
    m.toSeq.sortBy(_._1).foreach { case (k, v) => w.message(field, keyValue(k, v)) }
    w
  }

  /** Resource{attributes=[service.name=..]} — the reference names the
    * exporting entity via resource attributes (plan.proto OTelResource).
    */
  private def resource(serviceName: String): Writer =
    new Writer().message(1, keyValue("service.name", serviceName))

  private def scope(name: String): Writer = new Writer().string(1, name)

  /** Wrap per-signal payload bytes in the shared Resource/Scope envelope:
    * Request{1: {resource=1, scope_envelope=2: {scope=1, items=itemField}}}.
    */
  private def envelope(serviceName: String, itemField: Int,
                       items: Seq[Writer]): Array[Byte] = {
    val scoped = new Writer().message(1, scope("graft"))
    items.foreach(scoped.message(itemField, _))
    val rm = new Writer().message(1, resource(serviceName)).message(2, scoped)
    new Writer().message(1, rm).bytes
  }

  // ---- signal encodings ----------------------------------------------

  def encodeGauges(batch: Seq[MetricRecord], serviceName: String = "graft"): Array[Byte] = {
    val metrics = batch.groupBy(_.name).toSeq.sortBy(_._1).map { case (name, recs) =>
      val gauge = new Writer()
      recs.foreach { r =>
        gauge.message(1, attrs(7, new Writer()
          .fixed64(3, r.timeNs).double(4, r.value), r.attributes))
      }
      new Writer().string(1, name).message(5, gauge)
    }
    envelope(serviceName, 2, metrics)
  }

  def encodeSummaries(batch: Seq[SummaryRecord], serviceName: String = "graft"): Array[Byte] = {
    val metrics = batch.groupBy(_.name).toSeq.sortBy(_._1).map { case (name, recs) =>
      val summary = new Writer()
      recs.foreach { r =>
        val dp = new Writer().fixed64(3, r.timeNs).fixed64(4, r.count)
        r.quantiles.toSeq.sortBy(_._1).foreach { case (q, v) =>
          dp.message(6, new Writer().double(1, q).double(2, v))
        }
        summary.message(1, attrs(7, dp, r.attributes))
      }
      new Writer().string(1, name).message(11, summary)
    }
    envelope(serviceName, 2, metrics)
  }

  private def hexBytes(hex: String): Array[Byte] =
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  def encodeSpans(batch: Seq[SpanRecord], serviceName: String = "graft"): Array[Byte] = {
    val spans = batch.map { r =>
      val w = new Writer()
        .bytes(1, hexBytes(r.traceId))
        .bytes(2, hexBytes(r.spanId))
        .string(5, r.name)
        .fixed64(7, r.startNs)
        .fixed64(8, r.endNs)
      attrs(9, w, r.attributes)
    }
    envelope(serviceName, 2, spans)
  }

  def encodeLogs(batch: Seq[LogRecord], serviceName: String = "graft"): Array[Byte] = {
    val logs = batch.map { r =>
      val w = new Writer()
        .fixed64(1, r.timeNs)
        .string(3, r.severity)
        .message(5, anyString(r.body))
      attrs(6, w, r.attributes)
    }
    envelope(serviceName, 2, logs)
  }
}

/** Wire-capture transport: runs the SAME OTLP protobuf encoding as
  * [[OtlpHttpTransport]] but captures each encoded request body instead
  * of POSTing it (no egress here) — the collector stand-in that lets the
  * q487 gate row and specs verify the exact bytes a collector would
  * receive. The byte queue lives in a JVM-static store keyed by
  * transport id (the [[OtelSink.InMemoryTransport]] pattern: the
  * instance is serialized into executor tasks; valid in local mode,
  * while production uses the stateless HTTP transport).
  */
object OtlpWireCapture {
  private[streaming] val store = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]]()
}
class OtlpWireCapture(serviceName: String = "graft")
    extends OtelSink.Transport with OtelSink.SpanTransport
    with OtelSink.SummaryTransport with OtelSink.LogTransport {
  import OtelSink._
  private val id = java.util.UUID.randomUUID().toString
  def captured: java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]] =
    OtlpWireCapture.store.computeIfAbsent(id,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]())
  def send(batch: Seq[MetricRecord]): Unit =
    captured.add(OtlpProto.encodeGauges(batch, serviceName))
  def sendSpans(batch: Seq[SpanRecord]): Unit =
    captured.add(OtlpProto.encodeSpans(batch, serviceName))
  def sendSummaries(batch: Seq[SummaryRecord]): Unit =
    captured.add(OtlpProto.encodeSummaries(batch, serviceName))
  def sendLogs(batch: Seq[LogRecord]): Unit =
    captured.add(OtlpProto.encodeLogs(batch, serviceName))
  /** Drop this instance's JVM-static queue (caller teardown). */
  def close(): Unit = { OtlpWireCapture.store.remove(id); () }
}

/** OTLP/HTTP transport: POSTs protobuf-encoded batches to the collector's
  * standard paths (/v1/metrics, /v1/traces, /v1/logs) with optional
  * headers — the reference's EndpointConfig{url, headers, insecure}
  * (plan.proto:363-549). Stateless per send: each executor partition
  * opens its own connection, exactly like the reference's per-node
  * exporter, so the export path scales with partitions, not the driver.
  */
class OtlpHttpTransport(endpoint: String,
                        headers: Map[String, String] = Map.empty,
                        serviceName: String = "graft")
    extends OtelSink.Transport with OtelSink.SpanTransport
    with OtelSink.SummaryTransport with OtelSink.LogTransport {
  import OtelSink._

  def send(batch: Seq[MetricRecord]): Unit =
    post("/v1/metrics", OtlpProto.encodeGauges(batch, serviceName))
  def sendSummaries(batch: Seq[SummaryRecord]): Unit =
    post("/v1/metrics", OtlpProto.encodeSummaries(batch, serviceName))
  def sendSpans(batch: Seq[SpanRecord]): Unit =
    post("/v1/traces", OtlpProto.encodeSpans(batch, serviceName))
  def sendLogs(batch: Seq[LogRecord]): Unit =
    post("/v1/logs", OtlpProto.encodeLogs(batch, serviceName))

  private def post(path: String, body: Array[Byte]): Unit = {
    val url = java.net.URI.create(endpoint.stripSuffix("/") + path).toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      try { os.write(body); os.flush() } finally os.close()
      val code = conn.getResponseCode
      if (code < 200 || code >= 300)
        throw new java.io.IOException(s"OTLP export to $url failed: HTTP $code")
    } finally conn.disconnect()
  }
}
