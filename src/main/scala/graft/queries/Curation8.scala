package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Q._
import graft.functions.PixieFunctions.idiv

/** Round-10 batch. Opens with the OTel export path as a GATE row
  * (q487): the last spec-only physical operator (SURVEY §2.1#13)
  * exports a deterministic frame through [[graft.streaming.OtelSink]],
  * the captured OTLP/HTTP protobuf bytes are decoded back to a frame
  * by the INDEPENDENT wire reader
  * ([[graft.streaming.OtlpProtoReader]] — written separately from the
  * encoder), and the decoded frame hash-matches a DuckDB oracle of
  * the expected rows. Any drift in the Gauge or Span encoding now
  * fails the official gate, not just a spec.
  */
object Curation8 {

  val queries: Map[String, QFn] = Map(

    // OTel export oracle gate: per-(event_type, day) grid -> Gauge
    // datapoints (daily counts) + Spans (day activity intervals with
    // md5-bound trace/span ids) -> OTLP wire bytes -> independent
    // decode -> one frame. The export runs executor-side
    // (foreachPartition); the captured wire bytes are MODEL-sized
    // (the 5x30 grid, never corpus rows) — in production the same
    // bytes stream to a collector per partition and no decode side
    // exists.
    "q487_otel_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{OtelSink, OtlpWireCapture, OtlpProtoReader => R}
      val dayNs = 86400000000000L
      val grid = t(s, dir, "events")
        .where(col("event_type").isNotNull)
        .groupBy(col("event_type"), idiv(col("ts"), dayNs).as("day"))
        .agg(count(lit(1)).as("n"), min(col("ts")).as("t0"),
          max(col("ts")).as("t1"))
        .select(col("event_type"), col("n"),
          (col("day") * dayNs).as("t_ns"),
          col("n").cast("double").as("value"),
          col("t0"), col("t1"),
          md5(concat(col("event_type"), lit(":"),
            col("day").cast("string"))).as("trace_id"),
          substring(md5(concat(col("event_type"), lit(":"),
            col("day").cast("string"))), 1, 16).as("span_id"),
          col("n").cast("string").as("n_str"))
      val gaugeWire = new OtlpWireCapture()
      val spanWire = new OtlpWireCapture()
      try {
        OtelSink.exportGauges(grid, OtelSink.GaugeSpec(
          "events.daily.count", "value", "t_ns", Seq("event_type")),
          gaugeWire)
        OtelSink.exportSpans(grid, OtelSink.SpanSpec(
          "event_type", "t0", "t1", Some("trace_id"), Some("span_id"),
          Seq("n_str")), spanWire)
        def hex(b: Array[Byte]) = b.map("%02x".format(_)).mkString
        def str(b: Array[Byte]) = new String(b, "UTF-8")
        val gauges = for {
          env <- gaugeWire.captured.toArray(Array.empty[Array[Byte]]).toSeq
          rm <- R.messages(env, 1); sc <- R.messages(rm, 2)
          m <- R.messages(sc, 2)
          dp <- R.messages(R.firstMessage(m, 5), 1)
        } yield ("gauge", str(R.firstBytes(m, 1)),
          R.keyValues(dp, 7)("event_type"),
          R.firstFixed64(dp, 3), None: Option[Long],
          Some(java.lang.Double.longBitsToDouble(R.firstFixed64(dp, 4))),
          None: Option[String], None: Option[String])
        val spans = for {
          env <- spanWire.captured.toArray(Array.empty[Array[Byte]]).toSeq
          rs <- R.messages(env, 1); sc <- R.messages(rs, 2)
          sp <- R.messages(sc, 2)
        } yield ("span", str(R.firstBytes(sp, 5)),
          R.keyValues(sp, 9)("n_str"),
          R.firstFixed64(sp, 7), Some(R.firstFixed64(sp, 8)),
          None: Option[Double],
          Some(hex(R.firstBytes(sp, 1))), Some(hex(R.firstBytes(sp, 2))))
        (gauges ++ spans)
          .toDF("signal", "name", "attr", "t0_ns", "t1_ns", "value",
            "trace_id", "span_id")
          .orderBy("signal", "name", "attr", "t0_ns")
      } finally { gaugeWire.close(); spanWire.close() }
    }))

  val oracles: Map[String, String] = Map(

    "q487_otel_roundtrip" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day,
        |    CAST(count(*) AS BIGINT) AS n,
        |    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT 'gauge' AS signal, 'events.daily.count' AS name,
        |    event_type AS attr, day * 86400000000000 AS t0_ns,
        |    CAST(NULL AS BIGINT) AS t1_ns, CAST(n AS DOUBLE) AS value,
        |    CAST(NULL AS VARCHAR) AS trace_id,
        |    CAST(NULL AS VARCHAR) AS span_id
        |  FROM g
        |  UNION ALL
        |  SELECT 'span', event_type, CAST(n AS VARCHAR), t0 * 1000,
        |    t1 * 1000, CAST(NULL AS DOUBLE),
        |    md5(event_type || ':' || CAST(day AS VARCHAR)),
        |    substr(md5(event_type || ':' || CAST(day AS VARCHAR)), 1, 16)
        |  FROM g)
        |ORDER BY signal, name, attr, t0_ns""".stripMargin)
}
