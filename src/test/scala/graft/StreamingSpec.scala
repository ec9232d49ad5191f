package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{OtelSink, Streaming}
import graft.functions.PixieFunctions._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("streaming windowed agg matches the batch bin-agg result") {
    val out = s"stream_agg_${System.nanoTime()}"
    val stream = graft.core.Tables.stream(spark, sf, "events")
    val q = Streaming.windowedCounts(stream, "ts", 3600, 0)
      .writeStream.outputMode("append").format("memory").queryName(out).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table(out)
      .select("bucket", "n").as[(Long, Long)].collect().toMap
    val batch = graft.core.Tables(spark, sf, "events")
      .groupBy(timeBinNs(col("ts"), 3600).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // watermark(0) closes every window once data is exhausted except the
    // final one, which stays open in append mode — compare the closed set.
    assert(streamed.nonEmpty)
    assert(streamed.forall { case (b, n) => batch.get(b).contains(n) })
    assert(batch.size - streamed.size <= 1)
  }

  test("sessionize groups events by gap with flatMapGroupsWithState") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.SessionEvent]
    val sessions = Streaming.sessionize(mem.toDS(), gapNs = 100L)
    val out = s"sessions_${System.nanoTime()}"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(out).start()
    // user 1: two bursts separated by > gap; second burst stays open (no
    // eos in streaming) — only the first session is emitted.
    mem.addData(Streaming.SessionEvent(1, 10), Streaming.SessionEvent(1, 50),
      Streaming.SessionEvent(1, 120))
    q.processAllAvailable()
    mem.addData(Streaming.SessionEvent(1, 1000))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(out).as[Streaming.Session].collect().toSeq
    assert(got == Seq(Streaming.Session(1, 10, 120, 3)))
  }

  test("otel gauge export maps rows to metric records (batch + stream)") {
    val transport = new OtelSink.InMemoryTransport
    val spec = OtelSink.GaugeSpec("event.value", "value", "ts", Seq("event_type"))
    val df = graft.core.Tables(spark, sf, "events")
      .select("ts", "value", "event_type").limit(100)
    val n = OtelSink.exportGauges(df, spec, transport)
    assert(n == 100 && transport.sent.size() == 100)
    val rec = transport.sent.peek()
    assert(rec.name == "event.value" && rec.attributes.contains("event_type"))
    transport.close()
    assert(transport.sent.isEmpty) // close() dropped the static store entry
  }

  test("OTLP wire transport POSTs protobuf the collector can decode") {
    import OtelSink._
    import graft.streaming.{OtlpHttpTransport, OtlpProtoReader => R}
    import scala.jdk.CollectionConverters._

    // In-process OTLP/HTTP collector: records (path, content-type, body)
    // for every POST, replies 200 — no network egress involved.
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Array[Byte])]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val handler = new com.sun.net.httpserver.HttpHandler {
      def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val body = ex.getRequestBody.readAllBytes()
        received.add((ex.getRequestURI.getPath,
          ex.getRequestHeaders.getFirst("Content-Type"), body))
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    }
    server.createContext("/v1/metrics", handler)
    server.createContext("/v1/traces", handler)
    server.createContext("/v1/logs", handler)
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"
      val transport = new OtlpHttpTransport(endpoint,
        headers = Map("x-api-key" -> "test"), serviceName = "graft-test")

      // Gauges ship from the executors through the real export path.
      val df = graft.core.Tables(spark, sf, "events")
        .select("ts", "value", "event_type").limit(10).coalesce(1)
      val n = OtelSink.exportGauges(df,
        GaugeSpec("event.value", "value", "ts", Seq("event_type")), transport)
      assert(n == 10)

      // Spans through the same wire.
      val sdf = Seq(("checkout", 100L, 250L, "WARN"))
        .toDF("span_name", "start_ns", "end_ns", "sev")
      OtelSink.exportSpans(sdf,
        SpanSpec("span_name", "start_ns", "end_ns", None, None, Seq("sev")),
        transport)

      val posts = received.asScala.toSeq
      assert(posts.forall(_._2 == "application/x-protobuf"))

      // Independent decode of the metrics payload: Request.resource_
      // metrics[0] -> {resource{attrs}, scope_metrics[0] -> {scope,
      // metrics[0] -> {name, gauge{data_points}}}}.
      val (_, _, mBody) = posts.find(_._1 == "/v1/metrics").get
      val rm = R.firstMessage(mBody, 1)
      val res = R.firstMessage(rm, 1)
      assert(R.keyValues(res, 1) == Map("service.name" -> "graft-test"))
      val sm = R.firstMessage(rm, 2)
      assert(new String(R.firstBytes(R.firstMessage(sm, 1), 1), "UTF-8") == "graft")
      val metric = R.firstMessage(sm, 2)
      assert(new String(R.firstBytes(metric, 1), "UTF-8") == "event.value")
      val points = R.messages(R.firstMessage(metric, 5), 1)
      assert(points.length == 10)
      val expect = df.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      val got = points.map { p =>
        (R.firstFixed64(p, 3),
          java.lang.Double.longBitsToDouble(R.firstFixed64(p, 4)),
          R.keyValues(p, 7)("event_type"))
      }.toSet
      assert(got == expect)

      // And the trace payload: Span{trace_id(16B), span_id(8B), name,
      // start=7, end=8, attrs=9}.
      val (_, _, tBody) = posts.find(_._1 == "/v1/traces").get
      val span = R.firstMessage(R.firstMessage(R.firstMessage(tBody, 1), 2), 2)
      assert(R.firstBytes(span, 1).length == 16 && R.firstBytes(span, 2).length == 8)
      assert(new String(R.firstBytes(span, 5), "UTF-8") == "checkout")
      assert(R.firstFixed64(span, 7) == 100L && R.firstFixed64(span, 8) == 250L)
      assert(R.keyValues(span, 9) == Map("sev" -> "WARN"))
    } finally server.stop(0)
  }

  test("upid helpers round-trip (asid, pid, start_ts)") {
    val df = Seq((7L, 12345L, 1704067798778549L)).toDF("asid", "pid", "ts")
      .withColumn("upid", graft.types.Upid.makeUpid(col("asid"), col("pid"), col("ts")))
    val r = df.select(
      graft.types.Upid.upidToAsid(col("upid")),
      graft.types.Upid.upidToPid(col("upid")),
      graft.types.Upid.upidToStartTs(col("upid")),
      graft.types.Upid.upidToString(col("upid")))
      .as[(Long, Long, Long, String)].head()
    assert(r == ((7L, 12345L, 1704067798778549L, "7:12345:1704067798778549")))
  }

  test("metadata as-of join resolves generations by timestamp") {
    val ev = Seq((1L, 100L, 5L), (2L, 300L, 5L)).toDF("event_id", "ts", "user_id")
    val dim = Seq(
      (5L, "pod-5-gen0", 0L, 200L, "svc-5"),
      (5L, "pod-5-gen1", 200L, Long.MaxValue, "svc-5"))
      .toDF("owner_id", "pod_name", "start_ns", "stop_ns", "service_name")
    val got = graft.meta.K8sMetadata
      .resolveAsOf(ev, dim, "user_id", "owner_id", "ts", Seq("pod_name"))
      .select("event_id", "pod_name").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "pod-5-gen0", 2L -> "pod-5-gen1"))
  }

  test("otel summary/span/log signal mapping (plan.proto OTel* bindings)") {
    import OtelSink._
    val df = Seq(
      ("checkout", 100L, 250L, 42L, 0.5, 0.99, "WARN", "slow request"),
      ("login", 300L, 310L, 7L, 0.1, 0.2, "INFO", "ok"))
      .toDF("span_name", "start_ns", "end_ns", "n", "p50", "p99", "sev", "msg")

    // Partition-parallel export: arrival order is not defined (matches
    // the reference — per-node exporters have no cross-node order), so
    // look records up by key.
    import scala.jdk.CollectionConverters._
    val summaries = new SignalCollector[SummaryRecord]
    summaries.export(df, rowToSummary(SummarySpec(
      "latency", "start_ns", "n", Map(0.5 -> "p50", 0.99 -> "p99"), Seq("span_name"))))
    val s = summaries.sent.asScala.find(_.attributes("span_name") == "checkout").get
    assert(s.count == 42L && s.quantiles(0.99) == 0.99 * 1)

    val spans = new SignalCollector[SpanRecord]
    spans.export(df, rowToSpan(SpanSpec(
      "span_name", "start_ns", "end_ns", None, None, Seq("sev"))))
    val sp = spans.sent.asScala.find(_.name == "checkout").get
    assert(sp.endNs == 250L)
    assert(sp.traceId.length == 32 && sp.spanId.length == 16)

    val logs = new SignalCollector[LogRecord]
    logs.export(df, rowToLog(LogSpec("start_ns", "sev", "msg", Nil)))
    assert(logs.sent.size == 2 &&
      logs.sent.asScala.exists(_.severity == "WARN"))
    summaries.close(); spans.close(); logs.close()
  }

  test("streaming MinHash-LSH replay equals the batch candidate-pair set") {
    val out = s"stream_mh_${System.nanoTime()}"
    val stream = graft.core.Tables.stream(spark, sf, "documents")
    val q = Streaming.streamingBandPairs(stream, "text", "doc_id", 3, 16, 4)
      .writeStream.outputMode("append").format("memory").queryName(out).start()
    q.processAllAvailable(); q.stop()
    // at-least-once per colliding band -> distinct at read
    val streamed = spark.table(out).distinct()
      .as[(Long, Long)].collect().toSet
    val batch = graft.ops.Dedup.minhashPairs(
        graft.core.Tables(spark, sf, "documents"), "text", "doc_id", 3, 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
    spark.catalog.dropTempView(out)
  }

  test("streamingContamination is invariant to micro-batch boundaries") {
    // completes the batch-boundary determinism battery (Round8Spec
    // covers normalized dedup, LSH pairs, and paths): the complete-
    // mode contamination aggregation must produce identical per-doc
    // ratios whether rows arrive as ONE batch or one per batch
    implicit val sqlCtx = spark.sqlContext
    def runCont(batches: Seq[Seq[(Long, String)]]): Map[Long, (Long, Long)] = {
      val evalSet = Seq((100L,
        "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
      val in = MemoryStream[(Long, String)](spark)
      val out = s"det_cont_${System.nanoTime()}"
      val q = Streaming.streamingContamination(
          in.toDF.toDF("doc_id", "text"), evalSet, "text", "doc_id", n = 8)
        .writeStream.outputMode("complete").format("memory")
        .queryName(out).start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(out).select("doc_id", "n_grams", "n_contaminated")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      spark.catalog.dropTempView(out)
      got
    }
    val contRows = Seq(
      (1L, "one two three four five six seven eight extra words here"),
      (2L, "totally clean document text with no benchmark overlap at all"),
      (3L, "zero one two three four five six seven eight nine ten done"))
    assert(runCont(Seq(contRows)) == runCont(contRows.map(Seq(_))))
  }

  test("streamingAlerts: hysteresis transitions, gap clearing, batch-boundary invariance") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{AlertEvent, AlertRow}
    // bin width 10us; key 0: bin0 all-errors (fires), bin1 dead band
    // (1/3 errors - holds), bins 2-3 silent (gap rows clear), bin4
    // reopens (unemitted tail)
    val evs = Seq(
      AlertEvent(0L, 1L, 1L), AlertEvent(0L, 2L, 1L),
      AlertEvent(0L, 12L, 1L), AlertEvent(0L, 13L, 0L),
      AlertEvent(0L, 14L, 0L),
      AlertEvent(0L, 41L, 0L))
    def run(batches: Seq[Seq[AlertEvent]]): Seq[AlertRow] = {
      val in = MemoryStream[AlertEvent](spark)
      val out = s"alerts_${System.nanoTime()}"
      val q = Streaming.streamingAlerts(in.toDS(), binUs = 10L,
          hiPpm = 300000L, loPpm = 150000L)
        .writeStream.outputMode("append").format("memory")
        .queryName(out).start()
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      q.stop()
      val got = spark.table(out)
        .as[AlertRow].collect().sortBy(r => (r.k, r.b)).toSeq
      spark.catalog.dropTempView(out)
      got
    }
    val one = run(Seq(evs))
    assert(one.map(r => (r.b, r.n, r.err_ppm, r.alert, r.fired, r.cleared)) ==
      Seq((0L, 2L, 1000000L, 1L, 1L, 0L),   // fires above hi
        (1L, 3L, 333333L, 1L, 0L, 0L),      // dead band holds
        (2L, 0L, 0L, 0L, 0L, 1L),           // silence clears
        (3L, 0L, 0L, 0L, 0L, 0L)))          // bin 4 stays open
    // identical under per-event micro-batches (state correctness)
    assert(run(evs.map(Seq(_))) == one)
  }

  test("streamingAlerts recovers flatMapGroupsWithState state from a checkpoint restart") {
    // The property AvailableNow replay can't witness: KILL the query
    // after batch 1 commits, START A NEW QUERY on the same checkpoint,
    // and require the phase-2 output to depend on phase-1 STATE (bin1's
    // dead-band hold needs alert=1 from bin0; bin2's cleared=1 needs the
    // open alert) — recovered from the state store, not recomputed.
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.Streaming.{AlertEvent, AlertRow}
    val batch1 = Seq(
      AlertEvent(0L, 1L, 1L), AlertEvent(0L, 2L, 1L),
      AlertEvent(0L, 12L, 1L), AlertEvent(0L, 13L, 0L),
      AlertEvent(0L, 14L, 0L))
    val batch2 = Seq(AlertEvent(0L, 41L, 0L))
    val base = java.nio.file.Files.createTempDirectory("alerts_cp").toString
    val cp = s"$base/checkpoint"; val outDir = s"$base/out"
    val in = MemoryStream[AlertEvent](spark)
    // a DURABLE sink — the memory sink refuses checkpoint recovery
    def start() =
      Streaming.streamingAlerts(in.toDS(), binUs = 10L,
          hiPpm = 300000L, loPpm = 150000L)
        .writeStream.outputMode("append").format("parquet")
        .option("path", outDir).option("checkpointLocation", cp).start()
    def readOut() = spark.read.schema(org.apache.spark.sql.Encoders
        .product[AlertRow].schema).parquet(outDir)
      .as[AlertRow].collect().toSeq
    val q1 = start()
    in.addData(batch1: _*); q1.processAllAvailable(); q1.stop()
    val phase1 = readOut()
    val q2 = start() // NEW query, same checkpoint
    in.addData(batch2: _*); q2.processAllAvailable(); q2.stop()
    val all = readOut()
    val phase2 = all.diff(phase1)
    // phase 2 contains ONLY post-restart rows (offsets recovered too,
    // so batch 1 is not reprocessed), and its dead-band hold/clear rows
    // need bin0's alert=1 state — recovered from the state store
    assert(phase1.map(_.b).toSet == Set(0L))
    assert(phase2.map(_.b).toSet == Set(1L, 2L, 3L))
    // interrupted == uninterrupted, row for row
    val inU = MemoryStream[AlertEvent](spark)
    val qU = Streaming.streamingAlerts(inU.toDS(), binUs = 10L,
        hiPpm = 300000L, loPpm = 150000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("alerts_cp_u").start()
    inU.addData(batch1: _*); qU.processAllAvailable()
    inU.addData(batch2: _*); qU.processAllAvailable(); qU.stop()
    val uninterrupted = spark.table("alerts_cp_u").as[AlertRow].collect().toSeq
    assert(all.sortBy(r => (r.k, r.b)) ==
      uninterrupted.sortBy(r => (r.k, r.b)))
    spark.catalog.dropTempView("alerts_cp_u")
  }

  test("streaming MinHash-LSH state persists across micro-batches") {
    val in = MemoryStream[(Long, String)](spark)
    val out = s"stream_mh2_${System.nanoTime()}"
    val q = Streaming.streamingBandPairs(
        in.toDF.toDF("doc_id", "text"), "text", "doc_id", 3, 16, 4)
      .writeStream.outputMode("append").format("memory").queryName(out).start()
    val txt = "the quick brown fox jumps over the lazy dog"
    in.addData((1L, txt), (2L, txt)); q.processAllAvailable()
    in.addData((3L, txt)); q.processAllAvailable()
    q.stop()
    val pairs = spark.table(out).distinct().as[(Long, Long)].collect().toSet
    // doc 3 arrived a batch later and still pairs with both prior occupants
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    spark.catalog.dropTempView(out)
  }

  test("streaming contamination updates per-doc ratios across micro-batches") {
    val in = MemoryStream[(Long, String)](spark)
    val out = s"stream_cont_${System.nanoTime()}"
    val evalSet = Seq((100L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val q = Streaming.streamingContamination(
        in.toDF.toDF("doc_id", "text"), evalSet, "text", "doc_id", n = 8)
      .writeStream.outputMode("complete").format("memory").queryName(out).start()
    // doc 1: contains an eval 8-gram span; doc 2 (later batch): clean
    in.addData((1L, "one two three four five six seven eight extra words here"))
    q.processAllAvailable()
    in.addData((2L, "totally clean document text with no benchmark overlap at all"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(out)
      .select("doc_id", "n_grams", "n_contaminated")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L)._2 >= 1L, got.toString) // the shared 8-gram hit
    assert(got(2L)._2 == 0L)
    spark.catalog.dropTempView(out)
  }

  test("stream-static as-of metadata join resolves generations in streaming") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val splitNs = tsNsLit("2024-01-15")
    val batchEv = graft.core.Tables(spark, sf, "events")
    val dim = graft.meta.K8sMetadata.syntheticPodDim(batchEv, splitNs)

    val mem = MemoryStream[(Long, Long, Long)] // (event_id, user_id, ts)
    val uid = batchEv.select("user_id").head().getLong(0)
    mem.addData((1L, uid, splitNs - 5L), (2L, uid, splitNs + 5L))
    val stream = mem.toDF.toDF("event_id", "user_id", "ts")
    val resolved = graft.meta.K8sMetadata.resolveAsOf(
      stream, dim, "user_id", "owner_id", "ts", Seq("pod_name"))

    val q = resolved.writeStream.format("memory")
      .queryName("asof_out").outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val out = spark.table("asof_out").orderBy("event_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("pod_name").endsWith("-gen0"))
    assert(out(1).getAs[String]("pod_name").endsWith("-gen1"))
  }
}
