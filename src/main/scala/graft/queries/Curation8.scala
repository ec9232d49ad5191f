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

  import graft.ops.{CurationDay, Scale}

  /** Curation-day artifacts are built ONCE per sf dir per JVM (the
    * production shape: day-0 bootstrap is amortized across delta
    * days, and q488-q491 are four facets of ONE delta-day run). The
    * scratch root lives until JVM exit (shutdown hook deletes it), so
    * every facet reads the same persisted artifacts.
    */
  private val dayCache =
    new java.util.concurrent.ConcurrentHashMap[String, CurationDay.Artifacts]()
  private def day(s: org.apache.spark.sql.SparkSession,
                  dir: String): CurationDay.Artifacts =
    dayCache.computeIfAbsent(dir, { d: String =>
      val root = Curation2.tempIndexDir("graft_curation_day_")
      val a = CurationDay.Artifacts(root)
      CurationDay.bootstrap(s, d, a)
      sys.addShutdownHook(Curation2.deleteDir(root))
      a
    })

  /** The delta-day decision frame, computed once per dir (it feeds
    * q488, q489, and q491) and pinned with an eager localCheckpoint.
    */
  private val decCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def dayDecisions(s: org.apache.spark.sql.SparkSession,
                           dir: String): org.apache.spark.sql.DataFrame =
    decCache.computeIfAbsent(dir, { d: String =>
      CurationDay.decisions(s, day(s, d), tp(s, d, "documents"))
        .localCheckpoint(true)
    })

  /** The TWO-day lifecycle run (q492-q494), computed once per dir:
    * bootstrap on the {2,3,4}-snapshot -> day-1 decisions -> ADMIT
    * (index append + manifest fold + agg-state persist + distinct-
    * state append) -> day-2 drop (with appended-index sentinels) ->
    * day-2 decisions -> day-2 admit. Returns the artifacts and the
    * checkpointed day-2 decision frame.
    */
  private val twoDayCache = new java.util.concurrent.ConcurrentHashMap[
    String, (CurationDay.Artifacts, org.apache.spark.sql.DataFrame)]()
  private def twoDay(s: org.apache.spark.sql.SparkSession, dir: String)
      : (CurationDay.Artifacts, org.apache.spark.sql.DataFrame) =
    twoDayCache.computeIfAbsent(dir, { d: String =>
      val root = Curation2.tempIndexDir("graft_curation_2day_")
      val a = CurationDay.Artifacts(root)
      CurationDay.bootstrapTwoDay(s, d, a)
      sys.addShutdownHook(Curation2.deleteDir(root))
      val fetch = tp(s, d, "documents")
      val dec1 = CurationDay.decisions(s, a, fetch).localCheckpoint(true)
      CurationDay.admitDay(s, a, dec1, a.deltaDocs, a.manifest0,
        a.manifest1)
      // event-state write side: persist day-1's folded agg partials
      // and append day-1's keys into the distinct state, so day-2
      // folds against a state that already absorbed day 1
      graft.ops.Scale.foldAggState(s.read.parquet(a.aggState),
          s.read.parquet(a.deltaEvents), "event_type",
          CurationDay.guardedValue)
        .select("event_type", "n_rows", "sum_cents")
        .write.mode("overwrite").parquet(a.aggState1)
      graft.ops.Scale.appendDistinctState(s, a.distinctState,
        s.read.parquet(a.deltaEvents), "event_type", "user_id", 16)
      CurationDay.writeDay2Drop(s, d, a, dec1)
      val dec2 = CurationDay.decisions(s, a, fetch, Some(a.day2Docs))
        .localCheckpoint(true)
      CurationDay.admitDay(s, a, dec2, a.day2Docs, a.manifest1,
        a.manifest2)
      (a, dec2)
    })

  /** The grown manifest and the folded states, computed once per dir
    * (each feeds its own gate row AND the q491 report — without the
    * cache the folds would run twice per gate pass).
    */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def dayManifest(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    manifestCache.computeIfAbsent(dir, { d: String =>
      CurationDay.grownManifest(s, day(s, d), dayDecisions(s, d))
        .localCheckpoint(true)
    })
  private val statesCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  private def dayStates(s: org.apache.spark.sql.SparkSession,
                        dir: String): org.apache.spark.sql.DataFrame =
    statesCache.computeIfAbsent(dir, { d: String =>
      CurationDay.foldedStates(s, day(s, d)).localCheckpoint(true)
    })

  val queries: Map[String, QFn] = Map(

    // ---- The round-10 flagship: the fully INCREMENTAL curation day.
    // q488 per-doc verdicts, q489 manifest fold, q490 state folds,
    // q491 the one-row day report — each gated against a
    // full-recompute DuckDB re-derivation on the grown corpus, and
    // CurationDaySpec pins that no delta stage rescans the snapshot
    // corpus (the single documents-file scan is the id-pruned dedup
    // candidate verify fetch).

    "q488_curation_day_decisions" -> ((s, dir) =>
      dayDecisions(s, dir).orderBy("doc_id")),

    "q489_curation_day_manifest" -> ((s, dir) =>
      dayManifest(s, dir).orderBy("shard")),

    "q490_curation_day_states" -> ((s, dir) =>
      dayStates(s, dir).orderBy("event_type")),

    // ---- Two-day lifecycle: day-2 runs against artifacts that
    // ALREADY absorbed day 1 (appended dedup index, folded manifest,
    // persisted agg partials, appended distinct keys). q492's
    // sentinels witness the appended index serving day 2; q493's
    // chained state == q490's full-recompute oracle (two engine
    // paths, one oracle — the q483 pattern); q494's twice-folded
    // manifest == the manifest over the twice-grown curated corpus.

    "q492_curation_day2_decisions" -> ((s, dir) =>
      twoDay(s, dir)._2.orderBy("doc_id")),

    "q493_curation_day2_states" -> ((s, dir) => {
      val a = twoDay(s, dir)._1
      val d2 = s.read.parquet(a.day2Events)
      graft.ops.Scale.foldAggState(s.read.parquet(a.aggState1), d2,
          "event_type", CurationDay.guardedValue)
        .join(graft.ops.Scale.foldDistinctState(s, a.distinctState, d2,
          "event_type", "user_id", 16), "event_type")
        .orderBy("event_type")
    }),

    "q494_curation_day2_manifest" -> ((s, dir) => {
      val a = twoDay(s, dir)._1
      s.read.parquet(a.manifest2).orderBy("shard")
    }),

    "q491_curation_day_report" -> ((s, dir) => {
      val dec = dayDecisions(s, dir)
      val cnt = dec.agg(
        count(lit(1)).as("n_delta"),
        sum(when(col("decision") === "admitted", 1L).otherwise(0L))
          .as("n_admitted"),
        sum(when(col("decision") === "dup_exact_corpus", 1L).otherwise(0L))
          .as("n_dup_exact_corpus"),
        sum(when(col("decision") === "dup_exact_batch", 1L).otherwise(0L))
          .as("n_dup_exact_batch"),
        sum(when(col("decision") === "near_dup_corpus", 1L).otherwise(0L))
          .as("n_near_dup_corpus"),
        sum(when(col("decision") === "contaminated", 1L).otherwise(0L))
          .as("n_contaminated"),
        sum(when(col("decision") === "low_quality", 1L).otherwise(0L))
          .as("n_low_quality"))
      val man = dayManifest(s, dir)
        .agg(sum(col("n_docs")).as("corpus_docs"),
          sum(col("n_tokens")).as("corpus_tokens"))
      val ev = dayStates(s, dir)
        .agg(sum(col("n_rows")).as("total_events"))
      cnt.crossJoin(broadcast(man)).crossJoin(broadcast(ev))
    }),

    // Heaps-law vocabulary growth: 8 equal-count doc-id-order
    // prefixes, cumulative doc/token/vocab counts + marginal
    // new-vocab rate — the "when does more of this source stop
    // buying vocabulary" curve.
    "q495_vocab_growth" -> ((s, dir) =>
      graft.ops.Corpus.vocabGrowth(t(s, dir, "documents"), "text",
          "doc_id")
        .orderBy("step")),

    // Inter-arrival gap ladder per event type ((type, user)-keyed
    // consecutive gaps, fixed human-scale integer boundaries).
    "q496_inter_arrival" -> ((s, dir) =>
      graft.ops.Events.interArrival(t(s, dir, "events"), "user_id",
          "event_type", "ts")
        .orderBy("event_type", "bucket")),

    // N-gram diversity (TTR) per source for n = 1..3.
    "q497_ngram_diversity" -> ((s, dir) =>
      graft.ops.Corpus.ngramDiversity(t(s, dir, "documents"), "text",
          "source")
        .orderBy("source", "n")),

    // Token-budget mixture plan: 1.2x-corpus budget (upsampling
    // regime), 30% per-lang cap, cap-and-redistribute, sampling
    // rates + epoch counts (the fixture exercises capped/uncapped
    // AND single/multi-epoch branches).
    "q498_token_budget_plan" -> ((s, dir) =>
      graft.ops.Corpus.tokenBudgetPlan(t(s, dir, "documents"), "text",
          "lang")
        .orderBy("lang")),

    // The frontier k-core peel under the RELIABLE checkpoint swap
    // (graft.reliableCkpt=1 + a real checkpoint dir): byte-identical
    // answer to q461's localCheckpoint mode — the cluster swap as a
    // GATE row, not just a spec (two engine MODES, one oracle: the
    // q483 pattern applied to execution infrastructure).
    "q501_kcore_reliable_ckpt" -> ((s, dir) => {
      val ck = Curation2.tempIndexDir("graft_reliable_ckpt_")
      // the checkpoint dir CANNOT be unset on a SparkContext, so when
      // none was set before, the dir must stay valid for the session
      // (a later checkpoint() would otherwise write into a deleted
      // path) — defer cleanup to JVM exit instead of the finally
      sys.addShutdownHook(Curation2.deleteDir(ck))
      val prev = s.sparkContext.getCheckpointDir
      s.sparkContext.setCheckpointDir(ck)
      try {
        // LEXICALLY SCOPED swap (graft.core.Ckpt.withReliable) — no
        // process-global sys.props write, so a parallel query runner
        // cannot observe this query's dispatch (r10 verdict hygiene).
        graft.core.Ckpt.withReliable() {
          val l = t(s, dir, "lineitem")
            .where(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
            .distinct()
          val edges = l.toDF("o", "a").join(l.toDF("o", "b"), "o")
            .where(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("w"))
            .where(col("w") >= 2)
          graft.ops.Graph.kcorePeel(edges, "a", "b", k = 3)
            .orderBy("node")
            .localCheckpoint(true) // decouple from the ckpt files below
        }
      } finally prev.foreach(s.sparkContext.setCheckpointDir)
    }),

    // Persisted quantile (cent-histogram) state: bootstrap from the
    // pre-Jan-28 events, fold the rest, read exact p50/p90/p99 off
    // the FOLDED state — the quantile member completing the
    // persisted-state family (agg q446, distinct q454, HLL q455,
    // CMS q458, window q462, session q469). Fold == rebuild by
    // construction (additive counts); the oracle is the full
    // order-statistic recompute over all events.
    "q504_quantile_state" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .where(col("event_type").isNotNull && col("value").isNotNull &&
          !isnan(col("value")))
      val cut = 1706400000000000000L // 2024-01-28T00:00:00Z
      val p = Curation2.tempIndexDir("graft_cent_hist_")
      try {
        Scale.writeCentHist(ev.where(col("ts") < cut), "event_type",
          col("value"), p)
        Scale.histQuantiles(
            Scale.foldCentHist(s, p, ev.where(col("ts") >= cut),
              "event_type", col("value")),
            "event_type",
            Seq("p50_cents" -> 500000L, "p90_cents" -> 900000L,
              "p99_cents" -> 990000L))
          .orderBy("event_type")
          .localCheckpoint(true)
      } finally Curation2.deleteDir(p)
    }),

    // Sampling manifest: the q498 token-budget plan projected onto
    // the shard layout — per (shard, lang) cell: token mass, the
    // plan's sampling rate, and the cell's target token draw. The
    // file a trainer's data loader actually consumes; proves the
    // mixture plan and the shard layout COMPOSE (the q277 pattern
    // for token budgets). Cell targets are exact integer ppm draws,
    // so sum(cell targets) per lang <= the plan's lang target with
    // only truncation slack.
    "q503_sampling_manifest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val plan = graft.ops.Corpus.tokenBudgetPlan(docs, "text", "lang")
        .select("lang", "sample_ppm")
      val cells = graft.ops.Corpus.shardAssign(docs, "doc_id", 4)
        .select("doc_id", "shard")
        .join(docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("__tok")),
          "doc_id")
        .groupBy("shard", "lang")
        .agg(sum(col("__tok")).as("n_tokens"))
      cells.join(broadcast(plan), "lang")
        .select(col("shard"), col("lang"), col("n_tokens"),
          col("sample_ppm"),
          idiv(col("n_tokens") * col("sample_ppm"), 1000000L)
            .as("target_tokens"))
        .orderBy("shard", "lang")
    }),

    // Dedup-index health card over the q283-split index: hash-set
    // size, band rows, bands/doc, LSH bucket count + hottest bucket
    // (the candidate-explosion early warning an ops dashboard reads
    // before admitting a delta day).
    "q502_dedup_index_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0)
      val idx = Curation2.tempIndexDir("graft_dedup_stats_")
      try {
        graft.ops.Dedup.writeDedupIndex(corpus, "text", "doc_id", idx,
          Curation.NGRAM, Curation.K, Curation.BANDS)
        graft.ops.Dedup.dedupIndexStats(s, idx).localCheckpoint(true)
      } finally Curation2.deleteDir(idx)
    }),

    // Schema-evolution report: two event-file batches written under
    // DIFFERENT schemas (batch B adds event_type) into one directory,
    // read back with mergeSchema — per merged column: type, file
    // presence, and the non-null row mass it actually holds. The
    // presence/type columns pin the footer-level merge; the row-mass
    // column is data-bound (the oracle re-derives it from events).
    "q499_schema_evolution" -> ((s, dir) => {
      val p = Curation2.tempIndexDir("graft_schema_evo_")
      try {
        val ev = t(s, dir, "events").where(col("event_id").isNotNull)
        ev.where(pmod(col("event_id"), lit(2L)) === 0)
          .select("event_id", "user_id", "value")
          .repartition(2).write.mode("append").parquet(p)
        ev.where(pmod(col("event_id"), lit(2L)) === 1)
          .select("event_id", "user_id", "value", "event_type")
          .repartition(2).write.mode("append").parquet(p)
        graft.core.Layout.schemaEvolutionReport(s, p)
          .orderBy("column")
          .localCheckpoint(true)
      } finally Curation2.deleteDir(p)
    }),

    // Exactly-once batch ingest: b1 ingested, b1 REPLAYED (must
    // no-op against the ledger), b2 ingested — the table holds each
    // batch exactly once and the replay's return value is pinned in
    // the output row.
    "q500_idempotent_ingest" -> ((s, dir) => {
      val p = Curation2.tempIndexDir("graft_ingest_")
      try {
        val ev = t(s, dir, "events").where(col("event_id").isNotNull)
          .select("event_id", "event_type")
        val b1 = ev.where(pmod(col("event_id"), lit(2L)) === 0)
        val b2 = ev.where(pmod(col("event_id"), lit(2L)) === 1)
        val r1 = graft.ops.Scale.ingestBatch(s, s"$p/table", s"$p/ledger", "b1", b1)
        val r1Replay =
          graft.ops.Scale.ingestBatch(s, s"$p/table", s"$p/ledger", "b1", b1)
        val r2 = graft.ops.Scale.ingestBatch(s, s"$p/table", s"$p/ledger", "b2", b2)
        s.read.parquet(s"$p/table")
          .groupBy("__batch", "event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("ingest_results",
            lit(Seq(r1, r1Replay, r2).map(b => if (b) "1" else "0")
              .mkString("")))
          .orderBy("__batch", "event_type")
          .localCheckpoint(true)
      } finally Curation2.deleteDir(p)
    }),

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

  // ---- generated oracle SQL for the curation day -----------------

  private val sh8 = graft.ops.Dedup.shinglesSql("text", 8)
  private val sh2 = graft.ops.Dedup.shinglesSql("text", 2)
  private def h60(x: String) = graft.ops.Dedup.h60Sql(x)

  /** The full-recompute re-derivation of the curation day, shared by
    * q488-q491: day-0 batch curation of the snapshot (exact-dedup
    * keepers -> decontamination -> repetition gate), the incremental
    * dedup decisions ([[Curation.dedupDecisionCtes]] — the exact
    * q269/q283 algorithm text), then the admitted docs' contamination
    * + repetition verdicts. Integer threshold contracts mirror
    * [[graft.ops.CurationDay]] constant for constant.
    */
  /** Day-0 batch curation of a snapshot (`snapPred` over pool):
    * exact-dedup keepers -> decontamination -> repetition gate,
    * ending with the `corpus` CTE. */
  private[queries] def curatedCorpusCtes(snapPred: String): String = {
    val cp = CurationDay.ContamPpm; val rt = CurationDay.RepTenths
    s"""snapraw AS (SELECT * FROM pool WHERE $snapPred),
       |skeep AS (SELECT min(doc_id) AS doc_id FROM snapraw GROUP BY md5(text)),
       |s1 AS MATERIALIZED (SELECT s.* FROM snapraw s JOIN skeep USING (doc_id)),
       |sct AS (SELECT doc_id,
       |    CAST(len(list_distinct($sh8)) AS BIGINT) AS n_grams FROM s1),
       |sg AS (SELECT doc_id, unnest(list_distinct($sh8)) AS g FROM s1),
       |shit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
       |  FROM sg JOIN bgr USING (g) GROUP BY 1),
       |s2 AS (SELECT s1.* FROM s1 JOIN sct USING (doc_id)
       |  LEFT JOIN shit USING (doc_id)
       |  WHERE coalesce(shit.c, 0) * 1000000 <= $cp * sct.n_grams),
       |corpus AS MATERIALIZED (SELECT doc_id, text FROM s2
       |  WHERE (CAST(len($sh2) AS BIGINT)
       |      - CAST(len(list_distinct($sh2)) AS BIGINT)) * 10
       |    <= $rt * CAST(len($sh2) AS BIGINT))""".stripMargin
  }

  /** The post-dedup gates for one day (suffix `sfx`, matching the
    * `decisions$sfx`/`batch$sfx` CTEs): contamination + repetition on
    * the dedup survivors, ending with `final$sfx(doc_id, decision)`
    * and `admf$sfx(doc_id, text)`. */
  private[queries] def postGateCtes(sfx: String): String = {
    val cp = CurationDay.ContamPpm; val rt = CurationDay.RepTenths
    s"""adm$sfx AS (SELECT d.doc_id, b.text FROM decisions$sfx d
       |  JOIN batch$sfx b USING (doc_id) WHERE d.decision = 'admitted'),
       |act$sfx AS (SELECT doc_id,
       |    CAST(len(list_distinct($sh8)) AS BIGINT) AS n_grams FROM adm$sfx),
       |ag$sfx AS (SELECT doc_id, unnest(list_distinct($sh8)) AS g FROM adm$sfx),
       |ahit$sfx AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS c
       |  FROM ag$sfx JOIN bgr USING (g) GROUP BY 1),
       |final$sfx AS (SELECT d.doc_id,
       |    CASE WHEN d.decision <> 'admitted' THEN d.decision
       |      WHEN coalesce(ahit$sfx.c, 0) * 1000000 > $cp * act$sfx.n_grams
       |        THEN 'contaminated'
       |      WHEN (CAST(len($sh2) AS BIGINT)
       |          - CAST(len(list_distinct($sh2)) AS BIGINT)) * 10
       |        > $rt * CAST(len($sh2) AS BIGINT) THEN 'low_quality'
       |      ELSE 'admitted' END AS decision
       |  FROM decisions$sfx d JOIN batch$sfx b USING (doc_id)
       |  LEFT JOIN act$sfx USING (doc_id)
       |  LEFT JOIN ahit$sfx USING (doc_id)),
       |admf$sfx AS MATERIALIZED (SELECT f.doc_id, b.text FROM final$sfx f
       |  JOIN batch$sfx b USING (doc_id) WHERE f.decision = 'admitted')""".stripMargin
  }

  private[queries] val poolBenchCtes: String =
    s"""pool AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
       |bench AS MATERIALIZED (SELECT doc_id, text FROM documents WHERE source = 'src0'),
       |bgr AS MATERIALIZED (SELECT DISTINCT unnest(list_distinct($sh8)) AS g FROM bench)""".stripMargin

  private def dayCtes: String =
    s"""$poolBenchCtes,
       |${curatedCorpusCtes("doc_id % 5 <> 0")},
       |deltabase AS MATERIALIZED (SELECT doc_id, text FROM pool WHERE doc_id % 5 = 0),
       |plant AS (
       |  SELECT CAST(9000001 AS BIGINT) AS doc_id, text FROM corpus
       |    WHERE doc_id = (SELECT min(doc_id) FROM corpus)
       |  UNION ALL SELECT 9000002, text FROM deltabase
       |    WHERE doc_id = (SELECT min(doc_id) FROM deltabase)
       |  UNION ALL SELECT 9000003, text FROM deltabase
       |    WHERE doc_id = (SELECT min(doc_id) FROM deltabase)
       |  UNION ALL SELECT 9000004, text FROM bench
       |    WHERE doc_id = (SELECT min(doc_id) FROM bench)
       |  UNION ALL SELECT 9000005, repeat('spam ', 39) || 'spam'),
       |batch AS MATERIALIZED (SELECT * FROM deltabase UNION ALL SELECT * FROM plant),
       |${Curation.dedupDecisionCtes()},
       |${postGateCtes("")},
       |grown AS (SELECT doc_id, text FROM corpus
       |  UNION ALL SELECT doc_id, text FROM admf)""".stripMargin

  /** The two-day full-recompute re-derivation (q492-q494): day-1 on
    * the {2,3,4}-snapshot, then the SAME algorithm text instantiated
    * a second time (suffix "2") against the grown corpus — exactly
    * what the engine's appended index serves incrementally.
    */
  private def twoDayCtes: String =
    s"""$poolBenchCtes,
       |${curatedCorpusCtes("doc_id % 5 IN (2, 3, 4)")},
       |batch AS MATERIALIZED (SELECT doc_id, text FROM pool WHERE doc_id % 5 = 0),
       |${Curation.dedupDecisionCtes()},
       |${postGateCtes("")},
       |corpus2 AS MATERIALIZED (SELECT doc_id, text FROM corpus
       |  UNION ALL SELECT doc_id, text FROM admf),
       |day2base AS MATERIALIZED (SELECT doc_id, text FROM pool WHERE doc_id % 5 = 1),
       |plant2 AS (
       |  SELECT CAST(9100001 AS BIGINT) AS doc_id, text FROM admf
       |    WHERE doc_id = (SELECT min(doc_id) FROM admf)
       |  UNION ALL SELECT 9100002, text || ' zzz' FROM admf
       |    WHERE doc_id = (SELECT doc_id FROM admf
       |      ORDER BY len(string_split(text, ' ')) DESC, doc_id LIMIT 1)),
       |batch2 AS MATERIALIZED (SELECT * FROM day2base UNION ALL SELECT * FROM plant2),
       |${Curation.dedupDecisionCtes("corpus2", "batch2", "2")},
       |${postGateCtes("2")},
       |grown2 AS (SELECT doc_id, text FROM corpus2
       |  UNION ALL SELECT doc_id, text FROM admf2)""".stripMargin

  /** Full-recompute state oracle shared by q490 (single fold) and
    * q493 (build -> fold -> append -> fold chain) — two independent
    * engine paths against one SQL answer.
    */
  private[queries] val fullStateOracle: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(CAST(floor((CASE WHEN value IS NULL OR isnan(value)
      |      THEN NULL ELSE value END) * 100.0 + 0.5) AS BIGINT))
      |    AS BIGINT) AS sum_cents,
      |  round(CAST(sum(CAST(floor((CASE WHEN value IS NULL
      |      OR isnan(value) THEN NULL ELSE value END) * 100.0 + 0.5)
      |      AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 6) + 0.0 AS mean,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique
      |FROM events
      |WHERE ts IS NOT NULL AND event_type IS NOT NULL
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  val oracles: Map[String, String] = Map(

    "q488_curation_day_decisions" ->
      s"""WITH $dayCtes
         |SELECT doc_id, decision,
         |  CASE WHEN decision = 'admitted'
         |    THEN CAST((${h60("CAST(doc_id AS VARCHAR)")})
         |      % ${CurationDay.NShards} AS INT) END AS shard
         |FROM final ORDER BY doc_id""".stripMargin,

    "q489_curation_day_manifest" ->
      s"""WITH $dayCtes,
         |m AS (SELECT doc_id,
         |    CAST((${h60("CAST(doc_id AS VARCHAR)")})
         |      % ${CurationDay.NShards} AS INT) AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    (${h60("CAST(doc_id AS VARCHAR) || ':' || text")}) AS h
         |  FROM grown)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id,
         |  bit_xor(h) AS checksum
         |FROM m GROUP BY shard ORDER BY shard""".stripMargin,

    "q492_curation_day2_decisions" ->
      s"""WITH $twoDayCtes
         |SELECT doc_id, decision,
         |  CASE WHEN decision = 'admitted'
         |    THEN CAST((${h60("CAST(doc_id AS VARCHAR)")})
         |      % ${CurationDay.NShards} AS INT) END AS shard
         |FROM final2 ORDER BY doc_id""".stripMargin,

    // two engine paths, one oracle (the q483 pattern): the chained
    // build -> fold -> append -> fold state answers q490's
    // full-recompute SQL
    "q493_curation_day2_states" -> fullStateOracle,

    "q494_curation_day2_manifest" ->
      s"""WITH $twoDayCtes,
         |m AS (SELECT doc_id,
         |    CAST((${h60("CAST(doc_id AS VARCHAR)")})
         |      % ${CurationDay.NShards} AS INT) AS shard,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |    (${h60("CAST(doc_id AS VARCHAR) || ':' || text")}) AS h
         |  FROM grown2)
         |SELECT shard, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS min_id, max(doc_id) AS max_id,
         |  bit_xor(h) AS checksum
         |FROM m GROUP BY shard ORDER BY shard""".stripMargin,

    "q490_curation_day_states" -> fullStateOracle,

    "q491_curation_day_report" ->
      s"""WITH $dayCtes,
         |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n_delta,
         |  CAST(sum(CASE WHEN decision = 'admitted' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_admitted,
         |  CAST(sum(CASE WHEN decision = 'dup_exact_corpus' THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_dup_exact_corpus,
         |  CAST(sum(CASE WHEN decision = 'dup_exact_batch' THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_dup_exact_batch,
         |  CAST(sum(CASE WHEN decision = 'near_dup_corpus' THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_near_dup_corpus,
         |  CAST(sum(CASE WHEN decision = 'contaminated' THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_contaminated,
         |  CAST(sum(CASE WHEN decision = 'low_quality' THEN 1
         |    ELSE 0 END) AS BIGINT) AS n_low_quality
         |  FROM final),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS corpus_docs,
         |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
         |    AS BIGINT) AS corpus_tokens FROM grown),
         |ev AS (SELECT CAST(count(*) AS BIGINT) AS total_events
         |  FROM events
         |  WHERE ts IS NOT NULL AND event_type IS NOT NULL)
         |SELECT cnt.*, tot.*, ev.* FROM cnt, tot, ev""".stripMargin,

    "q495_vocab_growth" ->
      s"""WITH d AS (SELECT doc_id, text,
         |    row_number() OVER (ORDER BY doc_id) AS rn,
         |    count(*) OVER () AS n FROM documents),
         |s AS (SELECT doc_id, text,
         |    CAST(((rn - 1) * 8) // n AS BIGINT) AS step FROM d),
         |wx AS (SELECT step, w FROM (SELECT step,
         |    unnest(string_split(text, ' ')) AS w FROM s) WHERE w <> ''),
         |tok AS (SELECT step, CAST(count(*) AS BIGINT) AS tk
         |  FROM wx GROUP BY 1),
         |dc AS (SELECT step, CAST(count(*) AS BIGINT) AS dk
         |  FROM s GROUP BY 1),
         |gx AS (SELECT step,
         |    unnest(${graft.ops.Dedup.shinglesSql("text", 2)}) AS g FROM s),
         |fv AS (SELECT g, min(step) AS step FROM gx GROUP BY g),
         |nv AS (SELECT step, CAST(count(*) AS BIGINT) AS nw
         |  FROM fv GROUP BY 1)
        |SELECT tok.step,
        |  CAST(sum(dk) OVER win AS BIGINT) AS n_docs_cum,
        |  CAST(sum(tk) OVER win AS BIGINT) AS n_tokens_cum,
        |  CAST(sum(coalesce(nw, 0)) OVER win AS BIGINT) AS n_vocab_cum,
        |  coalesce(nw, 0) * 1000000 // greatest(tk, 1) AS new_vocab_ppm
        |FROM tok JOIN dc USING (step) LEFT JOIN nv USING (step)
        |WINDOW win AS (ORDER BY tok.step
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY tok.step""".stripMargin,

    "q496_inter_arrival" ->
      """WITH e AS (SELECT event_type, user_id, epoch_us(ts) AS tus,
        |    event_id FROM events
        |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
        |g AS (SELECT event_type,
        |    tus - lag(tus) OVER (PARTITION BY event_type, user_id
        |      ORDER BY tus, event_id) AS gap
        |  FROM e),
        |b AS (SELECT event_type,
        |    CASE WHEN gap < 1000000 THEN 'a_lt_1s'
        |      WHEN gap < 10000000 THEN 'b_1s_10s'
        |      WHEN gap < 60000000 THEN 'c_10s_1m'
        |      WHEN gap < 600000000 THEN 'd_1m_10m'
        |      WHEN gap < 3600000000 THEN 'e_10m_1h'
        |      WHEN gap < 21600000000 THEN 'f_1h_6h'
        |      WHEN gap < 86400000000 THEN 'g_6h_1d'
        |      ELSE 'h_ge_1d' END AS bucket
        |  FROM g WHERE gap IS NOT NULL),
        |c AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        |  n * 1000000 // (CAST(sum(n) OVER (PARTITION BY event_type)
        |    AS BIGINT)) AS share_ppm
        |FROM c ORDER BY event_type, bucket""".stripMargin,

    "q497_ngram_diversity" -> {
      def one(n: Int) = {
        val sh = graft.ops.Dedup.shinglesSql("text", n)
        s"""SELECT source, CAST($n AS BIGINT) AS n,
           |  CAST(count(*) AS BIGINT) AS n_grams,
           |  CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
           |  CAST(count(DISTINCT g) AS BIGINT) * 1000000
           |    // greatest(CAST(count(*) AS BIGINT), 1) AS ttr_ppm
           |FROM (SELECT source, unnest($sh) AS g FROM documents)
           |GROUP BY source""".stripMargin
      }
      (1 to 3).map(one).mkString("\nUNION ALL\n") +
        "\nORDER BY source, n"
    },

    "q498_token_budget_plan" ->
      """WITH per AS (SELECT lang,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
        |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
        |tt AS (SELECT CAST(sum(t) AS BIGINT) AS total FROM per),
        |raw AS (SELECT lang, t, t * 1000000 // total AS raw_ppm,
        |    total FROM per, tt),
        |sums AS (SELECT
        |    CAST(sum(CASE WHEN raw_ppm > 300000 THEN 300000
        |      ELSE raw_ppm END) AS BIGINT) AS assigned,
        |    CAST(sum(CASE WHEN raw_ppm > 300000 THEN 0
        |      ELSE raw_ppm END) AS BIGINT) AS raw_uncapped
        |  FROM raw),
        |fin AS (SELECT lang, t, raw_ppm, total,
        |    CASE WHEN raw_ppm > 300000 THEN 300000
        |      ELSE raw_ppm + (CASE WHEN raw_uncapped > 0
        |        THEN (1000000 - assigned) * raw_ppm // raw_uncapped
        |        ELSE 0 END) END AS final_ppm,
        |    (total * 6 + 4) // 5 AS budget
        |  FROM raw, sums)
        |SELECT lang, t AS n_tokens, raw_ppm,
        |  CAST(final_ppm AS BIGINT) AS final_ppm,
        |  CAST(budget * final_ppm // 1000000 AS BIGINT) AS target_tokens,
        |  CAST(budget * final_ppm // 1000000 * 1000000
        |    // greatest(t, 1) AS BIGINT) AS sample_ppm,
        |  CAST((budget * final_ppm // 1000000 * 1000000
        |    // greatest(t, 1) + 999999) // 1000000 AS BIGINT) AS epochs
        |FROM fin ORDER BY lang""".stripMargin,

    // the swap changes execution infrastructure, never the answer
    "q501_kcore_reliable_ckpt" ->
      graft.queries.Curation7.oracles("q461_kcore"),

    "q504_quantile_state" ->
      """WITH v AS (SELECT event_type AS g,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events WHERE event_type IS NOT NULL
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |k AS (SELECT g, c, CAST(count(*) AS BIGINT) AS k FROM v
        |  GROUP BY 1, 2),
        |ct AS (SELECT g, c, k,
        |    CAST(sum(k) OVER (PARTITION BY g ORDER BY c) AS BIGINT)
        |      AS cum,
        |    CAST(sum(k) OVER (PARTITION BY g) AS BIGINT) AS n FROM k)
        |SELECT g AS event_type, CAST(max(n) AS BIGINT) AS n_rows,
        |  min(CASE WHEN cum * 1000000 >= 500000 * n THEN c END)
        |    AS p50_cents,
        |  min(CASE WHEN cum * 1000000 >= 900000 * n THEN c END)
        |    AS p90_cents,
        |  min(CASE WHEN cum * 1000000 >= 990000 * n THEN c END)
        |    AS p99_cents
        |FROM ct GROUP BY g ORDER BY event_type""".stripMargin,

    "q503_sampling_manifest" -> {
      val h = graft.ops.Dedup.h60Sql("CAST(doc_id AS VARCHAR)")
      s"""WITH per AS (SELECT lang,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t
         |  FROM documents WHERE lang IS NOT NULL GROUP BY 1),
         |tt AS (SELECT CAST(sum(t) AS BIGINT) AS total FROM per),
         |raw AS (SELECT lang, t, t * 1000000 // total AS raw_ppm,
         |    total FROM per, tt),
         |sums AS (SELECT
         |    CAST(sum(CASE WHEN raw_ppm > 300000 THEN 300000
         |      ELSE raw_ppm END) AS BIGINT) AS assigned,
         |    CAST(sum(CASE WHEN raw_ppm > 300000 THEN 0
         |      ELSE raw_ppm END) AS BIGINT) AS raw_uncapped
         |  FROM raw),
         |fin AS (SELECT lang, t, total,
         |    CASE WHEN raw_ppm > 300000 THEN 300000
         |      ELSE raw_ppm + (CASE WHEN raw_uncapped > 0
         |        THEN (1000000 - assigned) * raw_ppm // raw_uncapped
         |        ELSE 0 END) END AS final_ppm,
         |    (total * 6 + 4) // 5 AS budget
         |  FROM raw, sums),
         |plan AS (SELECT lang,
         |    CAST(budget * final_ppm // 1000000 * 1000000
         |      // greatest(t, 1) AS BIGINT) AS sample_ppm
         |  FROM fin),
         |cells AS (SELECT CAST(($h) % 4 AS INT) AS shard, lang,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT)
         |      AS n_tokens
         |  FROM documents GROUP BY 1, 2)
         |SELECT shard, cells.lang, n_tokens, sample_ppm,
         |  n_tokens * sample_ppm // 1000000 AS target_tokens
         |FROM cells JOIN plan ON plan.lang = cells.lang
         |ORDER BY shard, cells.lang""".stripMargin
    },

    "q502_dedup_index_stats" ->
      s"""WITH corpus AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
         |${Curation.sigCtes("corpus", "c")},
         |bands AS (${Curation.bandsSql("c")}),
         |bk AS (SELECT band, bh, CAST(count(*) AS BIGINT) AS c
         |  FROM bands GROUP BY 1, 2)
         |SELECT
         |  (SELECT CAST(count(DISTINCT md5(text)) AS BIGINT) FROM corpus)
         |    AS n_hashes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM bands) AS n_band_rows,
         |  (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) FROM bands)
         |    AS n_docs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM bk) AS n_buckets,
         |  (SELECT CAST(max(c) AS BIGINT) FROM bk) AS max_bucket,
         |  (SELECT CAST(count(*) AS BIGINT) FROM bands)
         |    // greatest((SELECT CAST(count(DISTINCT doc_id) AS BIGINT)
         |      FROM bands), 1) AS bands_per_doc""".stripMargin,

    "q499_schema_evolution" ->
      """WITH ev AS (SELECT * FROM events WHERE event_id IS NOT NULL),
        |a AS (SELECT * FROM ev WHERE event_id % 2 = 0),
        |b AS (SELECT * FROM ev WHERE event_id % 2 = 1)
        |SELECT * FROM (
        |  SELECT 'event_id' AS "column", 'bigint' AS dtype,
        |    CAST(4 AS BIGINT) AS n_files,
        |    CAST(4 AS BIGINT) AS n_files_present,
        |    (SELECT CAST(count(event_id) AS BIGINT) FROM ev)
        |      AS n_rows_nonnull
        |  UNION ALL
        |  SELECT 'event_type', 'string', 4, 2,
        |    (SELECT CAST(count(event_type) AS BIGINT) FROM b)
        |  UNION ALL
        |  SELECT 'user_id', 'bigint', 4, 4,
        |    (SELECT CAST(count(user_id) AS BIGINT) FROM ev)
        |  UNION ALL
        |  SELECT 'value', 'double', 4, 4,
        |    (SELECT CAST(count(value) AS BIGINT) FROM ev))
        |ORDER BY "column"""".stripMargin,

    "q500_idempotent_ingest" ->
      """SELECT CASE WHEN event_id % 2 = 0 THEN 'b1' ELSE 'b2' END
        |    AS __batch,
        |  event_type, CAST(count(*) AS BIGINT) AS n,
        |  '101' AS ingest_results
        |FROM events WHERE event_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY __batch, event_type""".stripMargin,

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
