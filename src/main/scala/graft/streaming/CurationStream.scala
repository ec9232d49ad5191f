package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.{CurationDay, CurationNDay}

/** The curation day as a STREAMING job (SURVEY §1.3 — the engine is
  * streaming-first, and the r10 flagship was batch-incremental): daily
  * document drops LAND AS FILES in a directory, a Structured Streaming
  * file source delivers them, and `foreachBatch` drives each day
  * through the exact [[CurationNDay.processDay]] the batch loop uses —
  * ledger-gated exactly-once ingest + index-backed incremental
  * decisions + admit (index append, manifest fold, persisted-state
  * folds). The reference's script-runner/cron analog
  * (src/vizier/services/query_broker/script_runner/), re-expressed as
  * the standard Spark incremental-ETL topology: file source →
  * foreachBatch → idempotent multi-artifact day transaction.
  *
  * Delivery/recovery semantics, layer by layer:
  *  - the file source's checkpoint (offset log) gives at-least-once
  *    micro-batch delivery across stop/restart;
  *  - [[CurationNDay.processDay]]'s day ledger upgrades that to
  *    exactly-once per DAY: a replayed batch whose day committed is a
  *    no-op, and a day that died before its ledger row re-runs
  *    convergently (see [[CurationNDay]]'s crash/replay contract);
  *  - days inside one micro-batch are applied in day order (a bounded
  *    driver loop — the distinct-day list is model-sized), and an
  *    out-of-order drop fails loudly via the day-(k−1) artifact
  *    require.
  *
  * At 100 TB nothing here collects data rows to the driver: the batch
  * frame is only filtered per day and handed to the same
  * delta-proportional operators the batch path runs; `landDrop`'s
  * single-file staging is a fixture convenience (a production landing
  * zone drops whatever file batches it likes — `maxFilesPerTrigger`
  * then controls batch granularity, and the in-batch day loop handles
  * multi-file, multi-day batches).
  */
object CurationStream {

  /** Landing-file schema: the curation payload (doc_id, text) plus
    * the [[ControlChannel]] contract fields — op = null is admission
    * data, "ttl"/"cap" are retention slots whose scalar (keepFromDay
    * / maxTokens) rides `doc_id`, "compact" is the index-maintenance
    * slot (see [[ControlChannel]] for the full channel contract both
    * calendars share).
    */
  val dropSchema: StructType = ControlChannel.schemaWith(
    StructField("doc_id", LongType),
    StructField("text", StringType))

  /** Start the admission stream over `a.landing`, checkpointed at
    * `a.streamCp` (restart with the same paths to resume).
    *
    * A retention CONTROL (op = "ttl") runs the ledgered
    * [[CurationNDay.ttlDay]] + [[graft.ops.Pack.rebuild]] as a
    * TWO-PHASE slot: the slot's own `ttl<k>_done` ledger row commits
    * only after the tape rebuild, so a slot that crashed between the
    * (itself ledgered, replay-convergent) expiry and the rebuild
    * re-runs BOTH on replay — the expiry no-ops via its own ledger,
    * the rebuild is an idempotent overwrite — while a fully committed
    * slot is a pure no-op.
    */
  def start(spark: SparkSession, a: CurationDay.Artifacts,
            corpusFetch: DataFrame): StreamingQuery =
    spark.readStream
      .schema(dropSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(a.landing)
      .writeStream
      .option("checkpointLocation", a.streamCp)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val days = batch.select("day").distinct()
          .collect().map(_.getInt(0)).sorted // bounded: days per batch
        days.foreach { k =>
          val rows = batch.where(col("day") === k)
          val drop = rows.where(col("op").isNull)
            .select("doc_id", "text")
          if (!drop.isEmpty)
            CurationNDay.processDay(spark, a, k, drop, corpusFetch): Unit
          ControlChannel.payloads(rows, ControlChannel.OpTtl)
            .foreach { keepFrom =>
              ControlChannel.slot(spark, a.ledger, s"ttl${k}_done") {
                CurationNDay.ttlDay(spark, a, s"ttl$k", keepFrom.toInt,
                  a.manifestDay(CurationNDay.NDays),
                  a.manifestRetract(1)): Unit
                graft.ops.Pack.rebuild(spark, a, CurationNDay.NDays)
              }: Unit
            }
          // SIZE-CAP control (op = "cap", doc_id = maxTokens): same
          // two-phase slot, but the tape rebuild is governed by the
          // horizon capDay PINNED before mutating — a slot replayed
          // after the cap committed still knows whether it expired
          // anything (rebuild) or was an under-cap no-op (leave the
          // valid per-day tape untouched).
          ControlChannel.payloads(rows, ControlChannel.OpCap)
            .foreach { maxTok =>
              ControlChannel.slot(spark, a.ledger, s"cap${k}_done") {
                // the ORDER-INDEPENDENT variant: a calendar may
                // schedule this slot after a ttl whose rebuild
                // collapsed the pack day segments (identical horizons
                // when it doesn't — see capDayPinned)
                CurationNDay.capDayPinned(spark, a, s"cap$k", maxTok,
                  a.manifestDay(CurationNDay.NDays),
                  a.manifestRetract(1)): Unit
                val horizon = spark.read
                  .parquet(a.capHorizon(s"cap$k"))
                  .head().getInt(0) // one pinned row
                if (horizon > 0)
                  graft.ops.Pack.rebuild(spark, a, CurationNDay.NDays)
              }: Unit
            }
          // COMPACTION control (op = "compact", payload ignored): the
          // dedup index's accrued per-day append files settled into
          // right-sized ones IN the calendar — the mm chain's
          // op = "compact" slot ([[MultiStream]]) on the curation
          // side. Content-invariant by construction (staging +
          // rename-swap, [[graft.ops.Dedup.compactDedupIndex]]), so
          // every later day's decisions must stay bit-identical;
          // single-phase, exactly-once via the slot's done row.
          ControlChannel.payloads(rows, ControlChannel.OpCompact)
            .foreach { _ =>
              ControlChannel.slot(spark, a.ledger, s"compact${k}_done") {
                graft.ops.Dedup.compactDedupIndex(spark, a.index,
                  CompactParts)
              }: Unit
            }
        }
      }
      .start()

  /** Target part-file count per index table after a calendar
    * compaction slot (fixture-sized; a production calendar sizes this
    * to `table_bytes / maxPartitionBytes`).
    */
  val CompactParts = 2

  private def partFiles(spark: SparkSession, path: String): Int =
    graft.core.Layout.partFiles(spark, path)

  /** Stage day k's drop into the landing dir as ONE parquet file named
    * `day<k>.parquet` (deterministic one-file-per-day granularity for
    * the gate/spec runs; see object Scaladoc for the production shape).
    */
  def landDrop(spark: SparkSession, a: CurationDay.Artifacts,
               k: Int): Unit =
    // mod times pinned to a strictly-increasing run-stable ladder
    // anchored on the bootstrap bench file (see ControlChannel.land)
    ControlChannel.land(spark, a.landing,
      spark.read.parquet(a.dropDay(k)).withColumn("day", lit(k)),
      s"${a.root}/land_tmp_day$k", s"day$k.parquet", a.bench,
      k * 60000L)

  /** Land a retention CONTROL record (op = "ttl", doc_id =
    * keepFromDay) at calendar slot `slot` — its pinned modification
    * time sorts after day `slot`'s drop (and a replay after the
    * original).
    */
  def landControl(spark: SparkSession, a: CurationDay.Artifacts,
                  slot: Int, payload: Long, name: String = "",
                  op: String = "ttl"): Unit =
    ControlChannel.landControl(spark, a.landing, a.root, slot, op,
      payload,
      if (name.isEmpty) s"ctl_${op}$slot.parquet" else name, a.bench,
      slot * 60000L + opOff(op) + (if (name.isEmpty) 0L else 5000L))

  /** Same-slot control ordering (the [[MultiStream]] ladder): ttl
    * before cap before compact — all after the slot's admissions and
    * their replays, before the next day — each op's replay 5 s after
    * its original.
    */
  private def opOff(op: String): Long = op match {
    case ControlChannel.OpTtl => 40000L
    case ControlChannel.OpCap => 46000L
    case ControlChannel.OpCompact => 52000L
    case other => sys.error(s"landControl: unknown op $other")
  }

  /** The STREAMED N-day lifecycle with the RETENTION CALENDAR slot
    * (r12 verdict task 2, curation side): days 1–2, the kill, days
    * 3–4 plus the ttl slot (keepFrom = 2 — age out snapshot + day 1)
    * and a REPLAY of the control, the restart, drain. The control
    * runs the ledgered expiry + tape rebuild in-stream; the replayed
    * control is a pure no-op via the slot's done row. Returns
    * (replayNoOp, ledgerDays) — replayNoOp additionally witnesses a
    * direct re-offer of the committed expiry no-op'ing.
    */
  def runTtlCalendarStreamed(spark: SparkSession, dir: String,
                             a: CurationDay.Artifacts)
      : (Boolean, Seq[String]) = {
    CurationNDay.bootstrapNDay(spark, dir, a)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    landDrop(spark, a, 1); landDrop(spark, a, 2)
    val q1 = start(spark, a, fetch)
    try { q1.processAllAvailable() } finally q1.stop() // the kill
    CurationNDay.writeDay4Drop(spark, dir, a)
    landDrop(spark, a, 3); landDrop(spark, a, 4)
    landControl(spark, a, slot = CurationNDay.NDays, payload = 2L)
    landControl(spark, a, slot = CurationNDay.NDays, payload = 2L,
      name = "ctl4_replay.parquet")
    val q2 = start(spark, a, fetch) // same checkpoint: the restart
    try { q2.processAllAvailable() } finally q2.stop()
    val replayNoOp = !CurationNDay.ttlDay(spark, a,
      s"ttl${CurationNDay.NDays}", 2,
      a.manifestDay(CurationNDay.NDays), a.manifestRetract(1))
    (replayNoOp, CurationNDay.ledgerDays(spark, a.ledger))
  }

  /** The STREAMED SIZE-CAP calendar: days 1–4, the kill, then the cap
    * control (55% of the admitted token mass — the q557 scale-
    * proportional contract) plus its replay, the restart, drain. The
    * slot computes the horizon from the persisted pack masses, PINS
    * it, expires to it, rebuilds the tape, and commits its done row;
    * the replayed control is a pure no-op. Returns (replayNoOp,
    * ledgerDays, pinnedHorizon).
    */
  def runCapCalendarStreamed(spark: SparkSession, dir: String,
                             a: CurationDay.Artifacts)
      : (Boolean, Seq[String], Int) = {
    CurationNDay.bootstrapNDay(spark, dir, a)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    landDrop(spark, a, 1); landDrop(spark, a, 2)
    val q1 = start(spark, a, fetch)
    try { q1.processAllAvailable() } finally q1.stop()
    CurationNDay.writeDay4Drop(spark, dir, a)
    landDrop(spark, a, 3); landDrop(spark, a, 4)
    val q2 = start(spark, a, fetch)
    try { q2.processAllAvailable() } finally q2.stop() // the kill
    val total = (1 to CurationNDay.NDays).map { k =>
      spark.read.parquet(a.packDay(k))
        .agg(coalesce(sum(col("n_tok")), lit(0L)).as("m"))
        .head().getLong(0)
    }.sum
    val cap = total * 55L / 100L
    landControl(spark, a, slot = CurationNDay.NDays, payload = cap,
      op = "cap")
    landControl(spark, a, slot = CurationNDay.NDays, payload = cap,
      op = "cap", name = "cap4_replay.parquet")
    val q3 = start(spark, a, fetch) // same checkpoint: the restart
    try { q3.processAllAvailable() } finally q3.stop()
    val horizon = spark.read
      .parquet(a.capHorizon(s"cap${CurationNDay.NDays}"))
      .head().getInt(0)
    val replayNoOp = CurationNDay.capDayPinned(spark, a,
      s"cap${CurationNDay.NDays}", cap,
      a.manifestDay(CurationNDay.NDays), a.manifestRetract(1)) == 0
    (replayNoOp, CurationNDay.ledgerDays(spark, a.ledger), horizon)
  }

  /** The STREAMED COMPACTION calendar — the mm chain's
    * [[MultiStream.runDays4CompactStreamed]] on the CURATION side
    * (closing the op-coverage asymmetry the shared [[ControlChannel]]
    * contract exposed: both calendars now serve all three ops): day 1,
    * a compact1 slot, day 2 — the kill — days 3–4 plus the compact4
    * slot and its REPLAY, the restart, drain. Compaction is
    * content-invariant, so the decisions must stay bit-identical to
    * the plain chain (q505/q508's oracle — a third engine path onto
    * it), while the index's accrued append files settle into
    * [[CompactParts]] right-sized ones. Returns (replayNoOp,
    * ledgerDays, filesSettled): filesSettled witnesses NON-VACUITY —
    * the hash table held more part files than the target after the
    * day-2 append re-fragmented the compact1 result, and exactly the
    * target once the compact4 slot committed.
    */
  def runCompactCalendarStreamed(spark: SparkSession, dir: String,
                                 a: CurationDay.Artifacts)
      : (Boolean, Seq[String], Boolean) = {
    CurationNDay.bootstrapNDay(spark, dir, a)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    landDrop(spark, a, 1)
    landControl(spark, a, slot = 1, payload = 0L, op = "compact")
    landDrop(spark, a, 2) // mtime ladder: day1 < compact1 < day2
    val q1 = start(spark, a, fetch)
    try { q1.processAllAvailable() } finally q1.stop() // the kill
    val fragmented = // day 2's append re-fragmented the compact1 result
      partFiles(spark, s"${a.index}/hashes.parquet") > CompactParts
    CurationNDay.writeDay4Drop(spark, dir, a)
    landDrop(spark, a, 3); landDrop(spark, a, 4)
    landControl(spark, a, slot = CurationNDay.NDays, payload = 0L,
      op = "compact")
    landControl(spark, a, slot = CurationNDay.NDays, payload = 0L,
      op = "compact", name = "compact4_replay.parquet")
    val q2 = start(spark, a, fetch) // same checkpoint: the restart
    try { q2.processAllAvailable() } finally q2.stop()
    val settled =
      partFiles(spark, s"${a.index}/hashes.parquet") == CompactParts &&
      partFiles(spark, s"${a.index}/bands.parquet") == CompactParts
    // replay witness: the committed compact4 slot re-offered directly
    val replayNoOp = !ControlChannel.slot(spark, a.ledger,
      s"compact${CurationNDay.NDays}_done") {
      graft.ops.Dedup.compactDedupIndex(spark, a.index, CompactParts)
    }
    (replayNoOp, CurationNDay.ledgerDays(spark, a.ledger),
      fragmented && settled)
  }

  /** The CURATION-side FULL MAINTENANCE CALENDAR — all three control
    * ops in ONE streamed run (the q604/q605 mm capstone's sibling,
    * runnable because the streamed cap slot rides
    * [[CurationNDay.capDayPinned]], whose decision-pinned masses
    * survive the ttl slot's tape rebuild): day 1, a compact1 slot,
    * day 2 — kill 1 — days 3–4, the ttl4 slot (keepFrom = 2: snapshot
    * + day 1 out) plus its replay — restart 1, kill 2 — the cap4 slot
    * (fixture `m4 + m3 + m2/2` over the POST-TTL pinned masses,
    * deterministically between tail(3) and tail(2) at any sf, so the
    * pinned horizon is always 3: day 2 expires) plus its replay, a
    * final compact4 slot — restart 2, drain.
    *
    * Decisions stay bit-identical to the plain chain (q505/q508's
    * oracle — every slot follows the admissions it governs; compact1
    * is content-invariant). Returns (replayNoOp, ledgerDays, horizon,
    * settled): replayNoOp re-offers all three committed controls
    * directly; settled witnesses the compact4 slot re-settling the
    * index the cap's expiry rewrite had just re-fragmented.
    */
  def runFullCalendarStreamed(spark: SparkSession, dir: String,
                              a: CurationDay.Artifacts)
      : (Boolean, Seq[String], Int, Boolean) = {
    CurationNDay.bootstrapNDay(spark, dir, a)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    landDrop(spark, a, 1)
    landControl(spark, a, slot = 1, payload = 0L, op = "compact")
    landDrop(spark, a, 2) // mtime ladder: day1 < compact1 < day2
    val q1 = start(spark, a, fetch)
    try { q1.processAllAvailable() } finally q1.stop() // kill 1
    CurationNDay.writeDay4Drop(spark, dir, a)
    landDrop(spark, a, 3); landDrop(spark, a, 4)
    landControl(spark, a, slot = CurationNDay.NDays, payload = 2L)
    landControl(spark, a, slot = CurationNDay.NDays, payload = 2L,
      name = "ctl_ttl4_replay.parquet")
    val q2 = start(spark, a, fetch) // restart 1
    try { q2.processAllAvailable() } finally q2.stop() // kill 2
    val m = CurationNDay.pinnedMasses(spark, a)
    val cap = m.getOrElse(4, 0L) + m.getOrElse(3, 0L) +
      m.getOrElse(2, 0L) / 2L
    landControl(spark, a, slot = CurationNDay.NDays, payload = cap,
      op = "cap")
    landControl(spark, a, slot = CurationNDay.NDays, payload = cap,
      op = "cap", name = "ctl_cap4_replay.parquet")
    landControl(spark, a, slot = CurationNDay.NDays, payload = 0L,
      op = "compact")
    val q3 = start(spark, a, fetch) // restart 2
    try { q3.processAllAvailable() } finally q3.stop()
    val settled =
      partFiles(spark, s"${a.index}/hashes.parquet") == CompactParts &&
      partFiles(spark, s"${a.index}/bands.parquet") == CompactParts
    val horizon = spark.read
      .parquet(a.capHorizon(s"cap${CurationNDay.NDays}"))
      .head().getInt(0)
    val replayNoOp =
      !CurationNDay.ttlDay(spark, a, s"ttl${CurationNDay.NDays}", 2,
        a.manifestDay(CurationNDay.NDays), a.manifestRetract(1)) &&
      CurationNDay.capDayPinned(spark, a, s"cap${CurationNDay.NDays}",
        cap, a.manifestDay(CurationNDay.NDays),
        a.manifestRetract(1)) == 0 &&
      !ControlChannel.slot(spark, a.ledger,
        s"compact${CurationNDay.NDays}_done") {
        graft.ops.Dedup.compactDedupIndex(spark, a.index, CompactParts)
      }
    (replayNoOp, CurationNDay.ledgerDays(spark, a.ledger), horizon,
      settled)
  }

  /** The full STREAMED N-day lifecycle with a kill/restart witnessed
    * mid-chain (the gate row runs THIS, so recovery is part of the
    * official evidence, not just a spec): bootstrap; land days 1–2;
    * stream them; STOP the query (the kill); manually re-offer day 2
    * (a replayed, already-committed day must no-op via the ledger);
    * derive + land days 3–4; RESTART from the same checkpoint; drain.
    * Returns (replayNoOp, ledgerDays) for the report row to pin.
    */
  def runDaysStreamed(spark: SparkSession, dir: String,
                      a: CurationDay.Artifacts): (Boolean, Seq[String]) = {
    CurationNDay.bootstrapNDay(spark, dir, a)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    landDrop(spark, a, 1); landDrop(spark, a, 2)
    val q1 = start(spark, a, fetch)
    try { q1.processAllAvailable() } finally q1.stop()
    // replay witness: a committed day offered again is a pure no-op
    val replayNoOp = !CurationNDay.processDay(spark, a, 2,
      spark.read.parquet(a.dropDay(2)), fetch)
    CurationNDay.writeDay4Drop(spark, dir, a)
    landDrop(spark, a, 3); landDrop(spark, a, 4)
    val q2 = start(spark, a, fetch) // same checkpoint: the restart
    try { q2.processAllAvailable() } finally q2.stop()
    (replayNoOp, CurationNDay.ledgerDays(spark, a.ledger))
  }
}
