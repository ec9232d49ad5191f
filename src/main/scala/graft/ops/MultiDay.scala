package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MULTIMODAL admission day — the three persisted near-dup
  * indexes ([[Dedup.writeDedupIndex]] lexical, [[SemIndex]] semantic,
  * [[PhashIndex]] perceptual) composed into ONE incremental day: a
  * delta document is admitted only when ALL THREE stages clear it,
  * and only overall-admitted documents append to ANY index, so the
  * three artifacts stay consistent views of one admitted corpus. The
  * verdict priority is fixed and re-derivable: a lexical verdict
  * (exact/batch/near) wins over a semantic one, semantic over
  * perceptual — the cheap-to-explain "first failing stage" rule.
  *
  * Replay contract: the COMBINED decisions pin before any index
  * mutation (the [[CurationNDay.processDayBody]] rule — naive
  * recomputation would self-collide with the day's own appends in
  * all three indexes at once), every append is anti-joined. 100 TB
  * shape: each stage keeps its own documented delta-proportional
  * cost; the composition adds only model-per-doc joins of the three
  * verdict frames.
  */
object MultiDay {

  case class Paths(root: String) {
    def lex: String = s"$root/lex_index"
    def sem: SemIndex.Paths = SemIndex.Paths(s"$root/sem")
    def ph: PhashIndex.Paths = PhashIndex.Paths(s"$root/ph")
    def decisionsDay(k: Int): String = s"$root/multi_decisions_day$k.parquet"
  }

  val NGram = 3; val K = 16; val Bands = 4; val Threshold = 0.8

  /** Build all three snapshot indexes from the same id space. */
  def bootstrap(spark: SparkSession, docs: DataFrame, vecs: DataFrame,
                hashed: DataFrame, p: Paths): Unit = {
    Dedup.writeDedupIndex(docs, "text", "doc_id", p.lex, NGram, K, Bands)
    SemIndex.bootstrap(spark, vecs, p.sem)
    PhashIndex.write(spark, hashed, p.ph)
  }

  /** One composed day: three stage verdicts joined on the shared id,
    * combined by stage priority, pinned, then the overall-admitted
    * set appended to all three indexes. `corpusFetch` is the lexical
    * candidate-verify text service (id-pruned read).
    */
  def processDay(spark: SparkSession, p: Paths, k: Int,
                 docs: DataFrame, vecs: DataFrame, hashed: DataFrame,
                 corpusFetch: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(p.decisionsDay(k))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned = fs.exists(new org.apache.hadoop.fs.Path(
      p.decisionsDay(k) + "/_SUCCESS"))
    val dec =
      if (pinned)
        spark.read.parquet(p.decisionsDay(k)).localCheckpoint(true)
      else {
        val lex = Dedup.incrementalDedupIndexed(p.lex, corpusFetch,
            docs, "text", "doc_id", NGram, K, Bands, Threshold)
          .withColumnRenamed("decision", "__lex")
        val sem = SemIndex.decisions(spark, p.sem, vecs)
          .select(col("vec_id").as("doc_id"),
            col("decision").as("__sem"))
        val ph = PhashIndex.decisions(spark, p.ph, hashed)
          .select(col("media_id").as("doc_id"),
            col("decision").as("__ph"))
        // FULL joins: the op is generic, so a delta doc missing an
        // embedding or image row must not silently vanish — it gets
        // the loud `missing_modality` verdict (never admitted, never
        // appended) instead of dropping out of the decisions frame.
        val d = lex.join(sem, Seq("doc_id"), "full")
          .join(ph, Seq("doc_id"), "full")
          .select(col("doc_id"),
            when(col("__lex").isNull || col("__sem").isNull ||
              col("__ph").isNull, lit("missing_modality"))
              .when(col("__lex") =!= "admitted", col("__lex"))
              .when(col("__sem") =!= "admitted", col("__sem"))
              .when(col("__ph") =!= "admitted", col("__ph"))
              .otherwise(lit("admitted")).as("decision"))
          .localCheckpoint(true)
        d.write.mode("overwrite").parquet(p.decisionsDay(k))
        d
      }
    val admIds = dec.where(col("decision") === "admitted")
      .select("doc_id").localCheckpoint(true)
    Dedup.appendDedupIndex(docs.join(admIds, "doc_id"), "text",
      "doc_id", p.lex, NGram, K, Bands)
    SemIndex.append(spark, p.sem,
      vecs.join(admIds.withColumnRenamed("doc_id", "vec_id"), "vec_id"))
    PhashIndex.append(spark, p.ph,
      hashed.join(admIds.withColumnRenamed("doc_id", "media_id"),
        "media_id"))
    dec
  }

  // =====================================================================
  // The ROUND-12 generation: FOUR stages (lexical, semantic, perceptual
  // image, perceptual AUDIO), per-stage verdict columns, within-day
  // near-dup passes, a decode-once media artifact, N = 3 days with a
  // DAY LEDGER, and a streamed delivery path
  // ([[graft.streaming.MultiStream]]) — the [[CurationNDay]] contract
  // lifted onto the composed multimodal day. The round-11 two-day
  // `processDay` above is kept as-is (its gates pin the original
  // contract); everything below is the generalized lifecycle.
  // =====================================================================

  /** Artifact roots of the 4-index lifecycle. `media` is the
    * decode-once [[MediaHashes]] table; `aud` reuses the
    * [[PhashIndex]] layout over audio fingerprints (the machinery is
    * modality-blind over 8 row-bytes).
    */
  case class Paths4(root: String) {
    def lex: String = s"$root/lex_index"
    def sem: SemIndex.Paths = SemIndex.Paths(s"$root/sem")
    def ph: PhashIndex.Paths = PhashIndex.Paths(s"$root/ph")
    def aud: PhashIndex.Paths = PhashIndex.Paths(s"$root/aud")
    def media: String = s"$root/media_hashes.parquet"
    def decisionsDay(k: Int): String = s"$root/mm_decisions_day$k.parquet"
    def dropDay(k: Int): String = s"$root/mm_drop_day$k.parquet"
    def ledger: String = s"$root/day_ledger"
    def landing: String = s"$root/landing"
    def streamCp: String = s"$root/stream_cp"
    def capHorizon(dayId: String): String =
      s"$root/cap_horizon_$dayId.parquet"
  }

  val NDays4 = 3

  /** The fixture lifecycle's %8 split: snapshot {4..7}, day 1 = 0,
    * day 2 = 1, day 3 = {2,3} + the three sentinels. Image payloads
    * are PAIR-grouped (`doc_id − doc_id%2`), so a day-1 even doc's
    * partner arrives on day 2 (cross-day perceptual witness through
    * the day-1 append alone) and a day-3 pair co-arrives (the
    * within-day pass's organic witness).
    */
  private def m8(c: org.apache.spark.sql.Column) = pmod(c, lit(8L))

  private val pngUdf =
    Multimodal.pngVarUdf

  /** One day's organic drop: (doc_id, text, embedding, img). */
  private def organicDrop(spark: SparkSession, dir: String,
                          pred: org.apache.spark.sql.Column): DataFrame =
    graft.core.Tables.plain(spark, dir, "documents")
      .select("doc_id", "text").where(pred)
      .join(graft.core.Tables.plain(spark, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .withColumn("img",
        pngUdf(col("doc_id") - pmod(col("doc_id"), lit(2L))))

  /** The drop frame as a media frame for [[MediaHashes]]: the image
    * payload plus the audio track (documents-as-media text bytes —
    * the q290 convention; cast string→binary is UTF-8 in Spark and
    * `ord(substr(..))` in the oracle, byte-identical on the fixture's
    * ASCII text).
    */
  private def mediaOf(drop: DataFrame): DataFrame =
    drop.select(col("doc_id").as("media_id"),
      col("img").as("payload"), col("text").cast("binary").as("audio"))

  /** Bootstrap all four snapshot indexes + the media artifact from the
    * %8 ∈ {4..7} snapshot, and stage the day-1/-2 organic drops.
    */
  def bootstrap4(spark: SparkSession, dir: String, p: Paths4): Unit = {
    val snap = organicDrop(spark, dir, m8(col("doc_id")) >= 4L)
      .localCheckpoint(true)
    // all tracks read only the pinned snapshot / base tables and write
    // disjoint artifacts — overlap them (guide §2.6)
    graft.core.Par.run(
      () => Dedup.writeDedupIndex(snap, "text", "doc_id", p.lex, NGram,
        K, Bands),
      () => SemIndex.bootstrap(spark,
        snap.select(col("doc_id").as("vec_id"), col("embedding")), p.sem),
      () => { // media chain: extend, then both index writes off it
        MediaHashes.extend(spark, p.media, mediaOf(snap))
        val sigs = MediaHashes.fetchBoth(spark, p.media,
          snap.select(col("doc_id").as("media_id"))).localCheckpoint(true)
        graft.core.Par.run(
          () => PhashIndex.write(spark, MediaHashes.imageOf(sigs), p.ph),
          () => PhashIndex.write(spark, MediaHashes.audioOf(sigs), p.aud))
      },
      () => organicDrop(spark, dir, m8(col("doc_id")) === 0L)
        .write.mode("overwrite").parquet(p.dropDay(1)),
      () => organicDrop(spark, dir, m8(col("doc_id")) === 1L)
        .write.mode("overwrite").parquet(p.dropDay(2)))
  }

  /** The day-3 drop: organic %8 ∈ {2,3} plus three FULL-CLONE
    * sentinels derived from the pipeline's OWN pinned decisions (the
    * q492 planting rule, per modality): 9600001 clones the smallest
    * day-1 OVERALL-admitted doc (text + embedding + image group + the
    * audio track the text implies) — every stage must flag it dup via
    * the day-1 appends; 9600002 the same off day 2; 9600003 clones
    * the smallest day-3 ORGANIC doc — a same-day clone, so each of
    * its stage verdicts must be a dup (corpus or batch, whichever the
    * source's own corpus check dictates) and it can never be
    * admitted.
    */
  /** A FULL-CLONE sentinel row: all modalities (text, embedding,
    * image payload group — the audio track follows the text) of the
    * smallest id in `src`, re-badged as `newId`.
    */
  private def cloneOf(spark: SparkSession, dir: String, src: DataFrame,
                      newId: Long): DataFrame =
    src.orderBy("doc_id").limit(1)
      .join(graft.core.Tables.plain(spark, dir, "documents")
        .select("doc_id", "text"), "doc_id")
      .join(graft.core.Tables.plain(spark, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .select(lit(newId).as("doc_id"), col("text"), col("embedding"),
        pngUdf(col("doc_id") - pmod(col("doc_id"), lit(2L))).as("img"))

  def writeDay3Drop(spark: SparkSession, dir: String, p: Paths4): Unit = {
    val organic = organicDrop(spark, dir, m8(col("doc_id")).isin(2L, 3L))
    def admittedOf(k: Int): DataFrame =
      spark.read.parquet(p.decisionsDay(k))
        .where(col("decision") === "admitted").select("doc_id")
    organic
      .unionByName(cloneOf(spark, dir, admittedOf(1), 9600001L))
      .unionByName(cloneOf(spark, dir, admittedOf(2), 9600002L))
      .unionByName(cloneOf(spark, dir, organic.select("doc_id"), 9600003L))
      .write.mode("overwrite").parquet(p.dropDay(3))
  }

  /** The four stage verdicts over one day's drop, combined into ONE
    * row per doc with the per-stage columns DISCLOSED (d_lex, d_sem,
    * d_ph, d_aud) plus the combined verdict under the fixed stage
    * priority lexical > semantic > perceptual > audio (corpus hits
    * already outrank batch hits within each stage). FULL joins: a doc
    * missing any modality gets the loud `missing_modality` combined
    * verdict — never admitted, never silently dropped.
    */
  /** The four near-dup stage columns, FULL-joined on the shared id
    * with nulls preserved (a missing modality surfaces as a null
    * stage value for the combiners to flag loudly).
    */
  private def stageVerdicts(spark: SparkSession, p: Paths4,
                            drop: DataFrame, imgHashed: DataFrame,
                            audHashed: DataFrame,
                            corpusFetch: DataFrame): DataFrame = {
    val lex = Dedup.incrementalDedupIndexed(p.lex, corpusFetch,
        drop.select("doc_id", "text"), "text", "doc_id", NGram, K,
        Bands, Threshold)
      .withColumnRenamed("decision", "d_lex")
    val sem = SemIndex.decisions(spark, p.sem,
        drop.select(col("doc_id").as("vec_id"), col("embedding")),
        withinBatch = true)
      .select(col("vec_id").as("doc_id"), col("decision").as("d_sem"))
    val ph = PhashIndex.decisions(spark, p.ph, imgHashed,
        withinBatch = true, label = "phash")
      .select(col("media_id").as("doc_id"), col("decision").as("d_ph"))
    val aud = PhashIndex.decisions(spark, p.aud, audHashed,
        withinBatch = true, label = "audio")
      .select(col("media_id").as("doc_id"), col("decision").as("d_aud"))
    lex.join(sem, Seq("doc_id"), "full")
      .join(ph, Seq("doc_id"), "full")
      .join(aud, Seq("doc_id"), "full")
  }

  def decisions4(spark: SparkSession, p: Paths4, drop: DataFrame,
                 imgHashed: DataFrame, audHashed: DataFrame,
                 corpusFetch: DataFrame): DataFrame = {
    val stages = Seq(col("d_lex"), col("d_sem"), col("d_ph"), col("d_aud"))
    stageVerdicts(spark, p, drop, imgHashed, audHashed, corpusFetch)
      .select(col("doc_id"), col("d_lex"), col("d_sem"), col("d_ph"),
        col("d_aud"),
        when(stages.map(_.isNull).reduce(_ || _), lit("missing_modality"))
          .when(col("d_lex") =!= "admitted", col("d_lex"))
          .when(col("d_sem") =!= "admitted", col("d_sem"))
          .when(col("d_ph") =!= "admitted", col("d_ph"))
          .when(col("d_aud") =!= "admitted", col("d_aud"))
          .otherwise(lit("admitted")).as("decision"))
  }

  /** The FULL admission stack — the four near-dup stages composed
    * with the lexical curation day's POST-GATES: benchmark
    * CONTAMINATION ([[Corpus.contamination]] at the q488 contract —
    * flag when shared distinct 8-grams exceed
    * [[CurationDay.ContamPpm]] ppm of the doc's grams) and the
    * repetition QUALITY gate (duplicate 2-gram mass over
    * [[CurationDay.RepTenths]] tenths). Six verdict columns
    * disclosed; the combined priority appends the two gates after
    * the dedup stages (dedup > contamination > quality — the
    * [[graft.queries.Curation8]] postGate order). The gates are pure
    * per-doc functions of the day's own text + the model-sized bench
    * gram set — no index state, so they add zero cross-day machinery
    * but DO govern the appends: a contaminated or low-quality doc
    * never touches any index (q559's day-2 sentinel witnesses this
    * through a clone of a day-1 post-gate-rejected doc coming back
    * dedup-clean).
    */
  def decisions6(spark: SparkSession, p: Paths4, drop: DataFrame,
                 imgHashed: DataFrame, audHashed: DataFrame,
                 corpusFetch: DataFrame, bench: DataFrame): DataFrame = {
    val contam = Corpus.contamination(drop.select("doc_id", "text"),
        bench, "text", "doc_id", 8)
      .select(col("doc_id"),
        when(col("n_contaminated") * 1000000L >
            lit(CurationDay.ContamPpm) * col("n_grams"),
          lit("contaminated")).otherwise(lit("admitted")).as("d_contam"))
    val g2 = Dedup.shingles(col("text"), 2)
    val qual = drop.select(col("doc_id"),
      when((size(g2) - size(array_distinct(g2))).cast("long") * 10L >
          lit(CurationDay.RepTenths) * size(g2).cast("long"),
        lit("low_quality")).otherwise(lit("admitted")).as("d_qual"))
    val stages = Seq(col("d_lex"), col("d_sem"), col("d_ph"),
      col("d_aud"), col("d_contam"), col("d_qual"))
    stageVerdicts(spark, p, drop, imgHashed, audHashed, corpusFetch)
      .join(contam, Seq("doc_id"), "full")
      .join(qual, Seq("doc_id"), "full")
      .select(col("doc_id"), col("d_lex"), col("d_sem"), col("d_ph"),
        col("d_aud"), col("d_contam"), col("d_qual"),
        when(stages.map(_.isNull).reduce(_ || _), lit("missing_modality"))
          .when(col("d_lex") =!= "admitted", col("d_lex"))
          .when(col("d_sem") =!= "admitted", col("d_sem"))
          .when(col("d_ph") =!= "admitted", col("d_ph"))
          .when(col("d_aud") =!= "admitted", col("d_aud"))
          .when(col("d_contam") =!= "admitted", col("d_contam"))
          .when(col("d_qual") =!= "admitted", col("d_qual"))
          .otherwise(lit("admitted")).as("decision"))
  }

  /** One 4-stage day, LEDGER-GATED (the [[CurationNDay.processDay]]
    * exactly-once-per-day contract): a committed day is a pure no-op;
    * a day that died before its ledger row re-runs convergently —
    * the media-artifact extend is anti-joined, the decisions PIN
    * before any index mutation and a completed pin is REUSED (the
    * decision-pin rule: recomputation against indexes that absorbed
    * this day's own appends would self-flag every admission), and all
    * four appends are anti-joined.
    */
  def processDay4(spark: SparkSession, p: Paths4, k: Int,
                  drop: DataFrame, corpusFetch: DataFrame): Boolean = {
    val dayId = s"mm$k"
    if (CurationNDay.ledgerSeen(spark, p.ledger, dayId)) false
    else {
      processDay4Body(spark, p, k, drop, corpusFetch)
      CurationNDay.appendLedger(spark, p.ledger, dayId)
      true
    }
  }

  /** [[processDay4]] with the FULL six-stage verdict
    * ([[decisions6]]): same ledger, same pin, same anti-joined
    * appends — but the append set is the six-stage overall admission,
    * so post-gate-rejected docs never touch any index.
    */
  def processDay6(spark: SparkSession, p: Paths4, k: Int,
                  drop: DataFrame, corpusFetch: DataFrame,
                  bench: DataFrame): Boolean = {
    val dayId = s"mm$k"
    if (CurationNDay.ledgerSeen(spark, p.ledger, dayId)) false
    else {
      processDay4Body(spark, p, k, drop, corpusFetch, Some(bench))
      CurationNDay.appendLedger(spark, p.ledger, dayId)
      true
    }
  }

  /** Everything except the ledger commit — the crash window, exposed
    * for the torn-day spec. Days must arrive in order (day k needs
    * day k−1's pin).
    */
  private[graft] def processDay4Body(spark: SparkSession, p: Paths4,
                                     k: Int, drop: DataFrame,
                                     corpusFetch: DataFrame,
                                     bench: Option[DataFrame] = None)
      : Unit = {
    val fs = new org.apache.hadoop.fs.Path(p.decisionsDay(k))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (k > 1)
      require(fs.exists(new org.apache.hadoop.fs.Path(
        p.decisionsDay(k - 1) + "/_SUCCESS")),
        s"processDay4: day $k arrived before day ${k - 1}")
    val d = drop.localCheckpoint(true)
    // decode-once: extend the media artifact FIRST (anti-joined, so a
    // replay re-decodes only its own drop and appends nothing)
    MediaHashes.extend(spark, p.media, mediaOf(d))
    val ids = d.select(col("doc_id").as("media_id"))
    // one pruned fetch serves both modalities (one collect + one
    // materialization instead of two of each)
    val sigs = MediaHashes.fetchBoth(spark, p.media, ids)
      .localCheckpoint(true)
    val imgHashed = MediaHashes.imageOf(sigs)
    val audHashed = MediaHashes.audioOf(sigs)
    val pinned = fs.exists(new org.apache.hadoop.fs.Path(
      p.decisionsDay(k) + "/_SUCCESS"))
    val dec =
      if (pinned)
        spark.read.parquet(p.decisionsDay(k)).localCheckpoint(true)
      else {
        val x = (bench match {
          case Some(b) =>
            decisions6(spark, p, d, imgHashed, audHashed, corpusFetch, b)
          case None =>
            decisions4(spark, p, d, imgHashed, audHashed, corpusFetch)
        }).localCheckpoint(true)
        x.write.mode("overwrite").parquet(p.decisionsDay(k))
        x
      }
    val admIds = dec.where(col("decision") === "admitted")
      .select("doc_id").localCheckpoint(true)
    // the four appends touch disjoint artifacts and read only pinned
    // frames — overlap them (guide §2.6)
    val admMedia = admIds.select(col("doc_id").as("media_id"))
    graft.core.Par.run(
      () => Dedup.appendDedupIndex(d.join(admIds, "doc_id"), "text",
        "doc_id", p.lex, NGram, K, Bands),
      () => SemIndex.append(spark, p.sem,
        d.join(admIds, "doc_id")
          .select(col("doc_id").as("vec_id"), col("embedding"))),
      () => PhashIndex.append(spark, p.ph,
        imgHashed.join(admMedia, "media_id")),
      () => PhashIndex.append(spark, p.aud,
        audHashed.join(admMedia, "media_id")))
  }

  /** The BATCH engine path: bootstrap, days 1–2, derive + apply the
    * sentinel-planted day 3 — each through the same ledgered
    * [[processDay4]] the streaming path invokes per micro-batch.
    */
  def runDays4Batch(spark: SparkSession, dir: String, p: Paths4): Unit = {
    bootstrap4(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    (1 to 2).foreach { k =>
      processDay4(spark, p, k, spark.read.parquet(p.dropDay(k)),
        fetch): Unit
    }
    writeDay3Drop(spark, dir, p)
    processDay4(spark, p, 3, spark.read.parquet(p.dropDay(3)), fetch): Unit
  }

  /** The batch path WITH MAINTENANCE INTERLEAVED — the operational
    * calendar a production pipeline actually runs (admit, then settle
    * the file debt in the maintenance slot, then admit again):
    * content-invariant compactions of the lexical hash/band tables,
    * the semantic cell partitions, and the media artifact execute
    * BETWEEN the days. Decisions must be bit-identical to the plain
    * chain — q558 gates this path against the SAME composed oracle as
    * q542/q545 (third engine path, one oracle), turning "compaction
    * changes nothing" from a per-op claim into a lifecycle-level
    * proof.
    */
  /** The full maintenance set — content-invariant compactions of all
    * FOUR indexes + the media artifact (each staging + rename-swap,
    * self-healing on replay via [[graft.core.Layout.healTorn]]);
    * shared by the batch maintained chain and the streamed
    * `op = "compact"` calendar slot.
    */
  def maintain4(spark: SparkSession, p: Paths4): Unit =
    // five disjoint artifacts, each compaction self-contained — overlap
    graft.core.Par.run(
      () => Dedup.compactDedupIndex(spark, p.lex, partitions = 1),
      () => SemIndex.compact(spark, p.sem),
      () => PhashIndex.compact(spark, p.ph),
      () => PhashIndex.compact(spark, p.aud),
      () => MediaHashes.compact(spark, p.media))

  def runDays4BatchMaintained(spark: SparkSession, dir: String,
                              p: Paths4): Unit = {
    bootstrap4(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    (1 to 2).foreach { k =>
      processDay4(spark, p, k, spark.read.parquet(p.dropDay(k)),
        fetch): Unit
      maintain4(spark, p)
    }
    writeDay3Drop(spark, dir, p)
    processDay4(spark, p, 3, spark.read.parquet(p.dropDay(3)), fetch): Unit
  }

  /** The indexed-docs text frame a retention day's lexical stillHeld
    * pass scans, derived from the lexical index's OWN band table (the
    * index knows its membership — no lifecycle-specific snapshot
    * predicate has to travel into the retention calendar). Text
    * resolution covers BOTH id spaces an index member can live in:
    * the corpus fetch AND the staged drop files — an admitted
    * drop-file sentinel (doc_id absent from the corpus table) indexed
    * before a later retention slot would otherwise be missing from
    * the stillHeld pass, allowing over-deletion of a content hash it
    * shares with an expiring victim. Any band id that resolves in
    * NEITHER source loud-fails — a silent miss is exactly the
    * over-deletion bug this frame exists to prevent. Costs: the drop
    * union is day-sized, the membership join is index-sized, the
    * resolution check one index-sized count.
    */
  def indexedDocs(spark: SparkSession, p: Paths4,
                  corpusFetch: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(p.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val drops = (1 to NDays4)
      .filter(k => fs.exists(new org.apache.hadoop.fs.Path(
        p.dropDay(k) + "/_SUCCESS")))
      .map(k => spark.read.parquet(p.dropDay(k)).select("doc_id", "text"))
    // one text per id: corpus text == drop text for organic ids (the
    // drops are derived from the corpus tables), and sentinel ids
    // appear only in drops — min() just collapses the duplicates
    val texts = (corpusFetch.select("doc_id", "text") +: drops)
      .reduce(_.unionByName(_))
      .groupBy("doc_id").agg(min(col("text")).as("text"))
    val members = spark.read.parquet(s"${p.lex}/bands.parquet")
      .select(col("corpus_id").as("doc_id")).distinct()
      .localCheckpoint(true)
    val missing = members.join(texts, Seq("doc_id"), "left_anti").count()
    require(missing == 0L,
      s"indexedDocs: $missing indexed ids resolve in neither the " +
        "corpus fetch nor any staged drop — stillHeld would over-delete")
    texts.join(members, "doc_id")
  }

  /** The batch CALENDAR — admission days with a LEDGERED retention
    * day interleaved (the r12 verdict's "stream the retention
    * calendar" task, batch engine path): days 1–2 admit, the ttl2
    * slot expires day 1's admissions from all four indexes, day 3
    * admits against the RETAINED state — so a day-3 clone of an
    * expired day-1 doc genuinely re-admits (retention re-opens
    * admission THROUGH the calendar, the q551 story as a calendar
    * slot). Decisions for days 1–2 are bit-identical to the plain
    * chain; day 3's oracle models the interleaved horizon (q569).
    */
  def runDays4Calendar(spark: SparkSession, dir: String,
                       p: Paths4): Unit = {
    bootstrap4(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    (1 to 2).foreach { k =>
      processDay4(spark, p, k, spark.read.parquet(p.dropDay(k)),
        fetch): Unit
    }
    ttl4Day(spark, p, "ttl2", Seq(1), indexedDocs(spark, p, fetch)): Unit
    writeDay3Drop(spark, dir, p)
    processDay4(spark, p, 3, spark.read.parquet(p.dropDay(3)), fetch): Unit
  }

  /** All N days' pinned verdicts as one frame. */
  def allDecisions4(spark: SparkSession, p: Paths4): DataFrame =
    (1 to NDays4).map { k =>
      spark.read.parquet(p.decisionsDay(k))
        .select(lit(k).as("day"), col("doc_id"), col("d_lex"),
          col("d_sem"), col("d_ph"), col("d_aud"), col("decision"))
    }.reduce(_.unionByName(_))

  // ---- the FULL-STACK (six-stage) fixture lifecycle ------------------

  /** The benchmark frame: the `src0` source plays the held-out eval
    * suite (the q488 convention) — text only, no modality needed.
    */
  def benchOf(spark: SparkSession, dir: String): DataFrame =
    graft.core.Tables.plain(spark, dir, "documents")
      .where(col("source") === "src0").select("doc_id", "text")

  /** Full-stack organic drop: participants (docs ⋈ embeddings) with
    * the bench source EXCLUDED from the pool, %4 split.
    */
  private def organicDrop6(spark: SparkSession, dir: String,
                           pred: org.apache.spark.sql.Column): DataFrame =
    graft.core.Tables.plain(spark, dir, "documents")
      .where(col("source") =!= "src0" && pred)
      .select("doc_id", "text")
      .join(graft.core.Tables.plain(spark, dir, "embeddings")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .withColumn("img",
        pngUdf(col("doc_id") - pmod(col("doc_id"), lit(2L))))

  private def m4(c: org.apache.spark.sql.Column) = pmod(c, lit(4L))

  /** Bootstrap the four indexes + media artifact from the pool's
    * %4 ∈ {2,3} snapshot and stage the day-1 organic drop.
    */
  def bootstrap6(spark: SparkSession, dir: String, p: Paths4): Unit = {
    val snap = organicDrop6(spark, dir, m4(col("doc_id")).isin(2L, 3L))
      .localCheckpoint(true)
    graft.core.Par.run(
      () => Dedup.writeDedupIndex(snap, "text", "doc_id", p.lex, NGram,
        K, Bands),
      () => SemIndex.bootstrap(spark,
        snap.select(col("doc_id").as("vec_id"), col("embedding")), p.sem),
      () => {
        MediaHashes.extend(spark, p.media, mediaOf(snap))
        val sigs = MediaHashes.fetchBoth(spark, p.media,
          snap.select(col("doc_id").as("media_id"))).localCheckpoint(true)
        graft.core.Par.run(
          () => PhashIndex.write(spark, MediaHashes.imageOf(sigs), p.ph),
          () => PhashIndex.write(spark, MediaHashes.audioOf(sigs), p.aud))
      },
      () => organicDrop6(spark, dir, m4(col("doc_id")) === 0L)
        .write.mode("overwrite").parquet(p.dropDay(1)))
  }

  /** The spam text the low-quality gate must reject (40 copies of one
    * word ⇒ duplicate 2-gram mass far over [[CurationDay.RepTenths]]).
    */
  val SpamText: String = ("spam " * 39) + "spam"

  /** Day 2 = organic %4 == 1 plus three sentinels:
    *
    *  - 9700001: full clone of the smallest day-1 doc that cleared
    *    EVERY dedup stage but was rejected by a post-gate — on day 2
    *    its four dedup columns must come back CLEAN (the proof that a
    *    post-gate rejection kept it out of every index) while the
    *    post-gate, a pure text function, rejects it again;
    *  - 9700002: [[SpamText]] with the smallest day-2 organic doc's
    *    embedding + image — the low-quality branch's witness (its
    *    semantic column simultaneously shows dup_sem_batch against
    *    the smaller-id vector source co-arriving the same day);
    *  - 9700003: full clone of the smallest day-1 overall-ADMITTED
    *    doc — all four dedup columns must show the corpus dup their
    *    index absorbed on day 1 (the q542-pattern append witness).
    */
  def writeDay2Drop6(spark: SparkSession, dir: String, p: Paths4): Unit = {
    val organic = organicDrop6(spark, dir, m4(col("doc_id")) === 1L)
    def dayOf(pred: org.apache.spark.sql.Column): DataFrame =
      spark.read.parquet(p.decisionsDay(1)).where(pred).select("doc_id")
    val spam = organic.orderBy("doc_id").limit(1)
      .select(lit(9700002L).as("doc_id"), lit(SpamText).as("text"),
        col("embedding"), col("img"))
    organic
      .unionByName(cloneOf(spark, dir,
        dayOf(col("decision").isin("contaminated", "low_quality")),
        9700001L))
      .unionByName(spam)
      .unionByName(cloneOf(spark, dir,
        dayOf(col("decision") === "admitted"), 9700003L))
      .write.mode("overwrite").parquet(p.dropDay(2))
  }

  /** The batch engine path of the full-stack lifecycle. */
  def runDays6Batch(spark: SparkSession, dir: String, p: Paths4): Unit = {
    bootstrap6(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    val bench = benchOf(spark, dir)
    processDay6(spark, p, 1, spark.read.parquet(p.dropDay(1)), fetch,
      bench): Unit
    writeDay2Drop6(spark, dir, p)
    processDay6(spark, p, 2, spark.read.parquet(p.dropDay(2)), fetch,
      bench): Unit
  }

  /** Both full-stack days' pinned verdicts, all six stage columns. */
  def allDecisions6(spark: SparkSession, p: Paths4): DataFrame =
    allDecisions6Upto(spark, p, 2)

  def allDecisions6Upto(spark: SparkSession, p: Paths4,
                        nDays: Int): DataFrame =
    (1 to nDays).map { k =>
      spark.read.parquet(p.decisionsDay(k))
        .select(lit(k).as("day"), col("doc_id"), col("d_lex"),
          col("d_sem"), col("d_ph"), col("d_aud"), col("d_contam"),
          col("d_qual"), col("decision"))
    }.reduce(_.unionByName(_))

  /** Day 3 of the six-stage CALENDAR — a pure WITNESS day derived
    * entirely from the chain's own pins (scale-robust: the sources
    * exist at any sf as long as day 1 admitted + post-gate-rejected
    * something and day 2 admitted something, which q559 already
    * proves), exercising every per-modality cross-day branch AFTER
    * the ttl2 retention slot expired day 1:
    *
    *  - 9700004 full-clones the smallest day-1 overall-ADMITTED doc —
    *    the post-TTL re-offer: all four dedup columns must come back
    *    CLEAN (day-1 state left every index), the post-gates pass
    *    again (pure text functions), and it RE-ADMITS through the
    *    calendar;
    *  - 9700005 full-clones the smallest day-2 overall-admitted doc —
    *    all four dedup columns must show the corpus dup their
    *    RETAINED day-2 state serves;
    *  - 9700006 full-clones the smallest day-1 post-gate-REJECTED doc
    *    — its post-gate column must fire again while its lexical/
    *    audio state stays clean (a rejection never touched an index);
    *  - 9700007 clones 9700004's source AGAIN — a same-day duplicate
    *    of 9700004, witnessing every stage's within-batch pass on
    *    day 3 (dup_*_batch, the larger id loses).
    */
  def writeDay3Drop6Cal(spark: SparkSession, dir: String,
                        p: Paths4): Unit = {
    def dayOf(k: Int, pred: org.apache.spark.sql.Column): DataFrame =
      spark.read.parquet(p.decisionsDay(k)).where(pred).select("doc_id")
    val adm1 = dayOf(1, col("decision") === "admitted")
    val adm2 = dayOf(2, col("decision") === "admitted")
    val rej1 = dayOf(1,
      col("decision").isin("contaminated", "low_quality"))
    cloneOf(spark, dir, adm1, 9700004L)
      .unionByName(cloneOf(spark, dir, adm2, 9700005L))
      .unionByName(cloneOf(spark, dir, rej1, 9700006L))
      .unionByName(cloneOf(spark, dir, adm1, 9700007L))
      .write.mode("overwrite").parquet(p.dropDay(3))
  }

  /** The six-stage BATCH CALENDAR (r12 verdict task 3): the proven
    * two-day full stack verbatim, then the LEDGERED ttl2 retention
    * slot (expire day 1 from all four indexes), then the
    * [[writeDay3Drop6Cal]] witness day admitted against the RETAINED
    * state — N = 3 days with retention interleaved, one oracle across
    * engines (q572/q574).
    */
  def runDays6Calendar(spark: SparkSession, dir: String,
                       p: Paths4): Unit = {
    bootstrap6(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    val bench = benchOf(spark, dir)
    processDay6(spark, p, 1, spark.read.parquet(p.dropDay(1)), fetch,
      bench): Unit
    writeDay2Drop6(spark, dir, p)
    processDay6(spark, p, 2, spark.read.parquet(p.dropDay(2)), fetch,
      bench): Unit
    ttl4Day(spark, p, "ttl2", Seq(1), indexedDocs(spark, p, fetch)): Unit
    writeDay3Drop6Cal(spark, dir, p)
    processDay6(spark, p, 3, spark.read.parquet(p.dropDay(3)), fetch,
      bench): Unit
  }

  /** RETENTION (TTL) over the multimodal lifecycle — the reference's
    * ring-buffer age-out (src/table_store/table/table.h:335
    * `ExpireRowBatches`) as a lifecycle operation on all FOUR indexes
    * at once: everything admitted on a day older than the retention
    * horizon leaves every index, so the four artifacts stay consistent
    * views of the RETAINED corpus (retraction says "remove these
    * docs"; retention says "remove everything older than T" — the day
    * ledger IS the age record, no per-row timestamp needed). Victims
    * are derived from the pipeline's own pinned decisions
    * (admission-day age), then:
    *
    *  - lexical: [[Dedup.deleteFromDedupIndex]] (band rows out; a
    *    content hash leaves only when no RETAINED doc still carries
    *    it — the stillHeld pass over the surviving indexed docs);
    *  - semantic: [[SemIndex.delete]] (touched cells rewritten);
    *  - image + audio: [[PhashIndex.delete]] (hash-sized rewrites).
    *
    * The media artifact is deliberately NOT pruned: decode-once means
    * an expired asset re-offered later reuses its stored signatures —
    * signatures are pure payload functions, not admission state.
    * Every step is an overwrite or anti-join ⇒ a crashed TTL re-runs
    * convergently. `corpusDocs` is the indexed-docs text frame
    * (snapshot + admitted days) the lexical stillHeld pass scans.
    */
  /** [[ttl4]] as a LEDGERED maintenance day — the same exactly-once
    * contract the admission days carry ([[processDay4]]) and the
    * curation-side retention already has ([[CurationNDay.ttlDay]]):
    * a committed TTL day is a pure no-op on replay (returns false),
    * a TTL that died before its ledger row re-runs convergently
    * (every [[ttl4]] step is an overwrite or anti-join). The gate
    * card pins the ledger content and the replay no-op.
    */
  def ttl4Day(spark: SparkSession, p: Paths4, dayId: String,
              expireDays: Seq[Int], corpusDocs: DataFrame): Boolean =
    if (CurationNDay.ledgerSeen(spark, p.ledger, dayId)) false
    else {
      ttl4(spark, p, expireDays, corpusDocs)
      CurationNDay.appendLedger(spark, p.ledger, dayId)
      true
    }

  def ttl4(spark: SparkSession, p: Paths4, expireDays: Seq[Int],
           corpusDocs: DataFrame): Unit = {
    val victims = expireDays.map { k =>
      spark.read.parquet(p.decisionsDay(k))
        .where(col("decision") === "admitted").select("doc_id")
    }.reduce(_.unionByName(_)).localCheckpoint(true)
    // four disjoint index artifacts, victims pinned — overlap (§2.6)
    graft.core.Par.run(
      () => Dedup.deleteFromDedupIndex(spark, p.lex, corpusDocs,
        corpusDocs.join(victims, "doc_id"), "text", "doc_id"),
      () => SemIndex.delete(spark, p.sem, victims),
      () => PhashIndex.delete(spark, p.ph, victims),
      () => PhashIndex.delete(spark, p.aud, victims))
  }

  /** Retained BYTE mass per admission horizon — the input to the
    * size-cap trigger ([[cap4Day]]): for every indexed doc (the
    * lexical band table's own membership via [[indexedDocs]] — so a
    * doc an earlier slot expired counts zero, exactly "what is in the
    * ring buffer now"), its text-byte mass bucketed by ADMISSION day
    * (pinned decisions; day 0 = the snapshot — a member admitted on
    * no pinned day). The metric is the audio-track payload length —
    * the byte analog of the reference's byte-capped ring buffer
    * (src/table_store/table/table.cc:44) on the fixture's one sized
    * payload column; character length, so any engine re-derives it.
    * One index-sized pass; the result is one row per day.
    */
  def retainedMasses(spark: SparkSession, p: Paths4,
                     corpusFetch: DataFrame): Map[Int, Long] =
    massesOf(spark, p, indexedDocs(spark, p, corpusFetch))

  /** [[retainedMasses]] over an already-derived indexed-docs frame —
    * callers holding one (the cap slot needs the same frame for its
    * victim derivation) avoid re-deriving it.
    */
  private def massesOf(spark: SparkSession, p: Paths4,
                       docs: DataFrame): Map[Int, Long] = {
    val fs = new org.apache.hadoop.fs.Path(p.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinnedDays = (1 to NDays4).filter(k =>
      fs.exists(new org.apache.hadoop.fs.Path(
        p.decisionsDay(k) + "/_SUCCESS")))
    val admDay = pinnedDays.map { k =>
      spark.read.parquet(p.decisionsDay(k))
        .where(col("decision") === "admitted")
        .select(col("doc_id"), lit(k).as("__day"))
    }.reduceOption(_.unionByName(_))
    val tagged = admDay match {
      case Some(d) => docs.join(d, Seq("doc_id"), "left")
        .withColumn("__day", coalesce(col("__day"), lit(0)))
      case None => docs.withColumn("__day", lit(0))
    }
    val measured = tagged.groupBy("__day")
      .agg(sum(length(col("text"))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    ((0 +: pinnedDays).map(k => k -> measured.getOrElse(k, 0L))).toMap
  }

  /** SIZE-CAPPED retention over the multimodal lifecycle — the
    * [[CurationNDay.capDay]] product for the four-index side (the
    * reference's actual ring-buffer trigger is BYTES, table.cc:44;
    * the mm side previously had only age-TTL): choose the OLDEST
    * admission horizon whose retained byte mass ([[retainedMasses]])
    * fits `maxBytes` (whole-day granularity — the row-batch analog;
    * the snapshot is day 0, so horizon 1 expires the snapshot alone),
    * PIN the horizon before any mutation (the decision-pin rule for
    * retention — a replayed calendar slot whose cap committed can
    * still read what the cap decided), then expire everything older
    * from all four indexes at once (the [[ttl4]] delete machinery
    * with membership-derived victims, so the four artifacts stay
    * consistent views of the capped corpus). An UNDER-CAP corpus
    * commits as a LEDGERED no-op with horizon 0 (the reference cap
    * expires only while over); a cap even the newest day alone
    * exceeds loud-fails (whole-day expiry cannot satisfy it).
    * Returns the chosen horizon, or 0 for the no-op /
    * already-committed cases.
    */
  def cap4Day(spark: SparkSession, p: Paths4, dayId: String,
              maxBytes: Long, corpusFetch: DataFrame): Int =
    if (CurationNDay.ledgerSeen(spark, p.ledger, dayId)) 0
    else {
      // derive the membership frame ONCE: the masses and the victim
      // set both read it (previously re-derived per use)
      val docs = indexedDocs(spark, p, corpusFetch).localCheckpoint(true)
      val masses = massesOf(spark, p, docs)
      val days = masses.keys.toSeq.sorted
      def pinHorizon(kf: Int): Unit = {
        import spark.implicits._
        Seq(kf).toDF("keep_from_day")
          .repartition(1)
          .write.mode("overwrite").parquet(p.capHorizon(dayId))
      }
      if (masses.values.sum <= maxBytes) {
        pinHorizon(0)
        CurationNDay.appendLedger(spark, p.ledger, dayId)
        0
      } else {
        val keepFrom = days.filter(_ >= 1).find { k =>
          days.filter(_ >= k).map(masses).sum <= maxBytes
        }.getOrElse(sys.error(
          s"cap4Day: day ${days.max} alone exceeds the $maxBytes-byte " +
            "cap — whole-day expiry cannot satisfy it"))
        pinHorizon(keepFrom)
        val young = (keepFrom to NDays4)
          .filter(k => masses.contains(k))
          .map { k =>
            spark.read.parquet(p.decisionsDay(k))
              .where(col("decision") === "admitted").select("doc_id")
          }.reduce(_.unionByName(_))
        val victims = docs.select("doc_id")
          .join(young, Seq("doc_id"), "left_anti")
          .localCheckpoint(true) // age-out set pinned before mutation
        graft.core.Par.run(
          () => Dedup.deleteFromDedupIndex(spark, p.lex, docs,
            docs.join(victims, "doc_id"), "text", "doc_id"),
          () => SemIndex.delete(spark, p.sem, victims),
          () => PhashIndex.delete(spark, p.ph, victims),
          () => PhashIndex.delete(spark, p.aud, victims))
        CurationNDay.appendLedger(spark, p.ledger, dayId)
        keepFrom
      }
    }

  /** The FIXTURE cap for the mid-calendar slot: `m2 + m1 / 2` bytes —
    * deterministically BETWEEN tail(2) = m2 and tail(1) = m1 + m2 at
    * ANY scale factor (m1 > 0 by construction), so the chosen horizon
    * is always 2: the snapshot AND day 1 expire, day 2 is retained —
    * the scale-robust analog of the curation side's 55%-of-mass cap
    * (whose margins depend on the day-mass ratios; this one's do
    * not). Any engine re-derives it from the same two masses.
    */
  def capFixtureBytes(spark: SparkSession, p: Paths4,
                      corpusFetch: DataFrame): Long = {
    val masses = retainedMasses(spark, p, corpusFetch)
    masses.getOrElse(2, 0L) + masses.getOrElse(1, 0L) / 2L
  }

  /** The batch SIZE-CAP CALENDAR (the q569 shape with the cap slot in
    * place of the TTL): days 1–2 admit, the cap2 slot expires to the
    * pinned horizon (deterministically 2 — snapshot + day 1 out, the
    * [[capFixtureBytes]] contract), day 3 admits against the capped
    * indexes (the day-1 clone sentinel genuinely RE-ADMITS — the cap
    * re-opened admission through the calendar), then an UNDER-CAP
    * slot (cap3 at exactly the retained mass) commits as a ledgered
    * no-op — both cap branches witnessed in one lifecycle.
    */
  def runDays4CapCalendar(spark: SparkSession, dir: String,
                          p: Paths4): Unit = {
    bootstrap4(spark, dir, p)
    val fetch = graft.core.Tables.plain(spark, dir, "documents")
    (1 to 2).foreach { k =>
      processDay4(spark, p, k, spark.read.parquet(p.dropDay(k)),
        fetch): Unit
    }
    cap4Day(spark, p, "cap2", capFixtureBytes(spark, p, fetch),
      fetch): Unit
    writeDay3Drop(spark, dir, p)
    processDay4(spark, p, 3, spark.read.parquet(p.dropDay(3)), fetch): Unit
    cap4Day(spark, p, "cap3",
      retainedMasses(spark, p, fetch).values.sum, fetch): Unit
  }

  /** The four indexes' cards as one long frame — q543's consistency
    * view. PLAIN counts, no `.distinct()` laundering: with the
    * anti-joined band append a duplicated row is a bug this gate must
    * catch, not hide.
    */
  def indexCards4(spark: SparkSession, p: Paths4): DataFrame = {
    def row(m: String, met: String, src: DataFrame): DataFrame =
      src.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(m).as("modality"), lit(met).as("metric"),
          col("value"))
    row("lexical", "n_hashes",
        spark.read.parquet(s"${p.lex}/hashes.parquet"))
      .unionByName(row("lexical", "n_band_rows",
        spark.read.parquet(s"${p.lex}/bands.parquet")))
      .unionByName(row("semantic", "n_vecs",
        spark.read.parquet(p.sem.index)))
      .unionByName(row("perceptual", "n_hashes",
        spark.read.parquet(p.ph.hashes)))
      .unionByName(row("perceptual", "n_band_rows",
        spark.read.parquet(p.ph.bands)))
      .unionByName(row("audio", "n_hashes",
        spark.read.parquet(p.aud.hashes)))
      .unionByName(row("audio", "n_band_rows",
        spark.read.parquet(p.aud.bands)))
      .unionByName(row("media", "n_assets",
        spark.read.parquet(p.media)))
  }

  /** The three indexes' one-line cards as one long frame — the
    * consistency view q541 gates: all three must describe the SAME
    * admitted corpus.
    */
  def indexCards(spark: SparkSession, p: Paths): DataFrame = {
    def row(m: String, met: String, src: DataFrame): DataFrame =
      src.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(m).as("modality"), lit(met).as("metric"),
          col("value"))
    row("lexical", "n_hashes",
        spark.read.parquet(s"${p.lex}/hashes.parquet"))
      .unionByName(row("lexical", "n_band_rows",
        spark.read.parquet(s"${p.lex}/bands.parquet").distinct()))
      .unionByName(row("semantic", "n_vecs",
        spark.read.parquet(p.sem.index)))
      .unionByName(row("perceptual", "n_hashes",
        spark.read.parquet(p.ph.hashes)))
      .unionByName(row("perceptual", "n_band_rows",
        spark.read.parquet(p.ph.bands).distinct()))
  }
}
