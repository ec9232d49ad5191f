package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED SEMANTIC dedup index — the embedding-space sibling of
  * the lexical [[Dedup.writeDedupIndex]] lifecycle, completing the
  * incremental-day stage family: where the lexical index stores
  * content hashes + MinHash band rows, this one stores a frozen coarse
  * quantizer (the SemDeDup cell seeds, fit ONCE on the snapshot) plus
  * the corpus vectors partitioned BY CELL, so a delta day's semantic
  * near-dup check touches only the cells its own vectors land in:
  *
  *  - [[bootstrap]]: init-only k-means seeds on the snapshot
  *    ([[graft.functions.MlAggregators.kmeansFit]] with iters = 0 —
  *    the q251/q253 init-only contract that makes the quantizer
  *    re-derivable by any engine), then the snapshot vectors written
  *    cell-partitioned;
  *  - [[decisions]]: delta vectors → one broadcast-seed map pass to
  *    assign cells → join ONLY the touched cell partitions of the
  *    index (partition-pruned scan) → cosine ≥ [[MinCos]] against any
  *    stored vector ⇒ `dup_sem_corpus`, else `admitted`;
  *  - [[append]]: admitted delta vectors anti-join their own cells
  *    (replay-idempotent, the [[Scale.appendDistinctState]] storage
  *    contract) and append.
  *
  * The SEEDS ARE FROZEN at bootstrap — cell assignment must be stable
  * across days or yesterday's vectors would sit in cells today's
  * assignment never probes (the standard IVF-index contract: re-fit ⇒
  * re-index, a compaction-class rebuild, not a daily step).
  *
  * 100 TB shape: seeds are model-sized and broadcast; a delta day
  * reads |delta| vectors plus only the touched cells' partitions; the
  * within-cell pair work is (cell occupancy)·|delta-in-cell| — grow
  * the cell count with the corpus to hold occupancy constant, exactly
  * [[Dedup.semanticDedup]]'s documented contract. q521/q522 gate the
  * two-day lifecycle (decisions + final index) against a from-scratch
  * DuckDB re-derivation, with a planted day-2 sentinel witnessing that
  * day-1 admissions really serve day-2 lookups.
  */
object SemIndex {

  val NCells = 8
  /** Same-cell cosine threshold (the q253 semantic-stage contract —
    * both engines compare the identical sequential-sum double).
    */
  val MinCos = 0.35

  /** The SERVING PAIR (frozen seeds + cell-partitioned index) lives
    * under ONE `serving/` subroot so quantizer-changing cutovers
    * ([[refitIfNeeded]]) swap both artifacts with a single directory
    * promote — no instant can pair new seeds with the old index (a
    * reader resolving mid-cutover would cell-prune against bins the
    * stored vectors were never assigned to and silently miss matches).
    * Content-invariant per-artifact swaps ([[compact]]) still operate
    * inside the serving root.
    */
  case class Paths(root: String) {
    def serving: String = s"$root/serving"
    def seeds: String = s"$serving/sem_seeds.parquet"
    def index: String = s"$serving/sem_index"
    def decisionsDay(k: Int): String = s"$root/sem_decisions_day$k.parquet"
  }

  private def vecs(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  /** Fit the frozen quantizer on the snapshot and persist seeds +
    * the cell-partitioned snapshot index.
    */
  def bootstrap(spark: SparkSession, snapshot: DataFrame,
                p: Paths): Unit = {
    import spark.implicits._
    val model = vecs(snapshot)
      .agg(graft.functions.MlAggregators.kmeansFit(col("e"), NCells,
        iters = 0).as("m"))
      .head().getString(0)
    val seeds = model.stripPrefix("[[").stripSuffix("]]").split("\\],\\[")
      .map(_.split(",").map(_.toDouble).toSeq).toSeq
    seeds.zipWithIndex.map { case (se, i) => (i + 1, se) }
      .toDF("sid", "se")
      .repartition(1).write.mode("overwrite").parquet(p.seeds)
    assigned(spark, snapshot, p)
      .write.partitionBy("cell").mode("overwrite").parquet(p.index)
  }

  def loadSeeds(spark: SparkSession, p: Paths): Seq[Seq[Double]] =
    spark.read.parquet(p.seeds).orderBy("sid")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq // model-sized

  /** (vec_id, e, n, cell) for a vector frame under the FROZEN seeds. */
  def assigned(spark: SparkSession, df: DataFrame, p: Paths): DataFrame =
    Similarity.cellAssign(vecs(df), "vec_id", "e", loadSeeds(spark, p))
      .drop("cell_cos")
      .select(col("id").as("vec_id"), col("e"), col("n"), col("cell"))

  /** The delta day's semantic verdicts: `dup_sem_corpus` when any
    * stored vector in the same cell clears [[MinCos]], else
    * `admitted`. Scans ONLY the delta's own cell partitions.
    *
    * WITHIN-DAY contract: by default (`withinBatch = false`, the
    * q521-family gate semantics) the delta is compared against the
    * STORED index only — two near-identical vectors arriving in the
    * same day's drop are both admitted and both appended (unlike the
    * lexical stage's dup_exact_batch). `withinBatch = true` closes
    * the gap: a delta vector also checks SMALLER-id same-day vectors
    * in its cell (⇒ `dup_sem_batch`; the smaller-id member survives —
    * deterministic and engine-re-derivable because the rule is
    * "any smaller id within threshold", not a greedy chain). Corpus
    * hits take precedence over batch hits. The q542-family
    * multimodal-day gates run with the pass ON.
    */
  def decisions(spark: SparkSession, p: Paths, delta: DataFrame,
                withinBatch: Boolean = false): DataFrame = {
    import graft.ops.Similarity.dot
    val asg = assigned(spark, delta, p).localCheckpoint(true)
    val cells = asg.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by NCells
    val idx = graft.core.Tables.spread(spark, // cell filter still pushes
        spark.read.parquet(p.index), p.index)   // through the spread
      .where(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select(col("cell"), col("e").as("ce"), col("n").as("cn"))
    val hits = asg.join(idx, Seq("cell"))
      .where(dot(col("e"), col("ce")) / (col("n") * col("cn"))
        >= lit(MinCos))
      .select("vec_id").distinct()
    val base = asg
      .join(hits.withColumn("__hit", lit(true)), Seq("vec_id"), "left")
    if (!withinBatch)
      base.select(col("vec_id"), col("cell"),
        when(col("__hit"), lit("dup_sem_corpus"))
          .otherwise(lit("admitted")).as("decision"))
    else {
      // day-internal pass: same-cell self-join of the (delta-sized)
      // day frame, strictly-smaller partner id — O(day-cell occupancy)
      val bhits = asg.join(
          asg.select(col("cell"), col("vec_id").as("__bid"),
            col("e").as("be"), col("n").as("bn")), Seq("cell"))
        .where(col("__bid") < col("vec_id") &&
          dot(col("e"), col("be")) / (col("n") * col("bn"))
            >= lit(MinCos))
        .select("vec_id").distinct().withColumn("__bhit", lit(true))
      base.join(bhits, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell"),
          when(col("__hit"), lit("dup_sem_corpus"))
            .when(col("__bhit"), lit("dup_sem_batch"))
            .otherwise(lit("admitted")).as("decision"))
    }
  }

  /** Append a day's ADMITTED vectors to their cells, idempotently
    * (anti-join against the partition-pruned touched cells).
    */
  def append(spark: SparkSession, p: Paths, admitted: DataFrame): Unit = {
    val asg = assigned(spark, admitted, p).localCheckpoint(true)
    val cells = asg.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    val existing = spark.read.parquet(p.index)
      .where(col("cell").isin(cells.map(Integer.valueOf): _*))
      .select("vec_id", "cell")
    asg.join(existing, Seq("vec_id", "cell"), "left_anti")
      .localCheckpoint(true) // reads the table being appended
      .write.partitionBy("cell").mode("append").parquet(p.index)
  }

  /** One semantic day: decisions PINNED before the index mutation,
    * admitted vectors appended. Same replay contract as
    * [[CurationNDay.processDayBody]]: a re-run whose pin completed
    * (`_SUCCESS` present) REUSES it — recomputing against an index
    * that already absorbed this day's own vectors would flag every
    * prior admission as its own semantic dup — and the append is
    * anti-joined, so a replayed day converges to the identical state.
    */
  def processDay(spark: SparkSession, p: Paths, k: Int,
                 delta: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(p.decisionsDay(k))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned = fs.exists(new org.apache.hadoop.fs.Path(
      p.decisionsDay(k) + "/_SUCCESS"))
    val dec =
      if (pinned)
        spark.read.parquet(p.decisionsDay(k)).localCheckpoint(true)
      else {
        val d = decisions(spark, p, delta).localCheckpoint(true)
        d.write.mode("overwrite").parquet(p.decisionsDay(k))
        d
      }
    append(spark, p,
      dec.where(col("decision") === "admitted").select("vec_id")
        .join(delta, "vec_id"))
    dec
  }

  /** IVF top-k retrieval SERVED off the persisted index — the same
    * artifact that gates admission doubles as the corpus's ANN search
    * structure (one index, two duties — dedup probe and retrieval).
    * Each query ranks the frozen seeds by cosine (one broadcast map
    * pass), probes its `nprobe` best cells' PARTITIONS only, scores
    * exact cosine within them, and keeps its top `k` (ties to the
    * smaller vec_id). Standard IVF recall/cost dial: nprobe = 1 is
    * the dedup probe's regime; nprobe = NCells is exact brute force.
    *
    * 100 TB shape: the per-query fan-out is nprobe cells, the scan is
    * partition-pruned to the union of probed cells, and the top-k is
    * a per-query window over (probed occupancy · |queries|) scored
    * rows — never corpus × queries.
    */
  def search(spark: SparkSession, p: Paths, queries: DataFrame,
             k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seeds = loadSeeds(spark, p)
    val q = vecs(queries).withColumn("n", Similarity.norm(col("e")))
    val scored = q.withColumn("cells",
      slice(array_sort(array(seeds.zipWithIndex.map { case (s, i) =>
        val sNorm = math.sqrt(s.map(x => x * x).sum)
        struct((-aggregate(zip_with(col("e"), typedLit(s), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("n") * lit(sNorm)))
            .as("negcos"),
          lit(i + 1).as("sid"))
      }: _*)), 1, nprobe))
    val probes = scored
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("n").as("qn"),
        explode(col("cells").getField("sid")).as("cell"))
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by NCells
    val idx = graft.core.Tables.spread(spark, // cell filter still pushes
        spark.read.parquet(p.index), p.index)   // through the spread
      .where(col("cell").isin(cells.map(Integer.valueOf): _*))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("vec_id"))
    probes.join(idx, Seq("cell"))
      .withColumn("cos",
        Similarity.dot(col("qe"), col("e")) / (col("qn") * col("n")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"),
        graft.core.Exact.zround(col("cos"), 6).as("cos"))
  }

  /** Recall@k of the nprobe-bounded [[search]] against exact brute
    * force over the SAME index (nprobe = NCells) — the tuning-curve
    * point an ANN deployment publishes before picking its
    * recall/latency operating point. Exact integer ppm per query
    * (ties at the k boundary are deterministic in both engines via
    * the (cos desc, vec_id) rank rule, so the top-k SETS are
    * well-defined and recall is exact).
    */
  def searchRecall(spark: SparkSession, p: Paths, queries: DataFrame,
                   k: Int, nprobe: Int): DataFrame = {
    val approx = search(spark, p, queries, k, nprobe)
      .select(col("qid"), col("vec_id")).withColumn("__hit", lit(1L))
    search(spark, p, queries, k, NCells)
      .select(col("qid"), col("vec_id"))
      .join(approx, Seq("qid", "vec_id"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("k_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall_ppm", graft.functions.PixieFunctions.idiv(
        col("n_hit") * 1000000L, col("k_exact")))
  }

  /** The full recall-vs-nprobe TUNING CURVE in one frame: mean exact
    * recall@k at every nprobe from 1 to NCells (the curve an ANN
    * deployment reads to pick its operating point; the endpoint
    * nprobe = NCells is exact search, recall 1.0 by construction — a
    * built-in sanity anchor).
    *
    * ONE scored pass, not NCells separate searches: every (query,
    * index vector) pair is cosine-scored exactly once, tagged with
    * the CELL RANK of the vector's cell in the query's seed ordering
    * (a vector is visible to the search at every nprobe ≥ that rank),
    * then fanned out to its visible nprobe values for a single
    * (nprobe, query)-keyed top-k window. Work = brute-force scoring +
    * a ~NCells/2× row fan-out into one shuffle — versus ~(NCells/2
    * + 1) full search executions for the loop formulation. At 100 TB
    * this is a tuning-time operation run on a query SAMPLE, not the
    * full query log.
    */
  def recallCurve(spark: SparkSession, p: Paths, queries: DataFrame,
                  k: Int): DataFrame = {
    import graft.functions.PixieFunctions.idiv
    import org.apache.spark.sql.expressions.Window
    val seeds = loadSeeds(spark, p)
    val q = vecs(queries).withColumn("n", Similarity.norm(col("e")))
    val ranked = q.withColumn("cells",
      array_sort(array(seeds.zipWithIndex.map { case (s, i) =>
        val sNorm = math.sqrt(s.map(x => x * x).sum)
        struct((-aggregate(zip_with(col("e"), typedLit(s), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x) / (col("n") * lit(sNorm)))
            .as("negcos"),
          lit(i + 1).as("sid"))
      }: _*)))
    val probes = ranked.select(col("vec_id").as("qid"),
        col("e").as("qe"), col("n").as("qn"),
        posexplode(col("cells").getField("sid")))
      .select(col("qid"), col("qe"), col("qn"),
        (col("pos") + 1).cast("long").as("crank"), col("col").as("cell"))
    val scored = probes
      // spread the index side: per-pair cosine scoring is the cost, and
      // the index artifact scans as one split at fixture scale
      // (size-gated no-op at production index sizes)
      .join(graft.core.Tables.spread(spark,
        spark.read.parquet(p.index), p.index), Seq("cell"))
      .select(col("qid"), col("vec_id"),
        (Similarity.dot(col("qe"), col("e"))
          / (col("qn") * col("n"))).as("cos"),
        col("crank"))
    val w = Window.partitionBy("np", "qid")
      .orderBy(col("cos").desc, col("vec_id"))
    val topk = scored
      .withColumn("np", explode(sequence(col("crank"),
        lit(NCells.toLong))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("np", "qid", "vec_id")
      .localCheckpoint(true) // feeds both the exact set and the join
    val exact = topk.where(col("np") === NCells)
      .select(col("qid"), col("vec_id")).withColumn("__hit", lit(1L))
    topk.join(exact, Seq("qid", "vec_id"), "left")
      .groupBy("np")
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .crossJoin(broadcast(exact.agg(count(lit(1)).as("k_total"))))
      .select(col("np").cast("int").as("nprobe"), col("hits"),
        col("k_total"),
        idiv(col("hits") * 1000000L, col("k_total")).as("recall_ppm"))
  }

  /** Rewrite each cell partition to ONE file (the day appends leave a
    * file batch per day per touched cell — the small-files lifecycle
    * the distinct-state/cent-hist compactors own for their states).
    * Contents are invariant; only the layout changes.
    *
    * STAGING + SWAP, not in-place: the compacted layout is written to
    * a staging root first, then swapped in with two directory renames
    * (current → __old, staging → current) and the old root deleted.
    * A reader that already RESOLVED its file list under the old root
    * keeps reading those inodes through the rename (rename moves the
    * directory, not the data), so an in-flight scan survives the
    * swap; only the instant between the two renames has no directory
    * at the canonical path — metadata-sized, versus the in-place
    * overwrite's whole-rewrite window. Round12Spec witnesses a
    * pre-swap-resolved frame still answering after compaction.
    */
  def compact(spark: SparkSession, p: Paths): Unit = {
    val staging = s"${p.index}__staging"
    // a replayed compaction resumes its own torn swap before reading
    graft.core.Layout.healTorn(spark, p.index, staging)
    spark.read.parquet(p.index)
      .select("vec_id", "e", "n", "cell")
      .repartition(col("cell")).sortWithinPartitions("vec_id")
      .write.partitionBy("cell").mode("overwrite").parquet(staging)
    graft.core.Layout.swapInto(spark, staging, p.index)
  }

  /** RE-FIT the quantizer at a new cell count and RE-INDEX — the
    * operation the occupancy contract prescribes when the corpus has
    * outgrown its cells (10× vectors at fixed NCells = 10× within-
    * cell pair work; the fix is more cells, and more cells means a
    * new frozen quantizer and a full re-index — compaction-class,
    * scheduled, never a daily step). Fits init-only k-means on the
    * CURRENT index vectors (the same re-derivable contract as
    * [[bootstrap]]) and writes a NEW index root, leaving the source
    * index untouched (cut over atomically by swapping the root the
    * readers use).
    */
  def refit(spark: SparkSession, src: Paths, dst: Paths,
            nCells: Int): Unit = {
    import spark.implicits._
    val v = spark.read.parquet(src.index)
      .select(col("vec_id"), col("e").cast("array<double>").as("e"))
    val model = v
      .agg(graft.functions.MlAggregators.kmeansFit(col("e"), nCells,
        iters = 0).as("m"))
      .head().getString(0)
    val seeds = model.stripPrefix("[[").stripSuffix("]]").split("\\],\\[")
      .map(_.split(",").map(_.toDouble).toSeq).toSeq
    seeds.zipWithIndex.map { case (se, i) => (i + 1, se) }
      .toDF("sid", "se")
      .repartition(1).write.mode("overwrite").parquet(dst.seeds)
    Similarity.cellAssign(v, "vec_id", "e", seeds).drop("cell_cos")
      .select(col("id").as("vec_id"), col("e"), col("n"), col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(dst.index)
  }

  /** Delete vectors from the index by id — the retraction/retention
    * path ([[CurationNDay.retractDay]]'s shard-rewrite pattern on the
    * cell partitions): victim rows are found by one id-join against
    * the index, ONLY their cells' partitions are rewritten (anti-join,
    * partition-pruned read), untouched cells keep their files. Cost ∝
    * touched-cell occupancy, never the whole index.
    */
  def delete(spark: SparkSession, p: Paths, ids: DataFrame): Unit = {
    val victims = spark.read.parquet(p.index)
      .join(ids.select(col(ids.columns.head).as("vec_id")), "vec_id")
    val cells = victims.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted // bounded by NCells
    if (cells.nonEmpty) {
      val kept = spark.read.parquet(p.index)
        .where(col("cell").isin(cells.map(Integer.valueOf): _*))
        .join(ids.select(col(ids.columns.head).as("vec_id")),
          Seq("vec_id"), "left_anti")
        .select("vec_id", "e", "n", "cell")
        .localCheckpoint(true) // pin before deleting the source files
      val fs = new org.apache.hadoop.fs.Path(p.index)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      cells.foreach { c =>
        fs.delete(new org.apache.hadoop.fs.Path(
          s"${p.index}/cell=$c"), true): Unit
      }
      kept.write.partitionBy("cell").mode("append").parquet(p.index)
    }
  }

  /** The OCCUPANCY HEALTH CARD — the numbers behind the documented
    * IVF contract ("grow cells with the corpus to hold occupancy
    * constant"): per-cell population plus the whole-index verdict —
    * total vectors, cell count, mean occupancy, the target, whether a
    * refit is due (mean occupancy above target), and the cell count a
    * refit would move to (⌈total / target⌉). Index-metadata-sized at
    * any corpus scale; exact integer arithmetic so any engine derives
    * the same trigger.
    */
  def occupancyCard(spark: SparkSession, p: Paths,
                    targetOcc: Long): DataFrame = {
    import graft.functions.PixieFunctions.idiv
    val per = spark.read.parquet(p.index)
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val tot = per.agg(sum(col("n_vecs")).as("n_total"),
      count(lit(1)).as("n_cells"))
    per.crossJoin(broadcast(tot))
      .withColumn("mean_occ", idiv(col("n_total"), col("n_cells")))
      .withColumn("target_occ", lit(targetOcc))
      .withColumn("refit_needed",
        (col("n_total") > lit(targetOcc) * col("n_cells")).cast("long"))
      .withColumn("new_ncells",
        idiv(col("n_total") + lit(targetOcc - 1), lit(targetOcc)))
  }

  /** The occupancy-TRIGGERED refit policy: when the card says the
    * index outgrew its cells, [[refit]] to the card's `new_ncells`
    * into a staging root, then CUT OVER by promoting the staged
    * SERVING PAIR (seeds + index together) with ONE
    * [[graft.core.Layout.swapInto]] on the serving root — the seeds
    * and the index they binned can never be observed mismatched, and
    * a crash at any instant leaves either the complete old pair, the
    * complete new pair, or (mid-swap) the staging pair intact for
    * [[graft.core.Layout.swapInto]]'s torn-swap resume. The index
    * CONTENT is invariant (same vectors, re-binned); Round12Spec pins
    * that the stored vector-id set survives the cutover. Returns the
    * new cell count, or 0 when the trigger did not fire — including
    * on an EMPTY index (no cells → no card rows → nothing to refit,
    * the quiet no-op, not an exception).
    */
  def refitIfNeeded(spark: SparkSession, p: Paths,
                    targetOcc: Long): Long = {
    // a replay whose predecessor died mid-cutover finds the serving
    // root parked at __old (or fully staged) — heal before reading
    graft.core.Layout.healTorn(spark, p.serving,
      Paths(s"${p.root}__staging").serving)
    val head = occupancyCard(spark, p, targetOcc)
      .select("refit_needed", "new_ncells")
      .collect().headOption // empty index ⇒ empty card ⇒ no-op
    head match {
      case None => 0L
      case Some(h) if h.getLong(0) == 0L => 0L
      case Some(h) =>
        val nCells = h.getLong(1).toInt
        val staging = Paths(s"${p.root}__staging")
        refit(spark, p, staging, nCells)
        graft.core.Layout.swapInto(spark, staging.serving, p.serving)
        val fs = new org.apache.hadoop.fs.Path(staging.root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(staging.root), true): Unit
        nCells.toLong
    }
  }

  /** Model-sized per-cell index card: population + id checksum. */
  def indexStats(spark: SparkSession, p: Paths): DataFrame =
    spark.read.parquet(p.index)
      .withColumn("h", Dedup.h60(col("vec_id").cast("string")))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        min(col("vec_id")).as("min_vec"), max(col("vec_id")).as("max_vec"),
        expr("bit_xor(h)").as("checksum"))
}
