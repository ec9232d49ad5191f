package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PixieFunctions.idiv

/** The lifecycle's TRAINER-FACING product: the curated corpus packed
  * into fixed-length token sequences, maintained INCREMENTALLY day by
  * day. A training loader does not read documents — it reads a
  * contiguous token stream cut into `SeqLen`-token sequences
  * ([[Corpus.packSequences]] is the batch layout op; reference analog:
  * the result-table layout contract of src/table_store/table/table.h,
  * re-expressed for a training-shard writer). This object lifts that
  * layout to the [[CurationNDay]] day cycle:
  *
  *  - day 0 packs the curated snapshot starting at token 0;
  *  - day k packs ONLY its own admitted docs, continuing the stream at
  *    the PERSISTED offset (`packStateDay(k-1)` — one row, the token
  *    count packed so far), so earlier days' shards are never repacked
  *    and a sequence may legitimately straddle a day boundary (the
  *    stream is one contiguous tape, exactly what a packed-attention
  *    trainer consumes);
  *  - the day's layout lands in its own `packDay(k)` file (overwrite —
  *    the [[CurationNDay.processDayBody]] replay-idempotence contract)
  *    and the new offset is read back FROM the written file, so a
  *    replayed day reproduces byte-identical state.
  *
  * Scale shape: a day's packing touches day-sized data plus one
  * model-sized state row; the within-day prefix sum is the
  * [[Corpus.packSequences]] two-level shape (parallel within shard
  * groups, O(#shards) offset window), never a single-partition window
  * over the corpus. q519/q520 gate the full N-day layout against a
  * from-scratch DuckDB re-derivation of the whole token tape.
  */
object Pack {

  /** Sequence capacity in tokens (model-sized constant; the fixture
    * docs average a few dozen whitespace tokens).
    */
  val SeqLen = 128L

  /** One day's pack layout given the stream offset where the day
    * starts: within the day, docs are laid out in (shard, doc_id)
    * order (the same deterministic order the manifest/oracle use).
    * Input must carry (doc_id, shard, n_tok); output adds start_tok /
    * first_seq / last_seq in GLOBAL stream coordinates.
    */
  def layoutWithOffset(docs: DataFrame, offset: Long,
                       seqLen: Long = SeqLen): DataFrame =
    Corpus.packSequences(docs, "doc_id", "n_tok", "shard", seqLen)
      .withColumn("start_tok", col("start_tok") + lit(offset))
      .withColumn("first_seq", idiv(col("start_tok"), seqLen))
      .withColumn("last_seq",
        idiv(col("start_tok") + col("n_tok") - 1L, seqLen))

  /** Apply day k's admitted docs to the pack stream: read the
    * persisted offset (day 0 starts at token 0), lay the day out,
    * overwrite `packDay(k)`, and persist the new offset as
    * `packStateDay(k)`. The state is derived from the file just
    * written (max end position), so replay convergence is structural
    * — recompute and write can never diverge.
    */
  def packDayStep(spark: SparkSession, a: CurationDay.Artifacts, k: Int,
                  docs: DataFrame): Unit = {
    val offset =
      if (k == 0) 0L
      else spark.read.parquet(a.packStateDay(k - 1))
        .collect()(0).getLong(0) // one model-sized state row
    layoutWithOffset(docs.select("doc_id", "shard", "n_tok"), offset)
      .select(lit(k).as("day"), col("doc_id"), col("shard"),
        col("n_tok"), col("start_tok"), col("first_seq"),
        col("last_seq"))
      .write.mode("overwrite").parquet(a.packDay(k))
    spark.read.parquet(a.packDay(k))
      .agg(coalesce(max(col("start_tok") + col("n_tok")),
        lit(offset)).as("next_tok"))
      .write.mode("overwrite").parquet(a.packStateDay(k))
  }

  /** RETRACTION handling: removing a doc shifts every LATER token
    * position, so a retraction day invalidates the tape from the first
    * victim's stream position onward — the tape cannot be patched in
    * place the way the manifest folds down. This rebuild is the
    * compaction-class repair: one layout pass over the post-retraction
    * corpus from token 0 (cost ∝ corpus, amortized against retraction
    * cadence exactly like index compaction), consolidating the tape
    * into a single day-0 epoch file and deleting the stale per-day
    * files. Idempotent: every step is an overwrite or a delete, so a
    * crashed rebuild re-runs convergently. q528 gates the rebuilt tape
    * against the oracle's re-derivation over the shrunk corpus.
    */
  def rebuild(spark: SparkSession, a: CurationDay.Artifacts,
              upTo: Int): Unit = {
    packDayStep(spark, a, 0,
      spark.read.parquet(a.corpusDir).select(col("doc_id"), col("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tok")))
    val fs = new org.apache.hadoop.fs.Path(a.packDay(0))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to upTo).foreach { k =>
      fs.delete(new org.apache.hadoop.fs.Path(a.packDay(k)), true): Unit
      fs.delete(new org.apache.hadoop.fs.Path(a.packStateDay(k)),
        true): Unit
    }
  }

  /** The full tape after N days: union of the per-day layout files
    * (day-sized each; at production cadence a reader prunes to the
    * days it needs — the union here is the gate's full-tape read).
    */
  def fullLayout(spark: SparkSession, a: CurationDay.Artifacts,
                 nDays: Int): DataFrame =
    (0 to nDays).map(k => spark.read.parquet(a.packDay(k)))
      .reduce(_.unionByName(_))

  /** Per-day pack report off the layout alone (no corpus scan):
    * doc/token mass, the sequence span the day touched, how many docs
    * straddle a sequence boundary, and the stream position after the
    * day (`next_tok` — monotone across days by construction).
    */
  def packReport(layout: DataFrame): DataFrame =
    layout.groupBy("day")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        min(col("first_seq")).as("seq_lo"),
        max(col("last_seq")).as("seq_hi"),
        sum(when(col("first_seq") =!= col("last_seq"), 1L)
          .otherwise(0L)).as("n_straddle"),
        max(col("start_tok") + col("n_tok")).as("next_tok"))
}
