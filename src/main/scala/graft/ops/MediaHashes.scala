package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The DECODE-ONCE media artifact: every media asset's perceptual
  * signatures (image dHash row-bytes r0..r7 + audio energy-sign
  * fingerprint a0..a7), decoded ONCE per asset lifetime into a
  * persisted `media_hashes` table that every downstream consumer —
  * admission days, near-dup indexes, analytics — reads instead of
  * re-decoding payload bytes. This is the 100 TB contract the round-11
  * verdict asked for: decode cost (the dominant term in the phash
  * lifecycle's sf1 probe) is paid once per asset at ingest, not once
  * per consumer per query; the artifact itself is hash-sized (17
  * longs per asset) next to the payload bytes.
  *
  * LAYOUT: partitioned by `mb = media_id % NBuckets` (the
  * [[graft.core.Layout.writeCellPartitioned]] pattern), so an
  * id-keyed fetch prunes to the buckets its ids actually touch —
  * a sentinel re-offer or a small-day fetch reads a fraction of the
  * artifact's files instead of scanning it (Round13Spec pins
  * PartitionFilters on the fetch plan). A full-day fetch touching
  * every bucket degrades gracefully to the previous whole-artifact
  * hash join.
  *
  * [[extend]] is REPLAY-IDEMPOTENT the [[Scale.appendDistinctState]]
  * way: new assets anti-join the stored id set before appending, so a
  * crashed-and-replayed day re-decodes only its own (day-sized) drop
  * and appends nothing twice. Signatures are pure functions of the
  * payload bytes (no corpus statistic to drift), so an append is
  * always exact — the [[Dedup.appendDedupIndex]] argument.
  */
object MediaHashes {

  /** Fixed bucket count: the id-pruning granularity. Model-sized and
    * FROZEN per artifact (changing it is a compaction-class relayout,
    * like an IVF refit); 16 buckets keeps per-bucket file counts low
    * while letting sentinel-sized fetches read 1/16 of the files.
    */
  val NBuckets = 16L

  private def rcols = (0 until 8).map(i => col(s"r$i"))

  private def mbOf(c: org.apache.spark.sql.Column) = pmod(c, lit(NBuckets))

  /** Decode a media frame (media_id, payload, audio) → one signature
    * row per asset: image cells → dHash bytes, audio bytes → energy
    * fingerprint. `audio` is the audio-track payload (here the
    * documents-as-media text bytes — the q290 fixture convention).
    */
  def signatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val img = Multimodal.dHash(Multimodal.decodeCells(
        media.select("media_id", "payload")))
      .select(col("media_id") +: rcols: _*)
    val aud = Multimodal.audioFingerprint(
        media.select(col("media_id"), col("audio").as("payload")))
      .select(col("media_id") +:
        (0 until 8).map(i => col(s"r$i").as(s"a$i")): _*)
    img.join(aud, "media_id")
  }

  /** The artifact WITHOUT its layout column — what consumers and the
    * gate read (the bucket is storage, not signature).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("mb")

  /** Extend the artifact by a day's assets: decode only assets NOT
    * already stored (anti-join on media_id — replay-safe and
    * decode-once even when two days carry the same asset id).
    */
  def extend(spark: SparkSession, path: String, media: DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(p)) media
      else media.join(
        spark.read.parquet(path).select("media_id"),
        Seq("media_id"), "left_anti")
    signatures(spark, fresh)
      .withColumn("mb", mbOf(col("media_id")))
      .localCheckpoint(true) // the anti-join read the table appended to
      .write.partitionBy("mb").mode("append").parquet(path)
  }

  /** Settle the small-files debt the per-day appends leave (one file
    * batch per day PER TOUCHED BUCKET): rewrite each bucket partition
    * to one right-sized file via the staging + rename-swap cutover
    * ([[graft.core.Layout.swapInto]] — content invariant, no reader
    * ever sees half-written data).
    */
  def compact(spark: SparkSession, path: String): Unit = {
    // a replayed compaction resumes its own torn swap before reading
    graft.core.Layout.healTorn(spark, path)
    spark.read.parquet(path)
      .repartition(col("mb")).sortWithinPartitions("media_id")
      .write.partitionBy("mb").mode("overwrite").parquet(path + "__staging")
    graft.core.Layout.swapInto(spark, path + "__staging", path)
  }

  /** The bucket partitions an id frame touches — ≤ [[NBuckets]] values
    * by construction (the bounded collect the cell/band fetches use).
    */
  private def bucketsOf(ids: DataFrame): Seq[Long] =
    ids.select(mbOf(col("media_id")).as("mb")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq

  /** Id-pruned signature fetch for a day's ids: partition-prune to the
    * ids' buckets, then hash-join the ids — the image rows and the
    * audio rows (audio renamed to the r0..r7 layout so [[PhashIndex]]
    * consumes either modality unchanged).
    */
  def fetchImage(spark: SparkSession, path: String,
                 ids: DataFrame): DataFrame =
    imageOf(pruned(spark, path, ids))

  def fetchAudio(spark: SparkSession, path: String,
                 ids: DataFrame): DataFrame =
    audioOf(pruned(spark, path, ids))

  /** One id-pruned fetch serving BOTH modalities: callers that need the
    * image AND audio signatures of the same id set (every admission
    * day) materialize [[fetchBoth]] once and split with [[imageOf]] /
    * [[audioOf]] — one bucket collect + one fetch job instead of two
    * of each.
    */
  def fetchBoth(spark: SparkSession, path: String,
                ids: DataFrame): DataFrame = pruned(spark, path, ids)

  def imageOf(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id") +: rcols: _*)

  def audioOf(sigs: DataFrame): DataFrame =
    sigs.select(col("media_id") +:
      (0 until 8).map(i => col(s"a$i").as(s"r$i")): _*)

  private def pruned(spark: SparkSession, path: String,
                     ids: DataFrame): DataFrame = {
    val bs = bucketsOf(ids)
    spark.read.parquet(path)
      .where(col("mb").isin(bs.map(java.lang.Long.valueOf): _*))
      .join(ids.select("media_id"), "media_id")
  }
}
