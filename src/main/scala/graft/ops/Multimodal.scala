package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.9): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata. The Spark-side
  * machinery — schema, batched per-partition processing, deterministic
  * output shape — is real; the actual media decode is STUBBED (no codec
  * libraries in this environment) behind [[StubDecoder]], which derives
  * deterministic fake dimensions/features from the bytes so the pipeline
  * is testable end-to-end.
  */
object Multimodal {

  /** A "media" table from any text/binary source: payload + metadata. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      lit("application/octet-stream").as("mime"))

  /** ??? in production: a real image decode (JPEG/PNG -> HxWxC). Here a
    * deterministic fake so plumbing + partitioning are testable.
    */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + (math.abs(n * 2654435761L) % 48).toInt
      val height = 16 + (math.abs(n * 40503L) % 48).toInt
      // "features": 8 deterministic byte-window means, a stand-in for a
      // real embedding/feature extractor.
      val feats = (0 until 8).map { i =>
        val slice = payload.slice(i * n / 8, math.max(i * n / 8 + 1, (i + 1) * n / 8))
        if (slice.isEmpty) 0f else slice.map(_.toInt & 0xff).sum.toFloat / slice.length
      }.toArray
      (width, height, feats)
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Batched decode over partitions — the Scala analog of a pandas-UDF
    * `mapInPandas` stage: one decoder instance per partition, rows
    * processed in a streaming iterator (no per-row setup, no collect).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, f) = StubDecoder.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), w, h, f)
      }
    }(enc)
  }

  /** Frame sampling stub: every k-th "frame" (byte window) of a payload —
    * the row-expanding shape of video frame extraction. Zero-byte
    * payloads yield zero frames (without the guard, sequence(0, div(-1,
    * k)) = [0] would fabricate one frame for an empty payload).
    */
  def sampleFrames(media: DataFrame, everyK: Int = 4, frameBytes: Int = 16): DataFrame =
    media.where(col("n_bytes") > 0)
      .select(col("media_id"), col("payload"),
        sequence(lit(0), call_function("div", col("n_bytes") - 1, lit(frameBytes.toLong * everyK)))
          .as("frame_idx"))
      .select(col("media_id"), explode(col("frame_idx")).as("frame_no"))
      .withColumn("frame_offset", col("frame_no") * frameBytes * everyK)
}
