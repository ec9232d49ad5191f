package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing (SURVEY §7.9): image/audio/video payloads
  * travel as opaque `binary` columns with typed metadata. Image decode is
  * REAL — JPEG/PNG/GIF/BMP via `javax.imageio` (JDK-built-in, no external
  * codec deps), one decoder pass per partition. Payloads that are not a
  * decodable image fall back to [[StubDecoder]]'s deterministic fake
  * dimensions/features (documented: keeps text/audio/video payloads —
  * whose codecs are NOT in the JDK — flowing through the same pipeline
  * shape instead of dying mid-batch; a production build swaps the
  * fallback for the real audio/video codecs).
  */
object Multimodal {

  /** A "media" table from any text/binary source: payload + metadata. */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      length(col(payloadCol).cast("binary")).cast("long").as("n_bytes"),
      lit("application/octet-stream").as("mime"))

  /** Deterministic fallback for payloads the JDK cannot decode (audio/
    * video/garbage): fake dimensions/features derived from the bytes so
    * the pipeline stays testable end-to-end on any input.
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

  /** One decoded image: real pixel statistics + 8 luminance-window means
    * as the feature stand-in (band 0 = gray/red channel).
    */
  final case class Decoded(width: Int, height: Int, nPixels: Long,
                           pixelSum: Long, features: Array[Float])

  /** Real JDK image decode. Returns None when the payload is not a
    * format `javax.imageio` understands OR a claimed reader fails on it
    * (truncated/corrupt bytes throw IOException/CMMException out of
    * ImageIO.read — at corpus scale some payloads ARE broken, and one
    * bad row must not kill the whole mapPartitions batch): either way
    * the caller falls back to the stub — the reference's decode-or-skip
    * batch contract.
    */
  object ImageDecoder {
    def decode(payload: Array[Byte]): Option[Decoded] = try {
      Option(ImageIO.read(new ByteArrayInputStream(payload))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L
        val winSums = new Array[Long](8)
        val winCounts = new Array[Long](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v
            val win = ((y.toLong * w + x) * 8 / (w.toLong * h)).toInt min 7
            winSums(win) += v
            winCounts(win) += 1
            x += 1
          }
          y += 1
        }
        val feats = (0 until 8).map(i =>
          if (winCounts(i) == 0) 0f else winSums(i).toFloat / winCounts(i)).toArray
        Decoded(w, h, w.toLong * h, sum, feats)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic synthetic grayscale PNG — the gate's image generator.
    * Dimensions and every pixel are pure integer functions of the id
    * (pixel(x,y) = (id*31 + x*7 + y*13) mod 256), so a SQL oracle can
    * re-derive the decoded statistics from first principles and verify
    * the REAL encode->decode round trip, not a stub.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 16 + (id % 8).toInt
    val h = 16 + (id % 5).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((id * 31 + x * 7 + y * 13) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("pixel_sum", LongType),
    StructField("features", ArrayType(FloatType))))

  /** Batched decode over partitions — the Scala analog of a pandas-UDF
    * `mapInPandas` stage: one decoder instance per partition, rows
    * processed in a streaming iterator (no per-row setup, no collect).
    * Real images get real pixel stats; undecodable payloads carry the
    * stub's fake dims with n_pixels/pixel_sum = byte-count/byte-sum.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        ImageDecoder.decode(payload) match {
          case Some(d) =>
            Row(r.getLong(0), d.width, d.height, d.nPixels, d.pixelSum, d.features)
          case None =>
            val (w, h, f) = StubDecoder.decode(payload)
            Row(r.getLong(0), w, h, payload.length.toLong,
              payload.foldLeft(0L)((a, b) => a + (b & 0xff)), f)
        }
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
