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

  /** Shared payload-synthesis UDFs over [[syntheticPng]] /
    * [[syntheticPngVar]]. Marked non-deterministic DELIBERATELY even
    * though both functions are pure in the id: it pins the multi-KB
    * payload synthesis ABOVE any scan-spread exchange (a deterministic
    * projection gets sunk below the repartition, generating every image
    * on the narrow scan's single task and then shuffling the bytes —
    * backwards: distribute the 8-byte ids, synthesize in parallel) and
    * stops the optimizer duplicating the synthesis under a pushed
    * filter. Purity means the marker cannot change any result.
    */
  // ImageIO defaults to a DISK-backed stream cache: every encode/decode
  // creates (and later deletes) a temp file, which is pure overhead for
  // in-memory byte-array round trips and a filesystem contention point
  // once decode runs on many tasks at once. The memory cache is exactly
  // right for these payload sizes. JVM-global, set once on class load.
  ImageIO.setUseCache(false)

  val pngUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticPng(id)).asNondeterministic()
  val pngVarUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((id: Long) => syntheticPngVar(id)).asNondeterministic()

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

  /** Second synthetic image family, built for the perceptual-hash gate:
    * id-dependent QUADRATIC structure (linear gradients alone make
    * every dHash near-monotone and the hashes collide corpus-wide —
    * measured: 133/167 distinct; the x²/y² terms give 167/167 distinct
    * hashes and zero cross-id pairs within Hamming 3), so distinct ids
    * hash far apart while shared payloads hash identically. Dimensions
    * and pixels stay pure integer functions of the id —
    * w = 16 + id%8, h = 16 + id%5,
    * pixel(x,y) = (id*53 + (3+id%9)*x + (5+id%7)*y
    *               + (2+id%4)*x² + (3+id%6)*y²) mod 256 —
    * re-derivable from first principles by a SQL oracle.
    */
  def syntheticPngVar(id: Long): Array[Byte] = {
    val w = 16 + (id % 8).toInt
    val h = 16 + (id % 5).toInt
    val a = 3 + (id % 9)
    val b = 5 + (id % 7)
    val qa = 2 + (id % 4)
    val qb = 3 + (id % 6)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0,
          ((id * 53 + a * x + b * y + qa * x * x + qb * y * y) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val cellSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("cell_sum", ArrayType(LongType)),
    StructField("cell_cnt", ArrayType(LongType))))

  /** Batched decode to a fixed gx x gy block grid — the downsample stage
    * of a perceptual hash, run against the REAL decoded raster (cell of
    * pixel (x,y) is (y*gy/h, x*gx/w), integer division — the standard
    * area-mapping shrink). Undecodable payloads fall back to the same
    * grid over the raw byte stream (1-D index mapped to cells) with the
    * stub's fake dimensions, keeping the decode-or-skip batch contract.
    * One decoder per partition, streaming iterator, no collect.
    */
  def decodeCells(media: DataFrame, gx: Int = 9, gy: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(cellSchema)
    val gridMeta = new MetadataBuilder()
      .putLong("gx", gx.toLong).putLong("gy", gy.toLong).build()
    val decoded = media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val sums = new Array[Long](gx * gy)
        val cnts = new Array[Long](gx * gy)
        // ONE decode per row (decode-or-skip: any failure -> stub path);
        // the grid walk reads the raster directly, no second decode.
        val img = try Option(ImageIO.read(new ByteArrayInputStream(payload)))
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case Some(im) =>
            val (w, h) = (im.getWidth, im.getHeight)
            val raster = im.getRaster
            var y = 0
            while (y < h) {
              val cy = y * gy / h
              var x = 0
              while (x < w) {
                val idx = cy * gx + x * gx / w
                sums(idx) += raster.getSample(x, y, 0)
                cnts(idx) += 1
                x += 1
              }
              y += 1
            }
            Row(r.getLong(0), w, h, sums.toSeq, cnts.toSeq)
          case None =>
            val (w, h, _) = StubDecoder.decode(payload)
            val n = payload.length
            var i = 0
            while (i < n) {
              val idx = (i.toLong * (gx * gy) / n).toInt min (gx * gy - 1)
              sums(idx) += payload(i) & 0xff
              cnts(idx) += 1
              i += 1
            }
            Row(r.getLong(0), w, h, sums.toSeq, cnts.toSeq)
        }
      }
    }(enc)
    // the grid geometry rides the schema so downstream consumers can
    // verify they index the arrays with the SAME (gx, gy)
    decoded.withColumn("cell_sum", col("cell_sum").as("cell_sum", gridMeta))
  }

  /** dHash over the decoded cell grid: bit (cy, cx) is set iff the mean
    * of cell (cy, cx) exceeds the mean of its right neighbor — compared
    * EXACTLY via integer cross-multiplication (sumA*cntB > sumB*cntA),
    * no float mean, so every engine agrees bit-for-bit. gx=9 columns
    * give 8 comparisons per row x gy=8 rows = 64 bits, emitted as 8
    * row-bytes r0..r7 plus the canonical 16-hex-char phash. Pure
    * codegen'd column arithmetic — map-only at any scale.
    */
  def dHash(cells: DataFrame, gx: Int = 9, gy: Int = 8): DataFrame = {
    // guard against silent grid mismatch: element_at past the array end
    // returns null under non-ANSI and every affected bit would collapse
    // to 0 — misaligned hashes with no error. decodeCells stamps its
    // geometry on the schema; a frame built with a different grid fails
    // loudly here instead.
    val meta = cells.schema("cell_sum").metadata
    if (meta.contains("gx"))
      require(meta.getLong("gx") == gx && meta.getLong("gy") == gy,
        s"dHash grid ($gx x $gy) != decodeCells grid " +
          s"(${meta.getLong("gx")} x ${meta.getLong("gy")})")
    val s = col("cell_sum"); val c = col("cell_cnt")
    def bit(cy: Int, cx: Int) =
      when(element_at(s, cy * gx + cx + 1) * element_at(c, cy * gx + cx + 2) >
           element_at(s, cy * gx + cx + 2) * element_at(c, cy * gx + cx + 1),
        lit(1L)).otherwise(lit(0L))
    val withBytes = (0 until gy).foldLeft(cells) { (df, cy) =>
      df.withColumn(s"r$cy",
        (0 until gx - 1).map(cx => bit(cy, cx) * (1L << cx)).reduce(_ + _))
    }
    withBytes.withColumn("phash",
      concat((0 until gy).map(cy => format_string("%02x", col(s"r$cy"))): _*))
  }

  /** Perceptual near-dup pairs by banded Hamming search: the 64-bit
    * dHash splits into four 16-bit bands; images colliding on ANY band
    * become candidates, then candidates verify by exact Hamming
    * distance (bit_count of the row-byte XORs). Recall is EXACT for
    * maxDist < 4: fewer differing bits than bands leaves some band
    * untouched (pigeonhole — the Manku et al. WWW'07 SimHash-search
    * layout); at maxDist >= 4 the banding is a documented approximate
    * prefilter. Same candidates-then-verify shape as MinHash-LSH: two
    * keyed shuffles, pair fan-out bounded by band occupancy, never
    * corpus x corpus.
    */
  def phashNearDup(hashed: DataFrame, maxDist: Int = 3): DataFrame = {
    // `h` feeds three consumers (the band explode and both verify join
    // sides); without truncation the upstream decode re-executes per
    // consumer. The hash table is 9 small columns per image — cheap to
    // materialize once (lazy localCheckpoint, the winnowMatches/
    // PxlRunner pattern; swap for checkpoint() on a cluster).
    val h = hashed.select(
      (col("media_id") +: (0 until 8).map(i => col(s"r$i"))) :+
        array((0 until 4).map(b =>
          col(s"r${2 * b}") * 256L + col(s"r${2 * b + 1}")): _*).as("bands"): _*)
      .localCheckpoint(false)
    val b = h.select(col("media_id"),
      posexplode(col("bands")).as(Seq("band", "bv")))
    val cand = b.select(col("media_id").as("doc_a"), col("band"), col("bv"))
      .join(b.select(col("media_id").as("doc_b"), col("band"), col("bv")),
        Seq("band", "bv"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    def side(n: String) = h.select(
      col("media_id").as(n) +: (0 until 8).map(i => col(s"r$i").as(s"${n}_r$i")): _*)
    val hamming = (0 until 8).map(i =>
      bit_count(col(s"doc_a_r$i").bitwiseXOR(col(s"doc_b_r$i")))).reduce(_ + _)
    cand.join(side("doc_a"), "doc_a").join(side("doc_b"), "doc_b")
      .withColumn("hamming", hamming.cast("long"))
      .where(col("hamming") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        least(col("doc_a"), col("doc_b")).as("keeper_id"))
  }

  /** Batched frame-window feature extraction over raw binary payloads —
    * the audio-modality analog of [[decodeCells]]: fixed-size byte
    * windows ("frames"), per-frame byte count and sum (the energy
    * profile a real PCM feature extractor would compute per window).
    * One extractor per partition, row-expanding, no collect.
    */
  def frameEnergy(media: DataFrame, frameBytes: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("frame_len", IntegerType),
      StructField("byte_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val id = r.getLong(0)
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, payload.length)
          var sum = 0L
          var i = from
          while (i < until) { sum += payload(i) & 0xff; i += 1 }
          Row(id, f, until - from, sum)
        }
      }
    }(enc)
  }

  /** AUDIO perceptual fingerprint — the audio-modality sibling of
    * [[dHash]], built so the SAME banded-Hamming index machinery
    * ([[graft.ops.PhashIndex]]) serves both modalities: the payload is
    * split into `windows` EQUAL byte windows (byte p of n lands in
    * window p·windows/n — the [[decodeCells]] grid rule in 1-D, so
    * loud/quiet media of any length produce comparable signatures),
    * and bit i compares consecutive window ENERGIES exactly via
    * integer cross-multiplication (sum_i·cnt_{i+1} > sum_{i+1}·cnt_i —
    * no float means, every engine agrees bit-for-bit; an empty window
    * compares 0-vs-0 → bit 0). windows−1 = 64 sign bits emit as 8
    * row-bytes r0..r7 — byte-compatible with the dHash layout, which
    * is the point: one index implementation, two modalities. This is
    * the energy-delta-sign fingerprint family (Haitsma & Kalker 2002's
    * robust-hash shape on a byte-energy feature). Pure per-partition
    * map over payload bytes — no shuffle at any scale.
    */
  def audioFingerprint(media: DataFrame, windows: Int = 65): DataFrame = {
    require(windows == 65,
      "audioFingerprint: 64 sign bits (8 row-bytes) requires windows = 65")
    val schema = StructType(
      StructField("media_id", LongType) +:
        (0 until 8).map(i => StructField(s"r$i", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val id = r.getLong(0)
        val n = if (payload == null) 0 else payload.length
        val sums = new Array[Long](windows)
        val cnts = new Array[Long](windows)
        var p = 0
        while (p < n) {
          val w = ((p.toLong * windows) / n).toInt
          sums(w) += payload(p) & 0xff
          cnts(w) += 1
          p += 1
        }
        val bytes = new Array[Any](8)
        var j = 0
        while (j < 8) {
          var b = 0L
          var k = 0
          while (k < 8) {
            val i = 8 * j + k
            if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i))
              b |= (1L << k)
            k += 1
          }
          bytes(j) = b
          j += 1
        }
        Row.fromSeq(id +: bytes.toSeq)
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

  /** Shot-boundary detection — the video segmentation pass of a
    * multimodal curation pipeline: a cut is declared wherever the
    * frame-feature distance between CONSECUTIVE frames exceeds a
    * threshold (the classic pairwise-comparison detector; here the
    * feature is [[frameEnergy]]'s exact per-window byte sum, so the
    * delta is integer-exact in every engine). The threshold is
    * relative — `|delta| * 100 >= thresholdPct * max(prev, cur)` —
    * so loud and quiet media are cut on proportional change; zero
    * deltas never cut (two silent frames are one shot), and the
    * optional absolute floor `minDelta` suppresses near-silent
    * flicker. The q417 oracle mirrors the default `minDelta = 0`
    * instantiation — callers passing a floor need their own mirror.
    * Emits one row per boundary with the per-media shot index the cut
    * OPENS (boundary k starts shot k+1).
    *
    * Scale: one media-keyed window over frame sequences — frames per
    * media is codec-bound (minutes x fps), never corpus-bound; the
    * energy extraction is the batched per-partition decoder.
    */
  def shotBoundaries(media: DataFrame, frameBytes: Int = 64,
                     thresholdPct: Long = 30L,
                     minDelta: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(thresholdPct > 0, "shotBoundaries: thresholdPct > 0")
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    val e = frameEnergy(media, frameBytes)
      .withColumn("prev_sum", lag(col("byte_sum"), 1).over(w))
    e.where(col("prev_sum").isNotNull)
      .withColumn("delta", col("byte_sum") - col("prev_sum"))
      // delta != 0 kills the degenerate zero-vs-zero frame pair
      // (abs(0) >= 0*pct is vacuously true) — silence never cuts
      .where(col("delta") =!= 0L && abs(col("delta")) >= minDelta &&
        abs(col("delta")) * 100L >=
          greatest(col("byte_sum"), col("prev_sum")) * thresholdPct)
      .withColumn("shot_no", row_number().over(
        Window.partitionBy("media_id").orderBy("frame_no")).cast("long"))
      .select(col("media_id"), col("frame_no"), col("prev_sum"),
        col("byte_sum"), col("delta"), col("shot_no"))
  }
}
