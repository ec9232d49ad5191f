package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Events, Multimodal, Quality, Similarity, TextOps}

/** Round-8 batch-3 specs: phrase mining, k-anonymity, closed-form
  * CUSUM (vs the direct recursion — the property the window trick
  * must preserve), centroid drift, margin mining (vs brute-force
  * mutual-NN), OLS trend, Benford ladder, shot boundaries. References
  * here are independent in-memory implementations, seeded where
  * random.
  */
class Round8cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phraseMining == in-memory staged-integer reference on random word streams") {
    for (seed <- Seq(7, 19)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
      val docs = (1 to 40).map { _ =>
        // plant a sticky bigram "alpha beta" amid random words
        (1 to 20).flatMap { _ =>
          if (rnd.nextInt(4) == 0) Seq("alpha", "beta")
          else Seq(vocab(rnd.nextInt(vocab.size)))
        }.mkString(" ")
      }
      val toks = docs.map(_.split(" ").toSeq)
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = toks.map(_.size.toLong).sum
      val bi = toks.flatMap(w => w.zip(w.tail))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = bi.collect { case ((a, b), cab) if cab >= 3 =>
        val score = (cab - 2L) * 1000000L / uni(a) * n / uni(b)
        ((a, b), (cab, uni(a), uni(b), score))
      }.filter(_._2._4 >= 0L)
      val got = TextOps.phraseMining(docs.toDF("text"), "text",
          delta = 2L, minCount = 3L, minScoreE6 = Long.MinValue)
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      assert(got == expect, s"seed $seed")
      assert(got.contains(("alpha", "beta")))
    }
  }

  test("kAnonymity flags exactly the sub-k QI groups; repeat rows don't inflate subjects") {
    // group A: 2 subjects x 3 rows each (violates k=3)
    // group B: 3 subjects (meets k=3), group C: 1 subject (violates)
    val rows = Seq.fill(3)(("A", 1L)) ++ Seq.fill(3)(("A", 2L)) ++
      Seq(("B", 10L), ("B", 11L), ("B", 12L)) ++ Seq(("C", 20L))
    val got = Quality.kAnonymity(rows.toDF("qi", "subj"), "subj",
        Seq("qi"), k = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("A", 2L, 6L), ("C", 1L, 1L)))
  }

  test("cusumDrift closed form == direct max(0, S+x) recursion on random grids") {
    for (seed <- Seq(5, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      val nBins = 48
      val counts = (0 until nBins).map(b =>
        (b.toLong, (1 + rnd.nextInt(9) + (if (b > 30) rnd.nextInt(20) else 0)).toLong))
      // events: c(b) rows in hour-bucket b (epoch hour b)
      val ev = counts.flatMap { case (b, c) =>
        Seq.fill(c.toInt)(("t", b * 3600L * 1000000000L))
      }
      val slackDen = 4L; val hMult = 2L
      val got = Events.cusumDrift(ev.toDF("event_type", "ts"),
          "event_type", "ts", binUs = 3600000000L, slackDen, hMult)
        .collect().map(r => (r.getLong(2), r.getLong(5))).toMap
      // independent reference: the literal sequential recursion
      val total = counts.map(_._2).sum
      val mm = total * 1000L / nBins
      val slack = mm / slackDen
      var s = 0L
      val ref = scala.collection.mutable.Map.empty[Long, Long]
      for ((b, c) <- counts) {
        s = math.max(0L, s + c * 1000L - mm - slack)
        if (s >= mm * hMult) ref(b) = s
      }
      assert(got == ref.toMap, s"seed $seed")
      assert(ref.nonEmpty, s"seed $seed planted drift must alarm")
    }
  }

  test("olsTrend recovers a planted exact line; constant series yields null slope/r2=1 line") {
    // y = 3x + 2 on 24 hourly bins: slope 3, intercept 2, r2 = 1
    val ev = (0 until 24).flatMap { b =>
      Seq.fill(3 * b + 2)(("t", b * 3600L * 1000000000L))
    }
    val r = Events.olsTrend(ev.toDF("event_type", "ts"), "event_type",
      "ts", 3600000000L).collect().head
    assert(r.getLong(1) == 24L)
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 2.0
      && r.getDouble(4) == 1.0)
    // constant series: dyy = 0 -> r2 null, slope 0
    val flat = (0 until 10).flatMap { b =>
      Seq.fill(4)(("t", b * 3600L * 1000000000L))
    }
    val f = Events.olsTrend(flat.toDF("event_type", "ts"), "event_type",
      "ts", 3600000000L).collect().head
    assert(f.getDouble(2) == 0.0 && f.getDouble(3) == 4.0 && f.isNullAt(4))
  }

  test("benford digit ladder: boundary values land on their digit; out-of-range excluded") {
    val vals = Seq(0.001, 0.0099, 0.1, 0.35, 1.0, 9.99, 10.0, 99.0,
      100.0, 999.0, 1000.0, 9999.0, 10000.0, 0.0005, -5.0, 0.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("g", v) }
      .toDF("grp", "v")
    val got = Quality.benford(df, "grp", "v")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // 10000, 0.0005, -5, 0 excluded -> 12 in-ladder values
    assert(got.values.sum == 12L)
    assert(got(1L) == 6L) // 0.1, 1.0, 10.0, 100.0, 1000.0, 0.001
    assert(got(3L) == 1L) // 0.35
    assert(got(9L) == 5L) // 0.0099, 9.99, 99, 999, 9999
    // ppm shares sum to <= 1e6 and deviations are vs the fixed table
    val full = Quality.benford(df, "grp", "v").collect()
    full.foreach { r =>
      assert(r.getLong(4) == Quality.benfordPpmTable(r.getLong(1).toInt - 1))
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4))
    }
  }

  test("centroidDrift: identical halves -> dist2 0; planted one-dim shift -> that dim tops") {
    // ids 0..3: even half == odd half -> zero drift
    val same = Seq(
      (0L, Seq(1.0, 2.0, 3.0), 7), (1L, Seq(1.0, 2.0, 3.0), 7),
      (2L, Seq(5.0, 5.0, 5.0), 7), (3L, Seq(5.0, 5.0, 5.0), 7))
    val z = Similarity.centroidDrift(same.toDF("id", "vec", "lab"),
      "id", "vec", "lab").collect().head
    assert(z.getDouble(3) == 0.0 && z.getLong(6) == 0L)
    // plant +2.0 on dim 1 of the odd half only
    val shifted = Seq(
      (0L, Seq(1.0, 2.0, 3.0), 7), (1L, Seq(1.0, 4.0, 3.0), 7),
      (2L, Seq(1.0, 2.0, 3.0), 7), (3L, Seq(1.0, 4.0, 3.0), 7))
    val s = Similarity.centroidDrift(shifted.toDF("id", "vec", "lab"),
      "id", "vec", "lab").collect().head
    assert(s.getInt(4) == 1, "top_dim must be the planted dim")
    assert(s.getLong(5) == -1L, "even-half centroid is below the odd")
    assert(s.getDouble(3) == 4.0) // (2.0)^2
    assert(s.getLong(6) == 2000000000L) // 2.0 in nano units
  }

  test("marginMining == brute-force mutual-NN with identical quantization") {
    for (seed <- Seq(13, 31)) {
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(8)(rnd.nextDouble() * 2 - 1), i % 2)
      }
      val k = 3
      val got = Similarity.marginMining(vecs.toDF("id", "vec", "side"),
          "id", "vec", "side", k)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      // reference
      val q = vecs.map { case (id, v, s) =>
        (id, v.map(x => math.floor(x * 1e6 + 0.5).toLong), s)
      }
      val as = q.filter(_._3 == 0); val bs = q.filter(_._3 == 1)
      def dot(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => x * y }.sum
      val dots = (for (a <- as; b <- bs)
        yield ((a._1, b._1), dot(a._2, b._2))).toMap
      def top(items: Seq[(Long, Long)]) = // (otherId, dot) sorted
        items.sortBy { case (o, d) => (-d, o) }
      val ref = for {
        a <- as
        ranksA = top(bs.map(b => (b._1, dots((a._1, b._1)))))
        (bBest, d) = ranksA.head
        ranksB = top(as.map(x => (x._1, dots((x._1, bBest)))))
        if ranksB.head._1 == a._1
      } yield {
        val ka = ranksA.take(k).map(_._2).sum
        val kb = ranksB.take(k).map(_._2).sum
        ((a._1, bBest), (d,
          if (ka + kb > 0) BigDecimal(2.0 * k * d / (ka + kb))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else Double.NaN))
      }
      assert(got.keySet == ref.map(_._1).toSet, s"seed $seed")
      ref.foreach { case (pair, (d, m)) =>
        assert(got(pair)._1 == d)
        if (!m.isNaN) assert(math.abs(got(pair)._2 - m) < 1e-9)
      }
    }
  }

  test("shotBoundaries: flat energy -> none; step change -> one cut; relative threshold") {
    // 64-byte frames of 'a' (97) then 'z' (122): |delta| = 64*25 = 1600,
    // 30% of max(7808, 6208) = 2342 -> NOT a cut at 30%, IS at 20%
    val gentle = ("a" * 128) + ("z" * 128)
    // 'a' frames then '!' (33) frames: delta 64*64=4096 vs 30% of 6208 -> cut
    val sharp = ("a" * 128) + ("!" * 128)
    val flat = "a" * 256
    val media = Multimodal.asMediaTable(
      Seq((1L, gentle), (2L, sharp), (3L, flat)).toDF("id", "txt"),
      "id", "txt")
    val cuts30 = Multimodal.shotBoundaries(media, 64, 30L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cuts30 == Set((2L, 2)))
    val cuts20 = Multimodal.shotBoundaries(media, 64, 20L)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cuts20 == Set((1L, 2), (2L, 2)))
    // shot_no ranks boundaries per media
    val multi = Multimodal.asMediaTable(
      Seq((9L, ("a" * 64) + ("!" * 64) + ("a" * 64) + ("!" * 64)))
        .toDF("id", "txt"), "id", "txt")
    val sn = Multimodal.shotBoundaries(multi, 64, 30L)
      .collect().map(r => (r.getInt(1), r.getLong(5))).toSeq.sorted
    assert(sn == Seq((1, 1L), (2, 2L), (3, 3L)))
  }
}
