package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Classify, Events, Graph, Scale}

/** Seeded-random fuzz for the event-analytics / classifier-audit /
  * scale-diagnostics tranche: each distributed operator vs a naive
  * in-memory reference (an independent implementation of the spec, not
  * a mirror of the algorithm).
  */
class EventsGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("funnel == per-user chain reference on random event streams") {
    val stages = Seq("a", "b", "c")
    val windowSec = 100L
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("a", "b", "c", "noise")
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(30).toLong, types(rnd.nextInt(types.size)),
          // epoch-ns in a range where windows matter
          (rnd.nextInt(500).toLong) * 1000000000L)
      }
      // reference: strictly-after chain within windowSec of t0
      val byUser = events.groupBy(_._1)
      val t0 = byUser.flatMap { case (u, es) =>
        es.filter(_._2 == stages.head).map(_._3 / 1000L)
          .sorted.headOption.map(u -> _)
      }
      var conv: Map[Long, (Long, Long)] = t0.map { case (u, t) => u -> (t, t) }
      val refCounts = scala.collection.mutable.ArrayBuffer(conv.size.toLong)
      for (st <- stages.tail) {
        conv = conv.flatMap { case (u, (tFirst, tPrev)) =>
          byUser.getOrElse(u, Nil).iterator
            .filter(e => e._2 == st)
            .map(_._3 / 1000L)
            .filter(t => t > tPrev && t <= tFirst + windowSec * 1000000L)
            .reduceOption(_ min _)
            .map(t => u -> (tFirst, t))
        }
        refCounts += conv.size.toLong
      }
      val got = Events.funnel(
          events.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", stages, windowSec)
        .orderBy("stage")
        .select("n_users", "conv_prev_ppm", "conv_first_ppm")
        .as[(Long, Long, Long)].collect().toSeq
      assert(got.map(_._1) == refCounts.toSeq, s"seed $seed counts")
      got.zipWithIndex.foreach { case ((n, cp, cf), i) =>
        val prev = if (i == 0) None else Some(refCounts(i - 1))
        val expPrev = prev match {
          case None => 1000000L
          case Some(0) => 0L
          case Some(p) => n * 1000000L / p
        }
        assert(cp == expPrev, s"seed $seed stage $i conv_prev")
        val first = refCounts.head
        assert(cf == (if (first == 0) 0L else n * 1000000L / first),
          s"seed $seed stage $i conv_first")
      }
    }
  }

  test("retention == first-week cohort reference") {
    for (seed <- Seq(13, 31)) {
      val rnd = new scala.util.Random(seed)
      val wkNs = 604800L * 1000000000L
      val events = (1 to 300).map { _ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(8).toLong * wkNs / 2 +
          rnd.nextInt(1000).toLong * 1000000L)
      }
      val uw = events.map { case (u, ns) => (u, (ns / 1000L) / 604800000000L) }
        .distinct
      val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
      val cells = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
        .map { case (k, us) => k -> us.size.toLong }
      val got = Events.retention(events.toDF("user_id", "ts"), "user_id", "ts")
        .select("cohort_week", "week_offset", "n_users", "retained_ppm")
        .as[(Long, Long, Long, Long)].collect()
      assert(got.length == cells.size, s"seed $seed cell count")
      got.foreach { case (cw, off, n, ppm) =>
        assert(cells((cw, off)) == n, s"seed $seed cell ($cw,$off)")
        assert(ppm == n * 1000000L / cells((cw, 0L)), s"seed $seed ppm")
      }
    }
  }

  test("calibration == binned reference incl. ECE") {
    for (seed <- Seq(3, 41)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 500).map { _ =>
        val p = rnd.nextInt(1000001).toLong
        // correlated label: higher prob -> more likely positive
        (p, if (rnd.nextInt(1000000) < p) 1L else 0L)
      }
      val bins = 10
      val ref = rows.groupBy(r => math.min(r._1 * bins / 1000000L, bins - 1L))
        .map { case (b, rs) =>
          val n = rs.size.toLong
          val conf = rs.map(_._1).sum / n
          val acc = rs.map(_._2).sum * 1000000L / n
          b -> ((n, rs.map(_._2).sum, conf, acc, math.abs(conf - acc)))
        }
      val refEce = ref.values.map(v => v._1 * v._5).sum / ref.values.map(_._1).sum
      val got = Classify.calibration(rows.toDF("prob_ppm", "y"),
          "prob_ppm", "y", bins)
        .select("bin", "n", "n_pos", "conf_ppm", "acc_ppm", "gap_ppm", "ece_ppm")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size)
      got.foreach { case (b, n, np, c, a, g, e) =>
        assert(ref(b) == ((n, np, c, a, g)), s"seed $seed bin $b")
        assert(e == refEce, s"seed $seed ece")
      }
    }
  }

  test("kappa == exact rational reference; perfect/constant edge cases") {
    for (seed <- Seq(11, 59)) {
      val rnd = new scala.util.Random(seed)
      val labels = Vector("x", "y", "z")
      val rows = (1 to 200).map { _ =>
        (labels(rnd.nextInt(3)), labels(rnd.nextInt(3)))
      }
      val n = rows.size.toLong
      val agree = rows.count(r => r._1 == r._2).toLong
      val peNum = labels.map(l =>
        rows.count(_._1 == l).toLong * rows.count(_._2 == l).toLong).sum
      val expKappa = (agree * n - peNum) * 1000000L / (n * n - peNum)
      val got = Classify.kappa(rows.toDF("a", "b"), "a", "b")
        .select("n", "agree", "po_ppm", "pe_ppm", "kappa_ppm")
        .as[(Long, Long, Long, Long, Long)].head()
      assert(got == ((n, agree, agree * 1000000L / n,
        peNum * 1000000L / (n * n), expKappa)), s"seed $seed")
    }
    // both raters constant and identical: pe = 1, kappa undefined -> null
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val row = Classify.kappa(const, "a", "b").collect().head
    assert(row.isNullAt(row.fieldIndex("kappa_ppm")))
    // perfect non-constant agreement: kappa = 1e6
    val perfect = Seq(("x", "x"), ("y", "y")).toDF("a", "b")
    assert(Classify.kappa(perfect, "a", "b")
      .select("kappa_ppm").as[Long].head() == 1000000L)
  }

  test("skewProfile == counted reference with independent md5 bucketing") {
    for (seed <- Seq(19, 37)) {
      val rnd = new scala.util.Random(seed)
      // zipf-ish: key k drawn with weight 1/(k+1)
      val keys = (1 to 600).map { _ =>
        var k = 0
        while (k < 9 && rnd.nextInt(100) < 55) k += 1
        s"key$k"
      }
      val parts = 16
      val counts = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val total = keys.size.toLong
      val got = Scale.skewProfile(keys.toDF("k"), "k", 5, parts)
        .select("key", "n", "share_ppm", "bucket", "salt_factor")
        .as[(String, Long, Long, Long, Long)].collect()
      val expTop = counts.toSeq.sortBy(p => (-p._2, p._1)).take(5)
      assert(got.map(r => (r._1, r._2)).toSeq == expTop, s"seed $seed top-k")
      got.foreach { case (k, n, share, bucket, salt) =>
        assert(share == n * 1000000L / total)
        assert(bucket == (((h60Ref(k) % parts) + parts) % parts))
        assert(salt == (n * parts + total - 1) / total)
      }
    }
  }

  test("pageRank == in-memory integer power-iteration reference") {
    for (seed <- Seq(5, 43)) {
      val rnd = new scala.util.Random(seed)
      val nNodes = 12
      val edges = (for {
        s <- 0 until nNodes; d <- 0 until nNodes
        if s != d && rnd.nextInt(100) < 30
      } yield (s.toLong, d.toLong, 1L + rnd.nextInt(9).toLong)).toVector
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val nn = nodes.size.toLong
      val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      var pr = nodes.map(v => v -> 1000000L / nn).toMap
      for (_ <- 0 until 3) {
        val in = edges.groupBy(_._2).map { case (d, es) =>
          d -> es.map(e => 850000L * pr(e._1) / 1000000L * e._3 / outW(e._1)).sum
        }
        pr = nodes.map(v => v -> (150000L / nn + in.getOrElse(v, 0L))).toMap
      }
      val got = Graph.pageRank(edges.toDF("src", "dst", "w"),
          "src", "dst", "w", 3)
        .select("node", "pr_ppm").as[(Long, Long)].collect().toMap
      assert(got == pr, s"seed $seed")
    }
  }

  test("transitionMatrix == adjacent-pair reference on random streams") {
    for (seed <- Seq(17, 29)) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("a", "b", "c", "d")
      val events = (1 to 400).map { i =>
        (rnd.nextInt(25).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(300).toLong * 1000000000L, i.toLong)
      }
      val ref = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._3 / 1000L, e._4)).map(_._2)
          .sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val fromTot = ref.groupBy(_._1._1)
        .map { case (f, m) => f -> m.values.sum }
      val got = Events.transitionMatrix(
          events.toDF("user_id", "event_type", "ts", "event_id"),
          "user_id", "event_type", "ts", "event_id")
        .select("from_type", "to_type", "n", "p_ppm")
        .as[(String, String, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed pair count")
      got.foreach { case (f, to, n, ppm) =>
        assert(ref((f, to)) == n, s"seed $seed ($f,$to)")
        assert(ppm == n * 1000000L / fromTot(f), s"seed $seed ppm ($f,$to)")
      }
    }
  }

  test("spanConcurrency == brute sweep reference, shared-instant netting exact") {
    for (seed <- Seq(7, 53)) {
      val rnd = new scala.util.Random(seed)
      // coarse grid so starts/ends collide on shared instants
      val spans = (1 to 300).map { _ =>
        (if (rnd.nextBoolean()) "svc1" else "svc2",
          rnd.nextInt(40).toLong * 1000000000L,
          (1L + rnd.nextInt(10)) * 1000000L)
      }
      val ref = spans.groupBy(_._1).map { case (et, ss) =>
        val net = (ss.map(s => (s._2 / 1000L, 1L)) ++
            ss.map(s => (s._2 / 1000L + s._3, -1L)))
          .groupBy(_._1).map { case (t, ds) => t -> ds.map(_._2).sum }
          .toSeq.sortBy(_._1)
        var c = 0L; var peak = Long.MinValue; var peakAt = 0L
        net.foreach { case (t, d) =>
          c += d; if (c > peak) { peak = c; peakAt = t }
        }
        et -> ((ss.size.toLong, peak, peakAt))
      }
      val got = Events.spanConcurrency(
          spans.toDF("event_type", "ts", "dur_us"),
          "event_type", "ts", col("dur_us"))
        .select("event_type", "n_spans", "peak_concurrency", "peak_at_us")
        .as[(String, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed types")
      got.foreach { case (et, n, p, at) =>
        assert(ref(et) == ((n, p, at)), s"seed $seed $et")
      }
    }
  }

  test("rateChangepoint == zero-filled CUSUM grid reference") {
    for (seed <- Seq(23, 61)) {
      val rnd = new scala.util.Random(seed)
      val binUs = 60L * 1000000L
      // rate shift: type 'a' fires 3x as often in the second half
      val events = (1 to 500).map { _ =>
        val et = if (rnd.nextInt(3) == 0) "a" else "b"
        val half = if (et == "a" && rnd.nextInt(4) > 0) 1 else 0
        (et, (half * 3000 + rnd.nextInt(3000)).toLong * 1000000000L)
      }
      val bins = events.map(e => (e._1, e._2 / 1000L / binUs))
      val (b0, b1) = (bins.map(_._2).min, bins.map(_._2).max)
      val nB = b1 - b0 + 1
      val ref = bins.groupBy(_._1).map { case (et, es) =>
        val counts = es.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
        val tot = es.size.toLong
        var pre = 0L
        val ss = (b0 to b1).zipWithIndex.map { case (b, i) =>
          pre += counts.getOrElse(b, 0L)
          (b, nB * pre - (i + 1) * tot)
        }
        val best = ss.minBy { case (b, s) => (-math.abs(s), b) }
        et -> ((best._1, best._2, math.signum(best._2).toLong, nB, tot))
      }
      val got = Events.rateChangepoint(events.toDF("event_type", "ts"),
          "event_type", "ts", binUs)
        .select("event_type", "cp_bin", "cusum_scaled", "direction",
          "n_bins", "n_events")
        .as[(String, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (et, b, s, d, nb, ne) =>
        assert(ref(et) == ((b, s, d, nb, ne)), s"seed $seed $et")
      }
    }
  }

  test("rateAnomalies == doubled-order-statistic MAD reference") {
    def med2Of(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    for (seed <- Seq(3, 89)) {
      val rnd = new scala.util.Random(seed)
      val binUs = 60L * 1000000L
      val events = (1 to 600).map { _ =>
        val et = if (rnd.nextInt(2) == 0) "a" else "b"
        // background rate + an injected burst minute per type
        val burst = rnd.nextInt(20) == 0
        val t = if (burst) 7L else rnd.nextInt(50).toLong
        (et, t * 60L * 1000000000L + rnd.nextInt(1000).toLong)
      }
      val bins = events.map(e => (e._1, e._2 / 1000L / binUs))
      val (b0, b1) = (bins.map(_._2).min, bins.map(_._2).max)
      val ref = bins.groupBy(_._1).flatMap { case (et, es) =>
        val counts = es.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
        val grid = (b0 to b1).map(b => b -> counts.getOrElse(b, 0L))
        val med2 = med2Of(grid.map(_._2))
        val devs = grid.map { case (b, c) => (b, c, (c * 2 - med2).abs) }
        val mad4 = med2Of(devs.map(_._3))
        devs.sortBy { case (b, _, d) => (-d, b) }.take(5).zipWithIndex
          .map { case ((b, c, d), i) =>
            (et, i + 1) -> ((b, c, med2, mad4,
              if (mad4 > 0) Some(d * 2000000L / mad4) else None))
          }
      }
      val got = Events.rateAnomalies(events.toDF("event_type", "ts"),
          "event_type", "ts", binUs, 5)
        .select("event_type", "rank", "bin", "c", "med2", "mad4", "z_ppm")
        .collect()
      assert(got.length == ref.size, s"seed $seed rows")
      got.foreach { r =>
        val key = (r.getString(0), r.getInt(1))
        val z = if (r.isNullAt(6)) None else Some(r.getLong(6))
        assert(ref(key) == ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), z)), s"seed $seed $key")
      }
    }
    // constant series: mad4 = 0 -> null z, ranking still deterministic
    val const = (1 to 60).map(i =>
      ("x", i.toLong * 60L * 1000000000L)).toDF("event_type", "ts")
    val rows = Events.rateAnomalies(const, "event_type", "ts",
      60L * 1000000L, 3).collect()
    assert(rows.length == 3 && rows.forall(_.isNullAt(6)))
  }

  test("topPaths == trigram count reference; lead-chain completeness") {
    for (seed <- Seq(41, 67)) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("a", "b", "c")
      val events = (1 to 300).map { i =>
        (rnd.nextInt(20).toLong, types(rnd.nextInt(3)),
          rnd.nextInt(200).toLong * 1000000000L, i.toLong)
      }
      val tris = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._3 / 1000L, e._4)).map(_._2)
          .sliding(3).filter(_.size == 3).map(_.mkString(">")).toSeq
      }
      val counts = tris.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val total = tris.size.toLong
      val expect = counts.toSeq.sortBy(p => (-p._2, p._1)).take(10)
        .map { case (p, n) => (p, n, n * 1000000L / total) }
      val got = Events.topPaths(
          events.toDF("user_id", "event_type", "ts", "event_id"),
          "user_id", "event_type", "ts", "event_id", 3, 10)
        .as[(String, Long, Long)].collect().toSeq
      assert(got == expect, s"seed $seed")
    }
    // a null event_type poisons every window containing it — it must
    // never collapse into a shorter-looking path (concat_ws skips nulls)
    val withNull = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L), (1L, "e", 3L, 3L),
      (1L, null.asInstanceOf[String], 4L, 4L), (1L, "c", 5L, 5L),
      (1L, "d", 6L, 6L))
      .map { case (u, et, t, i) => (u, et, t * 1000000000L, i) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val nn = Events.topPaths(withNull, "user_id", "event_type", "ts",
      "event_id", 3, 10).as[(String, Long, Long)].collect().toSeq
    assert(nn == Seq(("a>b>e", 1L, 1000000L)), nn.toString)
    // single-stage funnelTimes is a contract violation, not a crash
    intercept[IllegalArgumentException] {
      Events.funnelTimes(withNull, "user_id", "event_type", "ts",
        Seq("a"), 60L)
    }
  }

  test("latencyBands == nearest-rank percentile reference") {
    for (seed <- Seq(5, 71)) {
      val rnd = new scala.util.Random(seed)
      val binUs = 3600L * 1000000L
      val events = (1 to 500).map { _ =>
        ("svc" + rnd.nextInt(2), rnd.nextInt(5).toLong * 3600L * 1000000000L
          + rnd.nextInt(3600).toLong * 1000000000L,
          rnd.nextInt(10000).toLong / 100.0)
      }
      val ref = events.groupBy(e => (e._1, e._2 / 1000L / binUs))
        .map { case (k, es) =>
          val cents = es.map(e => math.round(e._3 * 100.0)).sorted
          val n = cents.size.toLong
          def p(q: Int) = cents(((n * q + 99) / 100).toInt - 1)
          k -> ((n, p(50), p(95), p(99)))
        }
      val got = Events.latencyBands(
          events.toDF("event_type", "ts", "value"),
          "event_type", "ts", "value", binUs)
        .select("event_type", "bin", "n", "p50_c", "p95_c", "p99_c")
        .as[(String, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed cells")
      got.foreach { case (et, b, n, p50, p95, p99) =>
        assert(ref((et, b)) == ((n, p50, p95, p99)), s"seed $seed ($et,$b)")
      }
    }
  }

  test("timeWeightedMean == plain-lead reference across band boundaries") {
    for (seed <- Seq(9, 83)) {
      val rnd = new scala.util.Random(seed)
      // gaps from zero to multiple hours so in-band leads AND band patches
      // both carry weight; duplicate timestamps exercise the eid tiebreak
      var tNs = 0L
      val events = (1 to 300).map { i =>
        tNs += (if (rnd.nextInt(10) == 0) 0L
          else rnd.nextInt(3 * 3600).toLong * 1000000000L)
        ("g" + rnd.nextInt(2), tNs, rnd.nextInt(10000).toLong / 100.0,
          i.toLong)
      }
      val ref = events.groupBy(_._1).map { case (et, es) =>
        val s = es.map(e => (e._2 / 1000L, math.round(e._3 * 100.0), e._4))
          .sortBy(e => (e._1, e._3))
        val n = s.size.toLong
        val span = s.map(_._1).max - s.map(_._1).min
        val wsum = s.zip(s.drop(1)).map { case ((t, c, _), (nt, _, _)) =>
          c * (nt - t) }.sum
        val csum = s.map(_._2).sum
        et -> ((n, span, if (span > 0) Some(wsum / span) else None,
          csum / n))
      }
      val got = Events.timeWeightedMean(
          events.toDF("event_type", "ts", "value", "event_id"),
          "event_type", "ts", "value", "event_id").collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { r =>
        val twa = if (r.isNullAt(3)) None else Some(r.getLong(3))
        assert(ref(r.getString(0)) == ((r.getLong(1), r.getLong(2), twa,
          r.getLong(4))), s"seed $seed ${r.getString(0)}")
      }
    }
    // single-sample series: span 0 -> null twa, mean defined
    val one = Seq(("x", 5L * 1000000000L, 1.25, 1L))
      .toDF("event_type", "ts", "value", "event_id")
    val row = Events.timeWeightedMean(one, "event_type", "ts", "value",
      "event_id").collect().head
    assert(row.isNullAt(3) && row.getLong(4) == 125L)
  }

  test("funnelTimes == chain-reference stage waits (banded med2 + mean)") {
    def med2Of(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.size
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val stages = Seq("a", "b", "c"); val windowSec = 100L
    for (seed <- Seq(7, 23)) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("a", "b", "c", "noise")
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(30).toLong, types(rnd.nextInt(types.size)),
          (rnd.nextInt(500).toLong) * 1000000000L)
      }
      val byUser = events.groupBy(_._1)
      val t0 = byUser.flatMap { case (u, es) =>
        es.filter(_._2 == stages.head).map(_._3 / 1000L)
          .sorted.headOption.map(u -> _)
      }
      var conv: Map[Long, (Long, Long)] = t0.map { case (u, t) => u -> (t, t) }
      val waits = scala.collection.mutable.ArrayBuffer[Seq[Long]]()
      for (st <- stages.tail) {
        val next = conv.flatMap { case (u, (tFirst, tPrev)) =>
          byUser.getOrElse(u, Nil).iterator
            .filter(_._2 == st).map(_._3 / 1000L)
            .filter(t => t > tPrev && t <= tFirst + windowSec * 1000000L)
            .reduceOption(_ min _).map(t => u -> (tFirst, t))
        }
        waits += next.map { case (u, (_, t)) => t - conv(u)._2 }.toSeq
        conv = next
      }
      val got = Events.funnelTimes(
          events.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", stages, windowSec)
        .select("stage", "event_type", "n_users", "med2_dt_us", "mean_dt_us")
        .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
      val expect = waits.zipWithIndex.filter(_._1.nonEmpty).map {
        case (ws, i) => (i + 1L, stages(i + 1), ws.size.toLong,
          med2Of(ws), ws.sum / ws.size)
      }
      assert(got.toSeq == expect.toSeq, s"seed $seed")
    }
  }

  test("senTrend == pairwise-slope median reference; planted drift is detected") {
    for (seed <- Seq(19, 77)) {
      val rnd = new scala.util.Random(seed)
      val binUs = 60L * 1000000L
      // type 'up' fires k events in minute k (clean positive trend);
      // 'flat' fires uniformly
      val events =
        (1 to 8).flatMap(k => Seq.fill(k)(
          ("up", k.toLong * 60L * 1000000000L + rnd.nextInt(1000)))) ++
        (1 to 60).map(_ =>
          ("flat", rnd.nextInt(8).toLong * 60L * 1000000000L + 30000000000L))
      val bins = events.map(e => (e._1, e._2 / 1000L / binUs))
      val (b0, b1) = (bins.map(_._2).min, bins.map(_._2).max)
      val ref = bins.groupBy(_._1).map { case (et, es) =>
        val counts = es.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
        val grid = (b0 to b1).map(b => (b, counts.getOrElse(b, 0L)))
        val slopes = (for {
          (i, ci) <- grid; (j, cj) <- grid if i < j
        } yield ((cj - ci).toDouble / (j - i), i, j))
          .sortBy(identity).map(_._1)
        val n = slopes.size
        val m2 = slopes((n + 1) / 2 - 1) + slopes((n + 2) / 2 - 1)
        et -> ((b1 - b0 + 1, n.toLong,
          BigDecimal(m2 / 2.0).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          math.signum(m2).toLong))
      }
      val got = Events.senTrend(events.toDF("event_type", "ts"),
          "event_type", "ts", binUs)
        .select("event_type", "n_bins", "n_pairs", "sen_slope", "direction")
        .as[(String, Long, Long, Double, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (et, nb, np, s, d) =>
        assert(ref(et) == ((nb, np, s, d)), s"seed $seed $et")
      }
      // the planted drift: 'up' strictly positive, well above 'flat'
      val m = got.map(r => r._1 -> r._4).toMap
      assert(m("up") > 0.5 && math.abs(m("flat")) < m("up"))
    }
  }

  test("movingStats == zero-filled grid reference (cum + trailing window)") {
    for (seed <- Seq(13, 97)) {
      val rnd = new scala.util.Random(seed)
      val binUs = 60L * 1000000L; val win = 5
      val events = (1 to 300).map { _ =>
        ("m" + rnd.nextInt(2), rnd.nextInt(30).toLong * 60L * 1000000000L,
          rnd.nextInt(5000).toLong / 100.0)
      }
      val rows = events.map(e =>
        (e._1, e._2 / 1000L / binUs, math.round(e._3 * 100.0)))
      val (b0, b1) = (rows.map(_._2).min, rows.map(_._2).max)
      val ref = rows.groupBy(_._1).flatMap { case (et, es) =>
        val byBin = es.groupBy(_._2)
        val grid = (b0 to b1).map { b =>
          val cell = byBin.getOrElse(b, Nil)
          (b, cell.size.toLong, cell.map(_._3).sum)
        }
        grid.zipWithIndex.map { case ((b, n, c), i) =>
          val cum = grid.take(i + 1).map(_._3).sum
          val ma = grid.slice(math.max(0, i - win + 1), i + 1).map(_._3).sum
          (et, b) -> ((n, c, cum, ma, ma / win))
        }
      }
      val got = Events.movingStats(events.toDF("event_type", "ts", "value"),
          "event_type", "ts", "value", binUs, win)
        .select("event_type", "bin", "n", "c_sum", "cum_sum", "ma_sum",
          "ma_avg")
        .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (et, b, n, c, cum, ma, avg) =>
        assert(ref((et, b)) == ((n, c, cum, ma, avg)), s"seed $seed ($et,$b)")
      }
    }
  }

  test("growthAccounting == per-user week-set reference; ledger identity holds") {
    for (seed <- Seq(29, 101)) {
      val rnd = new scala.util.Random(seed)
      val wkNs = 604800L * 1000000000L
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(40).toLong,
          rnd.nextInt(10).toLong * wkNs + rnd.nextInt(100000).toLong)
      }
      val uw = events.map(e => (e._1, (e._2 / 1000L) / 604800000000L)).distinct
      val byU = uw.groupBy(_._1).map { case (u, ws) =>
        u -> ws.map(_._2).sorted }
      val weeks = scala.collection.mutable.Map[Long,
        (Long, Long, Long, Long, Long)]().withDefaultValue((0L, 0L, 0L, 0L, 0L))
      byU.foreach { case (_, ws) =>
        ws.zipWithIndex.foreach { case (w, i) =>
          val (a, nn, rt, rs, ch) = weeks(w)
          val isNew = i == 0
          val isRet = i > 0 && ws(i - 1) == w - 1
          weeks(w) = (a + 1, nn + (if (isNew) 1 else 0),
            rt + (if (isRet) 1 else 0),
            rs + (if (!isNew && !isRet) 1 else 0), ch)
          val churns = i == ws.size - 1 || ws(i + 1) != w + 1
          if (churns) {
            val t = weeks(w + 1)
            weeks(w + 1) = (t._1, t._2, t._3, t._4, t._5 + 1)
          }
        }
      }
      val got = Events.growthAccounting(events.toDF("user_id", "ts"),
          "user_id", "ts")
        .select("week", "n_active", "n_new", "n_retained",
          "n_resurrected", "n_churned")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == weeks.size, s"seed $seed")
      got.foreach { case (w, a, nn, rt, rs, ch) =>
        assert(weeks(w) == ((a, nn, rt, rs, ch)), s"seed $seed week $w")
        assert(a == nn + rt + rs, s"seed $seed identity week $w")
      }
    }
  }

  test("activeUsers == sliding-distinct reference incl. empty days") {
    for (seed <- Seq(31, 103)) {
      val rnd = new scala.util.Random(seed)
      val dayNs = 86400L * 1000000000L
      val events = (1 to 400).map { _ =>
        (rnd.nextInt(25).toLong,
          rnd.nextInt(40).toLong * dayNs + rnd.nextInt(1000).toLong)
      }
      val ud = events.map(e => (e._1, (e._2 / 1000L) / 86400000000L)).distinct
      val (d0, d1) = (ud.map(_._2).min, ud.map(_._2).max)
      val ref = (d0 to d1).map { day =>
        def act(w: Int) = ud.filter(p =>
          p._2 <= day && p._2 > day - w).map(_._1).distinct.size.toLong
        val (dau, mau) = (act(1), act(28))
        (day, dau, act(7), mau,
          if (mau > 0) dau * 1000000L / mau else 0L)
      }
      val got = Events.activeUsers(events.toDF("user_id", "ts"),
          "user_id", "ts")
        .orderBy("day")
        .select("day", "dau", "wau", "mau", "stickiness_ppm")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      assert(got == ref, s"seed $seed")
    }
    // null user ids are not users: dau AND wau/mau must all exclude
    // them (a one-sided exclusion would desynchronize the panel)
    val withNull = Seq((Some(1L), 1L), (None, 1L), (Some(2L), 2L))
      .map { case (u, d) => (u.map(Long.box).orNull, d * 86400L * 1000000000L) }
      .toDF("user_id", "ts")
    val rows = Events.activeUsers(withNull, "user_id", "ts")
      .orderBy("day").select("dau", "wau", "mau")
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 1L, 1L), (1L, 2L, 2L)), rows.toString)
  }

  test("cohortLtv == per-cohort cumulative reference; offsets zero-filled") {
    for (seed <- Seq(37, 107)) {
      val rnd = new scala.util.Random(seed)
      val wkNs = 604800L * 1000000000L
      val events = (1 to 300).map { _ =>
        (rnd.nextInt(30).toLong,
          rnd.nextInt(8).toLong * wkNs + rnd.nextInt(1000).toLong,
          rnd.nextInt(5000).toLong / 100.0)
      }
      val rows = events.map(e =>
        (e._1, (e._2 / 1000L) / 604800000000L, math.round(e._3 * 100.0)))
      val cohort = rows.groupBy(_._1).map { case (u, es) =>
        u -> es.map(_._2).min }
      val maxWk = rows.map(_._2).max
      val sizes = cohort.values.groupBy(identity)
        .map { case (cw, v) => cw -> v.size.toLong }
      val ref = sizes.keys.flatMap { cw =>
        var cum = 0L
        (0L to maxWk - cw).map { off =>
          val cell = rows.filter(r =>
            cohort(r._1) == cw && r._2 - cw == off)
          val rev = cell.map(_._3).sum
          cum += rev
          (cw, off) -> ((sizes(cw), cell.size.toLong, rev, cum,
            cum / sizes(cw)))
        }
      }.toMap
      val got = Events.cohortLtv(events.toDF("user_id", "ts", "value"),
          "user_id", "ts", "value")
        .select("cohort_week", "week_offset", "n_users", "n_events",
          "rev_c", "cum_rev_c", "ltv_per_user_c")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (cw, off, nu, ne, r, c, l) =>
        assert(ref((cw, off)) == ((nu, ne, r, c, l)), s"seed $seed ($cw,$off)")
      }
    }
  }

  test("seasonalDeviation == hour-of-day baseline reference; planted spike surfaces") {
    for (seed <- Seq(53, 127)) {
      val rnd = new scala.util.Random(seed)
      // 5 days of hourly traffic; one planted 30-event spike at
      // day 3, hour 7 for type 'a'
      val events = (for {
        d <- 0 until 5; h <- 0 until 24
        et <- Seq("a", "b")
        n = 2 + rnd.nextInt(3) + (if (et == "a" && d == 3 && h == 7) 30 else 0)
        _ <- 1 to n
      } yield (et, (d * 24 + h).toLong * 3600L * 1000000000L +
        rnd.nextInt(1000).toLong)).toSeq
      val bins = events.map(e => (e._1, e._2 / 1000L / (3600L * 1000000L)))
      val (b0, b1) = (bins.map(_._2).min, bins.map(_._2).max)
      val ref = bins.groupBy(_._1).flatMap { case (et, es) =>
        val counts = es.groupBy(_._2).map { case (b, v) => b -> v.size.toLong }
        val grid = (b0 to b1).map(b => (b, b % 24, counts.getOrElse(b, 0L)))
        val bl = grid.groupBy(_._2).map { case (hod, cells) =>
          hod -> cells.map(_._3).sum * 1000L / cells.size }
        grid.map { case (b, hod, c) =>
          (b, hod, c, bl(hod), c * 1000L - bl(hod)) }
          .sortBy { case (b, _, _, _, dv) => (-dv.abs, b) }.take(5)
          .zipWithIndex.map { case ((b, hod, c, base, dv), i) =>
            (et, i + 1) -> ((b, hod, c, base, dv)) }
      }
      val got = Events.seasonalDeviation(events.toDF("event_type", "ts"),
          "event_type", "ts", 3600L * 1000000L, 5)
        .select("event_type", "rank", "bin", "hod", "c", "baseline_milli",
          "dev_milli")
        .collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { r =>
        assert(ref((r.getString(0), r.getInt(1))) ==
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6))), s"seed $seed ${r.getString(0)} ${r.getInt(1)}")
      }
      // the planted spike is type a's #1 deviation
      val top = got.find(r => r.getString(0) == "a" && r.getInt(1) == 1).get
      // the spike inflates its own hod baseline by ~spike/ndays, so
      // dev ~ spike * (1 - 1/ndays) * 1000 = ~24k milli
      assert(top.getLong(2) == 3 * 24 + 7 && top.getLong(6) > 20000L)
    }
  }

  test("hopDistances == in-memory BFS reference on random graphs") {
    for (seed <- Seq(59, 137)) {
      val rnd = new scala.util.Random(seed)
      val n = 15
      val edges = (for {
        s0 <- 0 until n; d <- 0 until n
        if s0 != d && rnd.nextInt(100) < 12
      } yield (s0.toLong, d.toLong)).toVector
      if (edges.nonEmpty) {
        val seedNode = edges.map(_._1).min
        val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        var dist = Map(seedNode -> 0L)
        for (h <- 1 to 3) {
          val frontier = dist.filter(_._2 == h - 1).keys
          frontier.flatMap(f => adj.getOrElse(f, Nil)).foreach { v =>
            if (!dist.contains(v)) dist += (v -> h.toLong)
          }
        }
        val got = graft.ops.Graph.hopDistances(
            edges.toDF("src", "dst"), "src", "dst", min(col("src")), 3)
          .as[(Long, Long)].collect().toMap
        assert(got == dist, s"seed $seed: $got vs $dist")
      }
    }
  }

  test("plan pins: funnel/retention/pageRank shuffle keyed only, skewProfile is agg + top-k") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val pf = plan(Events.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"), 604800L))
    // no cartesian anywhere in the stage chain; the only window is the
    // O(#stages) counts frame
    assert(!pf.contains("CartesianProduct"), pf.take(2000))
    val pr = plan(Events.retention(ev, "user_id", "ts"))
    assert(!pr.contains("CartesianProduct"), pr.take(2000))
    val pp = plan(Graph.pageRank(
      Graph.profileEdges(docs, "text", "source"), "src", "dst", "w", 3))
    assert(!pp.contains("CartesianProduct"), pp.take(2000))
    // materialize-once: the 3-iteration plan must NOT re-derive the
    // edge lineage from the corpus per round — after the checkpoint the
    // iterated plan reads RDD scans only, zero parquet scans
    assert(!pp.contains("FileScan"), pp.take(3000))
    val ps = plan(Scale.skewProfile(ev, "event_type", 10, 32))
    assert(ps.contains("TakeOrderedAndProject"), ps.take(2000))
    assert(!ps.contains("CartesianProduct"), ps.take(2000))
  }

  test("profileEdges is symmetric and matches a brute-force dot reference") {
    val docs = Seq(
      (1L, "apple banana apple", "s0"), (2L, "banana cherry", "s1"),
      (3L, "apple cherry cherry", "s2"), (4L, "banana banana", "s0"))
      .toDF("doc_id", "text", "source")
    val prof = docs.collect().toSeq
      .map(r => (r.getString(2), r.getString(1).split(" ").toSeq))
      .groupBy(_._1)
      .map { case (s, rs) =>
        s -> rs.flatMap(_._2).groupBy(w => h60Ref(w) % 256)
          .map { case (b, ws) => b -> ws.size.toLong }
      }
    val expect = (for {
      a <- prof.keys; b <- prof.keys if a != b
      dot = prof(a).keys.toSet.intersect(prof(b).keys.toSet)
        .toSeq.map(k => prof(a)(k) * prof(b)(k)).sum
      if dot > 0
    } yield (a, b) -> dot).toMap
    val got = Graph.profileEdges(docs, "text", "source")
      .select("src", "dst", "w").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == expect)
    got.foreach { case ((a, b), w) => assert(got((b, a)) == w, "symmetry") }
  }
}
