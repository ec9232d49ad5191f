package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Alerts

/** Seeded fuzz for the alerting layer: every op vs an independent
  * in-memory reference, plus the hand-built hysteresis sequences that
  * prove the dead band actually holds state (the property a fuzz on
  * random data might never isolate).
  */
class AlertsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkEvents(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (rnd.nextInt(3).toLong,
        if (rnd.nextInt(5) == 0) "error" else "ok",
        rnd.nextInt(20).toLong * 3600L * 1000000000L
          + rnd.nextInt(3600).toLong * 1000000000L,
        rnd.nextInt(50000).toLong / 100.0, i.toLong)
    }
  }

  private def ratesRef(events: Seq[(Long, String, Long, Double, Long)]) = {
    val binUs = 3600L * 1000000L
    val rows = events.map(e => (e._1, e._3 / 1000L / binUs, e._2))
    val (b0, b1) = (rows.map(_._2).min, rows.map(_._2).max)
    rows.map(_._1).distinct.flatMap { k =>
      (b0 to b1).map { b =>
        val cell = rows.filter(r => r._1 == k && r._2 == b)
        val n = cell.size.toLong
        val e = cell.count(_._3 == "error").toLong
        (k, b, n, e, if (n > 0) e * 1000000L / n else 0L)
      }
    }
  }

  test("errorRates == zero-filled keyed grid reference") {
    for (seed <- Seq(3, 59)) {
      val events = mkEvents(seed, 400)
      val got = Alerts.errorRates(
          events.toDF("shard", "event_type", "ts", "value", "event_id"),
          "shard", "ts", col("event_type") === "error", 3600L * 1000000L)
        .select("k", "b", "n", "n_err", "err_ppm")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == ratesRef(events).toSet, s"seed $seed")
    }
  }

  test("alertHysteresis: dead band holds state; edges fire exactly once") {
    // hand-built rate sequence (single key): rises through the band,
    // oscillates INSIDE it (must not flap), clears only at/below lo
    val ppm = Seq(0L, 200000L, 400000L, 250000L, 320000L, 160000L,
      150000L, 200000L, 400000L)
    //         off  off(band) ON   hold  hold   hold    OFF   off   ON
    val expAlert = Seq(0L, 0L, 1L, 1L, 1L, 1L, 0L, 0L, 1L)
    val rates = ppm.zipWithIndex.map { case (p, i) =>
      (0L, i.toLong, 10L, p / 100000L, p) }
      .toDF("k", "b", "n", "n_err", "err_ppm")
    val got = Alerts.alertHysteresis(rates, 300000L, 150000L)
      .orderBy("b")
      .select("alert", "fired", "cleared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == expAlert, got.toString)
    assert(got.map(_._2).sum == 2L && got.map(_._3).sum == 1L)
    assert(got.zipWithIndex.forall { case ((a, f, c), i) =>
      val prev = if (i == 0) 0L else got(i - 1)._1
      f == (if (a == 1 && prev == 0) 1L else 0L) &&
        c == (if (a == 0 && prev == 1) 1L else 0L)
    })
  }

  test("burnRate == trailing-window reference; on-budget series burns 100") {
    for (seed <- Seq(7, 83)) {
      val events = mkEvents(seed, 500)
      val ref = ratesRef(events).groupBy(_._1).flatMap { case (_, cells) =>
        val s = cells.sortBy(_._2)
        s.zipWithIndex.map { case ((k, b, _, _, ppm), i) =>
          def burn(w: Int) = {
            val win = s.slice(math.max(0, i - w + 1), i + 1)
            val n = win.map(_._3).sum; val e = win.map(_._4).sum
            if (n > 0) e * 100000000L / (n * 250000L) else 0L
          }
          (k, b) -> ((ppm, burn(6), burn(24)))
        }
      }
      val got = Alerts.burnRate(
          Alerts.errorRates(
            events.toDF("shard", "event_type", "ts", "value", "event_id"),
            "shard", "ts", col("event_type") === "error", 3600L * 1000000L),
          750000L, Seq(6, 24))
        .select("k", "b", "err_ppm", "burn6_x100", "burn24_x100")
        .as[(Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (k, b, p, b6, b24) =>
        assert(ref((k, b)) == ((p, b6, b24)), s"seed $seed ($k,$b)")
      }
    }
    // a series erring at exactly the budget rate burns exactly 100
    val onBudget = (1 to 4).map(i =>
      (0L, i.toLong, 4L, 1L, 250000L)).toDF("k", "b", "n", "n_err", "err_ppm")
    val burns = Alerts.burnRate(onBudget, 750000L, Seq(2))
      .select("burn2_x100").as[Long].collect()
    assert(burns.forall(_ == 100L), burns.toSeq.toString)
  }

  test("apdex == threshold reference; all-fast hour scores 1e6") {
    for (seed <- Seq(11, 91)) {
      val events = mkEvents(seed, 400)
      val binUs = 3600L * 1000000L
      val ref = events.groupBy(e => (e._2, e._3 / 1000L / binUs))
        .map { case (k, es) =>
          val cents = es.map(e => math.round(e._4 * 100.0))
          val sat = cents.count(_ <= 100L).toLong
          val tol = cents.count(c => c > 100L && c <= 400L).toLong
          k -> ((cents.size.toLong, sat, tol,
            (sat * 2 + tol) * 1000000L / (cents.size * 2L)))
        }
      val got = Alerts.apdex(
          events.toDF("shard", "event_type", "ts", "value", "event_id"),
          "event_type", "ts", "value", 100L, binUs)
        .select("k", "b", "n", "n_satisfied", "n_tolerating", "apdex_ppm")
        .as[(String, Long, Long, Long, Long, Long)].collect()
      assert(got.length == ref.size, s"seed $seed")
      got.foreach { case (k, b, n, s0, t0, a) =>
        assert(ref((k, b)) == ((n, s0, t0, a)), s"seed $seed ($k,$b)")
      }
    }
    val fast = Seq(("x", 1000000000L, 0.5, 1L), ("x", 2000000000L, 1.0, 2L))
      .toDF("event_type", "ts", "value", "event_id")
    assert(Alerts.apdex(fast, "event_type", "ts", "value", 100L,
        3600L * 1000000L)
      .select("apdex_ppm").as[Long].head() == 1000000L)
  }

  test("latencyHeatmap == bucketed density reference; shares sum to ~1e6 per column") {
    val events = mkEvents(43, 600)
    val binUs = 6L * 3600L * 1000000L
    val ref = events.groupBy(e => (e._2, e._3 / 1000L / binUs,
        math.min(math.round(e._4 * 100.0) / 2000L, 20L)))
      .map { case (k, es) => k -> es.size.toLong }
    val colTot = ref.groupBy { case ((k, b, _), _) => (k, b) }
      .map { case (k, m) => k -> m.values.sum }
    val got = Alerts.latencyHeatmap(
        events.toDF("shard", "event_type", "ts", "value", "event_id"),
        "event_type", "ts", "value", binUs, 2000L, 20)
      .select("k", "b", "vb", "n", "share_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length == ref.size)
    got.foreach { case (k, b, vb, n, share) =>
      assert(ref((k, b, vb)) == n, s"($k,$b,$vb)")
      assert(share == n * 1000000L / colTot((k, b)), s"share ($k,$b,$vb)")
    }
    // per-(k,b) shares sum within integer-truncation slack of 1e6
    got.groupBy(r => (r._1, r._2)).foreach { case (kb, rs) =>
      val s = rs.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - rs.size, s"$kb sum $s")
    }
  }
}
