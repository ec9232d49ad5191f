package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MlAggregators.{KMeansAgg, PprofAgg}

/** SURVEY §5.4 analog of the reference's UDA fuzz tests: partial
  * aggregation across an arbitrary shuffle must be indistinguishable from
  * a single pass — merge(reduce-partitions) == reduce(all), for any split
  * and any merge order. Exercised directly on the Aggregator semantics.
  */
class MlPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(r.passed, r.status.toString)
  }

  test("kmeans: split+merge == single pass, any partitioning") {
    val pointGen = Gen.listOfN(2, Gen.chooseNum(-50, 50).map(_.toDouble))
    val dataGen = Gen.nonEmptyListOf(pointGen)
    val agg = new KMeansAgg(3, cap = 32)
    check(Prop.forAll(dataGen, Gen.chooseNum(1, 5)) { (pts, nSplits) =>
      val single = agg.finish(pts.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val chunks = pts.grouped(math.max(1, pts.length / nSplits)).toList
      val partials = chunks.map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
      val mergedFwd = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      val mergedRev = agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge))
      single == mergedFwd && single == mergedRev
    })
  }

  test("pprof: split+merge == single pass, counts sum exactly") {
    val rowGen = for {
      s <- Gen.oneOf("a;b", "a;c", "m;n;o", "z")
      n <- Gen.chooseNum(0L, 100L)
    } yield (s, n)
    val agg = new PprofAgg
    check(Prop.forAll(Gen.nonEmptyListOf(rowGen), Gen.chooseNum(1, 5)) {
      (rows, nSplits) =>
        val single = agg.finish(rows.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        val chunks = rows.grouped(math.max(1, rows.length / nSplits)).toList
        val partials = chunks.map(_.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
        val merged = agg.finish(partials.reverse.foldLeft(agg.zero)(agg.merge))
        single == merged
    })
  }

  test("kmeans: buffer never exceeds compaction bound") {
    val agg = new KMeansAgg(2, cap = 8)
    val pts = (1 to 1000).map(i => Seq((i % 37).toDouble))
    val buf = pts.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(buf.flat.length <= 4 * 8 + 8) // 4x cap points (dim 1) + slack
  }
}
