package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{TDigest, Aggregators}

/** UDA laws the reference relies on for partial aggregation (SURVEY §5.4):
  * merge-of-parts must approximate single-pass, and the deterministic
  * sampler must be exactly order/partitioning-independent.
  */
class AggregatorSpec extends AnyFunSuite {

  test("tdigest quantiles within 2% rank error on uniform data") {
    val d = new TDigest()
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(50000)(rnd.nextDouble() * 1000)
    xs.foreach(d.add)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = d.quantile(q)
      val rank = sorted.count(_ <= est).toDouble / xs.length
      assert(math.abs(rank - q) < 0.02, s"q=$q est=$est rank=$rank")
    }
  }

  test("tdigest merge of partitions ~ single-pass digest") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(20000)(rnd.nextGaussian() * 50 + 500)
    val whole = new TDigest(); xs.foreach(whole.add)
    val parts = xs.grouped(3000).map { chunk =>
      val d = new TDigest(); chunk.foreach(d.add); d
    }
    val merged = parts.reduce(_ merge _)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = merged.quantile(q)
      val rank = sorted.count(_ <= est).toDouble / xs.length
      assert(math.abs(rank - q) < 0.02, s"merged q=$q rank=$rank")
    }
  }

  test("sample bottom-k is partitioning-independent (property)") {
    val agg = new Aggregators.SampleAgg(5)
    val prop = Prop.forAll(Gen.listOf(Gen.chooseNum(0L, 100000L)),
                           Gen.chooseNum(1, 7)) {
      (xs: List[Long], nParts: Int) =>
        val single = xs.foldLeft(agg.zero)(agg.reduce)
        val parts = xs.grouped(math.max(1, xs.length / nParts)).toList
        val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
          .foldLeft(agg.zero)(agg.merge)
        agg.finish(single).toSeq == agg.finish(merged).toSeq
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("sample is a distinct-VALUE sample: duplicates collapse to one slot") {
    val agg = new Aggregators.SampleAgg(3)
    val dups = List(5L, 5L, 5L, 9L, 9L, 2L)
    val got = agg.finish(dups.foldLeft(agg.zero)(agg.reduce)).toSeq
    assert(got == Seq(2L, 5L, 9L), s"expected each value once, got $got")
  }

  test("sample matches SQL-oracle semantics (bottom-k by LCG hash)") {
    val agg = new Aggregators.SampleAgg(3)
    val xs = (1L to 100L).toList
    val got = xs.foldLeft(agg.zero)(agg.reduce)
    val expect = xs.distinct
      .sortBy(x => (Aggregators.SampleAgg.hash(x), x)).take(3).sorted
    assert(agg.finish(got).toSeq == expect)
  }
}
