package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("joinBackward picks the latest preceding right row, inclusive, per key") {
    val left = Seq((1L, 100L), (1L, 250L), (2L, 100L))
      .toDF("k", "t")
    val right = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"))
      .toDF("k", "t", "v")
    val got = AsOf.joinBackward(left, right, Seq("k"), "t", "t")
      .select("k", "t", "right_v").as[(Long, Long, String)]
      .collect().toSet
    // t=100 matches the equal-time right row (inclusive); k=2's only
    // right row is later than its left row -> null
    assert(got == Set((1L, 100L, "a"), (1L, 250L, "b"), (2L, 100L, null)))
  }

  test("joinBackward ties at equal time resolve to the greatest tieBreak") {
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L, "lo"), (1L, 100L, 9L, "hi"))
      .toDF("k", "t", "seq", "v")
    val got = AsOf.joinBackward(left, right, Seq("k"), "t", "t",
        tieBreak = Some("seq"))
      .select("right_v").as[String].head()
    assert(got == "hi")
  }

  test("joinBackward preserves the latest right row's genuine NULLs (no chimera rows)") {
    // The latest preceding right row (t=200) has v=null, u=20: v must
    // stay null — NOT back-fill from the older (t=100, v="a") row, which
    // would mix columns from two different right rows.
    val left = Seq((1L, 250L)).toDF("k", "t")
    val right = Seq((1L, 100L, Some("a"), 10L), (1L, 200L, None, 20L))
      .toDF("k", "t", "v", "u")
    val got = AsOf.joinBackward(left, right, Seq("k"), "t", "t")
      .select("right_v", "right_u").as[(Option[String], Long)].head()
    assert(got == (None, 20L))
  }

  test("joinBackward equals a brute-force as-of join on random data with nulls") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 200).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    val right = (1 to 150).map(i => (rnd.nextInt(4).toLong,
      rnd.nextInt(1000).toLong,
      if (rnd.nextBoolean()) Some(s"v$i") else None, i.toLong))
    val got = AsOf.joinBackward(left.toDF("id", "k", "t"),
        right.toDF("k", "t", "v", "seq"), Seq("k"), "t", "t",
        tieBreak = Some("seq"))
      .select("id", "right_v", "right_seq")
      .as[(Long, Option[String], Option[Long])].collect().toSet
    val want = left.map { case (id, k, t) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) (id, None: Option[String], None: Option[Long])
      else {
        val best = cands.maxBy(c => (c._2, c._4))
        (id, best._3, Some(best._4))
      }
    }.toSet
    assert(got == want)
  }

  test("rangeJoin matches a brute-force non-equi join exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextLong(100000L)))
    val df = rows.toDF("id", "k", "t")
    val got = AsOf.rangeJoin(df, df.toDF("rid", "k", "rt"), Seq("k"),
        "t", "rt", before = 7000L, after = 3000L, rightPrefix = "")
      .select("id", "rid").as[(Long, Long)].collect().toSet
    val want = (for {
      (a, ka, ta) <- rows; (b, kb, tb) <- rows
      if ka == kb && tb >= ta - 7000L && tb <= ta + 3000L
    } yield (a, b)).toSet
    assert(got == want)
  }
}
