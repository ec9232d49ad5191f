package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** BPE tokenizer: trainer determinism (hand-computed merges), the
  * replace-chain == greedy-merge equivalence the gate oracle relies on,
  * and symbol-boundary safety of the marker encoding.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("bpeTrain learns the hand-computed merges with deterministic ties") {
    // corpus: low(x2) lower(x1).
    // pairs: (l,o)=3 (o,w)=3 (w,e)=1 (e,r)=1 -> tie broken lexicographically
    // -> (l,o); then (lo,w)=3; then tie (e,r) vs (low,e) -> (e,r); then
    // (low,er).
    val df = Seq("low low lower").toDF("text")
    val merges = TextOps.bpeTrain(df, "text", 4)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "e" -> "r", "low" -> "er"))
    // training exhausts: after (low,er) both words are single symbols
    assert(TextOps.bpeTrain(df, "text", 10).length == 4)
  }

  test("encode applies merges greedily left-to-right, non-overlapping") {
    val merges = Seq("a" -> "b", "a" -> "a")
    // 'aab': (a,b) first at chars 2-3 -> [a, ab]; the (a,a) rank-2 merge
    // must NOT fire across the consumed 'a'.
    // 'aaab': (a,b) -> a a ab; then (a,a) -> aa ab.
    val df = Seq("aab aaab").toDF("text")
    val toks = df.select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("a", "ab", "aa", "ab"))
  }

  test("marker prefix prevents symbol-boundary false matches") {
    // After (a,a) merges 'aa', a later (a,b) merge must not match the
    // tail of the 'aa' symbol against a following 'b'.
    val merges = Seq("a" -> "a", "a" -> "b")
    val toks = Seq("aab").toDF("text")
      .select(TextOps.bpeTokens(col("text"), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("aa", "b"))
  }

  test("replace-chain encode == driver-side greedy mergePair on real docs") {
    val docs = graft.core.Tables(spark, sf, "documents").limit(50)
    val merges = TextOps.bpeTrain(docs, "text", 20)
    val rows = docs.select(col("text"),
        TextOps.bpeTokens(col("text"), merges).as("toks"))
      .as[(String, Seq[String])].collect()
    for ((text, sparkToks) <- rows) {
      val local = text.split(" ").filter(_.nonEmpty).flatMap { w =>
        merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
          TextOps.mergePair(syms, a, b)
        }
      }.toSeq
      assert(sparkToks == local, s"mismatch for: $text")
      // lossless: tokens concatenate back to the original words
      assert(sparkToks.mkString == text.split(" ").filter(_.nonEmpty).mkString)
    }
    // training actually compresses: fewer tokens than characters
    val n = rows.map(_._2.size).sum
    assert(n < rows.map(_._1.count(_ != ' ')).sum)
  }

  test("bundled sentencepiece model reproduces from the fixture corpus") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val merges = TextOps.bpeTrain(docs, "text", 48, wordPrefix = "▁")
    assert(merges == graft.functions.MlScalars.sentencePieceMerges)
  }

  test("bpeWordCounts cap is deterministic (count desc, word asc)") {
    val df = Seq("b b a a c").toDF("text")
    val top = TextOps.bpeWordCounts(df, "text", 2).as[(String, Long)].collect()
    assert(top.toSeq == Seq(("a", 2L), ("b", 2L)))
  }
}
