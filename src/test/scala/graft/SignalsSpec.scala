package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Corpus, Dedup, Similarity, TextOps}

/** Semantic properties for the late round-7 operator tranche
  * (q309–q318). Each operator already earns a green CORRECTNESS row
  * against its DuckDB oracle; these cases pin the CLAIMS the oracles
  * can't express — discount/invariance/equivalence properties and the
  * plan shapes the scale contracts rest on.
  */
class SignalsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("weightedJaccard discounts boilerplate agreement, keeps identity at 1.0") {
    val boiler = ((1 to 30).map(i => s"b$i")).mkString(" ")
    // Docs 1/2 share ONLY the 30-word boilerplate; their tails are
    // disjoint. Docs 3..8 repeat the boilerplate so its grams carry
    // high df (ln(N/df) ~ 0). Docs 9/10 are exact copies of each other
    // with text seen nowhere else (df=2 of N=10 → weight > 0).
    val rare = (1 to 20).map(i => s"r$i").mkString(" ")
    val rows = Seq(
      (1L, s"$boiler ta1 ta2 ta3 ta4 ta5"),
      (2L, s"$boiler tb1 tb2 tb3 tb4 tb5")) ++
      (3L to 18L).map(i => (i, s"$boiler t${i}x t${i}y")) ++
      Seq((19L, rare), (20L, rare))
    val df = rows.toDF("doc_id", "text")
    val plain = Dedup.ngramJaccard(df, "text", "doc_id", 3, 16, 4, 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val weighted = Dedup.weightedJaccard(df, "text", "doc_id", 3, 16, 4, -1.0)
      .select("doc_a", "doc_b", "weighted_jaccard")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // boilerplate-only pair: plain Jaccard calls it a near-dup, the
    // IDF weighting demotes it hard
    assert(plain((1L, 2L)) > 0.6, s"plain=${plain((1L, 2L))}")
    assert(weighted((1L, 2L)) < plain((1L, 2L)) / 3,
      s"weighted=${weighted((1L, 2L))} plain=${plain((1L, 2L))}")
    // exact copies of rare content: both metrics say 1.0, and the
    // integer micro-nat ratio is EXACTLY 1.0, not 0.999…
    assert(plain((19L, 20L)) == 1.0 && weighted((19L, 20L)) == 1.0,
      s"rare pair plain=${plain((19L, 20L))} weighted=${weighted((19L, 20L))}")
  }

  test("weightedJaccard plan: candidates-then-verify, no quadratic join") {
    val df = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val p = plan(Dedup.weightedJaccard(df, "text", "doc_id"))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the only broadcast-nested-loop is the 1-row corpus-count N
    // attached to the gram-DF table (model-sized, not data-sized)
    assert(p.sliding("BroadcastNestedLoopJoin".length)
      .count(_ == "BroadcastNestedLoopJoin") <= 1, p.take(2000))
  }

  test("tokenEntropy: 0 for a one-word doc, ln(n) for uniform, partitioning-invariant") {
    val uniform = (1 to 8).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, "same same same same same"),
      (2L, uniform),
      (3L, "aa aa aa aa bb bb cc dd " + uniform)).toDF("doc_id", "text")
    def collectH(d: org.apache.spark.sql.DataFrame) =
      TextOps.tokenEntropy(d, "text", "doc_id")
        .select("doc_id", "entropy_nats").as[(Long, Double)].collect().toMap
    val h = collectH(df)
    assert(h(1L) == 0.0)
    assert(math.abs(h(2L) - math.log(8)) < 1e-5, s"h2=${h(2L)}")
    assert(h(3L) > 0.0 && h(3L) < math.log(16))
    // micro-nat quantization before the sum → identical at any layout
    assert(collectH(df.repartition(7)) == h)
  }

  test("stitchPairs finds tail==head continuations exactly, no self-pairs") {
    val p8 = (1 to 8).map(i => s"p$i").mkString(" ")
    val df = Seq(
      (1L, s"front matter of the page body $p8"), // tail = p8
      (2L, s"$p8 rest of the continuation text here"), // head = p8
      (3L, "completely unrelated page with its own eight word run"),
      (4L, p8) // head == own tail: must NOT self-pair
    ).toDF("doc_id", "text")
    val got = TextOps.stitchPairs(df, "text", "doc_id", 8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.forall(p => p._1 != p._2), got.toString)
    // doc 4 IS the phrase, so it stitches both ways with 1 and 2 —
    // but its own head==tail match is excluded
    assert(got == Set((1L, 2L), (1L, 4L), (4L, 2L)), got.toString)
  }

  test("sourceTemplates reports the modal opening phrase and breaks ties high") {
    val df = Seq(
      (1L, "alpha header one two three four five six tail a", "s1"),
      (2L, "alpha header one two three four five six tail b", "s1"),
      (3L, "different opening words entirely here for this doc", "s1"),
      (4L, "aaa one two three four five six seven x", "s2"),
      (5L, "zzz one two three four five six seven y", "s2")
    ).toDF("doc_id", "text", "source")
    val got = TextOps.sourceTemplates(df, "text", "source", 8)
      .select("source", "template_phrase", "n_template", "template_share")
      .as[(String, String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("s1") ==
      (("alpha header one two three four five six", 2L, 0.666667)))
    // 1–1 tie in s2 → lexicographically greatest phrase wins (the
    // max(struct) contract shared with the q241 top-gram rule)
    assert(got("s2")._1.startsWith("zzz") && got("s2")._2 == 1L)
  }

  test("decontaminateSpans excises exactly the eval-covered positions") {
    val leak = (1 to 8).map(i => s"e$i").mkString(" ")
    val corpus = Seq(
      (1L, s"u1 u2 $leak u3 u4"),
      (2L, "totally clean document with no overlap at all in it"),
      (3L, leak)).toDF("doc_id", "text")
    val eval = Seq((100L, s"$leak other eval words")).toDF("doc_id", "text")
    val got = Corpus.decontaminateSpans(corpus, eval, "text", "doc_id", 8)
      .select("doc_id", "clean_text", "n_removed")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1L, "u1 u2 u3 u4", 8L)), got(0).toString)
    assert(got(1)._3 == 0L &&
      got(1)._2 == "totally clean document with no overlap at all in it")
    // the fully-contaminated doc survives as an empty row, not a drop
    assert(got(2) == ((3L, "", 8L)))
    // the invariant the op exists for: NO eval n-gram survives anywhere
    val cleaned = got.map(r => (r._1, r._2)).toSeq.toDF("doc_id", "text")
    assert(Corpus.contamination(cleaned.where(col("text") =!= ""), eval,
        "text", "doc_id", 8)
      .agg(sum("n_contaminated")).as[Long].head() == 0L)
  }

  test("sourceDrift: exactly 0 for an unchanged source, positive under drift") {
    val oldDf = Seq(
      (1L, "stable words one two three four five", "keep"),
      (2L, "stable words one two three four five", "keep"),
      (3L, "old vocabulary alpha beta gamma delta", "moved")).toDF("doc_id", "text", "source")
    val newDf = Seq(
      (4L, "stable words one two three four five", "keep"),
      (5L, "stable words one two three four five", "keep"),
      (6L, "new vocabulary zeta eta theta iota kappa", "moved")).toDF("doc_id", "text", "source")
    val got = Corpus.sourceDrift(oldDf, newDf, "text", "source", 64)
      .select("source", "kl_nats").as[(String, Double)].collect().toMap
    assert(got("keep") == 0.0, got.toString)
    // Laplace smoothing over 64 buckets dampens tiny-fixture KL; the
    // point is a clear nonzero gap, not the magnitude
    assert(got("moved") > 0.05, got.toString)
  }

  test("retrievalQuality is exactly 1.0 on separated clusters") {
    val rows = (0 until 6).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i, 0f), 0)) ++
      (6 until 12).map(i => (i.toLong, Array(0.001f * i, 1.0f, 0f), 1))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.retrievalQuality(emb,
        emb.where(col("vec_id").isin(0L, 7L)), "vec_id", "embedding",
        "label", Seq(1, 3, 5))
      .select("k", "n_retrieved", "n_relevant", "precision_at_k")
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1, 3, 5))
    got.foreach { case (k, nr, rel, p) =>
      assert(nr == 2L * k && rel == nr && p == 1.0, got.mkString(","))
    }
  }

  test("incrementalComponents == full recompute, including cross-component merges") {
    val oldEdges = Seq((1L, 2L), (2L, 20L), (3L, 4L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val assign = Dedup.connectedComponents(oldEdges, "doc_a", "doc_b")
    // delta MERGES {1,2,20} with {3,4}, extends {7,8}, adds a new pair
    val delta = Seq((20L, 3L), (8L, 9L), (11L, 12L)).toDF("doc_a", "doc_b")
    val inc = Dedup.incrementalComponents(assign, delta, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val full = Dedup.connectedComponents(
        oldEdges.unionByName(delta), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc.contains((4L, 1L)) && inc.contains((9L, 7L)) &&
      inc.contains((12L, 11L)), inc.toString)
  }

  test("contaminationMatrix is dense: proved-clean zeros per (doc, suite)") {
    val leakA = (1 to 8).map(i => s"a$i").mkString(" ")
    val leakB = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"prefix words $leakA suffix words"),
      (2L, "spotless document nothing shared with any benchmark suite at all"))
      .toDF("doc_id", "text")
    val eval = Seq((100L, leakA, "suiteA"), (101L, leakB, "suiteB"))
      .toDF("doc_id", "text", "suite")
    val got = Corpus.contaminationMatrix(corpus, eval, "text", "doc_id", "suite", 8)
      .select("doc_id", "suite", "n_contaminated")
      .as[(Long, String, Long)].collect().toSet
    assert(got.map(r => (r._1, r._2)) ==
      Set((1L, "suiteA"), (1L, "suiteB"), (2L, "suiteA"), (2L, "suiteB")))
    assert(got.contains((1L, "suiteA", 1L)) && got.contains((1L, "suiteB", 0L)))
    assert(got.filter(_._1 == 2L).forall(_._3 == 0L))
  }

  test("streamingStitchPairs matches across micro-batches (symmetric state)") {
    val p8 = (1 to 8).map(i => s"q$i").mkString(" ")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)](spark)
    val out = s"stitch_${System.nanoTime()}"
    val q = graft.streaming.Streaming.streamingStitchPairs(
        in.toDF.toDF("doc_id", "text"), "text", "doc_id", 8)
      .writeStream.outputMode("append").format("memory").queryName(out).start()
    // the TAIL side arrives first; the matching HEAD a batch later —
    // then the reverse orientation in a third batch
    in.addData((1L, s"some page body ending with $p8")); q.processAllAvailable()
    in.addData((2L, s"$p8 continuation of the same page")); q.processAllAvailable()
    in.addData((3L, s"another ending with $p8")); q.processAllAvailable()
    q.stop()
    val got = spark.table(out).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    spark.catalog.dropTempView(out)
    assert(got == Set((1L, 2L), (3L, 2L)), got.toString)
  }
}
