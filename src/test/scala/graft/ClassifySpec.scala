package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Classify

class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = {
    val sport = Seq("goal match team score league play win cup ball field",
      "team win league cup final score match play season coach",
      "score ball play team goal win match season field referee")
    val tech = Seq("code compile spark query plan shuffle executor driver jvm scala",
      "query plan catalyst codegen shuffle partition executor spark jvm code",
      "compile scala jvm driver plan code query spark partition catalyst")
    val train = (sport.zipWithIndex.map { case (t, i) => (i.toLong, t, "sport") } ++
      tech.zipWithIndex.map { case (t, i) => (100L + i, t, "tech") })
      .toDF("doc_id", "text", "lang")
    val test = Seq(
      (900L, "the team can win the cup if they score in the match"),
      (901L, "the spark query plan avoids a shuffle via codegen"))
      .toDF("doc_id", "text")
    (train, test)
  }

  test("naiveBayes learns separable vocabularies and predicts held-out docs") {
    val (train, test) = fixture
    val got = Classify.naiveBayes(train, test, "text", "lang", "doc_id")
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(got(900L) == "sport" && got(901L) == "tech", got.toString)
  }

  test("scores are partitioning-invariant (micro-nat integer contract)") {
    val (train, test) = fixture
    val a = Classify.naiveBayes(train, test, "text", "lang", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = Classify.naiveBayes(train.repartition(7), test.repartition(5),
        "text", "lang", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("knnClassify takes the majority label among k nearest, ties to smaller label") {
    import graft.ops.Similarity
    // labeled: two tight clusters on orthogonal axes
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f), 7), (2L, Array(0.9f, 0.1f), 7),
      (3L, Array(0.95f, 0.05f), 7),
      (4L, Array(0.0f, 1.0f), 3), (5L, Array(0.1f, 0.9f), 3))
      .toDF("vec_id", "embedding", "label")
    val unlabeled = Seq(
      (10L, Array(0.8f, 0.2f)),   // x-cluster -> 7
      (11L, Array(0.2f, 0.8f)))   // y-cluster -> 3 (2 of top-3 votes)
      .toDF("vec_id", "embedding")
    val got = Similarity.knnClassify(unlabeled, labeled,
        "vec_id", "embedding", "label", k = 3)
      .select("vec_id", "label_pred").as[(Long, Int)].collect().toMap
    assert(got == Map(10L -> 7, 11L -> 3))
  }

  test("nearestCentroid classifies by class-mean cosine and is partitioning-invariant") {
    val labeled = Seq(
      (1L, Array(1.0f, 0.0f), 7), (2L, Array(0.8f, 0.2f), 7),
      (3L, Array(0.0f, 1.0f), 3), (4L, Array(0.2f, 0.8f), 3))
      .toDF("vec_id", "embedding", "label")
    val test = Seq((10L, Array(0.9f, 0.1f)), (11L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val a = Classify.nearestCentroid(labeled, test,
        "vec_id", "embedding", "label")
      .orderBy("vec_id").collect().toSeq
    val b = Classify.nearestCentroid(labeled.repartition(7), test.repartition(3),
        "vec_id", "embedding", "label")
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
    assert(a.map(r => (r.getLong(0), r.getInt(1))) == Seq((10L, 7), (11L, 3)))
  }

  test("scoring joins the model by broadcast; densification is model-sized") {
    val (train, test) = fixture
    val out = Classify.naiveBayes(train, test, "text", "lang", "doc_id")
    val p = out.queryExecution.executedPlan.toString
    // the (class x bucket) grid and the prior table must reach the gram
    // stream as broadcast joins — a sort-merge join against the model
    // would shuffle the corpus-sized side on a model-sized key
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "model join planned as SortMergeJoin:\n" + p.take(3000))
  }
}
