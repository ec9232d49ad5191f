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
