package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 hardening properties: bucket-cap non-vacuity + identity,
  * scoped reliable-checkpoint dispatch, distinct-state audit on a
  * healthy state, and compaction invariants on a controlled state.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/x"

  test("bucket cap: plant exceeds cap, probe disclosed, identity at large cap") {
    val root = tmp("graft_r11_cap_")
    try {
      val docs = graft.core.Tables(spark, sf, "documents")
        .select("doc_id", "text")
      val prefix = (1 to 45).map("p" + _).mkString(" ")
      val plantC = spark.range(1, 31)
        .select((col("id") + 9300000L).as("doc_id"),
          concat(lit(prefix + " w"), col("id").cast("string")).as("text"))
      val corpus = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0)
        .unionByName(plantC)
      val batch = docs.where(pmod(col("doc_id"), lit(5L)) === 0)
        .unionByName(spark.range(1).select(lit(9300100L).as("doc_id"),
          lit(prefix + " probe").as("text")))
      graft.ops.Dedup.writeDedupIndex(corpus, "text", "doc_id", root)
      // the plant really produces an over-cap bucket (non-vacuity)
      val maxBucket = spark.read.parquet(s"$root/bands.parquet")
        .groupBy("band", "band_hash").count()
        .agg(max("count")).head().getLong(0)
      assert(maxBucket > 8, s"plant too weak: max bucket $maxBucket")
      val capped = graft.ops.Dedup.incrementalDedupCapped(root, corpus,
        batch, "text", "doc_id", bucketCap = 8).cache()
      // the probe is disclosed AND still correctly verdicted (the
      // kept low-id members verify J = 43/49 >= 0.8)
      val probe = capped.where(col("doc_id") === 9300100L).head()
      assert(probe.getString(1) == "near_dup_corpus")
      assert(probe.getBoolean(2), "probe must carry the disclosure flag")
      // identity: a cap no bucket reaches reproduces the uncapped op
      val wide = graft.ops.Dedup.incrementalDedupCapped(root, corpus,
        batch, "text", "doc_id", bucketCap = maxBucket.toInt + 1)
      val uncapped = graft.ops.Dedup.incrementalDedupIndexed(root, corpus,
        batch, "text", "doc_id")
      assert(wide.select("doc_id", "decision").collect().toSet ==
        uncapped.collect().toSet)
      assert(wide.where(col("hit_capped_bucket")).count() == 0)
    } finally graft.queries.Curation2.deleteDir(
      new java.io.File(root).getParent)
  }

  test("Ckpt.withReliable scopes dispatch without process-global writes") {
    assert(!graft.core.Ckpt.reliable)
    val before = sys.props.get("graft.reliableCkpt")
    graft.core.Ckpt.withReliable() {
      assert(graft.core.Ckpt.reliable)
      // nothing process-global changed while scoped
      assert(sys.props.get("graft.reliableCkpt") == before)
      graft.core.Ckpt.withReliable(on = false) {
        assert(!graft.core.Ckpt.reliable) // innermost scope wins
      }
      assert(graft.core.Ckpt.reliable)
    }
    assert(!graft.core.Ckpt.reliable)
  }

  test("verifyDistinctState: healthy state audits clean, torn state doesn't") {
    val p = tmp("graft_r11_audit_")
    try {
      val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L), ("a", 1L))
        .toDF("g", "k")
      graft.ops.Scale.writeDistinctState(df, "g", "k", 4, p)
      val healthy = graft.ops.Scale.verifyDistinctState(spark, p, "g")
      assert(healthy.where(!col("ok")).count() == 0)
      // torn: keys appended, summary untouched
      val delta = Seq(("a", 99L), ("b", 100L)).toDF("g", "k")
      graft.ops.Scale.appendDistinctKeys(spark, p, delta, "g", "k", 4)
      assert(graft.ops.Scale.verifyDistinctState(spark, p, "g")
        .where(!col("ok")).count() > 0)
      // retry heals; cardinalities correct
      graft.ops.Scale.appendDistinctState(spark, p, delta, "g", "k", 4)
      assert(graft.ops.Scale.verifyDistinctState(spark, p, "g")
        .where(!col("ok")).count() == 0)
      val cards = graft.ops.Scale.distinctStateCard(spark, p, "g")
        .as[(String, Long)].collect().toMap
      assert(cards == Map("a" -> 3L, "b" -> 3L))
    } finally graft.queries.Curation2.deleteDir(
      new java.io.File(p).getParent)
  }

  test("manifest fold-down: xor self-inverse agrees with recompute on foldable columns") {
    // A ∪ B built by fold-up; folding B back in with negated masses
    // must reproduce A's n_docs/n_tokens/checksum EXACTLY (xor is its
    // own inverse) — while min_id/max_id legitimately don't invert,
    // which is why retractDay recomputes touched shards instead.
    def man(rows: Seq[(Long, String)]) =
      graft.core.Layout.shardManifest(
        rows.toDF("doc_id", "text")
          .withColumn("shard", pmod(col("doc_id"), lit(2L)).cast("int"))
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long")),
        "shard", "doc_id", "n_tok", "text")
    val a = Seq((1L, "x y"), (2L, "y z w"), (4L, "k"))
    val b = Seq((3L, "p q"), (6L, "r"))
    val mAB = graft.ops.CurationDay.foldManifest(man(a), man(b))
    val foldDown = graft.ops.CurationDay.foldManifest(mAB,
      man(b).withColumn("n_docs", -col("n_docs"))
        .withColumn("n_tokens", -col("n_tokens")))
    val got = foldDown.select("shard", "n_docs", "n_tokens", "checksum")
      .as[(Int, Long, Long, Long)].collect().toSet
    val want = man(a).select("shard", "n_docs", "n_tokens", "checksum")
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("compaction invariants: counts identical, files shrink") {
    val pd = tmp("graft_r11_cd_")
    val pc = tmp("graft_r11_cc_")
    try {
      val base = Seq(("a", 1L), ("b", 2L)).toDF("g", "k")
      graft.ops.Scale.writeDistinctState(base, "g", "k", 2, pd)
      (3L to 6L).foreach { i =>
        graft.ops.Scale.appendDistinctState(spark, pd,
          Seq(("a", i)).toDF("g", "k"), "g", "k", 2)
      }
      val cardBefore = graft.ops.Scale.distinctStateCard(spark, pd, "g")
        .as[(String, Long)].collect().toSet
      val filesBefore = graft.ops.Scale.parquetFileCount(spark, s"$pd/keys")
      graft.ops.Scale.compactDistinctState(spark, pd)
      assert(graft.ops.Scale.parquetFileCount(spark, s"$pd/keys") < filesBefore)
      assert(graft.ops.Scale.distinctStateCard(spark, pd, "g")
        .as[(String, Long)].collect().toSet == cardBefore)
      assert(graft.ops.Scale.verifyDistinctState(spark, pd, "g")
        .where(!col("ok")).count() == 0)

      val vals = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
      graft.ops.Scale.writeCentHist(vals, "g", col("v"), pc)
      graft.ops.Scale.appendCentHist(
        Seq(("a", 1.0), ("b", 9.0)).toDF("g", "v"), "g", col("v"), pc)
      val q = graft.ops.Scale.histQuantiles(spark.read.parquet(pc), "g",
        Seq("p50" -> 500000L)).collect().map(_.toString).toSet
      graft.ops.Scale.compactCentHist(spark, pc)
      assert(graft.ops.Scale.parquetFileCount(spark, pc) == 1)
      // duplicate (g, cent) rows merged; quantiles unchanged
      assert(graft.ops.Scale.histQuantiles(spark.read.parquet(pc), "g",
        Seq("p50" -> 500000L)).collect().map(_.toString).toSet == q)
      val aRows = spark.read.parquet(pc)
        .where(col("g") === "a" && col("__cent") === 100L).collect()
      assert(aRows.length == 1 && aRows.head.getAs[Long]("__n") == 2L)
    } finally {
      graft.queries.Curation2.deleteDir(new java.io.File(pd).getParent)
      graft.queries.Curation2.deleteDir(new java.io.File(pc).getParent)
    }
  }
}
