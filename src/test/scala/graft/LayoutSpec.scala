package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Layout
import graft.functions.PixieFunctions._

/** Scale-layout proofs: partition pruning on time-partitioned data and
  * exchange-free joins on bucketed tables — asserted in the plans, not
  * assumed.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private lazy val tmp = java.nio.file.Files.createTempDirectory("layout").toString

  test("time-partitioned layout prunes partitions for a time-range scan") {
    val ev = graft.core.Tables(spark, sf, "events")
    Layout.writeTimePartitioned(ev, "ts", s"$tmp/events_bydate")
    val back = Layout.readTimePartitioned(spark, s"$tmp/events_bydate")
    val janOnly = back.filter(col("dt") === "2024-01-03")
    val scan = janOnly.queryExecution.executedPlan.collectLeaves().mkString
    // NON-EMPTY filter list on dt — `contains("PartitionFilters")` is
    // vacuous (every parquet scan prints the header; the column name
    // can match in the schema)
    assert("PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(scan).isDefined,
      scan.take(800))
    // …and the pin is NOT vacuous: the same regex must fail on an
    // UNPRUNED scan of the same table (empty PartitionFilters list)
    val unpruned = back.queryExecution.executedPlan.collectLeaves().mkString
    assert("PartitionFilters: \\[[^\\]]*dt".r.findFirstIn(unpruned).isEmpty,
      unpruned.take(800))
    assert(janOnly.count() ==
      ev.filter(timeBinNs(col("ts"), 86400) === tsNsLit("2024-01-03") / 1000000000L)
        .count())
  }

  test("cell-partitioned ANN index prunes partitions for a probe query") {
    val emb = graft.core.Tables(spark, sf, "embeddings")
    def parse(s0: String) = s0.stripPrefix("[[").stripSuffix("]]")
      .split("\\],\\[").map(_.split(",").map(_.toDouble).toSeq).toSeq
    val cells = parse(emb.agg(graft.functions.MlAggregators.kmeansFit(
        col("embedding").cast("array<double>"), 8, iters = 0).as("m"))
      .head().getString(0))
    val index = graft.ops.Similarity.l2Residuals(emb, "vec_id", "embedding", cells)
    Layout.writeCellPartitioned(index, s"$tmp/ivf_index")
    val back = Layout.readCellPartitioned(spark, s"$tmp/ivf_index")
    // a 2-probe query touches 2/8 of the index: partition pruning, not a scan
    val probed = back.filter(col("cell").isin(1, 3))
    val scan = probed.queryExecution.executedPlan.collectLeaves().mkString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(scan).isDefined,
      scan.take(800))
    assert(probed.count() ==
      index.filter(col("cell").isin(1, 3)).count() && probed.count() > 0)
  }

  test("shard-partitioned corpus layout prunes to one shard per read") {
    val docs = graft.core.Tables(spark, sf, "documents")
    val sharded = graft.ops.Corpus.shardAssign(docs, "doc_id", nShards = 8)
      .join(docs, "doc_id")
    Layout.writeShardPartitioned(sharded, s"$tmp/corpus_shards")
    val one = Layout.readShard(spark, s"$tmp/corpus_shards", 3)
    val scan = one.queryExecution.executedPlan.collectLeaves().mkString
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(scan).isDefined,
      scan.take(800))
    assert(one.count() ==
      sharded.filter(col("shard") === 3).count() && one.count() > 0)
  }

  test("bucketed tables join with no exchange") {
    val li = graft.core.Tables(spark, sf, "lineitem")
    val or = graft.core.Tables(spark, sf, "orders")
    Layout.writeBucketed(li, "li_b", s"$tmp/li_b", "l_orderkey", 8)
    Layout.writeBucketed(
      or.withColumnRenamed("o_orderkey", "l_orderkey"), "or_b",
      s"$tmp/or_b", "l_orderkey", 8)
    // Force sort-merge (no auto-broadcast) so the assertion proves the
    // bucketing removed the shuffle, not that the table was small.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("or_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
