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
    assert(scan.contains("PartitionFilters") && scan.contains("dt"),
      scan.take(800))
    assert(janOnly.count() ==
      ev.filter(timeBinNs(col("ts"), 86400) === tsNsLit("2024-01-03") / 1000000000L)
        .count())
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
