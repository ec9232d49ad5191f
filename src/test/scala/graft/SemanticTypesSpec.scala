package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.SemanticTypes._

class SemanticTypesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tags survive projection and are readable from the schema") {
    val df = Seq((1L, "svc-a")).toDF("ts", "svc")
      .select(tag(col("ts"), "ts", ST_TIME_NS),
        tag(col("svc"), "service", ST_SERVICE_NAME, PT_GENERAL_ENUM))
      .withColumn("extra", lit(1))
      .select("ts", "service")
    assert(semanticTypeOf(df.schema("ts")) == ST_TIME_NS)
    assert(semanticTypeOf(df.schema("service")) == ST_SERVICE_NAME)
    assert(patternTypeOf(df.schema("service")) == PT_GENERAL_ENUM)
  }

  test("autoTag + relationOf produce the Relation view") {
    val ev = graft.core.Tables(spark, "/root/testdata/sf0.001", "events")
    val rel = relationOf(autoTag(ev))
    assert(rel.exists { case (n, dt, st, _) =>
      n == "ts" && dt == "bigint" && st == ST_TIME_NS })
    assert(rel.exists { case (n, _, st, _) => n == "value" && st == ST_NONE })
  }

  test("tags round-trip through parquet") {
    val p = java.nio.file.Files.createTempDirectory("st").toString + "/t.parquet"
    Seq((1L, 200L)).toDF("ts", "status")
      .select(tag(col("ts"), "ts", ST_TIME_NS),
        tag(col("status"), "status", ST_HTTP_RESP_STATUS)).write.parquet(p)
    val back = spark.read.parquet(p)
    assert(semanticTypeOf(back.schema("ts")) == ST_TIME_NS)
    assert(semanticTypeOf(back.schema("status")) == ST_HTTP_RESP_STATUS)
  }
}
