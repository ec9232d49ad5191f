package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MlAggregators
import graft.ops.RequestPath
import graft.sources.CatalogUdtfs

/** ML UDAs + request-path clustering beyond what the oracle queries pin:
  * k-means with more points than k (real Lloyd's work), merge-order
  * independence, pprof count accumulation, template edge shapes.
  */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("kmeans converges on separated clusters with n >> k") {
    // Two tight 1-d clusters around 0..4 and 1000..1004; k=2 must land
    // one centroid at each cluster mean regardless of partitioning.
    val pts = ((0 until 5) ++ (1000 until 1005)).map(v => Seq(v.toDouble))
    val df = pts.toDF("p").repartition(7)
    val out = df.agg(MlAggregators.kmeans(col("p"), 2)).as[String].head()
    assert(out == "[[2.0],[1002.0]]")
  }

  test("kmeans caps at k = distinct points and is partition-independent") {
    val pts = Seq.fill(50)(Seq(1.0, 2.0)) ++ Seq.fill(50)(Seq(5.0, 6.0))
    val a = pts.toDF("p").repartition(1)
      .agg(MlAggregators.kmeans(col("p"), 4)).as[String].head()
    val b = pts.toDF("p").repartition(13)
      .agg(MlAggregators.kmeans(col("p"), 4)).as[String].head()
    assert(a == b)
    assert(a == "[[1.0,2.0],[5.0,6.0]]")
  }

  test("pprof sums counts per stack into a sorted profile") {
    val rows = Seq(("a;b", 3L), ("a;c", 1L), ("a;b", 4L), ("a;a", 2L))
    val out = rows.toDF("stack", "cnt").repartition(3)
      .agg(MlAggregators.pprof(col("stack"), col("cnt"))).as[String].head()
    assert(out == """{"a;a":2,"a;b":7,"a;c":1}""")
  }

  test("request path templates wildcard only high-cardinality segments") {
    val paths = (1 to 30).map(i => s"/api/u/$i/profile") ++
      Seq("/api/u/1/settings", "/static/app.js")
    val df = paths.toDF("path")
    val ts = RequestPath.templates(df, col("path"), 10)
      .as[(String, String)].collect().toMap
    assert(ts("/api/u/5/profile") == "/api/u/*/profile")
    // card-2 final segment (profile/settings) stays literal
    assert(ts("/api/u/1/settings") == "/api/u/*/settings")
    assert(ts("/static/app.js") == "/static/app.js")
  }

  test("request path clusters counts distinct paths per template") {
    val paths = (1 to 20).map(i => s"/v/$i") ++ Seq("/health", "/health")
    val cs = RequestPath.clusters(paths.toDF("path"), col("path"), 5)
      .as[(String, Long)].collect().toMap
    assert(cs("/v/*") == 20L)
    assert(cs("/health") == 1L)
  }

  test("catalog UDTFs expose the fixture relations") {
    val dir = "/root/testdata/sf0.001"
    val tables = CatalogUdtfs.getTables(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(tables("lineitem") == 11L)
    assert(tables.keySet == CatalogUdtfs.tableNames.toSet)
    val schemas = CatalogUdtfs.getSchemas(spark, dir, Seq("events"))
      .as[(String, String, Long, String)].collect()
    assert(schemas.find(_._2 == "ts").get._4 == "BIGINT")
    assert(CatalogUdtfs.getUdfList(spark).count() ==
      CatalogUdtfs.udfNames.size)
  }

  test("request-path clustering: member vs centroid by min-cardinality") {
    import graft.ops.RequestPathClustering._
    // Below min_cardinality (5): clusters act as singletons — Predict
    // returns the member path itself (request_path_ops.h:108-120).
    val small = fitModel(Seq("/api/u/1", "/api/u/2", "/api/u/3",
      "/healthz"))
    assert(predict(small, "/api/u/2") == "/api/u/2")
    assert(predict(small, "/healthz") == "/healthz")
    // Above: members cleared (.cc:163), Predict returns the centroid.
    val big = fitModel((1 to 6).map(i => s"/api/u/$i"))
    assert(predict(big, "/api/u/3") == "/api/u/*")
    // Dissimilar same-depth paths stay separate clusters (sim < 0.5).
    val sep = fitModel(Seq("/healthz", "/readyz"))
    assert(predict(sep, "/healthz") == "/healthz")
    // _match_endpoint: same depth, '*' wildcards one component.
    assert(matches("/api/u/7", "/api/u/*"))
    assert(!matches("/api/u/7/x", "/api/u/*"))
    assert(!matches("/api/v/7", "/api/u/*"))
  }
}
