package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.PixieFunctions._
import graft.meta.K8sMetadata
import graft.types.Upid
import Q._

/** UPID/UINT128 semantics + the k8s metadata (`ctx`) resolution layer
  * (SURVEY §2.5 metadata_ops, §2.9).
  */
object Meta {

  private val SplitTs = "2024-01-15"

  val queries: Map[String, QFn] = Map(
    // UINT128/UPID: construct binary(16), round-trip every helper, and
    // produce the canonical string form. start_ts uses µs (DuckDB's ns
    // view of the nanos column is µs-truncated).
    "q37_upid" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("upid",
          Upid.makeUpid(col("user_id"), col("event_id"), nsToUs(col("ts"))))
      ev.select(
        col("event_id"),
        lower(hex(col("upid"))).as("upid_hex"),
        Upid.upidToAsid(col("upid")).as("asid"),
        Upid.upidToPid(col("upid")).as("pid"),
        Upid.upidToStartTs(col("upid")).as("start_us"),
        Upid.upidToString(col("upid")).as("upid_str")
      ).orderBy("event_id")
    }),

    // ctx metadata resolution: point-in-time broadcast as-of join against
    // a 2-generation dimension — the same key resolves to gen0 before the
    // split and gen1 after (the reference's agent-snapshot semantics).
    "q38_metadata_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = K8sMetadata.syntheticPodDim(ev, tsNsLit(SplitTs))
      K8sMetadata.resolveAsOf(ev, dim, "user_id", "owner_id", "ts",
          Seq("pod_name", "service_name"))
        .select("event_id", "pod_name", "service_name")
        .orderBy("event_id")
    }),

    // Per-service rollup through the metadata join (the http_request_stats
    // by-service shape).
    "q39_service_rollup" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dim = K8sMetadata.syntheticPodDim(ev, tsNsLit(SplitTs))
      K8sMetadata.resolveAsOf(ev, dim, "user_id", "owner_id", "ts",
          Seq("service_name"))
        .groupBy("service_name")
        .agg(count(lit(1)).as("n"), qsum(col("value")).as("sum_value"))
        .orderBy("service_name")
    })
  )

  private val splitNs = graft.functions.PixieFunctions.tsNsLit(SplitTs)
  private val dimSql =
    s"""ids AS (SELECT DISTINCT user_id FROM events),
       |dim AS (
       |  SELECT user_id AS owner_id, 'pod-' || user_id || '-gen0' AS pod_name,
       |         0 AS start_ns, $splitNs AS stop_ns FROM ids
       |  UNION ALL
       |  SELECT user_id, 'pod-' || user_id || '-gen1',
       |         $splitNs, 9223372036854775807 FROM ids)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q37_upid" ->
      """SELECT event_id,
        |  printf('%08x%08x%016x', user_id, event_id, epoch_us(ts)) AS upid_hex,
        |  user_id AS asid, event_id AS pid, epoch_us(ts) AS start_us,
        |  user_id || ':' || event_id || ':' || epoch_us(ts) AS upid_str
        |FROM events ORDER BY event_id""".stripMargin,
    "q38_metadata_asof" ->
      s"""WITH $dimSql
         |SELECT e.event_id, d.pod_name,
         |  'svc-' || (e.user_id % 10) AS service_name
         |FROM events e LEFT JOIN dim d ON e.user_id = d.owner_id
         |  AND epoch_ns(e.ts) >= d.start_ns AND epoch_ns(e.ts) < d.stop_ns
         |ORDER BY event_id""".stripMargin,
    "q39_service_rollup" ->
      s"""SELECT 'svc-' || (user_id % 10) AS service_name, count(*) AS n,
         |  ${qsumSql("value")} AS sum_value
         |FROM events GROUP BY 1 ORDER BY service_name""".stripMargin
  )
}
