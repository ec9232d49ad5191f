package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.K8sMetadata
import graft.pxl.PxlRunner
import graft.pxl.PxlRunner.PxlEnv
import Q._

/** PxL front-end gate: real PxL script text parsed and executed against
  * the engine (SURVEY §2.3 — the reference's parser/ast_visitor path).
  * q65 runs the verbatim reference script
  * src/pxl_scripts/px/http_request_stats/stats.pxl; q66 runs an authored
  * script of the same canonical shape over the whole table so the
  * front-end is value-checked at full row count.
  */
object Pxl {

  private val SplitTs = "2024-01-15"
  private def splitNs = graft.functions.PixieFunctions.tsNsLit(SplitTs)

  /** The reference's http_events shape synthesized from the events
    * fixture: time_ (ns), upid stand-in (user_id), resp_status, latency.
    */
  def httpEvents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("ts").as("time_"),
      col("user_id"),
      (lit(100) + pmod(col("event_id"), lit(460))).as("resp_status"),
      col("value").as("latency"))

  /** Script-execution environment over the fixture catalog. ctx
    * properties resolve through the point-in-time pod dimension
    * (ConvertMetadataRule's expansion, as a broadcast as-of join).
    */
  def env(s: SparkSession, dir: String, nowNs: Long): PxlEnv = PxlEnv(
    nowNs,
    tables = {
      case "http_events" => httpEvents(s, dir)
      case other => graft.core.Tables(s, dir, other)
    },
    ctx = (df, prop, out) => {
      val dim = K8sMetadata.syntheticPodDim(df, splitNs)
      val attr = prop match {
        case "service" => "service_name"
        case "pod" => "pod_name"
        case other => throw new IllegalArgumentException(s"ctx['$other']")
      }
      K8sMetadata.resolveAsOf(df, dim, "user_id", "owner_id", "time_", Seq(attr))
        .withColumnRenamed(attr, out)
    })

  val StatsPxlPath =
    "/root/reference/src/pxl_scripts/px/http_request_stats/stats.pxl"

  /** Deterministic "now" for relative start_time strings: the fixture's
    * max event time ceiled to the next µs. Scans bound time_ < now
    * strictly, so this includes the max event, and a µs-multiple bound
    * compares identically against the oracle's µs-truncated view of the
    * ns column.
    */
  private def nowNs(s: SparkSession, dir: String): Long = {
    val mx = t(s, dir, "events").agg(max(col("ts"))).head().getLong(0)
    mx / 1000 * 1000 + 1000
  }

  /** Authored PxL (same canonical shape as service_stats scripts) — runs
    * over the full fixture range so every operator path carries weight.
    */
  val ServiceStatsScript: String =
    """import px
      |
      |df = px.DataFrame(table='http_events', start_time='-45d')
      |df.service = df.ctx['service']
      |df.failure = df.resp_status >= 400
      |df.range_group = px.bin(df.time_, px.hours(1))
      |
      |per_win = df.groupby(['service', 'range_group']).agg(
      |    n=('resp_status', px.count),
      |)
      |per_svc = per_win.groupby('service').agg(
      |    windows=('n', px.count),
      |    avg_per_window=('n', px.mean),
      |)
      |err = df.groupby('service').agg(
      |    err_rate=('failure', px.mean),
      |    total=('resp_status', px.count),
      |    max_latency=('latency', px.max),
      |)
      |joined = per_svc.merge(err, how='inner', left_on=['service'],
      |                       right_on=['service'], suffixes=['', '_x'])
      |joined['req_per_hour'] = joined.total / joined.windows
      |joined = joined[joined.total > 0]
      |out = joined[['service', 'windows', 'avg_per_window', 'err_rate',
      |              'total', 'max_latency', 'req_per_hour']]
      |px.display(out, 'svc')
      |""".stripMargin

  val queries: Map[String, QFn] = Map(
    // The verbatim reference script, end-to-end through parser+runner.
    // now = max event time, so its '-30s' window covers the data tail.
    "q65_pxl_http_stats" -> ((s, dir) => {
      val script = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(StatsPxlPath)), "UTF-8")
      PxlRunner.run(script, env(s, dir, nowNs(s, dir)))("output")
        .orderBy("service")
    }),

    "q66_pxl_service_stats" -> ((s, dir) => {
      val now = graft.functions.PixieFunctions.tsNsLit("2024-02-01")
      PxlRunner.run(ServiceStatsScript, env(s, dir, now))("svc")
        .orderBy("service")
    })
  )

  val oracles: Map[String, String] = Map(
    "q65_pxl_http_stats" ->
      """WITH mx AS (SELECT max(epoch_us(ts)) * 1000 + 1000 AS now_ns FROM events),
        |e AS (SELECT epoch_us(ts) * 1000 AS t, user_id,
        |        100 + event_id % 460 AS resp_status, value AS latency
        |      FROM events, mx WHERE epoch_us(ts) * 1000 >= mx.now_ns - 30000000000
        |        AND epoch_us(ts) * 1000 < mx.now_ns),
        |w AS (SELECT *, 'svc-' || (user_id % 10) AS service,
        |        CASE WHEN resp_status >= 400 THEN 1 ELSE 0 END AS failure,
        |        t - t % 5000000000 AS range_group FROM e),
        |qa AS (SELECT service,
        |        CAST(floor(quantile_cont(latency, 0.50)) AS BIGINT) AS p50,
        |        CAST(floor(quantile_cont(latency, 0.90)) AS BIGINT) AS p90,
        |        CAST(floor(quantile_cont(latency, 0.99)) AS BIGINT) AS p99,
        |        avg(CAST(failure AS DOUBLE)) AS errors,
        |        count(resp_status) AS throughput_total
        |      FROM w GROUP BY service),
        |ra AS (SELECT service, range_group, count(resp_status) AS rpw
        |       FROM w GROUP BY 1, 2),
        |rps AS (SELECT service, avg(CAST(rpw AS DOUBLE)) AS request_throughput
        |        FROM ra GROUP BY 1)
        |SELECT qa.service,
        |  p50 AS "latency(p50)", p90 AS "latency(p90)", p99 AS "latency(p99)",
        |  errors,
        |  request_throughput / 5000000000 AS throughput,
        |  throughput_total AS "throughput total"
        |FROM qa JOIN rps ON qa.service = rps.service
        |WHERE qa.service <> ''
        |ORDER BY qa.service""".stripMargin,

    "q66_pxl_service_stats" -> {
      val start = graft.functions.PixieFunctions.tsNsLit("2024-02-01") -
        45L * 86400L * 1000000000L
      s"""WITH e AS (SELECT epoch_us(ts) * 1000 AS t, user_id,
         |        100 + event_id % 460 AS resp_status, value AS latency
         |      FROM events WHERE epoch_us(ts) * 1000 >= $start),
         |w AS (SELECT *, 'svc-' || (user_id % 10) AS service,
         |        CASE WHEN resp_status >= 400 THEN 1 ELSE 0 END AS failure,
         |        t - t % 3600000000000 AS range_group FROM e),
         |pw AS (SELECT service, range_group, count(resp_status) AS n
         |       FROM w GROUP BY 1, 2),
         |ps AS (SELECT service, count(n) AS windows,
         |         avg(CAST(n AS DOUBLE)) AS avg_per_window FROM pw GROUP BY 1),
         |er AS (SELECT service, avg(CAST(failure AS DOUBLE)) AS err_rate,
         |         count(resp_status) AS total, max(latency) AS max_latency
         |       FROM w GROUP BY 1)
         |SELECT ps.service, windows, avg_per_window, err_rate, total,
         |  max_latency, CAST(total AS DOUBLE) / windows AS req_per_hour
         |FROM ps JOIN er ON ps.service = er.service
         |WHERE total > 0 ORDER BY ps.service""".stripMargin
    }
  )
}
