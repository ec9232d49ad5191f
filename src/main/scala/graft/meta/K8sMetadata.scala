package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's k8s metadata layer (SURVEY §2.5 metadata_ops — 95
  * UDFs like upid_to_pod_name/upid_to_service_name) re-expressed the
  * Spark-native way: entities are slowly-changing dimension tables with
  * [start_ns, stop_ns) validity intervals, and every `upid_to_*`/`ctx`
  * resolution is a broadcast as-of join against the snapshot — instead of
  * agent-local in-memory state lookups (src/shared/metadata/).
  *
  * At 100 TB the fact side streams through executors while the dimension
  * snapshot (k8s object counts are small: 10^4-10^6 rows) broadcasts —
  * no shuffle of the fact table.
  */
object K8sMetadata {

  /** Point-in-time (as-of) resolution: attach dimension attributes valid
    * at the fact row's timestamp — `lookup(key, ts)` = the dimension row
    * where start_ns <= ts < stop_ns (FIXTURES.md §B contract).
    */
  def resolveAsOf(facts: DataFrame, dim: DataFrame, factKey: String,
                  dimKey: String, tsCol: String,
                  attrs: Seq[String]): DataFrame = {
    val d = broadcast(dim.select((Seq(dimKey, "start_ns", "stop_ns") ++ attrs)
      .map(col): _*))
    facts.join(d,
      facts(factKey) === d(dimKey) &&
        facts(tsCol) >= d("start_ns") && facts(tsCol) < d("stop_ns"),
      "left")
      .drop(dimKey, "start_ns", "stop_ns")
  }

  /** ctx['pod'] / ctx['service'] sugar (dataframe.h:422 + the
    * ConvertMetadataRule expansion): resolve a metadata property through
    * the right dimension at query-build time.
    */
  def ctx(facts: DataFrame, dims: Map[String, DataFrame], property: String,
          factKey: String, tsCol: String): DataFrame = property match {
    case "pod" =>
      resolveAsOf(facts, dims("pods"), factKey, "owner_id", tsCol, Seq("pod_name"))
    case "service" =>
      resolveAsOf(facts, dims("services"), factKey, "owner_id", tsCol, Seq("service_name"))
    case other => throw new IllegalArgumentException(s"unknown ctx property: $other")
  }

  /** Generic entity-attribute lookup: the Spark shape of the reference's
    * 95 `X_id_to_Y` metadata UDFs (funcs/metadata/metadata_ops.cc —
    * pod_id_to_pod_name, pod_name_to_service_id, service_id_to_service_name,
    * replica_set_id_to_deployment_name, ip_to_pod_id, ...). Each family
    * member is this one broadcast join with a different (dimKey, attr)
    * binding; the dimension is small, the fact table never shuffles.
    */
  def lookupAttr(facts: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, attrs: Seq[String]): DataFrame = {
    // Unique key alias: fact and dim often share lineage (dims derived
    // from the fact table), and a same-expression-ID join + drop would
    // resolve against the wrong side.
    val k = s"__dim_$dimKey"
    val d = broadcast(dim.select((dimKey +: attrs).map(col): _*)
      .dropDuplicates(dimKey).withColumnRenamed(dimKey, k))
    facts.join(d, facts(factKey) === col(k), "left").drop(k)
  }

  /** has_service_name (metadata_ops.cc): key resolves to a service. */
  def hasServiceName(facts: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String): DataFrame = {
    val out = lookupAttr(facts, dim.withColumnRenamed("service_name", "_svc"),
      factKey, dimKey, Seq("_svc"))
    out.withColumn("has_service", col("_svc").isNotNull).drop("_svc")
  }

  /** Full synthetic entity model over the user_id space: pod, service,
    * replica set, deployment, namespace and pod IP, with deterministic
    * id/name forms — the dimension every `X_to_Y` lookup resolves against.
    * One row per (owner_id, generation); ids embed the generation like the
    * reference's UID-per-incarnation semantics.
    */
  def syntheticEntityDim(events: DataFrame, splitNs: Long): DataFrame = {
    syntheticPodDim(events, splitNs)
      .withColumn("gen", when(col("start_ns") === 0L, lit(0)).otherwise(lit(1)))
      .withColumn("namespace", concat(lit("ns"), pmod(col("owner_id"), lit(3))))
      .withColumn("pod_id",
        concat(col("namespace"), lit("/pod-"), col("owner_id"), lit("-g"), col("gen")))
      .withColumn("service_id", concat(lit("svcid-"), pmod(col("owner_id"), lit(10))))
      .withColumn("replica_set",
        concat(lit("rs-"), pmod(col("owner_id"), lit(10)), lit("-g"), col("gen")))
      .withColumn("deployment", concat(lit("deploy-"), pmod(col("owner_id"), lit(10))))
      .withColumn("pod_ip",
        concat(lit("10.1."), pmod(col("owner_id"), lit(250)), lit("."),
          lit(10) + col("gen")))
  }

  /** get_cidrs (metadata_ops.cc): the cluster's pod/service CIDR set. */
  def getCidrs: Seq[String] = Seq("10.1.0.0/16", "10.2.0.0/16")

  /** Deterministic synthetic pod dimension derived from the events table's
    * user_id space — two validity generations split mid-month, so as-of
    * correctness is actually exercised (same key resolves differently
    * before/after the split).
    */
  def syntheticPodDim(events: DataFrame, splitNs: Long): DataFrame = {
    val ids = events.select(col("user_id").as("owner_id")).distinct()
    val gen0 = ids.select(col("owner_id"),
      concat(lit("pod-"), col("owner_id"), lit("-gen0")).as("pod_name"),
      lit(0L).as("start_ns"), lit(splitNs).as("stop_ns"))
    val gen1 = ids.select(col("owner_id"),
      concat(lit("pod-"), col("owner_id"), lit("-gen1")).as("pod_name"),
      lit(splitNs).as("start_ns"), lit(Long.MaxValue).as("stop_ns"))
    gen0.unionByName(gen1)
      .withColumn("service_name",
        concat(lit("svc-"), pmod(col("owner_id"), lit(10))))
  }
}
