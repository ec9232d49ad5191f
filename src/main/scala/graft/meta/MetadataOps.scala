package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The COMPLETE metadata_ops registry (reference:
  * src/carnot/funcs/metadata/metadata_ops.cc — 100 `registry->Register`
  * calls over 96 distinct names). Re-expressed Spark-first: every
  * `X_id_to_Y` / `X_name_to_Y` function is one (key column, attribute
  * column) binding over a single slowly-changing entity dimension, and a
  * call is a broadcast hash join against that dimension — the fact table
  * never shuffles. The remaining names are UPID scalars
  * ([[graft.types.Upid]]), `has_*` predicates, and cluster constants.
  *
  * The synthetic dimension is built so that every binding's attribute is
  * FUNCTIONALLY DEPENDENT on its key (a `deployment_id` determines its
  * namespace, a `pod_ip` determines its pod incarnation, ...), which is
  * exactly the k8s object model's own invariant — and what makes each
  * lookup deterministic under `dropDuplicates` at any partitioning.
  */
object MetadataOps {

  /** One row per (owner_id, generation): the full entity model — pod,
    * container, node, replica set, deployment, service, namespace — with
    * deterministic id/name/status forms. Generation-scoped entities
    * (pod, container, replica set) carry [start_ns, stop_ns) validity;
    * deployments/services span both generations (dep_start_ns/
    * dep_stop_ns are the full range).
    */
  def fullEntityDim(events: DataFrame, splitNs: Long): DataFrame = {
    val o = col("owner_id"); val g = col("gen")
    val svc = pmod(o, lit(10))
    events.select(col("user_id").as("owner_id")).distinct()
      .select(o, explode(array(lit(0), lit(1))).as("gen"))
      .withColumn("start_ns", when(g === 0, lit(0L)).otherwise(lit(splitNs)))
      .withColumn("stop_ns",
        when(g === 0, lit(splitNs)).otherwise(lit(Long.MaxValue)))
      .withColumn("namespace", concat(lit("ns"), pmod(svc, lit(3))))
      .withColumn("namespace_id", concat(lit("nsid-"), pmod(svc, lit(3))))
      .withColumn("pod_id", concat(lit("pid-"), o, lit("-g"), g))
      .withColumn("pod_name", concat(lit("pod-"), o, lit("-gen"), g))
      .withColumn("pod_ip", concat(lit("10."), g + 10, lit("."),
        pmod(o, lit(250)), lit("."), lit(1) + call_function("div", o, lit(250L))))
      .withColumn("pod_labels", concat(lit("""{"app":"app-"""), svc, lit("\"}")))
      .withColumn("pod_qos",
        when(pmod(o, lit(3)) === 0, "Guaranteed")
          .when(pmod(o, lit(3)) === 1, "Burstable").otherwise("BestEffort"))
      .withColumn("pod_status",
        when(pmod(o, lit(4)) === 0, "Running")
          .when(pmod(o, lit(4)) === 1, "Pending")
          .when(pmod(o, lit(4)) === 2, "Succeeded").otherwise("Failed"))
      .withColumn("owner_references",
        concat(lit("""[{"kind":"ReplicaSet","name":"rsn-"""), svc,
          lit("-g"), g, lit("\"}]")))
      .withColumn("node_name", concat(lit("node-"), pmod(o, lit(5))))
      .withColumn("hostname", concat(lit("host-"), pmod(o, lit(5))))
      .withColumn("cmdline", concat(lit("/bin/app --id="), o))
      .withColumn("container_id", concat(lit("cid-"), o, lit("-g"), g))
      .withColumn("container_name", concat(lit("ctr-"), o, lit("-g"), g))
      .withColumn("container_status",
        when(pmod(o, lit(3)) === 0, "Running")
          .when(pmod(o, lit(3)) === 1, "Waiting").otherwise("Terminated"))
      .withColumn("service_id", concat(lit("svcid-"), svc))
      .withColumn("service_name", concat(lit("svc-"), svc))
      .withColumn("cluster_ip", concat(lit("10.2.0."), svc))
      .withColumn("external_ips", concat(lit("""["35.0.0."""), svc, lit("\"]")))
      .withColumn("replicaset_id", concat(lit("rs-"), svc, lit("-g"), g))
      .withColumn("replicaset_name", concat(lit("rsn-"), svc, lit("-g"), g))
      .withColumn("rs_status",
        when(pmod(svc, lit(2)) === 0, "Ready").otherwise("ScalingUp"))
      .withColumn("deployment_id", concat(lit("depid-"), svc))
      .withColumn("deployment_name", concat(lit("deploy-"), svc))
      .withColumn("dep_status",
        when(pmod(svc, lit(2)) === 0, "Available").otherwise("Progressing"))
      .withColumn("dep_start_ns", lit(0L))
      .withColumn("dep_stop_ns", lit(Long.MaxValue))
  }

  private def fam(key: String)(pairs: (String, String)*): Seq[(String, (String, String))] =
    pairs.map { case (suffix, attr) => s"${key}_to_$suffix" -> (keyColOf(key), attr) }

  private def keyColOf(key: String): String = key match {
    case "upid"             => "owner_id" // asid == owner id in the synthetic model
    case "ip"               => "pod_ip"
    case "namespace_name"   => "namespace"
    case "deployment_name"  => "deployment_name"
    case "replicaset_name"  => "replicaset_name"
    case "service_name"     => "service_name"
    case "container_name"   => "container_name"
    case other              => other // pod_id, pod_name, container_id, ...
  }

  /** Every lookup-style metadata_ops function (81 of the 96 names) as a
    * (dimension key column, attribute column) binding. The other 15 are
    * UPID scalars (`upid`, `asid`, `upid_to_asid/pid/start_ts/string` —
    * graft.types.Upid), predicates (`has_value`, `has_service_id`,
    * `has_service_name` — K8sMetadata), and cluster constants
    * (`get_cidrs`, `vizier_id/name/namespace`, `_exec_hostname`,
    * `_exec_host_num_cpus` — [[constants]]).
    */
  val bindings: Map[String, (String, String)] = (
    fam("upid")(
      "cmdline" -> "cmdline", "container_id" -> "container_id",
      "container_name" -> "container_name", "deployment_id" -> "deployment_id",
      "deployment_name" -> "deployment_name", "hostname" -> "hostname",
      "namespace" -> "namespace", "node_name" -> "node_name",
      "pod_id" -> "pod_id", "pod_name" -> "pod_name", "pod_qos" -> "pod_qos",
      "pod_status" -> "pod_status", "replicaset_id" -> "replicaset_id",
      "replicaset_name" -> "replicaset_name", "service_id" -> "service_id",
      "service_name" -> "service_name") ++
    fam("pod_id")(
      "deployment_id" -> "deployment_id", "deployment_name" -> "deployment_name",
      "namespace" -> "namespace", "node_name" -> "node_name",
      "owner_references" -> "owner_references", "pod_labels" -> "pod_labels",
      "pod_name" -> "pod_name", "replicaset_id" -> "replicaset_id",
      "replicaset_name" -> "replicaset_name", "service_id" -> "service_id",
      "service_name" -> "service_name", "start_time" -> "start_ns",
      "stop_time" -> "stop_ns") ++
    fam("pod_name")(
      "deployment_id" -> "deployment_id", "deployment_name" -> "deployment_name",
      "namespace" -> "namespace", "owner_references" -> "owner_references",
      "pod_id" -> "pod_id", "pod_ip" -> "pod_ip",
      "replicaset_id" -> "replicaset_id", "replicaset_name" -> "replicaset_name",
      "service_id" -> "service_id", "service_name" -> "service_name",
      "start_time" -> "start_ns", "status" -> "pod_status",
      "stop_time" -> "stop_ns") ++
    fam("container_id")(
      "start_time" -> "start_ns", "status" -> "container_status",
      "stop_time" -> "stop_ns") ++
    fam("container_name")(
      "container_id" -> "container_id", "start_time" -> "start_ns",
      "stop_time" -> "stop_ns") ++
    fam("replicaset_id")(
      "deployment_id" -> "deployment_id", "deployment_name" -> "deployment_name",
      "namespace" -> "namespace", "owner_references" -> "owner_references",
      "replicaset_name" -> "replicaset_name", "start_time" -> "start_ns",
      "status" -> "rs_status", "stop_time" -> "stop_ns") ++
    fam("replicaset_name")(
      "deployment_id" -> "deployment_id", "deployment_name" -> "deployment_name",
      "namespace" -> "namespace", "replicaset_id" -> "replicaset_id",
      "start_time" -> "start_ns", "status" -> "rs_status",
      "stop_time" -> "stop_ns") ++
    fam("deployment_id")(
      "deployment_name" -> "deployment_name", "namespace" -> "namespace",
      "start_time" -> "dep_start_ns", "status" -> "dep_status",
      "stop_time" -> "dep_stop_ns") ++
    fam("deployment_name")(
      "deployment_id" -> "deployment_id", "namespace" -> "namespace",
      "start_time" -> "dep_start_ns", "status" -> "dep_status",
      "stop_time" -> "dep_stop_ns") ++
    fam("service_id")(
      "cluster_ip" -> "cluster_ip", "external_ips" -> "external_ips",
      "service_name" -> "service_name") ++
    fam("service_name")(
      "namespace" -> "namespace", "service_id" -> "service_id") ++
    fam("ip")("pod_id" -> "pod_id", "service_id" -> "service_id") ++
    fam("namespace_name")("namespace_id" -> "namespace_id")
  ).toMap

  /** The constant/scalar tail of the registry (vizier identity, executor
    * host facts). Values are deterministic fixture constants.
    */
  val constants: Map[String, Column] = Map(
    "vizier_id" -> lit("00000000-0000-0000-0000-000000000001"),
    "vizier_name" -> lit("graft-vizier"),
    "vizier_namespace" -> lit("pl"),
    "_exec_hostname" -> lit("host-local"),
    "_exec_host_num_cpus" -> lit(32L))

  /** Resolve one registry function: attach `outCol` to `facts` by the
    * binding's broadcast lookup. Point-in-time (gen-scoped) keys like
    * owner_id resolve via the as-of join when `tsCol` is given.
    */
  def resolve(fn: String, facts: DataFrame, dim: DataFrame, inCol: String,
              outCol: String, tsCol: Option[String] = None): DataFrame = {
    val (key, attr) = bindings(fn)
    if (key == "owner_id" && tsCol.isEmpty)
      throw new IllegalArgumentException(
        s"$fn is generation-scoped (upid family): pass tsCol for point-in-time resolution")
    tsCol match {
      case Some(ts) =>
        // Projection rows for a duplicated key are identical (attributes
        // are functionally dependent on the key), so the dedup is
        // deterministic and keeps the as-of join 1:1.
        K8sMetadata.resolveAsOf(facts,
          dim.select(col(key), col(attr).as(outCol), col("start_ns"), col("stop_ns"))
            .dropDuplicates(),
          inCol, key, ts, Seq(outCol))
      case None =>
        K8sMetadata.lookupAttr(facts,
          dim.select(col(key), col(attr).as(outCol)), inCol, key, Seq(outCol))
    }
  }

  /** One broadcast lookup pulling several attributes keyed by the same
    * dimension column, each renamed — the batched form the sweep query
    * uses so 81 bindings cost ~a dozen joins, not 81.
    */
  def resolveMany(facts: DataFrame, dim: DataFrame, inCol: String,
                  key: String, attrs: Seq[(String, String)]): DataFrame = {
    val d = dim.select(col(key) +: attrs.map { case (a, out) => col(a).as(out) }: _*)
    K8sMetadata.lookupAttr(facts, d, inCol, key, attrs.map(_._2))
  }
}
