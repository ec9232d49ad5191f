package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.meta.{K8sMetadata, MetadataOps}

/** Registry-completeness + value checks for the full metadata_ops surface
  * (reference: src/carnot/funcs/metadata/metadata_ops.cc).
  */
class MetadataOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val splitNs = graft.functions.PixieFunctions.tsNsLit("2024-01-15")
  private def events = graft.core.Tables(spark, dir, "events")
  private def dim = MetadataOps.fullEntityDim(events, splitNs)

  /** Every name registered in metadata_ops.cc (grep of
    * `registry->Register...("name")`, 96 distinct).
    */
  private val referenceNames = Set(
    "_exec_host_num_cpus", "_exec_hostname", "asid",
    "container_id_to_start_time", "container_id_to_status",
    "container_id_to_stop_time", "container_name_to_container_id",
    "container_name_to_start_time", "container_name_to_stop_time",
    "deployment_id_to_deployment_name", "deployment_id_to_namespace",
    "deployment_id_to_start_time", "deployment_id_to_status",
    "deployment_id_to_stop_time", "deployment_name_to_deployment_id",
    "deployment_name_to_namespace", "deployment_name_to_start_time",
    "deployment_name_to_status", "deployment_name_to_stop_time",
    "get_cidrs", "has_service_id", "has_service_name", "has_value",
    "ip_to_pod_id", "ip_to_service_id", "namespace_name_to_namespace_id",
    "pod_id_to_deployment_id", "pod_id_to_deployment_name",
    "pod_id_to_namespace", "pod_id_to_node_name",
    "pod_id_to_owner_references", "pod_id_to_pod_labels",
    "pod_id_to_pod_name", "pod_id_to_replicaset_id",
    "pod_id_to_replicaset_name", "pod_id_to_service_id",
    "pod_id_to_service_name", "pod_id_to_start_time", "pod_id_to_stop_time",
    "pod_name_to_deployment_id", "pod_name_to_deployment_name",
    "pod_name_to_namespace", "pod_name_to_owner_references",
    "pod_name_to_pod_id", "pod_name_to_pod_ip",
    "pod_name_to_replicaset_id", "pod_name_to_replicaset_name",
    "pod_name_to_service_id", "pod_name_to_service_name",
    "pod_name_to_start_time", "pod_name_to_status", "pod_name_to_stop_time",
    "replicaset_id_to_deployment_id", "replicaset_id_to_deployment_name",
    "replicaset_id_to_namespace", "replicaset_id_to_owner_references",
    "replicaset_id_to_replicaset_name", "replicaset_id_to_start_time",
    "replicaset_id_to_status", "replicaset_id_to_stop_time",
    "replicaset_name_to_deployment_id", "replicaset_name_to_deployment_name",
    "replicaset_name_to_namespace", "replicaset_name_to_replicaset_id",
    "replicaset_name_to_start_time", "replicaset_name_to_status",
    "replicaset_name_to_stop_time", "service_id_to_cluster_ip",
    "service_id_to_external_ips", "service_id_to_service_name",
    "service_name_to_namespace", "service_name_to_service_id", "upid",
    "upid_to_asid", "upid_to_cmdline", "upid_to_container_id",
    "upid_to_container_name", "upid_to_deployment_id",
    "upid_to_deployment_name", "upid_to_hostname", "upid_to_namespace",
    "upid_to_node_name", "upid_to_pid", "upid_to_pod_id",
    "upid_to_pod_name", "upid_to_pod_qos", "upid_to_pod_status",
    "upid_to_replicaset_id", "upid_to_replicaset_name",
    "upid_to_service_id", "upid_to_service_name", "upid_to_start_ts",
    "upid_to_string", "vizier_id", "vizier_name", "vizier_namespace")

  /** Names implemented outside the binding table: UPID scalars
    * (graft.types.Upid), predicates (K8sMetadata.hasServiceName /
    * isNotNull pattern, has_value = isNotNull), cluster constants.
    */
  private val scalarNames = Set(
    "upid", "asid", "upid_to_asid", "upid_to_pid", "upid_to_start_ts",
    "upid_to_string", "has_value", "has_service_id", "has_service_name",
    "get_cidrs") ++ MetadataOps.constants.keySet

  test("registry covers every metadata_ops registration (96 names)") {
    assert(referenceNames.size == 96)
    val covered = MetadataOps.bindings.keySet ++ scalarNames
    val missing = referenceNames -- covered
    val extra = covered -- referenceNames
    assert(missing.isEmpty, s"unbound reference functions: $missing")
    assert(extra.isEmpty, s"bindings not in the reference registry: $extra")
  }

  test("every lookup binding resolves to the dimension's own attribute values") {
    val d = dim
    val groups = MetadataOps.bindings.toSeq.groupBy(_._2._1)
    for ((key, fns) <- groups if key != "owner_id") {
      val exp = fns.map { case (fn, (_, attr)) => col(attr).as(s"exp_$fn") }
      val f = d.select(col(key).as("k") +: exp: _*).dropDuplicates("k").limit(25)
      val out = MetadataOps.resolveMany(f, d, "k", key,
        fns.map { case (fn, (_, attr)) => attr -> s"got_$fn" })
      val mismatch = fns.map { case (fn, _) =>
        col(s"got_$fn").isNull || col(s"got_$fn") =!= col(s"exp_$fn")
      }.reduce(_ || _)
      assert(out.where(mismatch).count() == 0, s"mismatch in $key family")
    }
  }

  test("upid family resolves point-in-time (generation flips at the split)") {
    val ev = events.select(col("user_id"), col("ts")).limit(200)
    val upidFns = MetadataOps.bindings.collect {
      case (fn, ("owner_id", attr)) => fn -> attr
    }.toSeq
    val proj = dim.select(col("owner_id") +: col("start_ns") +: col("stop_ns") +:
      upidFns.map { case (fn, attr) => col(attr).as(s"got_$fn") }: _*)
    val out = K8sMetadata.resolveAsOf(ev, proj, "user_id", "owner_id", "ts",
      upidFns.map { case (fn, _) => s"got_$fn" })
    val gen = when(col("ts") < splitNs, lit(0)).otherwise(lit(1))
    val bad = out.where(
      col("got_upid_to_pod_id") =!= concat(lit("pid-"), col("user_id"), lit("-g"), gen) ||
      col("got_upid_to_container_id") =!= concat(lit("cid-"), col("user_id"), lit("-g"), gen) ||
      col("got_upid_to_service_name") =!= concat(lit("svc-"), pmod(col("user_id"), lit(10))) ||
      upidFns.map { case (fn, _) => col(s"got_$fn").isNull }.reduce(_ || _))
    assert(bad.count() == 0)
  }

  test("resolve() rejects a generation-scoped binding without a timestamp") {
    intercept[IllegalArgumentException] {
      MetadataOps.resolve("upid_to_pod_id", events, dim, "user_id", "out")
    }
  }

  test("single-binding resolve routes ip_to_pod_id through the pod_ip key") {
    val f = dim.select(col("pod_ip").as("ip"), col("pod_id").as("exp")).limit(10)
    val out = MetadataOps.resolve("ip_to_pod_id", f, dim, "ip", "got")
    assert(out.where(col("got") =!= col("exp")).count() == 0)
  }
}
