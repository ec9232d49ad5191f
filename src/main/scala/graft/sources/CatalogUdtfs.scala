package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The reference's metadata UDTF-source family (SURVEY §2.7;
  * src/vizier/funcs/md_udtfs/md_udtfs.cc — GetTables, GetSchemas,
  * GetUDFList, GetUDAList, GetUDTFList, GetAgentStatus): table-generating
  * functions that expose engine introspection as relations. Here they are
  * plain Scala functions returning DataFrames over the catalog — the
  * idiomatic Spark shape for constant-ish metadata (tiny, broadcastable).
  */
object CatalogUdtfs {

  /** The fixture catalog (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Schema lookups memoized per (dir, table): parquet footer reads are
    * driver-side metadata operations a catalog caches (fixture schemas
    * are immutable for a run).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), StructType]()

  private def schemaOf(spark: SparkSession, dir: String, name: String): StructType =
    schemaCache.computeIfAbsent((dir, name),
      _ => graft.core.Tables(spark, dir, name).schema)

  /** Spark type -> engine type name (DuckDB-compatible spelling so the
    * schema UDTF is oracle-checkable).
    */
  private def typeName(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case StringType => "VARCHAR"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case BinaryType => "BLOB"
    case ArrayType(e, _) => typeName(e) + "[]"
    case other => other.simpleString.toUpperCase
  }

  /** GetTables: name + column count per registered table. */
  def getTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tableNames
      .map(n => (n, schemaOf(spark, dir, n).fields.length.toLong))
      .toDF("table_name", "n_cols")
  }

  /** GetSchemas: one row per column with 1-based ordinal and type name. */
  def getSchemas(spark: SparkSession, dir: String, tables: Seq[String] = tableNames): DataFrame = {
    import spark.implicits._
    tables.flatMap { n =>
      schemaOf(spark, dir, n).fields.zipWithIndex.map {
        case (f, i) => (n, f.name, (i + 1).toLong, typeName(f.dataType))
      }
    }.toDF("table_name", "column_name", "column_index", "data_type")
  }

  /** GetUDFList / GetUDAList / GetUDTFList: the engine's registered
    * function surface (names mirror the reference registry).
    */
  val udfNames: Seq[(String, String)] = Seq(
    "bin" -> "math_ops", "modulo" -> "math_ops", "time_to_int64" -> "math_ops",
    "int64_to_time" -> "math_ops", "contains" -> "string_ops",
    "length" -> "string_ops", "find" -> "string_ops", "substring" -> "string_ops",
    "tolower" -> "string_ops", "toupper" -> "string_ops", "trim" -> "string_ops",
    "strip_prefix" -> "string_ops", "hex_to_ascii" -> "string_ops",
    "bytes_to_hex" -> "string_ops", "atoi" -> "string_ops", "itoa" -> "string_ops",
    "regex_match" -> "regex_ops", "replace" -> "regex_ops",
    "_match_regex_rule" -> "regex_ops", "pluck" -> "json_ops",
    "pluck_int64" -> "json_ops", "pluck_float64" -> "json_ops",
    "pluck_array" -> "json_ops", "split" -> "json_ops",
    "_script_reference" -> "json_ops", "select" -> "conditionals",
    "equals_any" -> "conditionals", "uri_parse" -> "uri_ops",
    "uri_recompose" -> "uri_ops", "redact_pii_best_effort" -> "pii_ops",
    "normalize_mysql" -> "sql_ops", "normalize_pgsql" -> "sql_ops",
    "cidrs_contain_ip" -> "net_ops", "nslookup" -> "net_ops",
    "protocol_name" -> "protocol_ops", "http_resp_message" -> "protocol_ops",
    "kafka_api_key_name" -> "protocol_ops", "mysql_command_name" -> "protocol_ops",
    "cql_opcode_name" -> "protocol_ops", "amqp_frame_type_name" -> "protocol_ops",
    "amqp_method_name" -> "protocol_ops", "dns_rcode_name" -> "protocol_ops",
    "mux_frame_type_name" -> "protocol_ops",
    "grpc_status_code_to_str" -> "util_ops",
    "upid_to_asid" -> "metadata_ops", "upid_to_pid" -> "metadata_ops",
    "upid_to_string" -> "metadata_ops", "upid_to_pod_name" -> "metadata_ops",
    "upid_to_service_name" -> "metadata_ops",
    "pod_id_to_pod_name" -> "metadata_ops", "pod_id_to_namespace" -> "metadata_ops",
    "pod_id_to_service_id" -> "metadata_ops", "pod_id_to_replica_set" -> "metadata_ops",
    "pod_id_to_deployment_name" -> "metadata_ops", "ip_to_pod_id" -> "metadata_ops",
    "service_id_to_service_name" -> "metadata_ops",
    "has_service_name" -> "metadata_ops", "get_cidrs" -> "metadata_ops",
    "strptime" -> "time_ops", "parse_time" -> "time_ops",
    "parse_duration" -> "time_ops", "format_duration" -> "time_ops",
    "_kmeans_inference" -> "ml_ops", "_encode_sentence_piece" -> "ml_ops",
    "_text_embedding" -> "ml_ops",
    "_predict_request_path_cluster" -> "request_path_ops",
    "md5_long60" -> "hash_ops")

  val udaNames: Seq[(String, String)] = Seq(
    "mean" -> "math_ops", "sum" -> "math_ops", "max" -> "math_ops",
    "min" -> "math_ops", "count" -> "math_ops", "quantiles" -> "math_sketches",
    "any" -> "collections", "sample" -> "ml_ops", "_kmeans" -> "ml_ops",
    "pprof" -> "pprof_ops", "_build_request_path_clusters" -> "request_path_ops",
    "exact_dedup" -> "dedup_ops", "minhash" -> "dedup_ops",
    "simhash" -> "dedup_ops")

  val udtfNames: Seq[String] = Seq(
    "GetTables", "GetSchemas", "GetUDFList", "GetUDAList", "GetUDTFList",
    "GetAgentStatus", "GetProfilerSamplingPeriodMS", "GetLinuxHeadersStatus",
    "GetTracepointStatus", "GetCronScriptHistory", "_DebugMDState",
    "_DebugMDGetWithPrefix", "_DebugTableInfo")

  def getUdfList(spark: SparkSession): DataFrame = {
    import spark.implicits._
    udfNames.toDF("name", "module")
  }
  def getUdaList(spark: SparkSession): DataFrame = {
    import spark.implicits._
    udaNames.toDF("name", "module")
  }
  def getUdtfList(spark: SparkSession): DataFrame = {
    import spark.implicits._
    udtfNames.map(Tuple1(_)).toDF("name")
  }

  /** GetAgentStatus (md_udtfs_impl.h:287-305 relation): single local
    * "agent" (Spark has no PEM fleet; the executor topology is Spark's
    * concern). agent_id is the UINT128 uuid in string form; ip_address
    * carries host:port like the reference (scripts split on ':').
    */
  def getAgentStatus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("00000000-0000-0000-0000-000000000001", 1L, "host-local",
      "10.11.1.1:8080", "AGENT_STATE_HEALTHY", 1700000000000000000L,
      5000000L, true))
      .toDF("agent_id", "asid", "hostname", "ip_address", "agent_state",
        "create_time", "last_heartbeat_ns", "kernel_headers_installed")
  }

  /** _HeapGrowthStacks (internal debug.h:141-143 relation: asid, heap).
    * No Go heap profiler exists in a Spark deployment — deterministic
    * stub rows with the reference's folded-stack text shape.
    */
  def heapGrowthStacks(spark: SparkSession, asid: Long): DataFrame = {
    import spark.implicits._
    Seq((asid, "runtime.mallocgc;runtime.makeslice;app.handle 1024"),
      (asid, "runtime.mallocgc;bytes.growSlice;app.buffer 512"))
      .toDF("asid", "heap")
  }

  // ---- the md_udtfs long tail (md_udtfs.cc:32-60) --------------------
  // In the reference these query per-agent state over gRPC; in a Spark
  // deployment the corresponding state either doesn't exist (eBPF
  // tracepoints, per-node table-store accounting) or is a cluster
  // constant. They are modeled as deterministic constant relations with
  // the reference's exact output columns, so scripts depending on their
  // shape run unchanged.

  /** GetProfilerSamplingPeriodMS (md_udtfs_impl.h:377-381). */
  def getProfilerSamplingPeriodMS(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, 11L)).toDF("asid", "profiler_sampling_period_ms")
  }

  /** GetLinuxHeadersStatus (md_udtfs_impl.h:431-435). */
  def getLinuxHeadersStatus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, true)).toDF("asid", "kernel_headers_installed")
  }

  /** _DebugMDState (md_udtfs_impl.h:710-716): agent metadata-state dump. */
  def debugMDState(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "pl/vizier-pem-local", """{"epoch_id":1,"asid":1}"""))
      .toDF("asid", "pod_name", "debug_state")
  }

  /** The _DebugMDGetWithPrefix backing store (constant kv snapshot). */
  val mdKvStore: Seq[(String, String)] = Seq(
    "md/pods/ns0" -> "3", "md/pods/ns1" -> "3", "md/pods/ns2" -> "3",
    "md/services/count" -> "10", "md/epoch" -> "1")

  /** _DebugMDGetWithPrefix (md_udtfs_impl.h:741-745): prefix-filtered kv. */
  def debugMDGetWithPrefix(spark: SparkSession, prefix: String): DataFrame = {
    import spark.implicits._
    mdKvStore.filter(_._1.startsWith(prefix)).toDF("key", "value")
  }

  /** _DebugTableInfo (md_udtfs_impl.h:802-826): table-store accounting.
    * Spark has no ring-buffer table store, so the accounting columns are
    * deterministic placeholders over the real catalog (names/ids real;
    * batch/byte counters shape-only).
    */
  def debugTableInfo(spark: SparkSession): DataFrame = {
    import spark.implicits._
    tableNames.zipWithIndex.map { case (n, i) =>
      (1L, n, i.toLong, 1L, 0L, 1000L * (i + 1), 1L, 0L,
        1000L * (i + 1), 0L, 64L * 1024 * 1024, 0L)
    }.toDF("asid", "name", "id", "batches_added", "batches_expired",
      "bytes_added", "num_batches", "compacted_batches", "size",
      "cold_size", "max_table_size", "min_time")
  }

  /** GetTracepointStatus (md_udtfs_impl.h:880-891): no eBPF tracepoints
    * exist in a Spark deployment — the honest relation is empty.
    */
  def getTracepointStatus(spark: SparkSession): DataFrame = {
    val schema = StructType(Seq(
      StructField("tracepoint_id", StringType),
      StructField("name", StringType),
      StructField("state", StringType),
      StructField("status", StringType),
      StructField("output_tables", StringType)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** GetCronScriptHistory (md_udtfs_impl.h:987-1010): deterministic
    * execution history for the ScriptRunner analog.
    */
  val cronHistory: Seq[(String, Long, String, Long, Long, Long)] = Seq(
    ("script-otel-export", 1706000000000000000L, "", 120000000L, 8000000L, 4096L),
    ("script-otel-export", 1706000060000000000L, "", 110000000L, 0L, 4096L),
    ("script-table-rollup", 1706000000000000000L, "compile error: x", 0L, 5000000L, 0L))

  def getCronScriptHistory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    cronHistory.toDF("script_id", "timestamp", "error_message",
      "execution_time_ns", "compilation_time_ns", "bytes_processed")
  }
}
