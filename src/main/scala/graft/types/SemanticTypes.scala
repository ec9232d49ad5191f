package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Semantic + pattern type annotations (reference:
  * src/shared/types/typespb/types.proto:66-94 SemanticType enum, :50-54
  * PatternType; src/table_store/schema/relation.h:41-125 Relation carries
  * (name, DataType, SemanticType, PatternType) per column).
  *
  * Spark-native carrier: StructField.metadata — it survives projections
  * and parquet round-trips, costs nothing at execution, and any consumer
  * (formatter, UI, exporter) can read it off the schema. This is the
  * engine's version of semantic-type inference outputs
  * (src/carnot/udf/type_inference.h): functions that produce a
  * semantically-typed value tag their output column.
  */
object SemanticTypes {

  val Key = "graft.semantic_type"
  val PatternKey = "graft.pattern_type"

  // types.proto:66-94 (names kept verbatim for parity).
  val ST_NONE = "ST_NONE"
  val ST_TIME_NS = "ST_TIME_NS"
  val ST_AGENT_UID = "ST_AGENT_UID"
  val ST_ASID = "ST_ASID"
  val ST_UPID = "ST_UPID"
  val ST_SERVICE_NAME = "ST_SERVICE_NAME"
  val ST_POD_NAME = "ST_POD_NAME"
  val ST_POD_PHASE = "ST_POD_PHASE"
  val ST_POD_STATUS = "ST_POD_STATUS"
  val ST_NODE_NAME = "ST_NODE_NAME"
  val ST_CONTAINER_NAME = "ST_CONTAINER_NAME"
  val ST_NAMESPACE_NAME = "ST_NAMESPACE_NAME"
  val ST_BYTES = "ST_BYTES"
  val ST_PERCENT = "ST_PERCENT"
  val ST_DURATION_NS = "ST_DURATION_NS"
  val ST_THROUGHPUT_PER_NS = "ST_THROUGHPUT_PER_NS"
  val ST_QUANTILES = "ST_QUANTILES"
  val ST_DURATION_NS_QUANTILES = "ST_DURATION_NS_QUANTILES"
  val ST_IP_ADDRESS = "ST_IP_ADDRESS"
  val ST_PORT = "ST_PORT"
  val ST_HTTP_REQ_METHOD = "ST_HTTP_REQ_METHOD"
  val ST_HTTP_RESP_STATUS = "ST_HTTP_RESP_STATUS"
  val ST_HTTP_RESP_MESSAGE = "ST_HTTP_RESP_MESSAGE"
  val ST_SCRIPT_REFERENCE = "ST_SCRIPT_REFERENCE"

  // types.proto:50-54
  val PT_UNSPECIFIED = "UNSPECIFIED"
  val PT_GENERAL = "GENERAL"
  val PT_GENERAL_ENUM = "GENERAL_ENUM"
  val PT_STRUCTURED = "STRUCTURED"

  /** Alias a column expression with a semantic (and optionally pattern)
    * type tag; apply with df.select / withColumn as usual.
    */
  def tag(c: Column, name: String, st: String,
          pattern: String = PT_UNSPECIFIED): Column =
    c.as(name, new MetadataBuilder()
      .putString(Key, st).putString(PatternKey, pattern).build())

  /** Tag an existing column of a DataFrame in place. */
  def tagCol(df: DataFrame, name: String, st: String,
             pattern: String = PT_UNSPECIFIED): DataFrame = {
    val meta = new MetadataBuilder()
      .withMetadata(df.schema(name).metadata)
      .putString(Key, st).putString(PatternKey, pattern).build()
    df.withMetadata(name, meta)
  }

  def semanticTypeOf(f: StructField): String =
    if (f.metadata.contains(Key)) f.metadata.getString(Key) else ST_NONE

  def patternTypeOf(f: StructField): String =
    if (f.metadata.contains(PatternKey)) f.metadata.getString(PatternKey)
    else PT_UNSPECIFIED

  /** The Relation view (relation.h:122-125 parallel arrays): one row per
    * column with data/semantic/pattern type — feeds GetSchemas-style
    * introspection and result-sink relation headers.
    */
  def relationOf(df: DataFrame): Seq[(String, String, String, String)] =
    df.schema.fields.toSeq.map(f =>
      (f.name, f.dataType.simpleString, semanticTypeOf(f), patternTypeOf(f)))

  /** Default semantic tags for the engine's well-known column names —
    * the analog of source-relation annotations in stirling table schemas.
    */
  def autoTag(df: DataFrame): DataFrame = {
    val rules: Map[String, String] = Map(
      "ts" -> ST_TIME_NS, "time_" -> ST_TIME_NS, "upid" -> ST_UPID,
      "pod_name" -> ST_POD_NAME, "service_name" -> ST_SERVICE_NAME,
      "namespace" -> ST_NAMESPACE_NAME, "pod_ip" -> ST_IP_ADDRESS,
      "duration_ns" -> ST_DURATION_NS)
    rules.foldLeft(df) { case (d, (name, st)) =>
      if (d.columns.contains(name)) tagCol(d, name, st) else d
    }
  }
}
