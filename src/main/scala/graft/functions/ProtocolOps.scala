package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Protocol enum->string decoders (reference:
  * src/carnot/funcs/protocols/protocol_ops.cc and the per-protocol
  * tables in src/carnot/funcs/protocols/{protocols,http,kafka,mysql,cql,
  * amqp,dns,mux}.h). Each table is declared ONCE and emitted both as a
  * codegen'd Catalyst CASE WHEN chain and as equivalent DuckDB SQL, so
  * the Spark query and its oracle can never drift. These are pure data
  * tables (wire-protocol constants), not ported logic.
  */
object ProtocolOps {

  /** How the reference UDF handles a code outside the table. */
  sealed trait Default
  /** Fixed fallback string (e.g. "Unknown", "Unassigned"). */
  final case class Const(s: String) extends Default
  /** Echo the numeric code as a string (std::to_string(code)). */
  case object CodeString extends Default
  /** absl::Substitute("Unknown ($0)", code) — mux only. */
  case object UnknownParen extends Default

  final case class Lookup(entries: Seq[(Long, String)], default: Default) {
    /** O(1) dense-array lookup when the code domain is small (every
      * protocol table is), else a CASE WHEN chain. A 60-entry CaseWhen
      * costs ~30 branches + string copies per row; the array literal is
      * one bounds check + one index.
      */
    def column(c: Column): Column = {
      val dflt = default match {
        case Const(s)     => lit(s)
        case CodeString   => c.cast("string")
        case UnknownParen => concat(lit("Unknown ("), c.cast("string"), lit(")"))
      }
      val keys = entries.map(_._1)
      val (mn, mx) = (keys.min, keys.max)
      if (mx - mn < 16384) {
        val byKey = entries.toMap
        val arr = Array.tabulate((mx - mn + 1).toInt)(i => byKey.getOrElse(mn + i, null))
        val hit = try_element_at(typedLit(arr), (c - mn + 1).cast("int"))
        when(c.between(mn, mx) && hit.isNotNull, hit).otherwise(dflt)
      } else {
        entries.foldRight(dflt) { case ((k, v), acc) => when(c === k, lit(v)).otherwise(acc) }
      }
    }

    /** The same table as a DuckDB SQL CASE expression. */
    def sql(expr: String): String = {
      val dflt = default match {
        case Const(s)     => s"'${s.replace("'", "''")}'"
        case CodeString   => s"CAST($expr AS VARCHAR)"
        case UnknownParen => s"'Unknown (' || CAST($expr AS VARCHAR) || ')'"
      }
      val whens = entries
        .map { case (k, v) => s"WHEN $k THEN '${v.replace("'", "''")}'" }
        .mkString(" ")
      s"(CASE $expr $whens ELSE $dflt END)"
    }
  }

  /** protocols.h Protocol enum -> name (traffic classification). */
  val protocolName: Lookup = Lookup(Seq(
    0L -> "Unknown", 1L -> "HTTP", 2L -> "HTTP2", 3L -> "MySQL", 4L -> "CQL",
    5L -> "PGSQL", 6L -> "DNS", 7L -> "Redis", 8L -> "NATS", 9L -> "Mongo",
    10L -> "Kafka", 12L -> "AMQP"), Const("Unknown"))

  /** http.h IANA status -> reason phrase (full table, default Unassigned). */
  val httpRespMessage: Lookup = Lookup(Seq(
    100L -> "Continue", 101L -> "Switching Protocols", 102L -> "Processing",
    103L -> "Early Hints", 200L -> "OK", 201L -> "Created", 202L -> "Accepted",
    203L -> "Non-Authoritative Information", 204L -> "No Content",
    205L -> "Reset Content", 206L -> "Partial Content", 207L -> "Multi-Status",
    208L -> "Already Reported", 226L -> "IM Used", 300L -> "Multiple Choices",
    301L -> "Moved Permanently", 302L -> "Found", 303L -> "See Other",
    304L -> "Not Modified", 305L -> "Use Proxy", 306L -> "(Unused)",
    307L -> "Temporary Redirect", 308L -> "Permanent Redirect",
    400L -> "Bad Request", 401L -> "Unauthorized", 402L -> "Payment Required",
    403L -> "Forbidden", 404L -> "Not Found", 405L -> "Method Not Allowed",
    406L -> "Not Acceptable", 407L -> "Proxy Authentication Required",
    408L -> "Request Timeout", 409L -> "Conflict", 410L -> "Gone",
    411L -> "Length Required", 412L -> "Precondition Failed",
    413L -> "Payload Too Large", 414L -> "URI Too Long",
    415L -> "Unsupported Media Type", 416L -> "Range Not Satisfiable",
    417L -> "Expectation Failed", 421L -> "Misdirected Request",
    422L -> "Unprocessable Entity", 423L -> "Locked", 424L -> "Failed Dependency",
    425L -> "Too Early", 426L -> "Upgrade Required", 428L -> "Precondition Required",
    429L -> "Too Many Requests", 431L -> "Request Header Fields Too Large",
    451L -> "Unavailable For Legal Reasons", 500L -> "Internal Server Error",
    501L -> "Not Implemented", 502L -> "Bad Gateway", 503L -> "Service Unavailable",
    504L -> "Gateway Timeout", 505L -> "HTTP Version Not Supported",
    506L -> "Variant Also Negotiates", 507L -> "Insufficient Storage",
    508L -> "Loop Detected", 510L -> "Not Extended",
    511L -> "Network Authentication Required"), Const("Unassigned"))

  /** kafka.h api_key -> API name (default: echo code). */
  val kafkaApiKeyName: Lookup = Lookup(Seq(
    0L -> "Produce", 1L -> "Fetch", 2L -> "ListOffsets", 3L -> "Metadata",
    4L -> "LeaderAndIsr", 5L -> "StopReplica", 6L -> "UpdateMetadata",
    7L -> "ControlledShutdown", 8L -> "OffsetCommit", 9L -> "OffsetFetch",
    10L -> "FindCoordinator", 11L -> "JoinGroup", 12L -> "Heartbeat",
    13L -> "LeaveGroup", 14L -> "SyncGroup", 15L -> "DescribeGroups",
    16L -> "ListGroups", 17L -> "SaslHandshake", 18L -> "ApiVersions",
    19L -> "CreateTopics", 20L -> "DeleteTopics", 21L -> "DeleteRecords",
    22L -> "InitProducerId", 23L -> "OffsetForLeaderEpoch",
    24L -> "AddPartitionsToTxn", 25L -> "AddOffsetsToTxn", 26L -> "EndTxn",
    27L -> "WriteTxnMarkers", 28L -> "TxnOffsetCommit", 29L -> "DescribeAcls",
    30L -> "CreateAcls", 31L -> "DeleteAcls", 32L -> "DescribeConfigs",
    33L -> "AlterConfigs", 34L -> "AlterReplicaLogDirs", 35L -> "DescribeLogDirs",
    36L -> "SaslAuthenticate", 37L -> "CreatePartitions",
    38L -> "CreateDelegationToken", 39L -> "RenewDelegationToken",
    40L -> "ExpireDelegationToken", 41L -> "DescribeDelegationToken",
    42L -> "DeleteGroups", 43L -> "ElectLeaders", 44L -> "IncrementalAlterConfigs",
    45L -> "AlterPartitionReassignments", 46L -> "ListPartitionReassignments",
    47L -> "OffsetDelete", 48L -> "DescribeClientQuotas", 49L -> "AlterClientQuotas",
    50L -> "DescribeUserScramCredentials", 51L -> "AlterUserScramCredentials",
    56L -> "AlterIsr", 57L -> "UpdateFeatures", 60L -> "DescribeCluster",
    61L -> "DescribeProducers"), CodeString)

  /** mysql.h COM_* command byte -> name (default: echo code). */
  val mysqlCommandName: Lookup = Lookup(Seq(
    0x00L -> "Sleep", 0x01L -> "Quit", 0x02L -> "InitDB", 0x03L -> "Query",
    0x04L -> "FieldList", 0x05L -> "CreateDB", 0x06L -> "DropDB",
    0x07L -> "Refresh", 0x08L -> "Shutdown", 0x09L -> "Statistics",
    0x0aL -> "ProcessInfo", 0x0bL -> "Connect", 0x0cL -> "ProcessKill",
    0x0dL -> "Debug", 0x0eL -> "Ping", 0x0fL -> "Time", 0x10L -> "DelayedInsert",
    0x11L -> "ChangeUser", 0x12L -> "BinlogDump", 0x13L -> "TableDump",
    0x14L -> "ConnectOut", 0x15L -> "RegisterSlave", 0x16L -> "StmtPrepare",
    0x17L -> "StmtExecute", 0x18L -> "StmtSendLongData", 0x19L -> "StmtClose",
    0x1aL -> "StmtReset", 0x1bL -> "SetOption", 0x1cL -> "StmtFetch",
    0x1dL -> "Daemon", 0x1eL -> "BinlogDumpGTID", 0x1fL -> "ResetConnection"),
    CodeString)

  /** cql.h opcode -> name (default: echo code). */
  val cqlOpcodeName: Lookup = Lookup(Seq(
    0x00L -> "Error", 0x01L -> "Startup", 0x02L -> "Ready",
    0x03L -> "Authenticate", 0x05L -> "Options", 0x06L -> "Supported",
    0x07L -> "Query", 0x08L -> "Result", 0x09L -> "Prepare", 0x0aL -> "Execute",
    0x0bL -> "Register", 0x0cL -> "Event", 0x0dL -> "Batch",
    0x0eL -> "AuthChallenge", 0x0fL -> "AuthResponse", 0x10L -> "AuthSuccess"),
    CodeString)

  /** amqp.h frame type -> name (default: echo code). */
  val amqpFrameTypeName: Lookup = Lookup(Seq(
    1L -> "Frame method", 2L -> "Content Header", 3L -> "Content Body",
    8L -> "Heartbeat"), CodeString)

  /** dns.h RCODE -> name (default: echo code). */
  val dnsRcodeName: Lookup = Lookup(Seq(
    0L -> "NOERROR", 1L -> "FORMERR", 2L -> "SERVFAIL", 3L -> "NXDOMAIN",
    4L -> "NOTIMP", 5L -> "REFUSED", 6L -> "YXDOMAIN", 7L -> "YXRRSET",
    8L -> "NXRRSET", 9L -> "NOTAUTH", 10L -> "NOTZONE", 11L -> "DSOTYPENI",
    16L -> "BADVERS", 17L -> "BADKEY", 18L -> "BADTIME", 19L -> "BADMODE",
    20L -> "BADNAME", 21L -> "BADALG", 22L -> "BADTRUNC", 23L -> "BADCOOKIE"),
    CodeString)

  /** mux.h frame type -> name (default: "Unknown (code)"). */
  val muxFrameTypeName: Lookup = Lookup(Seq(
    1L -> "Treq", -1L -> "Rreq", 2L -> "Tdispatch", -2L -> "Rdispatch",
    64L -> "Tdrain", -64L -> "Rdrain", 65L -> "Tping", -65L -> "Rping",
    66L -> "Tdiscarded", -66L -> "Rdiscarded", 67L -> "Tlease", 68L -> "Tinit",
    -68L -> "Rinit", -128L -> "Rerr", 127L -> "Rerr (legacy)",
    -62L -> "Tdiscarded (legacy)"), UnknownParen)

  /** amqp.h class_id -> class name. */
  val amqpClassName: Lookup = Lookup(Seq(
    10L -> "Connection", 20L -> "Channel", 40L -> "Exchange", 50L -> "Queue",
    60L -> "Basic", 90L -> "Tx"), Const("Unknown"))

  /** amqp.h (class_id, method_id) -> method name, keyed class*1000+method.
    * method_id == 0 with a known class resolves to the class name
    * (ClassIdMethodIdToMethodName in the reference).
    */
  private val amqpMethods: Seq[((Long, Long), String)] = Seq(
    (10L, 10L) -> "ConnectionStart", (10L, 11L) -> "ConnectionStart-ok",
    (10L, 20L) -> "ConnectionSecure", (10L, 21L) -> "ConnectionSecure-ok",
    (10L, 30L) -> "ConnectionTune", (10L, 31L) -> "ConnectionTune-ok",
    (10L, 40L) -> "ConnectionOpen", (10L, 41L) -> "ConnectionOpen-ok",
    (10L, 50L) -> "ConnectionClose", (10L, 51L) -> "ConnectionClose-ok",
    (20L, 10L) -> "ChannelOpen", (20L, 11L) -> "ChannelOpen-ok",
    (20L, 20L) -> "ChannelFlow", (20L, 21L) -> "ChannelFlow-ok",
    (20L, 40L) -> "ChannelClose", (20L, 41L) -> "ChannelClose-ok",
    (40L, 10L) -> "ExchangeDeclare", (40L, 11L) -> "ExchangeDeclare-ok",
    (40L, 20L) -> "ExchangeDelete", (40L, 21L) -> "ExchangeDelete-ok",
    (50L, 10L) -> "QueueDeclare", (50L, 11L) -> "QueueDeclare-ok",
    (50L, 20L) -> "QueueBind", (50L, 21L) -> "QueueBind-ok",
    (50L, 50L) -> "QueueUnbind", (50L, 51L) -> "QueueUnbind-ok",
    (50L, 30L) -> "QueuePurge", (50L, 31L) -> "QueuePurge-ok",
    (50L, 40L) -> "QueueDelete", (50L, 41L) -> "QueueDelete-ok",
    (60L, 10L) -> "BasicQos", (60L, 11L) -> "BasicQos-ok",
    (60L, 20L) -> "BasicConsume", (60L, 21L) -> "BasicConsume-ok",
    (60L, 30L) -> "BasicCancel", (60L, 31L) -> "BasicCancel-ok",
    (60L, 40L) -> "BasicPublish", (60L, 50L) -> "BasicReturn",
    (60L, 60L) -> "BasicDeliver", (60L, 70L) -> "BasicGet",
    (60L, 71L) -> "BasicGet-ok", (60L, 72L) -> "BasicGet-empty",
    (60L, 80L) -> "BasicAck", (60L, 90L) -> "BasicReject",
    (60L, 100L) -> "BasicRecover-async", (60L, 110L) -> "BasicRecover",
    (60L, 111L) -> "BasicRecover-ok",
    (90L, 10L) -> "TxSelect", (90L, 11L) -> "TxSelect-ok",
    (90L, 20L) -> "TxCommit", (90L, 21L) -> "TxCommit-ok",
    (90L, 30L) -> "TxRollback", (90L, 31L) -> "TxRollback-ok")

  /** Combined-key lookup for (class_id, method_id) pairs. Key encoding
    * class*128+method keeps the domain dense (max 11631) so the O(1)
    * array path applies; method_id < 128 for every AMQP 0-9-1 method.
    */
  private val amqpMethodLookup: Lookup =
    Lookup(amqpMethods.map { case ((c, m), v) => (c * 128 + m) -> v }, Const("Unknown"))

  def amqpMethodName(classId: Column, methodId: Column): Column =
    when(classId =!= 0 && methodId === 0, amqpClassName.column(classId))
      .otherwise(when(methodId < 128,
        amqpMethodLookup.column(classId * 128 + methodId)).otherwise(lit("Unknown")))

  def amqpMethodNameSql(classExpr: String, methodExpr: String): String =
    s"(CASE WHEN $classExpr <> 0 AND $methodExpr = 0 THEN ${amqpClassName.sql(classExpr)} " +
      s"WHEN $methodExpr < 128 THEN ${amqpMethodLookup.sql(s"($classExpr * 128 + $methodExpr)")} " +
      "ELSE 'Unknown' END)"
}
