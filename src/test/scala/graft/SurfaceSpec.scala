package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{NetOps, PiiOps, ProtocolOps, SqlNormalize, UriOps}

/** Edge cases for the §2.5 long-tail surface that the oracle queries
  * (fully-populated synthesized inputs) don't reach: absent URI
  * components, decoder defaults, CIDR boundaries, SQL-normalizer quoting.
  */
class SurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).as[String].head()

  test("uri_parse omits absent components") {
    assert(one(UriOps.uriParse(lit("https://px.dev/community/?p=1"))) ==
      """{"scheme":"https","host":"px.dev","path":"community/","query":"p=1"}""")
    assert(one(UriOps.uriParse(lit("http://host"))) ==
      """{"scheme":"http","host":"host"}""")
    assert(one(UriOps.uriParse(lit("http://host:81/a#f"))) ==
      """{"scheme":"http","host":"host","port":81,"path":"a","fragment":"f"}""")
  }

  test("uri_recompose port semantics: 0 absent, negative is error") {
    val ok = UriOps.uriRecompose(lit("http"), lit(""), lit("h"), lit(0L),
      lit("p"), lit(""), lit(""))
    assert(one(ok) == "http://h/p")
    val bad = UriOps.uriRecompose(lit("http"), lit(""), lit("h"), lit(-1L),
      lit("p"), lit(""), lit(""))
    assert(one(bad) == "Failed to recompose URI")
  }

  test("protocol decoder defaults per reference kind") {
    assert(one(ProtocolOps.protocolName.column(lit(99L))) == "Unknown")
    assert(one(ProtocolOps.kafkaApiKeyName.column(lit(99L))) == "99")
    assert(one(ProtocolOps.muxFrameTypeName.column(lit(5L))) == "Unknown (5)")
    assert(one(ProtocolOps.httpRespMessage.column(lit(299L))) == "Unassigned")
    // method_id 0 with known class resolves to the class name.
    assert(one(ProtocolOps.amqpMethodName(lit(60L), lit(0L))) == "Basic")
    assert(one(ProtocolOps.amqpMethodName(lit(60L), lit(40L))) == "BasicPublish")
  }

  test("cidr containment boundaries") {
    assert(one(NetOps.cidrContainsIp(lit("10.0.0.0/8"), lit("10.255.255.255"))) == "true")
    assert(one(NetOps.cidrContainsIp(lit("10.0.0.0/8"), lit("11.0.0.0"))) == "false")
    assert(one(NetOps.cidrContainsIp(lit("0.0.0.0/0"), lit("203.0.113.9"))) == "true")
    assert(one(NetOps.cidrContainsIp(lit("192.168.1.128/25"), lit("192.168.1.127"))) == "false")
    assert(one(NetOps.cidrContainsIp(lit("192.168.1.128/25"), lit("192.168.1.129"))) == "true")
  }

  test("redact_pii leaves clean text alone and tags each PII kind") {
    assert(one(PiiOps.redactPii(lit("no pii here 123"))) == "no pii here 123")
    assert(one(PiiOps.redactPii(lit("at 1.2.3.4 now"))) == "at <REDACTED_IPV4> now")
    assert(one(PiiOps.redactPii(lit("a@b.co x"))) == "<REDACTED_EMAIL> x")
    assert(one(PiiOps.redactPii(lit("s 999-88-7777"))) == "s <REDACTED_SSN>")
  }

  test("sql normalizer scanner: quote escapes and adjacent literals") {
    val (q1, p1) = SqlNormalize.scan("SELECT 'it''s', 2 FROM t", i => "$" + i)
    assert(q1 == "SELECT $1, $2 FROM t")
    assert(p1 == Seq("'it''s'", "2"))
    // identifiers with digits are not literals
    val (q2, p2) = SqlNormalize.scan("SELECT c1 FROM t2 WHERE x=3.5", _ => "?")
    assert(q2 == "SELECT c1 FROM t2 WHERE x=?")
    assert(p2 == Seq("3.5"))
    // E'...' postgres escape-string prefix is part of the literal
    val (q3, p3) = SqlNormalize.scan("VALUES (E'\\xDE')", i => "$" + i)
    assert(q3 == "VALUES ($1)")
    assert(p3 == Seq("E'\\xDE'"))
  }

  test("nslookup stub: deterministic, null-safe") {
    import graft.functions.NetOps
    val a = one(NetOps.nslookupStub(lit("svc.example.com")))
    assert(a.startsWith("203.0.113.") && a == one(NetOps.nslookupStub(lit("svc.example.com"))))
    assert(one(NetOps.nslookupStub(lit(null).cast("string"))) == "")
  }

  test("nslookup real mode resolves on the executing node") {
    import graft.functions.NetOps
    // localhost resolves without egress; an invalid name returns "" —
    // the reference's failed-getaddrinfo contract (net_ops.cc).
    assert(one(NetOps.nslookup(lit("localhost"), Some("real"))) == "127.0.0.1")
    assert(one(NetOps.nslookup(
      lit("no-such-host.invalid"), Some("real"))) == "")
    // default dispatch stays the deterministic stub (gate contract)
    assert(one(NetOps.nslookup(lit("svc.example.com"), None))
      .startsWith("203.0.113."))
  }

  test("shared_libraries reads the executing node's /proc for a live pid") {
    import graft.functions.ProcessOps
    import graft.types.Upid
    // local mode: the executor is this JVM — its own mappings must list
    // the JVM shared objects as a JSON array (>=2 mappings, .so paths).
    val self = ProcessHandle.current().pid()
    val out = one(ProcessOps.sharedLibraries(
      Upid.makeUpid(lit(1L), lit(self), lit(0L))))
    assert(out.startsWith("[") && out.contains(".so"),
      s"expected a JSON mapping array for pid $self, got: ${out.take(120)}")
    // reference contract: missing /proc/<pid> -> "" (not a failure)
    assert(one(ProcessOps.sharedLibraries(
      Upid.makeUpid(lit(1L), lit(3999999L), lit(0L)))) == "")
    // null upid -> null
    assert(Seq(1).toDF("x")
      .select(ProcessOps.sharedLibraries(lit(null).cast("binary")))
      .head().isNullAt(0))
  }
}
