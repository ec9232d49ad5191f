package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Network math (reference: src/carnot/funcs/net/net_ops.cc —
  * `cidrs_contain_ip`, `nslookup`). IPv4/CIDR arithmetic is pure integer
  * math expressed as Catalyst expressions (codegen'd, no UDF).
  * `nslookup` does blocking DNS on the executor in the reference; that is
  * environment-dependent, so here it is a deterministic stub resolver —
  * the Spark-side plumbing (expression shape, null handling) is real.
  */
object NetOps {

  /** Dotted-quad IPv4 -> uint32 as long ("10.1.2.3" -> 167838211). */
  def ipv4ToLong(ip: Column): Column =
    split_part(ip, lit("."), lit(1)).cast("long") * 16777216L +
      split_part(ip, lit("."), lit(2)).cast("long") * 65536L +
      split_part(ip, lit("."), lit(3)).cast("long") * 256L +
      split_part(ip, lit("."), lit(4)).cast("long")

  /** True iff `ip` falls inside dotted-quad/prefix `cidr`.
    * (ip >> (32-m)) == (net >> (32-m)); /0 contains everything.
    */
  def cidrContainsIp(cidr: Column, ip: Column): Column = {
    val net = ipv4ToLong(split_part(cidr, lit("/"), lit(1)))
    val mlen = split_part(cidr, lit("/"), lit(2)).cast("int")
    val shiftPow = pow(lit(2.0), (lit(32) - mlen)).cast("long")
    // Exact integer division (Column./ promotes to double).
    call_function("div", ipv4ToLong(ip), shiftPow) ===
      call_function("div", net, shiftPow)
  }

  /** cidrs_contain_ip over a JSON array of CIDR strings: true if ANY
    * contains the ip (the reference takes the CIDR list as an init arg;
    * here it's data-driven).
    */
  def cidrsContainIp(cidrsJson: Column, ip: Column): Column =
    exists(from_json(cidrsJson, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
      cidr => cidrContainsIp(cidr, ip))

  /** Identical CIDR math as DuckDB SQL over one cidr/ip expression pair. */
  def cidrContainsIpSql(cidr: String, ip: String): String = {
    def ip2long(e: String) =
      s"(CAST(split_part($e,'.',1) AS BIGINT)*16777216 + CAST(split_part($e,'.',2) AS BIGINT)*65536 + " +
        s"CAST(split_part($e,'.',3) AS BIGINT)*256 + CAST(split_part($e,'.',4) AS BIGINT))"
    val net = ip2long(s"split_part($cidr,'/',1)")
    val m = s"CAST(split_part($cidr,'/',2) AS INT)"
    val p = s"CAST(power(2, 32 - $m) AS BIGINT)"
    s"(${ip2long(ip)} // $p = $net // $p)"
  }

  /** Deterministic fake resolver (see scaladoc): stable per-name address
    * in 203.0.113.0/24 (TEST-NET-3), "" for null — NOT a real lookup.
    * md5-derived so any SQL engine reproduces it
    * (`('0x' || substr(md5(x),1,6))::BIGINT % 256` in DuckDB).
    */
  def nslookupStub(name: Column): Column =
    when(name.isNull, lit(""))
      .otherwise(concat(lit("203.0.113."),
        pmod(conv(substring(md5(name), 1, 6), 16, 10).cast("long"), lit(256))))

  /** The DuckDB rendering of [[nslookupStub]] for oracle dual-emission. */
  def nslookupStubSql(x: String): String =
    s"'203.0.113.' || (('0x' || substr(md5($x),1,6))::BIGINT % 256)"

  private val nslookupRealUdf = udf((name: String) =>
    if (name == null) null
    else
      try java.net.InetAddress.getByName(name).getHostAddress
      catch { case _: Exception => "" })

  /** nslookup (net_ops.cc NSLookupUDF): blocking getaddrinfo on the
    * executing node — the reference's exact behavior, including "" on
    * resolution failure. A UDF by necessity (an OS call, like the
    * reference's ScalarUDF). Dispatch: SPARK_GRAFT_NSLOOKUP=real picks
    * this; the default stays the deterministic [[nslookupStub]] so gate
    * results are engine-reproducible — real DNS answers vary by
    * resolver/cluster, which is the one reason the stub exists.
    */
  def nslookup(name: Column,
      mode: Option[String] = sys.env.get("SPARK_GRAFT_NSLOOKUP")): Column =
    mode match {
      case Some("real") => nslookupRealUdf(name)
      case _ => nslookupStub(name)
    }
}
