package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** uri_parse / uri_recompose (reference:
  * src/carnot/funcs/builtins/uri_ops.h). Implemented as pure Catalyst
  * expressions (regexp_extract / concat) so URI handling stays inside
  * WholeStageCodegen — no UDF on the hot path.
  *
  * Output contract mirrors the reference's uriparser-based JSON: keys
  * scheme, userInfo, host, port (int), path, query, fragment, each
  * omitted when the component is absent; `path` is the joined segment
  * list, i.e. WITHOUT the leading '/'. Valid URIs cannot contain raw
  * quote/backslash characters (they must be %-encoded), so values are
  * embedded without further JSON escaping.
  */
object UriOps {

  private def extract(uri: Column, pattern: String): Column =
    regexp_extract(uri, pattern, 1)

  def scheme(uri: Column): Column = extract(uri, "^([^:/?#]+):")
  private def authority(uri: Column): Column = extract(uri, "^[^:/?#]+://([^/?#]*)")
  def userInfo(uri: Column): Column = regexp_extract(authority(uri), "^([^@]*)@", 1)
  def host(uri: Column): Column =
    regexp_extract(authority(uri), "^(?:[^@]*@)?([^:]*)", 1)
  def port(uri: Column): Column = regexp_extract(authority(uri), ":([0-9]+)$", 1)
  /** Path without the leading slash (uriparser segment-join semantics). */
  def path(uri: Column): Column = extract(uri, "^[^:/?#]+://[^/?#]*/([^?#]*)")
  def query(uri: Column): Column = extract(uri, "\\?([^#]*)")
  def fragment(uri: Column): Column = extract(uri, "#(.*)$")

  /** JSON component object, keys omitted when absent (WriteKeyVal). */
  def uriParse(uri: Column): Column = {
    def kv(key: String, v: Column, quoted: Boolean = true): Column = {
      val payload =
        if (quoted) concat(lit("\"" + key + "\":\""), v, lit("\""))
        else concat(lit("\"" + key + "\":"), v)
      when(v =!= "", payload).otherwise(lit(null))
    }
    val parts = array(
      kv("scheme", scheme(uri)),
      kv("userInfo", userInfo(uri)),
      kv("host", host(uri)),
      kv("port", port(uri), quoted = false),
      kv("path", path(uri)),
      when(uri.contains("?"), concat(lit("\"query\":\""), query(uri), lit("\"")))
        .otherwise(lit(null)),
      kv("fragment", fragment(uri)))
    // 2-arg array_join drops null elements (absent components).
    concat(lit("{"), array_join(parts, ","), lit("}"))
  }

  /** scheme://[userInfo@]host[:port]/path[?query][#fragment]; port<0 is
    * an error, port==0 means absent — matching URIRecomposeUDF.
    */
  def uriRecompose(scheme: Column, userInfo: Column, host: Column, port: Column,
                   path: Column, query: Column, fragment: Column): Column = {
    val composed = concat(
      scheme, lit("://"),
      when(userInfo =!= "", concat(userInfo, lit("@"))).otherwise(lit("")),
      host,
      when(port =!= 0, concat(lit(":"), port.cast("string"))).otherwise(lit("")),
      lit("/"), path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")),
      when(fragment =!= "", concat(lit("#"), fragment)).otherwise(lit("")))
    when(port < 0, lit("Failed to recompose URI")).otherwise(composed)
  }
}
