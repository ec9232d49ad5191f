package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** normalize_pgsql / normalize_mysql (reference:
  * src/carnot/funcs/builtins/sql_ops.h + sql_parsing/normalization.h —
  * ANTLR-based there; a linear literal scanner here, same contract):
  * extract string/numeric literals from a SQL statement, substitute
  * dialect placeholders ($1,$2,… for postgres; ? for mysql), and return
  * JSON `{"query": <normalized>, "params": [<literal text verbatim>]}`.
  *
  * A scanner is genuinely stateful (quote contexts, '' escapes), so this
  * is one of the few Scala UDFs in the engine — it's never on a
  * wide-scan hot path (applied to protocol-event query strings).
  */
object SqlNormalize {

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Linear scan: emits (normalized_sql, literals). Handles single-quoted
    * strings with '' escapes and optional E prefix, and numeric literals
    * not embedded in identifiers. Existing placeholders ($N, ?, @name)
    * pass through untouched.
    */
  private[graft] def scan(sql: String, placeholder: Int => String): (String, Seq[String]) = {
    val out = new StringBuilder
    val params = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = sql.length
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '$' || c == '@'
    while (i < n) {
      val c = sql.charAt(i)
      val ePrefix = (c == 'E' || c == 'e') && i + 1 < n && sql.charAt(i + 1) == '\'' &&
        (i == 0 || !isIdent(sql.charAt(i - 1)))
      if (c == '\'' || ePrefix) {
        val start = i
        i += (if (ePrefix) 2 else 1)
        var closed = false
        while (i < n && !closed) {
          if (sql.charAt(i) == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') i += 2 // '' escape
            else { closed = true; i += 1 }
          } else i += 1
        }
        params += sql.substring(start, i)
        out.append(placeholder(params.size))
      } else if (c.isDigit && (i == 0 || !isIdent(sql.charAt(i - 1)))) {
        val start = i
        while (i < n && (sql.charAt(i).isDigit || sql.charAt(i) == '.')) i += 1
        params += sql.substring(start, i)
        out.append(placeholder(params.size))
      } else {
        out.append(c)
        i += 1
      }
    }
    (out.toString, params.toSeq)
  }

  private def toJson(query: String, params: Seq[String]): String = {
    val ps = params.map(p => "\"" + jsonEscape(p) + "\"").mkString(",")
    s"""{"query":"${jsonEscape(query)}","params":[$ps]}"""
  }

  private val normalizePgsqlFn = udf { (sql: String) =>
    if (sql == null) null
    else { val (q, ps) = scan(sql, i => "$" + i); toJson(q, ps) }
  }

  private val normalizeMysqlFn = udf { (sql: String) =>
    if (sql == null) null
    else { val (q, ps) = scan(sql, _ => "?"); toJson(q, ps) }
  }

  /** Postgres dialect: $1, $2, … indexed placeholders. */
  def normalizePgsql(sql: Column): Column = normalizePgsqlFn(sql)

  /** MySQL dialect: generic `?` placeholders. */
  def normalizeMysql(sql: Column): Column = normalizeMysqlFn(sql)
}
