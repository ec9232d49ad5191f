package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** redact_pii_best_effort (reference: src/carnot/funcs/builtins/pii_ops.h
  * RedactPIIUDF — a regex battery tagging IPv4/IPv6/email/MAC/CC/IMEI/
  * IBAN/SSN and substituting `<REDACTED_$TYPE>`). Re-expressed as a chain
  * of codegen'd regexp_replace expressions.
  *
  * The rule list is declared once and emitted both as Spark Columns and
  * as DuckDB SQL (which needs the 'g' flag for replace-all), keeping the
  * engine and its oracle in lockstep. Patterns stay in the Java-regex ∩
  * RE2 common subset (no lookaround, no backrefs).
  */
object PiiOps {

  /** (pattern, replacement) applied in order — later rules see earlier
    * redactions, like the reference's sequential tagger.
    */
  val rules: Seq[(String, String)] = Seq(
    // email before host-ish patterns so user@host isn't split.
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<REDACTED_EMAIL>"),
    // MAC before IPv6 (both are colon-separated hex).
    ("\\b([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\\b", "<REDACTED_MAC_ADDR>"),
    // IPv6: full form or :: compressed (best-effort, like the reference).
    ("\\b([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\\b", "<REDACTED_IPV6>"),
    ("\\b([0-9A-Fa-f]{1,4}:){1,6}:([0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){0,5})?\\b",
      "<REDACTED_IPV6>"),
    ("\\b(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}\\b",
      "<REDACTED_IPV4>"),
    // SSN (dashed) before CC/IMEI digit runs.
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<REDACTED_SSN>"),
    // 16-digit (possibly space/dash grouped) card numbers.
    ("\\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\\b", "<REDACTED_CC_NUMBER>"),
    ("\\b[0-9]{16}\\b", "<REDACTED_CC_NUMBER>"),
    ("\\b[0-9]{15}\\b", "<REDACTED_IMEI>"),
    ("\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{12,30}\\b", "<REDACTED_IBAN>"))

  /** Adjacent rules with the same replacement fuse into one alternation
    * pass (leftmost-first in both Java regex and RE2): each pass is a
    * full scan + string rebuild, so 10 rules -> 8 passes is a direct
    * per-row win. Both engines run the same fused list.
    */
  val passes: Seq[(String, String)] =
    rules.foldLeft(Vector.empty[(String, String)]) {
      case (acc, (p, r)) if acc.nonEmpty && acc.last._2 == r =>
        acc.init :+ ((acc.last._1 + "|" + p, r))
      case (acc, pr) => acc :+ pr
    }

  def redactPii(c: Column): Column =
    passes.foldLeft(c) { case (acc, (pat, repl)) => regexp_replace(acc, pat, repl) }

  /** The identical chain as DuckDB SQL (RE2; 'g' = replace all). DuckDB
    * single-quoted literals are escape-free, so backslashes pass verbatim.
    */
  def redactPiiSql(expr: String): String =
    passes.foldLeft(expr) { case (acc, (pat, repl)) =>
      s"regexp_replace($acc, '${pat.replace("'", "''")}', '$repl', 'g')"
    }
}
