package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point for the library's custom Catalyst
  * surface — the standard deployment hook
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`) that
  * makes the native expressions callable from SQL and installs the
  * [[NsEpochPushdown]] optimizer rule without touching application
  * code. The DataFrame API path ([[graft.core.Tables]]) registers the
  * rule lazily on first table resolve; this class is the cluster-wide
  * equivalent for SQL-first users and Thrift/Connect servers.
  *
  * [[GraftFunctions.register]] applies the same function list to an
  * ALREADY-RUNNING session (extensions only apply at session build) —
  * one definition of the registry, two installation paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NsEpochPushdown)
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
      usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      require(exprs.length == n, s"$name expects $n arguments, " +
        s"got ${exprs.length}")
      f(exprs)
    }

  /** The SQL-callable registry of the library's native expressions —
    * one list consumed by both [[GraftExtensions]] (session build) and
    * [[register]] (runtime).
    */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("nfc_normalize",
      info("nfc_normalize", "_FUNC_(str) - Unicode NFC normalization."),
      arity("nfc_normalize", 1)(e =>
        graft.expressions.NfcNormalize(e.head))),
    ("md5_long60",
      info("md5_long60",
        "_FUNC_(bin) - first 60 bits of md5 as a long (cross-engine hash)."),
      arity("md5_long60", 1)(e => graft.expressions.Md5Long60(e.head))),
    ("jaro_winkler",
      info("jaro_winkler",
        "_FUNC_(a, b) - Jaro-Winkler similarity over UTF-8 bytes."),
      arity("jaro_winkler", 2)(e =>
        graft.expressions.JaroWinkler(e.head, e(1)))),
    ("damerau_levenshtein",
      info("damerau_levenshtein",
        "_FUNC_(a, b) - full Damerau-Levenshtein distance over UTF-8 bytes."),
      arity("damerau_levenshtein", 2)(e =>
        graft.expressions.DamerauLevenshtein(e.head, e(1)))),
    ("levenshtein_bytes",
      info("levenshtein_bytes",
        "_FUNC_(a, b) - Levenshtein distance over UTF-8 bytes " +
          "(Spark's builtin counts code points; DuckDB counts bytes)."),
      arity("levenshtein_bytes", 2)(e =>
        graft.expressions.ByteLevenshtein(e.head, e(1)))))

  /** Runtime registration on a live session (the extensions class only
    * applies at session construction).
    */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
