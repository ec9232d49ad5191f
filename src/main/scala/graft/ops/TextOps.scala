package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §7.9):
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. Pure codegen'd expressions — no UDFs — so they stream
  * through WholeStageCodegen at any scale.
  */
object TextOps {

  /** Marker-word tables for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "de", "que", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  private def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, w => w.isin(markers: _*)))

  /** Language-ID: marker-word votes with a deterministic priority
    * tie-break (en > de > es > fr); 'unknown' when no markers hit.
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val scored = langMarkers.foldLeft(df) { case (d, (lang, ms)) =>
      d.withColumn(s"score_$lang", markerCount(w, ms).cast("long"))
    }
    val total = langMarkers.map { case (l, _) => col(s"score_$l") }.reduce(_ + _)
    val best = langMarkers.map { case (l, _) => (l, col(s"score_$l")) }
    val pred = when(total === 0, lit("unknown")).otherwise(
      best.foldRight(lit("unknown")) { case ((lang, s), els) =>
        when(best.filter(_._1 != lang).map(o => s >= o._2).reduce(_ && _), lit(lang))
          .otherwise(els)
      })
    scored.withColumn("lang_pred", pred)
  }

  /** Quality features + composite score (length, lexical diversity,
    * stopword load) — the shape of the reference-free quality filters
    * used in large corpus cleaning.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val w = split(col(textCol), " ")
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    df.withColumn("n_words", size(w).cast("long"))
      .withColumn("n_distinct_words", size(array_distinct(w)).cast("long"))
      .withColumn("avg_word_len",
        (length(col(textCol)) - size(w) + 1).cast("double") / size(w))
      .withColumn("stop_ratio",
        markerCount(w, stop).cast("double") / size(w))
      .withColumn("distinct_ratio",
        size(array_distinct(w)).cast("double") / size(w))
      .withColumn("quality_score",
        least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.4
          + col("distinct_ratio") * 0.3
          + (lit(1.0) - col("stop_ratio")) * 0.3)
  }

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single punctuation).
    */
  val tokenPattern = "[a-z]+|[0-9]+|[^a-z0-9 ]"
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), " ")).cast("long"))
      .withColumn("re_tokens",
        size(regexp_extract_all(col(textCol), lit(tokenPattern), lit(0))).cast("long"))

  /** Set fingerprint: XOR + bounded-sum of distinct-word hashes —
    * order-independent, exact in any engine, mergeable.
    */
  def fingerprint(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = df.select(col(idCol),
        explode(array_distinct(split(col(textCol), " "))).as("w"))
      .withColumn("h", pmod(Dedup.h60(col("w")), lit(Dedup.P)))
    words.groupBy(col(idCol)).agg(
      expr("bit_xor(h)").as("xor_fp"),
      sum(col("h")).as("sum_fp"),
      count(lit(1)).as("n_distinct_words"))
  }
}
