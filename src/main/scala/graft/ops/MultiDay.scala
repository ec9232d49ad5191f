package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MULTIMODAL admission day — the three persisted near-dup
  * indexes ([[Dedup.writeDedupIndex]] lexical, [[SemIndex]] semantic,
  * [[PhashIndex]] perceptual) composed into ONE incremental day: a
  * delta document is admitted only when ALL THREE stages clear it,
  * and only overall-admitted documents append to ANY index, so the
  * three artifacts stay consistent views of one admitted corpus. The
  * verdict priority is fixed and re-derivable: a lexical verdict
  * (exact/batch/near) wins over a semantic one, semantic over
  * perceptual — the cheap-to-explain "first failing stage" rule.
  *
  * Replay contract: the COMBINED decisions pin before any index
  * mutation (the [[CurationNDay.processDayBody]] rule — naive
  * recomputation would self-collide with the day's own appends in
  * all three indexes at once), every append is anti-joined. 100 TB
  * shape: each stage keeps its own documented delta-proportional
  * cost; the composition adds only model-per-doc joins of the three
  * verdict frames.
  */
object MultiDay {

  case class Paths(root: String) {
    def lex: String = s"$root/lex_index"
    def sem: SemIndex.Paths = SemIndex.Paths(s"$root/sem")
    def ph: PhashIndex.Paths = PhashIndex.Paths(s"$root/ph")
    def decisionsDay(k: Int): String = s"$root/multi_decisions_day$k.parquet"
  }

  val NGram = 3; val K = 16; val Bands = 4; val Threshold = 0.8

  /** Build all three snapshot indexes from the same id space. */
  def bootstrap(spark: SparkSession, docs: DataFrame, vecs: DataFrame,
                hashed: DataFrame, p: Paths): Unit = {
    Dedup.writeDedupIndex(docs, "text", "doc_id", p.lex, NGram, K, Bands)
    SemIndex.bootstrap(spark, vecs, p.sem)
    PhashIndex.write(spark, hashed, p.ph)
  }

  /** One composed day: three stage verdicts joined on the shared id,
    * combined by stage priority, pinned, then the overall-admitted
    * set appended to all three indexes. `corpusFetch` is the lexical
    * candidate-verify text service (id-pruned read).
    */
  def processDay(spark: SparkSession, p: Paths, k: Int,
                 docs: DataFrame, vecs: DataFrame, hashed: DataFrame,
                 corpusFetch: DataFrame): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(p.decisionsDay(k))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pinned = fs.exists(new org.apache.hadoop.fs.Path(
      p.decisionsDay(k) + "/_SUCCESS"))
    val dec =
      if (pinned)
        spark.read.parquet(p.decisionsDay(k)).localCheckpoint(true)
      else {
        val lex = Dedup.incrementalDedupIndexed(p.lex, corpusFetch,
            docs, "text", "doc_id", NGram, K, Bands, Threshold)
          .withColumnRenamed("decision", "__lex")
        val sem = SemIndex.decisions(spark, p.sem, vecs)
          .select(col("vec_id").as("doc_id"),
            col("decision").as("__sem"))
        val ph = PhashIndex.decisions(spark, p.ph, hashed)
          .select(col("media_id").as("doc_id"),
            col("decision").as("__ph"))
        val d = lex.join(sem, "doc_id").join(ph, "doc_id")
          .select(col("doc_id"),
            when(col("__lex") =!= "admitted", col("__lex"))
              .when(col("__sem") =!= "admitted", col("__sem"))
              .when(col("__ph") =!= "admitted", col("__ph"))
              .otherwise(lit("admitted")).as("decision"))
          .localCheckpoint(true)
        d.write.mode("overwrite").parquet(p.decisionsDay(k))
        d
      }
    val admIds = dec.where(col("decision") === "admitted")
      .select("doc_id").localCheckpoint(true)
    Dedup.appendDedupIndex(docs.join(admIds, "doc_id"), "text",
      "doc_id", p.lex, NGram, K, Bands)
    SemIndex.append(spark, p.sem,
      vecs.join(admIds.withColumnRenamed("doc_id", "vec_id"), "vec_id"))
    PhashIndex.append(spark, p.ph,
      hashed.join(admIds.withColumnRenamed("doc_id", "media_id"),
        "media_id"))
    dec
  }

  /** The three indexes' one-line cards as one long frame — the
    * consistency view q541 gates: all three must describe the SAME
    * admitted corpus.
    */
  def indexCards(spark: SparkSession, p: Paths): DataFrame = {
    def row(m: String, met: String, src: DataFrame): DataFrame =
      src.agg(count(lit(1)).cast("long").as("value"))
        .select(lit(m).as("modality"), lit(met).as("metric"),
          col("value"))
    row("lexical", "n_hashes",
        spark.read.parquet(s"${p.lex}/hashes.parquet"))
      .unionByName(row("lexical", "n_band_rows",
        spark.read.parquet(s"${p.lex}/bands.parquet").distinct()))
      .unionByName(row("semantic", "n_vecs",
        spark.read.parquet(p.sem.index)))
      .unionByName(row("perceptual", "n_hashes",
        spark.read.parquet(p.ph.hashes)))
      .unionByName(row("perceptual", "n_band_rows",
        spark.read.parquet(p.ph.bands).distinct()))
  }
}
