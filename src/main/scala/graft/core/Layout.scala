package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB storage layouts behind the `Tables` catalog. The fixture
  * tables are single parquet files; at scale the same queries run over
  * these layouts unchanged because all access goes through the catalog:
  *
  * - time-partitioned parquet (dt=YYYY-MM-DD dirs): time-range scans
  *   become partition pruning (the MemorySource [start,stop] analog);
  * - bucketed tables on hot join keys: co-located joins with no exchange
  *   (the pre-shuffle the reference's per-agent data locality gives it
  *   for free, recreated deliberately).
  */
object Layout {

  /** Swap a fully-written staging directory into a live path with two
    * renames (live → live__old, staging → live) and delete the old
    * root — the shared cutover primitive for every compaction-class
    * rewrite ([[graft.ops.SemIndex.compact]]/refit, the state
    * compactors): no instant leaves half-written DATA at the live
    * path (each state is a complete old or new artifact), and a
    * reader that already resolved its file list keeps its inodes
    * through the rename. The instant between the renames has no
    * directory at the live path — metadata-sized; these operations
    * run in the maintenance slot.
    *
    * SELF-RECOVERING from its own torn swap: a crash between the two
    * renames leaves live absent, the pre-swap copy parked at __old and
    * staging intact. A retry detects the missing live path, skips the
    * park, promotes staging directly, and only THEN drops __old — so
    * the sole committed pre-swap copy is never deleted before the new
    * data is in place (the one state this primitive may not create is
    * "neither old nor new anywhere"). A leftover __old NEXT TO a live
    * path is the opposite case — that swap's promote committed and
    * only its cleanup died — and is safe to drop before parking.
    */
  /** Repair a torn [[swapInto]] BEFORE a compaction-class caller
    * re-reads the live path: the natural replay of a compactor starts
    * with `spark.read.parquet(live)`, which throws path-not-found
    * while live is parked at `__old` — so every such caller opens
    * with this check instead of requiring manual intervention. Three
    * cases, in the only safe order:
    *
    *  - live present → nothing to heal (a leftover staging/__old is
    *    stale and swapInto's own dead-cleanup handles it);
    *  - live absent, staging present → the crash hit between the two
    *    renames and staging is the COMPLETE new artifact (swapInto
    *    parks only after requiring staging exists): finish the swap;
    *  - live absent, only __old present → the staging copy is gone
    *    (or was never complete enough to promote): restore the parked
    *    pre-swap copy — content-identical for compaction-class
    *    rewrites, so the retry simply re-stages from it.
    */
  def healTorn(spark: SparkSession, live: String,
               staging: String = ""): Unit = {
    val stg = if (staging.isEmpty) live + "__staging" else staging
    val conf = spark.sparkContext.hadoopConfiguration
    val liveP = new org.apache.hadoop.fs.Path(live)
    val fs = liveP.getFileSystem(conf)
    if (!fs.exists(liveP)) {
      val stagingP = new org.apache.hadoop.fs.Path(stg)
      val oldP = new org.apache.hadoop.fs.Path(live + "__old")
      if (fs.exists(stagingP)) swapInto(spark, stg, live)
      else if (fs.exists(oldP))
        require(fs.rename(oldP, liveP),
          s"healTorn: restore $live from __old")
    }
  }

  /** Part-file count of a parquet directory — the calendars'
    * compaction-slot non-vacuity witness (fragmented before, settled
    * to the target after).
    */
  def partFiles(spark: SparkSession, path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).count(_.getPath.getName.startsWith("part-"))
  }

  def swapInto(spark: SparkSession, staging: String, live: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val liveP = new org.apache.hadoop.fs.Path(live)
    val fs = liveP.getFileSystem(conf)
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val oldP = new org.apache.hadoop.fs.Path(live + "__old")
    require(fs.exists(stagingP), s"swapInto: staging $staging missing")
    if (fs.exists(liveP)) {
      if (fs.exists(oldP)) { fs.delete(oldP, true): Unit } // dead cleanup
      require(fs.rename(liveP, oldP), s"swapInto: park $live")
    } // else: resuming a torn swap — live already parked at __old
    require(fs.rename(stagingP, liveP),
      s"swapInto: promote $staging -> $live")
    if (fs.exists(oldP)) { fs.delete(oldP, true): Unit }
  }

  /** Write time-partitioned by UTC date derived from the epoch-ns column. */
  def writeTimePartitioned(df: DataFrame, tsNsCol: String, path: String): Unit =
    df.withColumn("dt",
        date_format(timestamp_micros(
          graft.functions.PixieFunctions.nsToUs(col(tsNsCol))), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(path)

  def readTimePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Register a bucketed+sorted table on a join key; joins between tables
    * bucketed the same way need no shuffle and no sort.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Persist an ANN index (IVF or IVFADC) partitioned BY CELL — the
    * deployment layout behind [[graft.ops.Similarity.ivfPqTopK]]'s
    * scale contract: a query probing nProbe cells reads nProbe/nCells
    * of the index via partition pruning (assert PartitionFilters in
    * the scan), and cell assignment is amortized to write time instead
    * of being recomputed per query. `index` is any frame carrying a
    * `cell` column (e.g. [[graft.ops.Similarity.l2Residuals]] output
    * encoded to codes).
    */
  def writeCellPartitioned(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").partitionBy("cell").parquet(path)

  def readCellPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist a curated training corpus partitioned BY SHARD (the
    * [[graft.ops.Corpus.shardAssign]] / `curriculumShards` layout): a
    * trainer pulling shard k reads 1/nShards of the corpus via
    * partition pruning, and the write is the only global pass — the
    * hand-off point between the curation pipeline and the training
    * job. `curated` must carry a `shard` column.
    */
  def writeShardPartitioned(curated: DataFrame, path: String): Unit =
    curated.write.mode("overwrite").partitionBy("shard").parquet(path)

  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    spark.read.parquet(path).where(col("shard") === shard)

  /** Shard manifest — the reproducibility handshake between curation
    * and training: per shard, doc/token mass, the id range, and an
    * ORDER-INDEPENDENT content checksum: bit_xor of the repo's shared
    * 60-bit hash over `id ':' content`, a commutative fold, so the
    * same shard produces the same checksum at any partitioning, task
    * order, or engine — and a corrupted/substituted payload under an
    * unchanged id DOES flip it (an id-only checksum would wave
    * corrupted content through). A doc duplicated an even number of
    * times xor-cancels, but duplication always moves `n_docs`, which
    * travels in the same row. A trainer re-derives the row from the
    * files it actually read and refuses a mismatch. One keyed agg,
    * O(#shards) output.
    */
  /** Schema-evolution report over a parquet directory whose file
    * batches were written under DIFFERENT schemas (the daily-drop
    * reality of a long-lived lake table): one row per merged column
    * with its type, how many of the files carry it, and the non-null
    * row mass it actually holds under a `mergeSchema` read (absent-
    * in-file columns read as null).
    *
    * Footer reads run EXECUTOR-SIDE (one `mapPartitions` over the
    * file list, raw parquet-hadoop footer open — name extraction
    * only), so the report's cost is one distributed pass over footers
    * plus ONE distributed merged scan for the row mass — never
    * O(files) sequential driver round-trips (the r10 verdict scale
    * item: at daily-ingest cadence the flat dir holds tens of
    * thousands of files). Per-column dtype comes from the MERGED
    * schema — the type a reader actually sees; per-file physical
    * types that merge cleanly (e.g. widened ints) report as the
    * merged type.
    */
  def schemaEvolutionReport(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    // the PATH's own filesystem, not the default FS (object-store
    // tables on a cluster whose fs.defaultFS differs)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // flat-directory contract: file batches land as top-level
    // part files (the ingest layout this audits); a PARTITIONED
    // layout is a different, self-describing schema story
    val files = fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty,
      s"schemaEvolutionReport: no top-level parquet files under $path")
    val nFiles = files.length.toLong
    // hadoop conf travels to executors via the Writable wrapper (the
    // path's FS credentials/settings, not executor defaults)
    val confW = new org.apache.spark.SerializableWritable(
      spark.sparkContext.hadoopConfiguration)
    val presentCounts: Map[String, Long] = spark
      .createDataset(files.toSeq)
      .repartition(math.min(files.length, 32))
      .mapPartitions { it =>
        val c = confW.value
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new org.apache.hadoop.fs.Path(f), c)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            import scala.jdk.CollectionConverters._
            r.getFileMetaData.getSchema.getFields.asScala
              .map(_.getName).toList
          } finally r.close()
        }
      }
      .groupBy(col("value")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap // model-sized: one row per column NAME
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    // coalesce: a zero-row (schema-only) directory must report 0,
    // not NPE on the null sum
    val counts = merged.select(merged.columns.map(c =>
        coalesce(sum(when(col(c).isNotNull, 1L).otherwise(0L)), lit(0L))
          .as(c)): _*)
      .head()
    merged.schema.fields.toSeq.map { fd =>
      (fd.name, fd.dataType.simpleString, nFiles,
        presentCounts.getOrElse(fd.name, 0L),
        counts.getAs[Long](fd.name))
    }.toDF("column", "dtype", "n_files", "n_files_present",
      "n_rows_nonnull")
  }

  def shardManifest(df: DataFrame, shardCol: String, idCol: String,
                    tokenCol: String, contentCol: String): DataFrame =
    df.select(col(shardCol).as("shard"), col(idCol).as("__id"),
        col(tokenCol).cast("long").as("__tok"),
        graft.ops.Dedup.h60(concat(col(idCol).cast("string"), lit(":"),
          col(contentCol).cast("string"))).as("__h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        min(col("__id")).as("min_id"), max(col("__id")).as("max_id"),
        expr("bit_xor(__h)").as("checksum"))

  /** DATASET DIFF between two [[shardManifest]] epochs — what a data
    * steward reviews after any mutating day (admission, retraction,
    * compaction): per shard, the doc/token deltas and whether the
    * content checksum moved. Pure model-sized arithmetic over the two
    * manifests (never a corpus scan — the whole point of keeping
    * manifests); `status` classifies each shard as unchanged /
    * changed / new / gone, where `unchanged` asserts the CHECKSUM
    * matched, not just the counts (substituted content under equal
    * counts still reads `changed`).
    */
  def manifestDiff(before: DataFrame, after: DataFrame): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      df.select(col("shard"), col("n_docs").as(s"docs_$sfx"),
        col("n_tokens").as(s"tokens_$sfx"),
        col("checksum").as(s"__ck_$sfx"))
    side(before, "before").join(side(after, "after"), Seq("shard"), "full")
      .select(col("shard"),
        coalesce(col("docs_before"), lit(0L)).as("docs_before"),
        coalesce(col("docs_after"), lit(0L)).as("docs_after"),
        (coalesce(col("docs_after"), lit(0L))
          - coalesce(col("docs_before"), lit(0L))).as("docs_delta"),
        (coalesce(col("tokens_after"), lit(0L))
          - coalesce(col("tokens_before"), lit(0L))).as("tokens_delta"),
        when(col("__ck_before").isNull, lit("new"))
          .when(col("__ck_after").isNull, lit("gone"))
          .when(col("__ck_before") === col("__ck_after"),
            lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }
}
