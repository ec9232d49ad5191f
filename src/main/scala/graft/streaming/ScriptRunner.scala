package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** The query broker's cron-script service (reference:
  * src/vizier/services/query_broker/script_runner/ — cron scripts
  * repeatedly compile+run a PxL script and export results, e.g. to OTel
  * plugins). Spark-native shape: each script is a DataFrame builder run on
  * a schedule; the result goes to a pluggable sink (OTel exporter, table
  * append, ...). Scheduling is driver-side (cheap); the query itself runs
  * distributed as usual — at scale this is exactly a workflow of repeated
  * batch jobs over a shared SparkSession, which is how Spark shops run
  * micro-batch exports.
  */
object ScriptRunner {

  final case class CronScript(
      name: String,
      intervalMillis: Long,
      build: SparkSession => DataFrame,
      sink: DataFrame => Unit)

  final class Handle(pool: ScheduledExecutorService, val runs: AtomicLong) {
    def stop(): Unit = pool.shutdownNow()
  }

  /** One synchronous round of every script — the unit the scheduler
    * repeats, exposed for deterministic testing and manual runs.
    */
  def runOnce(spark: SparkSession, scripts: Seq[CronScript]): Unit =
    scripts.foreach(s => s.sink(s.build(spark)))

  /** Start the schedule; each script fires on its own interval. */
  def start(spark: SparkSession, scripts: Seq[CronScript]): Handle = {
    val pool = Executors.newScheduledThreadPool(1, r => {
      val t = new Thread(r, "graft-script-runner"); t.setDaemon(true); t
    })
    val runs = new AtomicLong()
    scripts.foreach { s =>
      pool.scheduleAtFixedRate(
        () => { s.sink(s.build(spark)); runs.incrementAndGet(); () },
        s.intervalMillis, s.intervalMillis, TimeUnit.MILLISECONDS)
    }
    new Handle(pool, runs)
  }
}
