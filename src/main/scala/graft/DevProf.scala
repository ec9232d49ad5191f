package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: args = [queryName, sfDir, reps].
  * Splits a gate query's cost into build (plan construction through the
  * runner) and exec (noop write), mirroring Bench's measurement.
  */
object DevProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.all.foreach(t => graft.core.Tables(spark, dir, t).count())
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    if (name == "bpetrain") {
      // dump a merge table (Scala literal) trained on dir's documents —
      // used to (re)generate MlScalars.sentencePieceMerges
      val docs = graft.core.Tables(spark, dir, "documents")
      val merges = graft.ops.TextOps.bpeTrain(docs, "text", reps,
        wordPrefix = "▁")
      Files.writeString(Paths.get("/tmp/bpe_model.txt"),
        merges.map { case (a, b) => s""""$a" -> "$b"""" }
          .grouped(4).map(_.mkString(", ")).mkString("    ", ",\n    ", "\n"))
    } else {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        val df = t(s"build#$i") { fn(spark, dir) }
        t(s"exec#$i") { df.write.format("noop").mode("overwrite").save() }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
