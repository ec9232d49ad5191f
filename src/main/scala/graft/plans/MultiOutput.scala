package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cross-sink common-subplan reuse (reference: MergeNodesRule,
  * src/carnot/planner/compiler/optimizer/merge_nodes_rule.h — identical
  * sources/operators feeding a script's multiple `px.display` outputs are
  * fused so shared scans compute once).
  *
  * Catalyst does not CSE across separate actions, so the Spark-native
  * policy is explicit: a multi-output script declares its shared prefixes;
  * the runner persists them for the duration of the script, materializes
  * every output, then releases. At 100 TB the shared prefix is typically a
  * filtered, binned scan that is orders of magnitude smaller than the
  * input — exactly the thing worth caching once instead of rescanning per
  * sink. (Within ONE action, Spark's ReuseExchange/ReuseSubquery already
  * dedupe identical exchanges — this handles the across-actions case.)
  */
object MultiOutput {

  final case class Script(
      name: String,
      shared: Seq[DataFrame],
      outputs: Map[String, DataFrame])

  /** Materialize every output with the shared prefixes cached once.
    * `sink` receives each (outputName, result). Caching level spills to
    * disk rather than recomputing — the faithful analog of the
    * reference's merged-plan semantics (each shared node computed once).
    */
  def run(script: Script)(sink: (String, DataFrame) => Unit): Unit = {
    script.shared.foreach(_.persist(StorageLevel.MEMORY_AND_DISK))
    try script.outputs.toSeq.sortBy(_._1).foreach { case (n, df) => sink(n, df) }
    finally script.shared.foreach(_.unpersist(blocking = false))
  }
}
