package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-cut dispatch for iterative operators (CC, k-core, staged
  * dedup): `localCheckpoint` by default — executor-local blocks,
  * correct and fast in one JVM — and the RELIABLE `checkpoint()`
  * (against `spark.sparkContext.setCheckpointDir`) when the cluster
  * swap is enabled, so the README's "one-line swap at each call
  * site" claim is a single tested switch instead of a promise.
  *
  * Enable with system property `graft.reliableCkpt=1` (what
  * `CkptSwapSpec` flips in-process) or env `SPARK_GRAFT_RELIABLE_
  * CKPT=1` (a whole gate/bench run). With the swap on but no
  * checkpoint dir configured Spark fails loudly — the right behavior
  * for an explicit opt-in.
  */
object Ckpt {
  def reliable: Boolean =
    sys.props.get("graft.reliableCkpt")
      .orElse(sys.env.get("SPARK_GRAFT_RELIABLE_CKPT"))
      .exists(v => v == "1" || v == "true")

  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
}
