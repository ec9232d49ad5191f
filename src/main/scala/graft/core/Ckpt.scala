package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage-cut dispatch for iterative operators (CC, k-core, staged
  * dedup): `localCheckpoint` by default — executor-local blocks,
  * correct and fast in one JVM — and the RELIABLE `checkpoint()`
  * (against `spark.sparkContext.setCheckpointDir`) when the cluster
  * swap is enabled, so the README's "one-line swap at each call
  * site" claim is a single tested switch instead of a promise.
  *
  * Three enablement scopes, most-specific wins:
  *  1. [[withReliable]] — a LEXICALLY SCOPED, thread-local switch for
  *     one operator invocation (what the q501 gate row uses). Nothing
  *     process-global is written, so a parallel query runner cannot
  *     race it (the r10 verdict hygiene item).
  *  2. system property `graft.reliableCkpt=1` (what `CkptSwapSpec`
  *     flips in-process).
  *  3. env `SPARK_GRAFT_RELIABLE_CKPT=1` (a whole gate/bench run).
  *
  * With the swap on but no checkpoint dir configured Spark fails
  * loudly — the right behavior for an explicit opt-in.
  */
object Ckpt {
  /** Thread-local override; None = fall through to prop/env. Driver-side
    * plan construction (where every Ckpt call site runs) stays on the
    * calling thread, so a DynamicVariable scopes exactly one query.
    */
  private val scoped = new scala.util.DynamicVariable[Option[Boolean]](None)

  /** Run `f` with the reliable-checkpoint dispatch forced to `on`,
    * restoring the ambient setting after — the per-call alternative to
    * the process-global switches. The checkpoint DIR is still
    * SparkContext state (Spark has no scoped equivalent); callers set
    * it once to a long-lived root.
    */
  def withReliable[T](on: Boolean = true)(f: => T): T =
    scoped.withValue(Some(on))(f)

  def reliable: Boolean =
    scoped.value.getOrElse(
      sys.props.get("graft.reliableCkpt")
        .orElse(sys.env.get("SPARK_GRAFT_RELIABLE_CKPT"))
        .exists(v => v == "1" || v == "true"))

  def apply(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable) df.checkpoint(eager) else df.localCheckpoint(eager)
}
