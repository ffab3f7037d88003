package graft.operators

import org.apache.spark.sql.DataFrame

/** The ONE cluster-posture decision for the engine's eager trunk
  * materializations (r19 — r18 verdict task 8).
  *
  * Several pipeline trunks are referenced by multiple downstream stages
  * and Catalyst expands the full subtree per reference (zero exchange
  * reuse across the references), so the engine materializes them once:
  * the curate stage-3 survivor frame under the containment stage, the
  * sourceOverlap/noveltyCurve window-explode frames (engine surfaces),
  * and the streaming-containment batch shingle frames. Through r18 each
  * site called `localCheckpoint(true)` with its own per-site caveat and
  * escape hatch; this object is the single policy those sites now route
  * through, selected by `spark.graft.materialize`:
  *
  *  - `local` (default) — `localCheckpoint(true)`: executor-local
  *    blocks, no configuration needed, the right choice for local mode
  *    and stable clusters. Caveat: blocks are NOT reliable storage — on
  *    a cluster with executor decommissioning/churn a lost block fails
  *    the query (it cannot be recomputed; lineage was truncated).
  *  - `reliable` — `checkpoint(true)`: durable blocks under the
  *    session's checkpoint dir (`SparkContext.setCheckpointDir` must be
  *    called); survives executor loss at the cost of writing the frame
  *    to the checkpoint filesystem. The production posture wherever
  *    executors are preemptible.
  *  - `lazy` — no materialization: the stateless plan, re-deriving the
  *    trunk per reference. The A/B arm and the escape for regimes where
  *    the trunk is cheaper to recompute than to store (it is also what
  *    the CONTRACT rows pin where a stateless plan is part of the
  *    contract shape — those pass explicit flags and never reach this
  *    policy).
  *
  * Deliberately NOT routed through here: the session memo builds
  * (jaccardPairs/labels/graph — materialization is part of the memo's
  * semantics), [[ConnectedComponents]]/[[NnDescent]] iteration cuts
  * (they expose their own `reliable` parameter because iterative
  * lineage MUST be cut — `lazy` would be exponential), and the
  * PQ/IVF build internals (ditto, documented at each site).
  */
object Materialize {
  val ConfKey = "spark.graft.materialize"

  def mode(df: DataFrame): String = {
    val m = df.sparkSession.conf.getOption(ConfKey).getOrElse("local")
    require(m == "local" || m == "reliable" || m == "lazy",
      s"$ConfKey must be local|reliable|lazy, got '$m'")
    m
  }

  /** Materialize `df` per the session policy (see object doc). */
  def apply(df: DataFrame): DataFrame = mode(df) match {
    case "lazy" => df
    case "reliable" => df.checkpoint(true)
    case _ => df.localCheckpoint(true)
  }
}
