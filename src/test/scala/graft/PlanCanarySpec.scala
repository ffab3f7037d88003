package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract-wide plan-drift canary (r11 verdict task 7): every contract
  * query's EXECUTED plan is swept for the two classes of silent scale
  * regressions a single refactor can introduce anywhere —
  *
  *   1. an unbounded join shape (CartesianProduct /
  *      BroadcastNestedLoopJoin) appearing where an equi-join used to
  *      be: at 100 TB that is the difference between a shuffle and a
  *      non-terminating job;
  *   2. a ScalaUDF sneaking into a hot path: interpreted per-row calls
  *      break whole-stage codegen and serialize every input.
  *
  * This turns PLANS.md's per-family pins into one regression gate over
  * the whole contract — the sweep iterates the LIVE `SparkEntry.queries`
  * map and asserts its own count against `SparkEntry.queries.size`, so
  * a newly registered query is covered automatically and a doc-comment
  * count can never drift from reality. Queries ALLOWED a nested-loop shape are
  * enumerated with their reason — each is either a documented exact
  * baseline, a cross/theta join by definition, or a broadcast of a
  * SINGLE aggregate row (corpus-wide stats), which is O(rows) work and
  * scale-safe. The allowlist is a permission, not a requirement: an
  * allowed query that stops nested-looping just passes.
  */
class PlanCanarySpec extends AnyFunSuite with SparkSessionFixture {

  /** Nested-loop shapes justified per query. */
  private val allowedNlj: Map[String, String] = Map(
    "q_join_cross" -> "cross join is the query's contract",
    "q_join_theta" -> "non-equi predicate join: BNLJ is the only shape",
    "q_knn_bruteforce" ->
      "documented exact ANN baseline (VectorOps.scala knn) the bucketed paths are measured against",
    "q_neardup_cosine" ->
      "documented exact near-dup baseline (VectorOps.scala neardupCosineAt)",
    "q_events_anomaly" ->
      "broadcast of the ONE global stats row (mean/variance) — O(rows)",
    "q_text_stats" -> "broadcast of the one corpus-stats row",
    "q_corpus_report" -> "broadcast of the one corpus-stats row",
    "q_quality_score" -> "broadcast of the one corpus-stats row",
    "q_tfidf" -> "broadcast of the one corpus doc-count row",
    "q_bm25" -> "broadcast of the one corpus avgdl/doc-count row",
    "q_search_hybrid" ->
      "bm25's one-row corpus-stats broadcast + the ONE query-vector row broadcast against the scan — both O(rows)",
    "q_vec_centroid_assign" ->
      "rows x broadcast ≤-labels-row centroid table: the nearest-centroid routing shape, bounded by labels not corpus",
    "q_decontaminate_bloom" ->
      "broadcast of the two one-row bloom filters (the prune's design)",
    "q_domain_mix" -> "broadcast of the one corpus-total row",
    "q_quality_logprob" ->
      "broadcast of the one corpus token-total row against the vocab",
    "q_domain_resample" -> "broadcast of the one corpus-total row",
    "q_dup_spans" -> "broadcast of the one corpus-stats row",
    "q_stats_summary" -> "summary() composes against a one-row broadcast",
    "q_sample_split" -> "broadcast of the one split-bounds row",
    "q_sample_weighted" -> "broadcast of the one total-weight row",
    "q_knn_collapse" ->
      "rep-corpus brute search: queries x the COLLAPSED rep table (clusters, not corpus) — the contract pins the exact rep stage; production plugs an index via searchReps",
    "q_knn_ivf" ->
      "rows x broadcast k-centroid table (Ivf.assign/probesOf): the IVF routing shape, bounded by k not corpus",
    "q_knn_label" -> "same IVF centroid-routing crossJoin, bounded by k",
    "q_sample_diverse" -> "same IVF centroid-routing crossJoin, bounded by k",
    "q_decontaminate_semantic" ->
      "corpus x broadcast EVAL-SET product (benchmark-sized by definition), collapsed map-side by the partial agg; the indexed variant is the pruned path"
  )

  private def hasScalaUdf(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectWithSubqueries {
      case p if p.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])) => p
    }.nonEmpty

  test("no contract query cartesian/BNLJs outside the documented " +
      "allowlist; no ScalaUDF anywhere") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    var swept = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      swept += 1
      val df = fn(spark, Sf0001)
      // execute THIS df's own physical plan (df.count() would build and
      // run a separate QueryExecution, leaving this one's
      // AdaptiveSparkPlanExec un-finalized — the sweep would read the
      // isFinalPlan=false initial plan)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val nlj = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (nlj && !allowedNlj.contains(name))
        offenders += s"$name: unexpected CartesianProduct/BNLJ"
      if (hasScalaUdf(df))
        offenders += s"$name: ScalaUDF in the optimized plan"
    }
    // self-counting: the sweep must have visited EVERY registered
    // contract query — if this trips, the iteration above was narrowed
    // (e.g. a filtered copy of the map) and the gate is no longer
    // contract-wide
    assert(swept == SparkEntry.queries.size,
      s"swept $swept queries but SparkEntry.queries has " +
        s"${SparkEntry.queries.size}")
    assert(offenders.isEmpty,
      s"plan drift detected:\n${offenders.mkString("\n")}")
  }
}
