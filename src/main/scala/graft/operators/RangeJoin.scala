package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join (SURVEY.md §7.7): a point-in-interval join with no
  * equi key plans as a BroadcastNestedLoopJoin / cartesian product —
  * O(|points|·|intervals|) comparisons, the classic 100 TB cliff. The
  * banding rewrite makes it an equi-join: quantize the domain into bands
  * of width w, emit each point once at band(p) and each interval at every
  * band it overlaps (⌈len/w⌉+1 rows — bounded when interval length is),
  * equi-join on the band id (hash shuffle, AQE-skew-splittable), and
  * re-check the exact predicate as a residual. Result-identical to the
  * naive join: every (point, interval) match shares the point's band.
  */
object RangeJoin {

  /** points ⋈ intervals ON lo <= point <= hi via band equi-join.
    * `bandWidth` trades replication (small w → more interval rows)
    * against band selectivity (large w → more residual comparisons);
    * a good default is the typical interval length.
    *
    * Per-row hygiene (the operator exists to avoid runtime cliffs, so it
    * must not have its own): intervals with lo > hi match nothing and are
    * filtered out up front (Spark's `sequence` would silently emit a
    * DESCENDING band range for them); an interval spanning more than
    * `maxBandsPerInterval` bands fails the job with a usable error
    * instead of tripping sequence's opaque element-limit mid-stage —
    * raise `bandWidth` (or the cap) for genuinely long intervals.
    */
  def bandedIntervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bandWidth: Double, maxBandsPerInterval: Long = 100000L): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(maxBandsPerInterval > 0, "maxBandsPerInterval must be positive")
    require(!points.columns.contains("__band") && !intervals.columns.contains("__band"),
      "__band is reserved by bandedIntervalJoin — rename the input column")
    val p = points.withColumn("__band",
      floor(col(pointCol) / lit(bandWidth)).cast("long"))
    val loBand = floor(col(loCol) / lit(bandWidth)).cast("long")
    val hiBand = floor(col(hiCol) / lit(bandWidth)).cast("long")
    // assert_true is NULL when the span is fine; coalesce then yields the
    // real upper band — the guard rides inside codegen, no extra pass
    // an interval touching B bands explodes B rows; enforce B <= cap
    val hiGuarded = coalesce(
      assert_true(hiBand - loBand + 1 <= lit(maxBandsPerInterval),
        concat(lit(s"bandedIntervalJoin: interval ["), col(loCol), lit(", "),
          col(hiCol), lit(s"] spans more than $maxBandsPerInterval bands of " +
            s"width $bandWidth — raise bandWidth or maxBandsPerInterval"))).cast("long"),
      hiBand)
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__band", explode(sequence(loBand, hiGuarded)))
    p.join(i, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__band")
  }
}
