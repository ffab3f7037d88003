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
    */
  def bandedIntervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    require(!points.columns.contains("__band") && !intervals.columns.contains("__band"),
      "__band is reserved by bandedIntervalJoin — rename the input column")
    val p = points.withColumn("__band",
      floor(col(pointCol) / lit(bandWidth)).cast("long"))
    val i = intervals.withColumn("__band",
      explode(sequence(floor(col(loCol) / lit(bandWidth)).cast("long"),
        floor(col(hiCol) / lit(bandWidth)).cast("long"))))
    p.join(i, Seq("__band"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__band")
  }
}
