package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch operators beyond HLL (q_agg_approx) and the bloom-filter join
  * prune (ScaleTechniquesSpec): Count-Min heavy hitters and t-digest
  * style approximate percentiles. Sketches are the 100 TB substitute for
  * exact answers whose state would not fit: CMS is O(w·d) for any stream
  * length, approx_percentile O(1/accuracy) per group — both mergeable
  * across partitions, which is what makes them distributable.
  */
class SketchSpec extends AnyFunSuite with SparkSessionFixture {

  test("Count-Min sketch bounds heavy-hitter counts (eps*n, 1-delta)") {
    val events = graft.queries.Tables.t(spark, Sf001, "events")
    val eps = 0.005
    val cms = events.stat.countMinSketch(col("event_type"),
      eps = eps, confidence = 0.99, seed = 42)
    val exact = events.groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, trueN) =>
      val est = cms.estimateCount(k)
      // CMS never under-counts; over-count bounded by eps*n w.h.p.
      assert(est >= trueN, s"$k: CMS under-counted $est < $trueN")
      assert(est <= trueN + (eps * n).toLong + 1,
        s"$k: CMS over-counted $est vs $trueN (n=$n)")
    }
  }

  test("approx_percentile tracks exact percentiles within accuracy") {
    val l = graft.queries.Tables.t(spark, Sf001, "lineitem")
    val row = l.agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("ap"),
      expr("percentile(l_extendedprice, array(0.5, 0.9))").as("ex"))
      .collect().head
    val ap = row.getSeq[Double](0)
    val ex = row.getSeq[Double](1)
    // rank-space accuracy 1/1000: value-space check against a generous
    // relative band (price distribution is smooth)
    ap.zip(ex).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.05, s"approx $a vs exact $e")
    }
  }
}
