package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF demo (SURVEY.md §2.F): geometric mean as an
  * `Aggregator[IN, BUF, OUT]` — the Spark-native way to add an aggregate
  * the built-ins lack. The buffer is (Σ ln x, n), so partial buffers merge
  * associatively and the partial+final split works over any partitioning,
  * exactly like the built-in algebraic aggregates.
  *
  * Register per session: `spark.udf.register("geomean",
  * functions.udaf(GeoMean))`. No DuckDB oracle: the double ln-sum is
  * partition-order dependent (SURVEY §7.6 R1) — UdafSpec bounds it
  * against the closed form instead.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)

  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    if (x > 0) (b._1 + math.log(x), b._2 + 1) else b

  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)

  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
