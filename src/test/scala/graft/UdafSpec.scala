package graft

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoMean

/** Typed-Aggregator UDAF surface (SURVEY.md §2.F). */
class UdafSpec extends AnyFunSuite with SparkSessionFixture {

  test("GeoMean aggregator matches the closed form and splits over partitions") {
    import spark.implicits._
    val geomean = functions.udaf(GeoMean)
    spark.udf.register("geomean", geomean)

    val xs = (1 to 1000).map(_.toDouble)
    val expect = math.exp(xs.map(math.log).sum / xs.size)
    // many partitions → exercises partial-buffer merge
    val got = xs.toDF("x").repartition(16)
      .agg(geomean($"x").as("g")).collect()(0).getDouble(0)
    assert(math.abs(got - expect) / expect < 1e-9, s"got $got expect $expect")

    // grouped + SQL registration path
    val grouped = Tables_grouped()
    assert(grouped.forall { case (_, g) => g > 0 && !g.isNaN })
  }

  private def Tables_grouped(): Seq[(String, Double)] = {
    val df = graft.queries.Tables.t(spark, Sf0001, "lineitem")
    df.createOrReplaceTempView("li_udaf")
    spark.sql("SELECT l_returnflag, geomean(l_quantity) AS g FROM li_udaf GROUP BY l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
  }

  test("non-positive inputs are skipped; all-non-positive group yields NaN") {
    import spark.implicits._
    val geomean = functions.udaf(GeoMean)
    val rows = Seq(("a", 2.0), ("a", 8.0), ("a", -1.0), ("b", -5.0), ("b", 0.0))
      .toDF("k", "x").groupBy($"k").agg(geomean($"x").as("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rows("a") - 4.0) < 1e-12) // sqrt(2*8)
    assert(rows("b").isNaN)
  }

  test("TopKFreq: MG error bound and heavy-hitter retention at every layout") {
    import spark.implicits._
    import graft.functions.TopKFreq
    // planted Zipf-ish stream: 3 heavy hitters over a 200-term tail,
    // deterministically shuffled so partitions see mixed order
    val stream = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle(
        Seq.fill(3000)("hot0") ++ Seq.fill(2000)("hot1") ++
        Seq.fill(1500)("hot2") ++
        (0 until 200).flatMap(i => Seq.fill(10)(s"rare$i")))
    val n = stream.size.toLong
    val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val m = 8
    for (parts <- Seq(1, 4, 32)) {
      val got: Map[String, Long] = stream.toDS().repartition(parts)
        .select(new TopKFreq(m).toColumn).head()
      assert(got.size <= m, s"parts=$parts: ${got.size} counters")
      // undercount only, bounded by n/(m+1)
      got.foreach { case (t, est) =>
        val tru = truth(t)
        assert(est <= tru && est >= tru - n / (m + 1),
          s"parts=$parts term=$t est=$est true=$tru bound=${n / (m + 1)}")
      }
      // every term with true frequency above the bound is retained
      truth.filter(_._2 > n / (m + 1)).keys.foreach { t =>
        assert(got.contains(t), s"parts=$parts lost heavy hitter $t")
      }
    }
    // exact regime: vocabulary fits the budget → sketch IS the count
    // (the property that lets q_topk_sketch carry a full DuckDB oracle)
    val exact: Map[String, Long] = stream.toDS().repartition(32)
      .select(new TopKFreq(1024).toColumn).head()
    assert(exact == truth)
  }

  test("property: MG bound holds under arbitrary merge trees") {
    import graft.functions.TopKFreq
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the PODS'12 merge rule must preserve the n/(m+1) undercount bound
    // for ANY merge tree over ANY partitioning — not just Spark's
    // two-level partial/final shape the plan-level tests exercise
    val m = 6
    val mg = new TopKFreq(m)
    val tokGen = Gen.frequency(
      (8, Gen.const("hot")), (4, Gen.const("warm")),
      (3, Gen.oneOf("a", "b", "c")), (1, Gen.choose(0, 50).map("r" + _)))
    for (seed <- 0 until 20) {
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(800)
      val stream = (0 until n).map(i =>
        tokGen.apply(Gen.Parameters.default, Seed(seed * 10000L + i)).get)
      val truth = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      // random partitioning → per-part sketches → random binary merge tree
      val parts = {
        val k = 1 + rnd.nextInt(8)
        stream.zipWithIndex.groupBy(_._2 % k).values
          .map(_.map(_._1).foldLeft(Map.empty[String, Long])(mg.reduce)).toVector
      }
      var forest = rnd.shuffle(parts)
      while (forest.size > 1) {
        val i = rnd.nextInt(forest.size - 1)
        forest = forest.updated(i, mg.merge(forest(i), forest(i + 1)))
          .patch(i + 1, Nil, 1)
      }
      val sketch = forest.head
      assert(sketch.size <= m, s"seed=$seed: ${sketch.size} counters")
      sketch.foreach { case (t, est) =>
        val tru = truth(t)
        assert(est <= tru && est >= tru - n / (m + 1),
          s"seed=$seed term=$t est=$est true=$tru n=$n")
      }
      truth.filter(_._2 > n / (m + 1)).keys.foreach(t =>
        assert(sketch.contains(t), s"seed=$seed lost heavy hitter $t"))
    }
  }

  test("day-rollup summaries: partial-agg plan, layout-invariant in the exact regime") {
    import graft.functions.TopKFreq
    import graft.queries.{EventOps, Tables}
    val events = Tables.t(spark, Sf0001, "events")
    val mg = new TopKFreq(64)

    // the r10 shape materialized each day in one task via mapGroups; the
    // production shape must build per-task partials through the
    // object-hash aggregate path and carry no (Flat)MapGroups operator
    val daily = EventOps.dailySummaries(events, mg)
    val plan = daily.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"day summaries must aggregate through ObjectHashAggregate:\n$plan")
    assert(!plan.contains("MapGroups"),
      s"day summaries must not materialize a day per task:\n$plan")

    // exact regime (fixture vocab fits m=64): the summary is the exact
    // per-day count, so it cannot depend on partition layout
    def summaries(parts: Int): Map[String, Map[String, Long]] =
      EventOps.dailySummaries(events.repartition(parts), mg)
        .collect().toMap
    val at1 = summaries(1)
    assert(at1.nonEmpty && at1.valuesIterator.forall(_.nonEmpty))
    for (parts <- Seq(4, 32))
      assert(summaries(parts) == at1, s"day-rollup drifted at parts=$parts")

    // and the full contract query is unchanged by the reshape: the
    // merged top-10 equals the exact global count
    val got = EventOps.topkMergeDaily(spark, Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exactTop = events.groupBy(org.apache.spark.sql.functions.col("event_type"))
      .count().collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(10).toSeq
    assert(got == exactTop)
  }
}
