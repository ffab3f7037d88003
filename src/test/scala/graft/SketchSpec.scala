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

  test("HLL sketches merge across partitions (hll_sketch_agg + hll_union)") {
    // mergeability is what makes sketches distributable: build one sketch
    // per half of the data, union them, and land within HLL error of the
    // exact distinct count — the partial/final aggregation story at 100 TB
    val l = graft.queries.Tables.t(spark, Sf001, "lineitem")
    val exact = l.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val halves = l.withColumn("half", col("l_orderkey") % 2)
      .groupBy(col("half"))
      .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk"))
    val merged = halves.agg(
      expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0)
    val relErr = math.abs(merged - exact).toDouble / exact
    assert(relErr < 0.05, s"merged HLL $merged vs exact $exact (err $relErr)")
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

  test("persisted day summaries: merge == in-session rollup; backfill rewrites only its day") {
    import graft.queries.{EventOps, Tables}
    val events = Tables.t(spark, Sf0001, "events")
    val path = java.nio.file.Files.createTempDirectory("topk_days").toString
    EventOps.writeDailySummaries(events, path)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = top(EventOps.topkMergeDaily(spark, Sf0001))
    assert(top(EventOps.topkFromSummaries(spark, path)) == want,
      "summary merge must equal the in-session rollup (exact regime)")
    // layout: one dir per day, summaries driver-sized
    val dayDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    assert(dayDirs.length > 1, s"fixture spans multiple days: ${dayDirs.toSeq}")
    // dynamic-overwrite backfill: re-writing ONE day touches only its dir
    val d0 = dayDirs.map(_.stripPrefix("day=")).min
    val others = dayDirs.filter(_ != s"day=$d0")
      .map(n => n -> new java.io.File(path, n).lastModified()).toMap
    EventOps.writeDailySummaries(
      events.filter(to_date(col("ts")).cast("string") === d0), path)
    others.foreach { case (n, ts0) =>
      assert(new java.io.File(path, n).lastModified() == ts0,
        s"backfill of day=$d0 must not rewrite $n")
    }
    assert(top(EventOps.topkFromSummaries(spark, path)) == want,
      "history unchanged by an identical single-day backfill")
  }

  test("topkFromSummaries day range: partition-pruned read, result == " +
      "rollup over just those days") {
    import graft.queries.{EventOps, Tables}
    val events = Tables.t(spark, Sf0001, "events")
    val path = java.nio.file.Files.createTempDirectory("topk_range").toString
    EventOps.writeDailySummaries(events, path)
    val days = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName.stripPrefix("day=")).sorted
    assert(days.length >= 4, s"need >3 days, got ${days.toSeq}")
    val (d1, d2) = (days(1), days(3)) // [d1, d2) = exactly days(1), days(2)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = top(EventOps.topkMergeDailyOn(
      events.filter(to_date(col("ts")).cast("string").between(days(1), days(2)))))
    assert(top(EventOps.topkFromSummaries(spark, path,
      fromDay = Some(d1), untilDay = Some(d2))) == want,
      "ranged summary merge must equal the rollup restricted to the range")
    // the range must reach the scan as PARTITION pruning: 2 of N day
    // dirs listed, not a post-scan filter over the archive
    val scan = EventOps.summariesRange(spark, path, Some(d1), Some(d2))
    scan.collect()
    val leaves = scan.queryExecution.executedPlan.collectLeaves()
    val fsScans = leaves.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(fsScans.nonEmpty, s"expected a file scan leaf, got $leaves")
    assert(fsScans.head.partitionFilters.nonEmpty,
      "day-range predicates must land as partitionFilters on the scan")
    assert(fsScans.head.inputRDDs().head.partitions.nonEmpty)
    val readDays = fsScans.head.relation.location
      .listFiles(fsScans.head.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
      .flatMap("day=([0-9-]+)".r.findFirstMatchIn(_).map(_.group(1))).toSet
    assert(readDays == Set(days(1), days(2)),
      s"pruned listing must touch exactly the 2 ranged days, got $readDays")
  }

  test("persisted day HLL sketches: union estimate within 5% of exact; " +
      "day range prunes; backfill rewrites only its day") {
    import graft.queries.{EventOps, Tables}
    val events = Tables.t(spark, Sf0001, "events")
    val path = java.nio.file.Files.createTempDirectory("hll_days").toString
    EventOps.writeDailySketches(events, path)
    val dayDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    assert(dayDirs.length > 1)
    val got = EventOps.distinctFromSketches(spark, path).head
    val exact = events.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(got.getLong(1) == dayDirs.length, "n_days == stored day count")
    assert(math.abs(got.getLong(0).toDouble - exact) / exact < 0.05,
      s"approx ${got.getLong(0)} vs exact $exact")
    // ranged estimate vs exact distinct over the same days
    val days = dayDirs.map(_.stripPrefix("day=")).sorted
    val (d1, d2) = (days(1), days(days.length - 1))
    val ranged = EventOps.distinctFromSketches(spark, path,
      fromDay = Some(d1), untilDay = Some(d2)).head
    val exactRanged = events
      .filter(to_date(col("ts")).cast("string") >= d1 &&
        to_date(col("ts")).cast("string") < d2)
      .select(countDistinct(col("user_id"))).head.getLong(0)
    assert(ranged.getLong(1) == days.length - 2)
    assert(math.abs(ranged.getLong(0).toDouble - exactRanged) / exactRanged < 0.05,
      s"ranged approx ${ranged.getLong(0)} vs exact $exactRanged")
    // dynamic-overwrite backfill discipline, as the MG pair
    val d0 = days.min
    val others = dayDirs.filter(_ != s"day=$d0")
      .map(n => n -> new java.io.File(path, n).lastModified()).toMap
    EventOps.writeDailySketches(
      events.filter(to_date(col("ts")).cast("string") === d0), path)
    others.foreach { case (n, ts0) =>
      assert(new java.io.File(path, n).lastModified() == ts0,
        s"backfill of day=$d0 must not rewrite $n")
    }
  }

  test("store-then-answer scratch root honors spark.graft.scratchDir " +
      "(cluster-shared FS), defaults to the warehouse dir, cleans up") {
    import graft.queries.EventOps
    // the day stores are written by EXECUTORS — a driver-local
    // java.io.tmpdir root would scatter task commits across hosts on a
    // real cluster. The conf key is how a deployment points these
    // contract queries at HDFS/object storage; the spec exercises it
    // with a file:-style URI root (any Hadoop-FS path resolves the same
    // way) and pins the leaf-per-invocation cleanup.
    val root = java.nio.file.Files.createTempDirectory("graft_scr").toString
    spark.conf.set("spark.graft.scratchDir", s"file:$root")
    try {
      val got = EventOps.topkRange(spark, Sf0001)
      assert(got.count() > 0)
      val scr = new java.io.File(s"$root/_scratch")
      assert(scr.exists(), "scratch root under the configured dir")
      assert(scr.listFiles().isEmpty,
        "per-invocation leaf must be deleted after the answer is local")
    } finally spark.conf.unset("spark.graft.scratchDir")
    // default root: the SQL warehouse dir — shared by construction on a
    // deployed cluster, ./spark-warehouse under local mode
    assert(EventOps.distinctDays(spark, Sf0001).count() == 1)
  }
}
