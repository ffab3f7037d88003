package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** The 100 TB techniques that don't show up in oracle-checked results but
  * define whether the plans survive scale-up: salting for skewed keys
  * (result-identical) and bucketed tables (co-located, shuffle-free
  * joins — asserted on the physical plan).
  */
class ScaleTechniquesSpec extends AnyFunSuite with SparkSessionFixture {

  test("salted aggregation equals plain aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(100000)
      .select(when($"id" % 10 === 0, $"id" % 100).otherwise(7L).as("k"))
    val plain = skewed.groupBy($"k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed.toDF(), "k", salts = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
    assert(plain(7L) > 89000)
  }

  test("generalized saltedAgg composes sum+count partials correctly") {
    import spark.implicits._
    val skewed = spark.range(100000)
      .select(when($"id" % 10 === 0, $"id" % 100).otherwise(7L).as("k"),
        ($"id" % 1000).as("x"))
    val plain = skewed.groupBy($"k")
      .agg(sum($"x").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedAgg(skewed.toDF(), "k", salts = 16,
        partials = Seq(sum($"x").as("s"), count(lit(1)).as("n")),
        finals = Seq(sum($"s").as("s"), sum($"n").as("n")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == plain)
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val prev = confs.map(c => c -> spark.conf.getOption(c)).toMap
    try {
      // shrink thresholds so the hot key trips skew handling at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the hot key lands in ONE post-shuffle partition at any partition
      // count — the split must trigger at the suite default and at the
      // driver's 32 alike (fresh frames per setting: plans are cached)
      atPinnedShuffleSettings {
        val large = spark.range(200000)
          .select(when($"id" % 20 === 0, $"id" % 50).otherwise(3L).as("k"),
            concat(lit("payload-payload-payload-"), $"id").as("v"))
        val right = spark.range(500).select($"id".as("rk"), ($"id" * 2).as("w"))
        // global agg (not grouped by the join key): a same-key groupBy would
        // reuse the join partitioning and AQE skips the split to avoid an
        // extra shuffle
        val j = large.join(right, $"k" === $"rk")
          .agg(count(lit(1)).as("n"), sum(length($"v")).as("bytes"))
        val rows = j.collect()
        assert(rows.head.getLong(0) == 200000L)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("skew=true"),
          s"expected AQE skew-join split in plan:\n$plan")
      }
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("salted join is row-identical to the plain join") {
    import spark.implicits._
    val large = spark.range(50000)
      .select(when($"id" % 5 === 0, $"id" % 20).otherwise(3L).as("k"), $"id".as("v"))
    val small = (0L until 20L).map(k => (k, s"dim$k")).toDF("dk", "name")
    val plain = large.join(small, $"k" === $"dk")
      .select($"v", $"name").collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(large.toDF(), small, "k", "dk", salts = 8)
      .select($"v", $"name").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      val events = graft.queries.Tables.t(spark, Sf0001, "events")
        .withColumn("day", to_date($"ts"))
      events.write.mode("overwrite").partitionBy("day").parquet(out)
      val expected = events.filter($"day" === lit("2024-01-05").cast("date")).count()
      atPinnedShuffleSettings {
        val df = spark.read.parquet(out).filter($"day" === "2024-01-05")
        assert(df.count() == expected && expected > 0)
        val scan = df.queryExecution.executedPlan.toString
        // the day predicate must be a PartitionFilter (directory pruning),
        // not a data filter: at 100 TB this is the difference between
        // listing one day and scanning the corpus
        assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
          s"expected partition pruning in:\n$scan")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("broadcast bloom filter pre-prunes the big side of a selective join") {
    import spark.implicits._
    // the 100 TB semi-join pattern: build a bloom filter over the small
    // side's keys, prune the big side BEFORE the shuffle, then join
    // exactly. False positives only cost extra shuffled rows, never
    // wrong results.
    val keys = graft.queries.Tables.t(spark, Sf0001, "orders")
      .filter($"o_totalprice" > 350000.0).select($"o_orderkey")
    val nKeys = keys.count()
    val bf = keys.stat.bloomFilter("o_orderkey", math.max(nKeys, 1L), 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContain(k))
    val lineitem = graft.queries.Tables.t(spark, Sf0001, "lineitem")
    val pruned = lineitem.filter(mightContain($"l_orderkey"))
    val exact = lineitem.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")
    val exactN = exact.count()
    val prunedN = pruned.count()
    // sound: never drops a true match; tight: bounded false positives
    assert(pruned.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")
      .count() == exactN)
    assert(prunedN >= exactN)
    assert(prunedN <= exactN + (lineitem.count() * 0.05).toLong,
      s"bloom let through too much: $prunedN vs exact $exactN")
  }

  test("banded range join equals the naive interval join, without a nested loop") {
    import spark.implicits._
    import graft.operators.RangeJoin
    // points = event values; intervals = synthetic bands around multiples
    val points = graft.queries.Tables.t(spark, Sf0001, "events")
      .select($"event_id", $"value")
    val intervals = spark.range(200)
      .select($"id".as("iv_id"), ($"id" * 7.0).as("lo"), ($"id" * 7.0 + 5.0).as("hi"))
    val naive = points.join(intervals,
        $"value" >= $"lo" && $"value" <= $"hi")
      .select($"event_id", $"iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    atPinnedShuffleSettings {
      val banded = RangeJoin.bandedIntervalJoin(
        points, "value", intervals, "lo", "hi", bandWidth = 8.0)
      val got = banded.select($"event_id", $"iv_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got.toSeq == naive.toSeq && got.nonEmpty)
      // join strategy is decided at initial planning — the initial adaptive
      // plan suffices to assert no nested loop was selected
      val plan = banded.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"banding must remove the nested loop:\n$plan")
    }
  }

  test("randomized differential: banded range join on negative/fractional domains") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(777)
    for (w <- Seq(0.37, 3.0, 50.0)) {
      val pts = Seq.fill(300)((rnd.nextInt(100000).toLong, rnd.nextDouble() * 400 - 200))
        .toDF("pid", "v")
      val ivs = Seq.fill(60) {
        val lo = rnd.nextDouble() * 380 - 210
        (rnd.nextInt(100000).toLong, lo, lo + rnd.nextDouble() * 25)
      }.toDF("ivid", "lo", "hi")
      val naive = pts.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
        .select($"pid", $"ivid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val banded = RangeJoin.bandedIntervalJoin(pts, "v", ivs, "lo", "hi", w)
        .select($"pid", $"ivid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(banded.toSeq == naive.toSeq, s"bandWidth $w diverged")
    }
  }

  test("banded range join hygiene: lo > hi matches nothing; runaway span fails loudly") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val pts = Seq((1L, 5.0), (2L, 50.0)).toDF("pid", "v")
    // a corrupt interval (lo > hi) must contribute no matches, not a
    // silently-descending band sequence
    val ivs = Seq((10L, 0.0, 10.0), (11L, 60.0, 40.0)).toDF("ivid", "lo", "hi")
    val got = RangeJoin.bandedIntervalJoin(pts, "v", ivs, "lo", "hi", 4.0)
      .select($"pid", $"ivid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
    // an interval spanning more bands than the cap fails with the
    // operator's own error, not sequence's opaque element-limit cliff
    val huge = Seq((12L, 0.0, 1e9)).toDF("ivid", "lo", "hi")
    val err = intercept[Exception] {
      RangeJoin.bandedIntervalJoin(pts, "v", huge, "lo", "hi", 1.0,
        maxBandsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("bandedIntervalJoin")),
      s"expected the operator's span error, got: ${messages(err)}")
  }

  test("hot-bucket guard under multiProbe: the large-corpus derived config " +
      "keeps the same degraded-but-bounded posture") {
    // the (4, true) simhashBanding regime never runs on fixture-sized
    // corpora, so its guard interaction would otherwise ship untested:
    // probe rows landing in a DROPPED hot bucket find nothing (the
    // guard removed the exact rows), and the planted trio still pairs
    // through its own non-degenerate buckets — including the hamming-1
    // pair whose band values differ by one flipped bit, which only the
    // probe side can reach when they share no exact 16-bit band
    import spark.implicits._
    import graft.operators.BandedHamming
    val degenerate = (0L until 200L).map(i => (i, 0L))
    val trio = Seq((1001L, 0x0123456789abcdefL),
      (1002L, 0x0123456789abcdeeL),
      (1003L, 0x0123456789abcdefL ^ 0x6L))
    val rows = (degenerate ++ trio).toDF("id", "h")
    val got = BandedHamming.pairs(rows, "id", "h", bands = 4, maxHamming = 6,
      maxBucket = 50, multiProbe = true).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1001L, 1002L), (1001L, 1003L), (1002L, 1003L)),
      s"got ${got.toSeq}")
  }

  test("hot-bucket guard: a degenerate band value cannot go quadratic") {
    import spark.implicits._
    import graft.operators.BandedHamming
    // 200 rows with the SAME hash (the flat-image / all-zero-band
    // degenerate case: every band bucket holds all 200) + one small
    // planted near-dup trio that must still surface through its own,
    // non-degenerate buckets
    val degenerate = (0L until 200L).map(i => (i, 0L))
    val trio = Seq((1001L, 0x0123456789abcdefL),
      (1002L, 0x0123456789abcdeeL),  // hamming 1 from 1001
      (1003L, 0x0123456789abcdefL ^ 0x6L)) // hamming 2 from 1001
    val rows = (degenerate ++ trio).toDF("id", "h")
    val before = BandedHamming.droppedHotBucketRows.get()
    val got = BandedHamming.pairs(rows, "id", "h", bands = 4, maxHamming = 6,
      maxBucket = 50).collect()
    // without the guard the degenerate value alone yields 200*199/2 =
    // 19900 pairs; with it, only the trio's 3 pairs survive
    assert(got.length == 3, s"expected 3 trio pairs, got ${got.length}")
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1001L, 1002L), (1001L, 1003L), (1002L, 1003L)))
    // the guard warned (loudly) about the dropped rows: 200 rows x 4 bands
    assert(BandedHamming.droppedHotBucketRows.get() - before >= 800,
      "hot-bucket warn path did not fire")
    // with rescueHot the identical-hash cluster is NOT lost: every member
    // reaches the min-id rep through a linear star edge (hamming 0), and
    // the quadratic blow-up still never happens (199 star pairs, not 19900)
    val rescued = BandedHamming.pairs(rows, "id", "h", bands = 4,
      maxHamming = 6, maxBucket = 50, rescueHot = true).collect()
    assert(rescued.length == 199 + 3, s"got ${rescued.length}")
    assert(rescued.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      ((1L until 200L).map(i => (0L, i)).toSet ++
        Set((1001L, 1002L), (1001L, 1003L), (1002L, 1003L))))
    // the generic bucket join rescues by default (all callers
    // exact-verify): the 200-row bucket contributes exactly its 199 star
    // edges, the 2-row bucket pairs normally
    val banded = ((0L until 200L).map(i => (i, 0L)) ++
      Seq((1001L, 42L), (1003L, 42L))).toDF("id", "bv")
      .withColumn("band", lit(0))
    val capped = BandedHamming.bucketedPairs(banded, "id", Seq("band", "bv"),
      maxBucket = 50).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      ((1L until 200L).map(i => (0L, i)).toSet + ((1001L, 1003L))),
      s"got ${capped.length} pairs")
    // …and with rescue off it is dropped entirely (the hash-is-verdict
    // posture imageDedup/dedupSimhash pin)
    val dropped = BandedHamming.bucketedPairs(banded, "id", Seq("band", "bv"),
      maxBucket = 50, rescueHot = false).collect()
    assert(dropped.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1001L, 1003L)), s"got ${dropped.toSeq}")
  }

  test("guard + rescue derive from one exchange: the candidate plan reuses " +
      "the bucket shuffle instead of re-shuffling per shape") {
    import graft.queries.VectorOps
    val docs = graft.queries.Tables.t(spark, Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    atPinnedShuffleSettings {
      val pairs = VectorOps.minhashPairsOn(docs)
      pairs.collect() // let AQE finalize
      val plan = pairs.queryExecution.executedPlan.toString
      // the quadratic join input and the star-edge branch both sit on the
      // markBuckets window — physical planning must reuse that exchange,
      // not shuffle the signature subtree once per shape
      assert(plan.contains("ReusedExchange"),
        s"expected ReusedExchange in the candidate plan:\n${plan.take(4000)}")
    }
  }

  test("hot-bucket star rescue: an over-cap identical-content cluster still " +
      "collapses through exact verify") {
    import spark.implicits._
    import graft.queries.VectorOps
    // 60 byte-identical docs — every (band, sig) bucket holds all 60,
    // far over a cap of 20 — plus a verbatim near-dup pair and a loner
    val boiler = (0L until 60L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"))
    val pairDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog every single day"),
      (101L, "the quick brown fox jumps over the lazy dog every single night"),
      (200L, "completely unrelated text about spark shuffle partitioning"))
    val docs = (boiler ++ pairDocs).toDF("doc_id", "text")
    val verified = VectorOps.minhashPairsOn(docs, 0.5, maxBucket = 20)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every boilerplate member meets rep 0 (star edges → Jaccard 1.0);
    // without rescue ALL 59 of these true-dup edges would be lost
    assert((1L until 60L).forall(i => verified.contains((0L, i))),
      s"star edges missing from verified set (${verified.size} pairs)")
    // the near-dup pair outside the hot bucket still surfaces normally
    assert(verified.contains((100L, 101L)))
    // any band-collision star edge was verified away, never admitted: no
    // boilerplate doc links outside the cluster, nothing touches the loner
    assert(!verified.exists { case (a, b) =>
      (a < 60L) != (b < 60L) || a == 200L || b == 200L })
    // connected components over the verified edges collapses the cluster
    val labels = graft.operators.ConnectedComponents.runOnPairs(
      verified.toSeq.toDF("src", "dst"))
    val reps = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L until 60L).map(reps).toSet.size == 1,
      "boilerplate cluster did not collapse to one rep")
  }

  test("local-finish labels broadcast into the cluster-assignment join") {
    import spark.implicits._
    // under the gate, runOnPairs returns a LocalRelation of exact known
    // size — the full-universe assignment join must plan as a broadcast
    // (the corpus side never shuffles for its labels)
    val pairs = (0L until 50L).map(i => (i, i + 1000L)).toDF("src", "dst")
    val labels = graft.operators.ConnectedComponents.runOnPairs(pairs)
    val universe = graft.queries.Tables.t(spark, Sf0001, "documents")
      .select($"doc_id")
    atPinnedShuffleSettings {
      val assigned = graft.operators.ConnectedComponents
        .assignClusters(universe, "doc_id", labels)
      assigned.collect()
      val plan = assigned.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"label assignment should broadcast the LocalRelation labels:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        "corpus must not shuffle for its cluster labels")
    }
  }

  test("bucketed tables join without a shuffle (co-located scan)") {
    import spark.implicits._
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      graft.queries.Tables.t(spark, Sf0001, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      graft.queries.Tables.t(spark, Sf0001, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      atPinnedShuffleSettings {
        val j = spark.table("b_orders").join(spark.table("b_lineitem"),
          $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        j.collect() // force execution so the adaptive plan finalizes
        val plan = j.queryExecution.executedPlan.toString
        // co-located bucket scan: the join itself needs no hashpartitioning
        // exchange on the join keys (only the post-agg exchange remains)
        val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").last
        assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey") &&
          !joinSection.contains("Exchange hashpartitioning(l_orderkey"),
          s"bucketed join must not shuffle join keys:\n$plan")
      }
      // equality with the unbucketed join
      val expect = graft.queries.Relational.joinSmj(spark, Sf0001)
        .collect().map(_.toString).sorted
      val got = spark.table("b_orders").join(spark.table("b_lineitem"),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          graft.queries.Det.out(sum(graft.queries.Det.money($"l_quantity"))).as("sum_qty"))
        .orderBy($"o_orderpriority").collect().map(_.toString).sorted
      assert(got.toSeq == expect.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
