package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Tables, TextOps, VectorOps}

/** Recall/property tests for the sketch-based operators that have no SQL
  * oracle (engine-specific hash seeds): MinHash-LSH and SimHash near-dup,
  * LSH-bucketed ANN — each judged against its exact baseline.
  */
class VectorOpsSpec extends AnyFunSuite with SparkSessionFixture {

  test("MinHash-LSH near-dup recalls >= 80% of exact-Jaccard J>=0.5 pairs") {
    val truth = TextOps.neardupJaccard(spark, Sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dup pairs")
    val found = VectorOps.dedupMinhash(spark, Sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall over ${truth.size} true pairs")
  }

  test("SimHash: near-identical docs collide, hamming <= 6, pairs ordered") {
    val rows = VectorOps.dedupSimhash(spark, Sf0001).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(r => r.getAs[Number]("hamming").intValue <= 6))
    // the planted exact-Jaccard dups should largely surface here too
    val truth = TextOps.neardupJaccard(spark, Sf0001)
      .filter(col("jaccard") >= 0.9)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (truth.isEmpty) 1.0
      else truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.7, s"simhash recall $recall of ${truth.size} J>=0.9 pairs")
  }

  test("simhashBanding derivation: exhaustive configs, cap-bound switch, " +
      "wide-gate refusal") {
    import graft.operators.BandedHamming
    // small regime: 8×8 exact bands (pigeonhole-exhaustive for d ≤ 7;
    // cheaper than the probe config through the measured crossover)
    assert(BandedHamming.simhashBanding(500L) == ((8, false)))
    assert(BandedHamming.simhashBanding(1L << 19) == ((8, false)),
      "boundary itself stays in the small regime")
    // large regime: 4×16 + radius-1 probes (same d ≤ 7 guarantee; the
    // 8-bit config's ~n²/64 candidate volume crosses the measured wall
    // near 2¹⁹ docs — SimhashGrid scale rows, BASELINE.md r18)
    assert(BandedHamming.simhashBanding((1L << 19) + 1) == ((4, true)))
    assert(BandedHamming.simhashBanding(1_000_000_000L) == ((4, true)))
    // a smaller cap moves the switch point proportionally
    assert(BandedHamming.simhashBanding(1000L, maxBucket = 10) == ((4, true)))
    // both configs' exhaustiveness stops at d = 7 — a derived default
    // silently under-covering a wider gate is the r17 LshGrid bug
    intercept[IllegalArgumentException] {
      BandedHamming.simhashBanding(500L, maxHamming = 8)
    }
  }

  test("simhash banding regimes are interchangeable: the large-corpus " +
      "4×16+probe config finds the SAME pairs as the small-corpus 8×8") {
    // the (4, true) branch never runs on fixture-sized corpora, so its
    // exhaustiveness claim would otherwise ship untested — both derived
    // configs cover every pair at hamming ≤ 7, hence identical outputs
    import graft.operators.BandedHamming
    val sigs = VectorOps.simhashSignatures(
      Tables.t(spark, Sf0001, "documents")).localCheckpoint(true)
    def pairsOf(bands: Int, probe: Boolean) = BandedHamming
      .pairs(sigs, "doc_id", "simhash", bands = bands, maxHamming = 6,
        multiProbe = probe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val small = pairsOf(8, probe = false)
    val large = pairsOf(4, probe = true)
    assert(small.nonEmpty && small == large,
      s"derived configs disagree: 8x8=${small.size} 4x16probe=${large.size}")
  }

  test("LSH clustering: contained in exact clusters, dup recall >= 80%") {
    val exact = graft.queries.TextOps.dedupCluster(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val lsh = VectorOps.dedupClusterLsh(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(lsh.length == exact.length)
    val exactRep = exact.map(t => t._1 -> t._2).toMap
    // containment: verified LSH edges ⊆ exact pairs, so two docs an LSH
    // cluster merges must share an exact cluster — under-merge only
    lsh.groupBy(_._2).values.foreach { members =>
      val exactReps = members.map(m => exactRep(m._1)).distinct
      assert(exactReps.length == 1,
        s"LSH cluster spans exact clusters $exactReps")
    }
    // recall: most exact-dup docs are still flagged through LSH edges
    val exactDups = exact.filter(_._3).map(_._1).toSet
    assert(exactDups.nonEmpty, "fixture must contain clustered dups")
    val lshDups = lsh.filter(_._3).map(_._1).toSet
    assert(lshDups.subsetOf(exactDups))
    val recall = exactDups.count(lshDups.contains).toDouble / exactDups.size
    assert(recall >= 0.8, s"cluster-dup recall $recall over ${exactDups.size}")
  }

  test("semantic clustering: LSH path contained in exact clusters, dup recall >= 80%") {
    val exact = VectorOps.dedupClusterCosine(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val lsh = VectorOps.dedupSemantic(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(lsh.length == exact.length, "both paths label every vector")
    val exactRep = exact.map(t => t._1 -> t._2).toMap
    // verified LSH pairs ⊆ exact cos ≥ 0.35 pairs ⇒ under-merge only:
    // an LSH cluster can never span two exact clusters
    lsh.groupBy(_._2).values.foreach { members =>
      val reps = members.map(m => exactRep(m._1)).distinct
      assert(reps.length == 1, s"LSH semantic cluster spans exact clusters $reps")
    }
    val exactDups = exact.filter(_._3).map(_._1).toSet
    assert(exactDups.nonEmpty, "fixture has cos >= 0.35 pairs at sf0.001")
    val lshDups = lsh.filter(_._3).map(_._1).toSet
    assert(lshDups.subsetOf(exactDups))
    val recall = exactDups.count(lshDups.contains).toDouble / exactDups.size
    assert(recall >= 0.8, s"semantic dup recall $recall over ${exactDups.size}")
  }

  test("LSH cosine near-dup: subset of exact pairs, recall >= 80%") {
    val exact = VectorOps.neardupCosine(spark, Sf0001)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact baseline must find cos>=0.35 pairs")
    val lsh = VectorOps.neardupCosineLsh(spark, Sf0001)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-verify step makes every emitted pair a true pair (precision 1)
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.8, s"lsh near-dup recall $recall over ${exact.size} pairs")
  }

  test("cosine-LSH dedup deferral: verify-then-distinct == distinct-then-verify") {
    // r19: neardupCosineLshAt dedups AFTER the exact-cosine filter (one
    // Exchange of candidate pairs removed — guide §2.1). Pin the
    // commuted form against the r18 distinct-first reference, values
    // included (the per-pair cos is deterministic, so the frames must
    // match bit-for-bit as sets), across both band regimes.
    val dot = org.apache.spark.sql.graft.VectorExpressions.dotProduct _
    val base = Tables.t(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("n2"))
    for ((planes, bands, t) <- Seq((16, 8, 0.35), (64, 4, 0.9))) {
      // the r18 reference, reconstructed: distinct candidates first,
      // then the exact-cosine verify (same expression as verifyCosine)
      val lhs = base.select(col("vec_id").as("v1"), col("embedding").as("e1"),
        col("n2").as("m1"))
      val rhs = base.select(col("vec_id").as("v2"), col("embedding").as("e2"),
        col("n2").as("m2"))
      val cosRaw = dot(col("e1"), col("e2")) / (sqrt(col("m1")) * sqrt(col("m2")))
      val reference = VectorOps.cosineLshCandidates(base, planes, bands)
        .join(lhs, "v1").join(rhs, "v2")
        .filter(cosRaw >= t)
        .select(col("v1"), col("v2"), round(cosRaw, 6).as("cos"))
      val got = VectorOps.neardupCosineLshAt(base, t, planes, bands)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("v1", "v2", "cos").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(canon(got) == canon(reference),
        s"dedup-deferred pairs drifted at planes=$planes bands=$bands t=$t")
      // only the contract regime is guaranteed pairs on the raw fixture
      // (the 0.9 gate finds none without planted twins — equality above
      // still exercises that plan shape end-to-end)
      if (t == 0.35) assert(canon(got).nonEmpty)
    }
  }

  test("LSH ANN recalls >= 60% of brute-force top-5 neighbors, no UDF nodes") {
    val truth = VectorOps.knnBruteforce(spark, Sf0001)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // plan pin re-asserted at both shuffle settings (fresh frame each)
    atPinnedShuffleSettings {
    val df = VectorOps.knnLsh(spark, Sf0001)
    val found = df.select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.6, s"ann recall $recall (observed 1.0 with 8x2-bit bands)")
    // the r6 verdict's pin: the mllib approxSimilarityJoin this replaced
    // ran interpreted ScalaUDF hash/distance nodes with an unstable plan
    // (5-60 s swings at sf0.1); the in-house path must stay pure codegen'd
    // Catalyst. ScalaUDF renders as "UDF(...)" in plan strings (checking
    // the class name alone would be vacuous), so assert on both spellings
    // — the hot-bucket guard's warn is a native expression precisely so
    // this holds.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("UDF(") &&
      !plan.contains("BatchEvalPython"),
      s"knnLsh plan must not carry interpreted UDF nodes:\n$plan")
    }
  }

  test("expandEmbeddings: deterministic, copy-0 exact, factor x rows") {
    val emb = graft.queries.Tables.t(spark, Sf0001, "embeddings")
    val ex = VectorOps.expandEmbeddings(emb, factor = 3, noise = 0.05)
    assert(ex.count() == emb.count() * 3)
    // copy 0 is the original bit-for-bit
    val orig = emb.select(col("vec_id"), col("embedding"))
    val copy0 = ex.filter(col("copy") === 0)
      .select((col("vec_id") / 3).cast("long").as("vec_id"), col("embedding"))
    assert(copy0.exceptAll(orig).isEmpty && orig.exceptAll(copy0).isEmpty)
    // same seed => identical expansion; different seed => different jitter
    val again = VectorOps.expandEmbeddings(emb, factor = 3, noise = 0.05)
    assert(ex.exceptAll(again).isEmpty)
    val other = VectorOps.expandEmbeddings(emb, 3, 0.05, seed = 99L)
      .filter(col("copy") =!= 0)
    assert(ex.filter(col("copy") =!= 0).exceptAll(other).count() > 0)
  }

  test("10x corpus (20k vectors): banded-LSH ANN recall floor") {
    // r8 verdict task 2: default banding (16 planes x 8 bands) measured
    // at the 20k near-duplicate cloud; observed 0.89 (20 queries) /
    // 0.87 (100 queries) — the floor sits under both.
    val r = AnnScaleFixture.recallOf(VectorOps.knnLshAt(
      AnnScaleFixture.corpus,
      AnnScaleFixture.queries.select("vec_id", "embedding"), k = 5))
    assert(r >= 0.75, s"lsh recall@5 $r at 20k corpus")
  }

  test("cosine-LSH pruning at a production gate: <30% candidates, >=90% recall") {
    // the fixture embeddings are isotropic noise (no cos>=0.9 pairs), so
    // plant near-identical dups: every vec_id < 30 gets a twin whose
    // elements are nudged by a deterministic per-position epsilon (cos ~
    // 0.999). At this gate the contract query's 8x2-bit banding would pass
    // nearly everything; 4x16-bit bands are the production knob — random
    // pairs share a 16-bit band with p ~ 4*2^-16, twins with p ~ 0.998.
    import org.apache.spark.sql.DataFrame
    val dot = org.apache.spark.sql.graft.VectorExpressions.dotProduct _
    val baseRaw = graft.queries.Tables.t(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val twins = baseRaw.filter(col("vec_id") < 30)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (pmod(col("vec_id") * 31L + i, lit(7L)).cast("float")
            - lit(3.0f)) * lit(1e-4f)).as("embedding"))
    val corpus = baseRaw.union(twins)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("n2"))
      .localCheckpoint(true)
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    val cands = VectorOps.cosineLshCandidates(corpus, numPlanes = 64, bands = 4)
    val nCands = cands.count()
    assert(nCands < 0.3 * allPairs,
      s"4x16-bit banding kept $nCands of $allPairs pairs — pruning must be real")
    // exact truth at the same gate, via the brute-force shape
    def cosPairs(df: DataFrame): Set[(Long, Long)] = {
      val a = df.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("n2").as("m1"))
      val b = df.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("n2").as("m2"))
      a.crossJoin(b)
        .filter(col("v1") < col("v2") &&
          dot(col("e1"), col("e2")) / (sqrt(col("m1")) * sqrt(col("m2"))) >= 0.9)
        .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val truth = cosPairs(corpus)
    assert(truth.size >= 30, s"planted twins must create cos>=0.9 pairs, got ${truth.size}")
    val got = VectorOps.neardupCosineLshAt(corpus, threshold = 0.9,
      numPlanes = 64, bands = 4)
      .select("v1", "v2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(truth), s"exact verify must kill false positives: ${got.diff(truth).take(5)}")
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall over ${truth.size} planted pairs")
  }

  test("IVF ANN recalls >= 60% of brute-force top-5 neighbors") {
    val truth = VectorOps.knnBruteforce(spark, Sf0001)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = VectorOps.knnIvf(spark, Sf0001).collect()
    val found = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.6, s"ivf recall $recall (observed 0.92 at nprobe=4/16)")
    // structural invariants: <=5 ranked rows per query, no self-matches
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 5))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("IVF spherical-Lloyd training improves the quantizer objective") {
    import graft.operators.Ivf
    val base = graft.queries.Tables.t(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        org.apache.spark.sql.graft.VectorExpressions.dotProduct(
          col("embedding"), col("embedding")).as("n2"))
    def objective(c: org.apache.spark.sql.DataFrame): Double =
      Ivf.assign(base, c).agg(avg(col("sim"))).collect().head.getDouble(0)
    val seed = Ivf.seedCentroids(base, 16)
    val trained = Ivf.train(base, 16, iters = 2)
    assert(trained.count() == 16)
    val (o0, o2) = (objective(seed), objective(trained))
    // observed 0.245 -> 0.324 at sf0.001; assert strict improvement
    assert(o2 > o0, s"objective did not improve: seed $o0, trained $o2")
    // search over the trained index still recalls the brute-force truth
    val truth = VectorOps.knnBruteforce(spark, Sf0001)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Ivf.search(base, trained, col("vec_id") < 5, k = 5, nprobe = 4)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.6, s"trained-index recall $recall (observed 0.84)")
  }

  test("dedupMinhash job/shuffle budget: fused verify keeps the query small") {
    // the r3 shape (window size count + two per-shingle joins +
    // re-aggregation) ran noticeably more jobs and hash exchanges; the
    // fused verify measured 7/7 at sf0.001, +1 job for the r7 hot-bucket
    // guard's window pass (keyed by the same bucket tuple the candidate
    // join shuffles on) — pin an upper bound so a regression back to the
    // multi-shuffle shape fails here
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = VectorOps.dedupMinhash(spark, Sf0001)
      df.collect()
      Thread.sleep(500) // listener bus drains asynchronously
      // job count is AQE-stage dependent (9-10 observed for the same
      // plan); the pin guards against the r3 shape's ~2x blow-up, not
      // run-to-run stage materialization jitter
      assert(jobs <= 11, s"dedupMinhash ran $jobs jobs (expected <= 11)")
      // the executedPlan string under AQE holds initial+final plan copies,
      // so this counts each real exchange ~2x: 12 observed = ~6 real
      // (2x shingle-by-doc, the guard's bucket-key window, distinct,
      // final sort). The r3 multi-shuffle shape would re-cross 16-17.
      val exchanges = "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
      assert(exchanges <= 13, s"dedupMinhash plan has $exchanges hash exchanges")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("Ivf.assign is a partial aggregation: no Window node, one cell per vector") {
    import graft.operators.Ivf
    val base = graft.queries.Tables.t(spark, Sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"),
        org.apache.spark.sql.graft.VectorExpressions.dotProduct(
          col("embedding"), col("embedding")).as("n2"))
    // plan pins re-asserted at both shuffle settings (fresh frame each)
    atPinnedShuffleSettings {
      val a = Ivf.assign(base, Ivf.seedCentroids(base, 16))
      a.collect()
      val plan = a.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"assign must not sort-window the corpus:\n$plan")
      // partial_max_by before the exchange = map-side combine: only one
      // pre-reduced row per (task, vec_id) ever shuffles
      assert(plan.contains("partial_max_by"),
        s"expected partially-aggregated argmax:\n$plan")
    }
    val assigned = Ivf.assign(base, Ivf.seedCentroids(base, 16))
    // exactly one cell per vector, and the assignment is the true argmax
    // (differential vs a window-ranked reference)
    val n = base.count()
    assert(assigned.count() == n)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("sim").desc, col("c_id").asc)
    val reference = base.crossJoin(broadcast(Ivf.seedCentroids(base, 16)))
      .withColumn("sim",
        org.apache.spark.sql.graft.VectorExpressions.dotProduct(
          col("embedding"), col("c_emb")) / (sqrt(col("n2")) * sqrt(col("c_n2"))))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = assigned.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference)
  }

  test("brute-force knn: 5 neighbors per query, no self, cos in [-1,1]") {
    val rows = VectorOps.knnBruteforce(spark, Sf0001).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(byQ.values.forall(_.length == 5))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0 + 1e-9))
  }

  test("centroid rows: 10 labels x 64 positions, counts sum to table size") {
    val rows = VectorOps.vecCentroid(spark, Sf0001).collect()
    assert(rows.length == 10 * 64)
    val total = rows.filter(_.getLong(1) == 1).map(_.getLong(3)).sum
    assert(total == 500)
  }

  test("approx_count_distinct within 10% of exact") {
    val approx = graft.queries.Aggregates.aggApprox(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.queries.Aggregates.aggDistinct(spark, Sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("BandedHamming pigeonhole: maxHamming < bands finds EVERY close pair") {
    import spark.implicits._
    import graft.operators.BandedHamming
    // 64-bit hashes with planted pairwise distances straddling the cutoff
    val base = 0x0123456789abcdefL
    val rows = Seq(
      (1L, base),
      (2L, base ^ 0x7L),                  // hamming 3 from id 1
      (3L, base ^ (1L << 63)),            // hamming 1 from id 1
      (4L, base ^ 0x0101010101010101L),   // hamming 8 — out of range
      (5L, ~base)                         // hamming 64
    ).toDF("id", "h")
    val got = BandedHamming.pairs(rows, "id", "h", bands = 4, maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    // with maxHamming(3) < bands(4), at least one 16-bit band must be
    // untouched, so recall is exactly 1 — both close pairs, nothing else
    // (pair (2,3) sits at hamming 4, just past the cutoff)
    assert(got == Set((1L, 2L, 3L), (1L, 3L, 1L)), s"got $got")
  }

  test("HLL merged weekly estimates within 5% of exact weekly distincts") {
    import graft.queries.Tables
    val approx = graft.queries.Aggregates.aggHllMerge(spark, Sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val exact = Tables.t(spark, Sf001, "events")
      .groupBy(date_trunc("week", col("ts")).as("week"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(unix_micros(col("week")), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (wk, ex) =>
      assert(math.abs(approx(wk) - ex) / ex < 0.05,
        s"week $wk: approx ${approx(wk)} vs exact $ex")
    }
  }

  test("knnViaReps: cluster collapse + exact expansion equals brute force " +
      "when the true top-k lives in the matched clusters") {
    import graft.queries.VectorOps
    // expanded fixture: 4 near-identical copies per parent — every
    // query's true top-5 is its own sibling cloud + the nearest parent
    val base = VectorOps.expandEmbeddings(
        graft.queries.Tables.t(spark, Sf0001, "embeddings"), 4, noise = 0.01)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val queries = base.filter(col("vec_id") < 20 && col("vec_id") % 4 === 0)
    val labels = VectorOps.semanticClustersOn(base, 0.9)
      .select(col("vec_id"), col("rep")).localCheckpoint(true)
    // sanity: the collapse is real — far fewer reps than members
    val nReps = labels.select(countDistinct(col("rep"))).head.getLong(0)
    assert(nReps < 600, s"collapse did nothing: $nReps reps of 2000")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted
    val brute = VectorOps.knn(base, queries, 5)
    // top-8 rep clusters expanded: the true top-5 (in-cloud siblings +
    // nearest parents) lies inside them, so the exact final stage must
    // reproduce brute force bit-for-bit
    val collapsed = VectorOps.knnViaReps(base, queries, k = 5,
      topClusters = 8, labels, (reps, qs) => VectorOps.knn(
        reps.select(col("vec_id"), col("embedding")), qs, 8))
    assert(canon(collapsed) == canon(brute))
    // degenerate law: expanding EVERY cluster is brute force by
    // construction, with any rep-search plugin
    val allClusters = VectorOps.knnViaReps(base, queries, k = 5,
      topClusters = nReps.toInt, labels, (reps, qs) => VectorOps.knn(
        reps.select(col("vec_id"), col("embedding")), qs, nReps.toInt))
    assert(canon(allClusters) == canon(brute))
  }

  test("vecProject (JL sign projection): siblings stay close, strangers stay far") {
    // the planted near-dup cloud: 50 parents x 3 copies at noise 0.05
    // (sibling cosine ~0.97); JL distortion is bounded, so the sibling /
    // stranger separation must survive the 64 -> 16 projection
    val base = Tables.t(spark, Sf0001, "embeddings").filter(col("vec_id") < 50)
    val exp = VectorOps.expandEmbeddings(base, factor = 3, noise = 0.05)
    val proj = exp.select(col("parent"), col("copy"),
      VectorOps.projectCol(col("embedding")).as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Double](2).toArray)).toSeq
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val byParent = proj.groupBy(_._1)
    val sib = byParent.values.toSeq.flatMap { g =>
      for (a <- g; b <- g if a._2 < b._2) yield cos(a._3, b._3)
    }
    val parents = byParent.keys.toSeq.sorted
    val strangers = for (i <- parents.indices; j <- i + 1 until parents.size
        if j == i + 1) // one stranger pair per adjacent parent: enough signal
      yield cos(byParent(parents(i)).head._3, byParent(parents(j)).head._3)
    val sibMean = sib.sum / sib.size
    val strMean = strangers.sum / strangers.size
    // K=16 JL distortion legitimately erodes the 0.97 sibling cosine
    // (measured ~0.76 on this fixture); the LAW is the separation gap
    assert(sibMean > 0.6, s"sibling projected cosine too low: $sibMean")
    assert(sibMean > strMean + 0.3,
      s"projection lost the sibling/stranger gap: $sibMean vs $strMean")
  }

  test("projectCol on dirty embeddings: per-component nulls, never row loss") {
    // the r14-advice divergence: the oracle's per-component +/- chain
    // nulls ALL 16 sums when ONE element is null, still emitting 16
    // unnested rows (val NULL) — a whole-null array here would make
    // posexplode emit ZERO rows for that vec_id: silent row loss on
    // dirty data. Pin the oracle's shape: dirty -> 16 null components.
    import spark.implicits._
    val dims = 64
    val clean = Array.tabulate(dims)(j => java.lang.Float.valueOf(j * 0.01f))
    val dirty = clean.clone(); dirty(17) = null // one null element
    val short = clean.take(dims - 1)            // wrong length
    val df = Seq(
      (0L, clean), (1L, dirty), (2L, short)
    ).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val out = df.select(col("vec_id"),
        posexplode(VectorOps.projectCol(col("embedding"))).as(Seq("pos", "v")))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n"), count(col("v")).as("nonNull"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // clean: 16 rows, all values present; dirty/short: STILL 16 rows,
    // every value null (count(v) skips nulls)
    assert(out(0L) == ((16L, 16L)), s"clean vector broke: ${out(0L)}")
    assert(out(1L) == ((16L, 0L)), s"null-element vector: ${out(1L)}")
    assert(out(2L) == ((16L, 0L)), s"wrong-length vector: ${out(2L)}")
  }

  test("approx quartiles sit between exact neighbors (rank error <= 1%)") {
    import graft.queries.Tables
    val rows = graft.queries.Aggregates.aggApproxPct(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val status = r.getString(0)
      val vals = Tables.t(spark, Sf001, "orders")
        .filter(col("o_orderstatus") === status)
        .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
      Seq(0.25 -> r.getDouble(1), 0.5 -> r.getDouble(2), 0.75 -> r.getDouble(3))
        .foreach { case (q, ap) =>
          val lo = vals(math.max(0, (q * vals.length).toInt - vals.length / 100 - 1))
          val hi = vals(math.min(vals.length - 1,
            (q * vals.length).toInt + vals.length / 100))
          assert(ap >= lo && ap <= hi, s"$status p$q: $ap outside [$lo, $hi]")
        }
    }
  }

  test("semantic decon: self-eval flags everything at cos 1; indexed " +
      "verdicts contained in exact with high recall") {
    val e = Tables.t(spark, Sf0001, "embeddings")
    // law: a corpus decontaminated against ITSELF is fully contaminated
    // (every vector matches itself at cosine exactly 1.0)
    val self = VectorOps.semanticDecontaminateOn(e, e, threshold = 0.99)
      .collect()
    assert(self.length == e.count())
    self.foreach { r =>
      assert(r.getBoolean(3), s"self-decon must contaminate every row: $r")
      assert(r.getDouble(2) == 1.0, s"self max_cos must be exactly 1: $r")
    }
    // indexed scale path: eval set persisted as a cosine index, corpus
    // probes buckets only — verdicts must be a SUBSET of exact's, and
    // candidate pruning must not lose much (recall measured, then pinned
    // with margin per the drift-metric discipline)
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val evalSet = e.filter(col("vec_id") % 10 === 0)
    val exact = VectorOps.semanticDecontaminateOn(corpus, evalSet, 0.35)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val idx = java.nio.file.Files.createTempDirectory("sdecon_idx").toString
    VectorOps.writeCosineIndex(evalSet, idx)
    val indexed = VectorOps.semanticDecontaminateIndexed(spark, idx, corpus, 0.35)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(indexed.keySet == exact.keySet,
      "indexed verdict frame must cover every corpus row")
    val falsePos = indexed.filter(_._2).keys.filterNot(exact(_))
    assert(falsePos.isEmpty,
      s"indexed contamination must be exact-verified (subset law): $falsePos")
    val truePos = exact.filter(_._2).keys.toSeq
    val recall = truePos.count(indexed(_)).toDouble / truePos.size
    info(s"indexed semantic-decon recall: $recall over ${truePos.size} contaminated rows")
    assert(recall >= 0.85,
      s"bucket pruning lost too much: recall $recall of ${truePos.size}")
  }
}
