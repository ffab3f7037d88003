package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ivf
import graft.queries.Tables

/** Materialized IVF index (build-once / query-many): searching the
  * on-disk, cell-partitioned index must return exactly the in-memory
  * search results, and the scan must be partition-PRUNED to the probed
  * cells — that pruning is the entire point of the layout at 100 TB.
  */
class IvfIndexSpec extends AnyFunSuite with SparkSessionFixture {

  private def base: DataFrame = {
    val emb = Tables.t(spark, Sf0001, "embeddings")
    emb.select(col("vec_id"), col("embedding"),
      VectorExpressions.dotProduct(col("embedding"), col("embedding")).as("n2"))
  }

  private def canon(df: DataFrame): Seq[(Long, Long, Double, Int)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted

  private lazy val indexPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir)
    dir
  }

  test("derived geometry: cells default to ~sqrt(n) with floor 16, and " +
      "the default-build index stores that many centroids") {
    import spark.implicits._
    // the formula, pinned at the floor boundary and at two live sizes
    assert(Ivf.defaultCells(100) == 16, "floor holds below 256")
    assert(Ivf.defaultCells(256) == 16, "sqrt(256) meets the floor")
    assert(Ivf.defaultCells(500) == 22)
    assert(Ivf.defaultCells(2000) == 45)
    assert(Ivf.defaultCells(1000000) == 1000)
    // the SEARCH knob's derivation (r18 — AnnSmallGrid): widen nprobe
    // until the candidate pool nprobe·n/cells reaches ~512; floor 4,
    // cap cells. Pinned at the fixture sizes the floors bound and at
    // the regimes where each bound binds.
    assert(Ivf.defaultNprobe(500, 16) == 16, "tiny corpus probes all cells")
    assert(Ivf.defaultNprobe(2000, 16) == 5)
    assert(Ivf.defaultNprobe(2048, 16) == 4, "floor from 128·cells rows")
    assert(Ivf.defaultNprobe(1000000, 16) == 4)
    // r18 wave-3 (IvfScale): hard-regime recall tracks the probed
    // FRACTION of cells, not the pool size — at √n cells the cells/16
    // fraction floor owns large corpora (was: pool floor 4, which read
    // recall 0.444 vs 0.852 at 200k/447 cells)
    assert(Ivf.defaultNprobe(1000000, Ivf.defaultCells(1000000)) == 62,
      "at derived cells ~sqrt(n) the cells/16 fraction floor owns " +
        "every large corpus")
    assert(Ivf.defaultNprobe(200000, 447) == 27, "the IvfScale rung")
    assert(Ivf.defaultNprobe(100, 8) == 8, "cap at cells")
    assert(Ivf.defaultNprobe(0, 16) == 16, "empty corpus degenerates safely")
    // an unpinned build derives its geometry from the corpus it indexes
    // (the r15 verdict: a 16-cell fixture constant shipped at 100 TB
    // decays routed overlap — BASELINE.md HybridScale); two corpus
    // sizes, both through the bridge entry a naive caller would use
    def corpus(n: Int): DataFrame = (0 until n)
      .map(i => (i.toLong, Seq.tabulate(4)(d =>
        (((i * 31 + d * 7) % 97) / 97.0f)))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    for (n <- Seq(300, 2000)) {
      val dir = java.nio.file.Files.createTempDirectory(s"ivf_geom_$n").toString
      PyBridge.ivfWriteIndex(corpus(n), dir)
      assert(spark.read.parquet(s"$dir/centroids").count() ==
        Ivf.defaultCells(n).toLong,
        s"default build at n=$n must store sqrt-scaled centroids")
    }
    // the graph index derives the same way when cells are unpinned
    val gDir = java.nio.file.Files.createTempDirectory("graph_geom").toString
    PyBridge.graphWriteIndex(corpus(300), gDir, k = 4, iters = 0)
    assert(spark.read.parquet(s"$gDir/centroids").count() ==
      Ivf.defaultCells(300).toLong)
  }

  test("two-level coarse assignment (r19): groups=1 == assign bit-for-" +
      "bit, multi-group output is a deterministic full assignment and " +
      "searchTwoLevel keeps the search contract shape") {
    val cents = Ivf.seedCentroids(base, 16)
    def canonA(df: DataFrame) = df
      .select(col("cell"), col("vec_id"), col("n2"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSeq.sorted
    // groups=1 routes every vector to one group holding every cell —
    // the degenerate case IS the one-level argmax, bit-for-bit
    assert(canonA(Ivf.assignTwoLevel(base, cents, groups = 1)) ==
      canonA(Ivf.assign(base, cents)))
    // multi-group: still a FULL assignment (every vector exactly once,
    // every cell a real centroid id), deterministic across invocations
    val two = Ivf.assignTwoLevel(base, cents, groups = 4)
    val rows = two.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(rows.map(_._1).distinct.size == rows.size)
    assert(rows.size == base.count())
    val cellIds = cents.select(col("c_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => cellIds.contains(r._2)))
    assert(canonA(two) == canonA(Ivf.assignTwoLevel(base, cents, 4)),
      "two-level assignment must be exactly reproducible")
    // search contract shape + self-exclusion, via the two-level corpus
    val got = Ivf.searchTwoLevel(base, cents, col("vec_id") < 5, k = 5,
      nprobe = 16, groups = 4)
    val g = canon(got)
    assert(g.size == 25)
    assert(g.forall { case (q, v, _, rn) => q != v && rn >= 1 && rn <= 5 })
    // nprobe = all cells over a two-level corpus that happens to agree
    // with one-level (it may not in general); at least assert recall
    // against brute force stays high on the fixture
    val brute = canon(graft.queries.VectorOps.knn(
      base.select(col("vec_id"), col("embedding")),
      base.filter(col("vec_id") < 5), 5))
    val hits = g.map(t => (t._1, t._2)).toSet
      .intersect(brute.map(t => (t._1, t._2)).toSet).size
    assert(hits >= 20, s"two-level recall collapsed on the fixture: $hits/25")
  }

  test("searchIndex == in-memory search, bit-identical") {
    val inMem = Ivf.search(base, Ivf.seedCentroids(base, 16),
      queryPred = col("vec_id") < 5, k = 5, nprobe = 4)
    val queries = base.filter(col("vec_id") < 5)
    val idx = Ivf.searchIndex(spark, indexPath, queries, k = 5, nprobe = 4)
    val idxStatic = Ivf.searchIndex(spark, indexPath, queries, k = 5,
      nprobe = 4, staticPrune = true)
    val want = canon(inMem)
    assert(want.size == 25)
    assert(canon(idx) == want)
    assert(canon(idxStatic) == want)
  }

  test("static prune reads only the probed cells' partitions") {
    // frames are built INSIDE the wrap: Dataset plans are cached on first
    // use, so each shuffle setting must plan its own instance
    atPinnedShuffleSettings {
      val queries = base.filter(col("vec_id") < 5)
      val pruned = Ivf.searchIndex(spark, indexPath, queries, k = 5,
        nprobe = 4, staticPrune = true)
      val plan = pruned.queryExecution.executedPlan.toString
      // the IN-list partition filter must reach the file scan — pruning at
      // listing time, not a post-scan filter
      assert(plan.contains("PartitionFilters") &&
        plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*IN[^\\]]*\\].*"),
        s"expected an IN partition filter on cell in:\n$plan")
      // one query at nprobe = 2 must prune the listing to EXACTLY its two
      // probed cells — the partition filter names them, not all 16
      val one = Ivf.searchIndex(spark, indexPath,
        base.filter(col("vec_id") === 0), k = 5, nprobe = 2, staticPrune = true)
      val onePlan = one.queryExecution.executedPlan.toString
      val inList = "cell[^\\[\\]]*? IN \\(([^)]*)\\)".r.findFirstMatchIn(onePlan)
      assert(inList.isDefined, s"no IN partition filter in:\n$onePlan")
      assert(inList.get.group(1).split(",").length == 2,
        s"expected exactly 2 probed cells, got: ${inList.get.group(1)}")
    }
  }

  test("appendIndex grows cells in place: searches see the union, replay " +
      "overwrites itself, compaction keeps the cell layout") {
    // seed centroids are the 16 lowest-id vectors — identical whether
    // taken from the initial half or the full corpus, so the grown index
    // must answer exactly like a full rebuild
    val init = base.filter(col("vec_id") < 150)
    val extra = base.filter(col("vec_id") >= 150)
    val dir = java.nio.file.Files.createTempDirectory("ivf_grow").toString
    Ivf.writeIndex(init, Ivf.seedCentroids(init, 16), dir)
    Ivf.appendIndex(spark, extra, dir, "g1")
    val queries = base.filter(col("vec_id") < 5)
    val want = canon(Ivf.search(base, Ivf.seedCentroids(base, 16),
      queryPred = col("vec_id") < 5, k = 5, nprobe = 4))
    assert(canon(Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4)) == want)
    // at-least-once replay of the same increment rewrites its own dir
    Ivf.appendIndex(spark, extra, dir, "g1")
    assert(spark.read.parquet(s"$dir/cells").count() == base.count())
    assert(canon(Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4)) == want)
    // compaction folds increments but keeps cell= dirs (pruning layout)
    Ivf.compactIndex(spark, dir)
    def dirsIn(p: String) = new java.io.File(p).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirsIn(s"$dir/cells") == Set("batch=init"))
    val cellDirs = dirsIn(s"$dir/cells/batch=init")
    assert(cellDirs.nonEmpty && cellDirs.forall(_.startsWith("cell=")),
      s"cell layout lost: $cellDirs")
    assert(canon(Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4)) == want)
    assert(canon(Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4,
      staticPrune = true)) == want)
  }

  test("appendIndex migrates an old flat cells layout (cell= dirs at the root)") {
    val init = base.filter(col("vec_id") < 150)
    val extra = base.filter(col("vec_id") >= 150)
    val dir = java.nio.file.Files.createTempDirectory("ivf_flat").toString
    Ivf.writeIndex(init, Ivf.seedCentroids(init, 16), dir)
    // old build's layout: cell= dirs directly under cells/ — lift them
    // out of batch=init; an un-migrated append would mix batch= and
    // cell= at one level and break partition discovery
    val root = new java.io.File(s"$dir/cells")
    val initDir = new java.io.File(root, "batch=init")
    initDir.listFiles().foreach { f =>
      java.nio.file.Files.move(f.toPath, new java.io.File(root, f.getName).toPath)
    }
    assert(initDir.delete())
    Ivf.appendIndex(spark, extra, dir, "g1")
    val queries = base.filter(col("vec_id") < 5)
    val want = canon(Ivf.search(base, Ivf.seedCentroids(base, 16),
      queryPred = col("vec_id") < 5, k = 5, nprobe = 4))
    assert(canon(Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4)) == want)
  }

  test("10x corpus (20k vectors): trained-IVF recall floors at nprobe 4/8") {
    // r8 verdict task 2: the pruning settings' recall measured at real
    // scale, not 500 fixture rows. Floors sit under the observed values
    // (np4 0.89, np8 0.97 on this corpus/queries; tools/AnnScale re-runs
    // the measurement with wall times for BASELINE.md).
    val b = AnnScaleFixture.base
    val cents = graft.operators.Ivf.train(b, k = 64, iters = 2)
      .localCheckpoint(true)
    val np4 = AnnScaleFixture.recallOf(
      Ivf.search(b, cents, AnnScaleFixture.queryPred, k = 5, nprobe = 4))
    assert(np4 >= 0.8, s"ivf nprobe=4 recall@5 $np4 at 20k corpus")
    val np8 = AnnScaleFixture.recallOf(
      Ivf.search(b, cents, AnnScaleFixture.queryPred, k = 5, nprobe = 8))
    assert(np8 >= 0.9, s"ivf nprobe=8 recall@5 $np8 at 20k corpus")
    assert(np8 >= np4 - 1e-9,
      s"widening probes must not lose recall: np4=$np4 np8=$np8")
  }

  test("dynamic search plan carries partition pruning on the cell scan") {
    atPinnedShuffleSettings {
      val queries = base.filter(col("vec_id") < 5)
      val idx = Ivf.searchIndex(spark, indexPath, queries, k = 5, nprobe = 4)
      idx.collect() // let AQE finalize the plan
      val plan = idx.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning") ||
        plan.contains("DynamicPruning") ||
        plan.matches("(?s).*PartitionFilters: \\[[^\\]]*dynamic[^\\]]*\\].*"),
        s"expected dynamic partition pruning on the cells scan in:\n$plan")
    }
  }

  test("appendIndex is growth-only: a re-sent vec_id under a NEW tag is " +
      "ignored, never written into a second cell") {
    val init = base.filter(col("vec_id") < 150)
    val extra = base.filter(col("vec_id") >= 150)
    val dir = java.nio.file.Files.createTempDirectory("ivf_dup").toString
    Ivf.writeIndex(init, Ivf.seedCentroids(init, 16), dir)
    Ivf.appendIndex(spark, extra, dir, "g1")
    // an upstream replay re-sends already-indexed ids under a fresh tag
    // PLUS one genuinely new row: the new row must land (a guard that
    // drops everything would pass a dup-only check vacuously), the
    // re-sends must not
    val novel = base.filter(col("vec_id") === 0)
      .select(lit(1000000L).as("vec_id"), col("embedding"), col("n2"))
    val resend = base.filter(col("vec_id") < 150 || col("vec_id") === 150)
      .unionByName(novel)
    Ivf.appendIndex(spark, resend, dir, "g2")
    val ids = spark.read.parquet(s"$dir/cells")
      .groupBy(col("vec_id")).count()
    assert(ids.filter(col("count") > 1).count() == 0,
      "no vec_id may appear in two cells/batches")
    assert(ids.count() == base.count() + 1)
    assert(ids.filter(col("vec_id") === 1000000L).count() == 1,
      "the genuinely new row must be appended, not dropped with the dups")
    // searches stay duplicate-free and correct
    val queries = base.filter(col("vec_id") < 5)
    val got = Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.distinct.length == got.length, "duplicate (q, vec) rows")
  }

  test("a crashed IVF rebuild fails closed: _building refuses search, " +
      "append and compaction until a rebuild completes") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_bld").toString
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir)
    assert(!new java.io.File(s"$dir/_building").exists())
    val queries = base.filter(col("vec_id") < 5)
    Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4).count()
    assert(new java.io.File(s"$dir/_building").createNewFile())
    intercept[IllegalArgumentException] {
      Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4).count()
    }
    intercept[IllegalArgumentException] {
      Ivf.appendIndex(spark, base.filter(col("vec_id") < 5), dir, "t")
    }
    intercept[IllegalArgumentException] { Ivf.compactIndex(spark, dir) }
    // a completed rebuild clears the sentinel and reopens the index
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir)
    assert(!new java.io.File(s"$dir/_building").exists())
    Ivf.searchIndex(spark, dir, queries, k = 5, nprobe = 4).count()
  }

  test("centroid drift: a drifted ingest degrades low-nprobe recall, " +
      "driftStats/driftSummary flag it, a retrained rebuild restores it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_drift").toString
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir)
    // fresh index: nothing appended, nothing to flag
    val fresh = Ivf.driftSummary(spark, dir).head
    assert(!fresh.getAs[Boolean]("rebuild_recommended"))

    // drifted ingest: a 160-member near-dup family straddling the
    // Voronoi boundary of the first two centroids — members sit on a
    // filament through their midpoint, alternating sides by a tiny
    // epsilon along (c1 − c2) while the spread direction w has that
    // component projected out (so filament position never influences
    // the c1-vs-c2 choice). Consecutive members are true nearest
    // neighbors but land in ALTERNATING frozen cells: exactly the
    // population appendIndex grows blind against.
    val cents = spark.read.parquet(s"$dir/centroids").orderBy("c_id")
      .collect()
    def emb(r: org.apache.spark.sql.Row) = r.getSeq[Float](1).toArray
    def norm(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val c1 = emb(cents(0)); val c2 = emb(cents(1))
    val mid = norm(c1.zip(c2).map { case (a, b) => a + b })
    val u = norm(c1.zip(c2).map { case (a, b) => a - b })
    val w0 = mid.indices.toArray.map(i => c1((i + 7) % 64))
    val wu = w0.zip(u).map { case (a, b) => a * b }.sum
    val w = norm(w0.indices.toArray.map(i => w0(i) - wu * u(i)))
    val fam = (0 until 160).map { j =>
      val sign = if (j % 2 == 0) 1f else -1f
      (10000L + j, norm(mid.indices.toArray.map(i =>
        mid(i) + sign * 0.005f * u(i) + 0.02f * j * w(i))).toSeq)
    }
    val famDf = fam.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.dotProduct(col("embedding"), col("embedding"))
          .as("n2"))
      .localCheckpoint(true)
    Ivf.appendIndex(spark, famDf, dir, "drift")

    // the stats see it: both straddled cells grew past 3x (fixture
    // cells hold ~30 members), and the summary recommends a rebuild
    val stats = Ivf.driftStats(spark, dir)
      .filter(col("n_total") > col("n_init")).collect()
    assert(stats.length == 2, "family must straddle exactly two cells")
    stats.foreach(r => assert(r.getAs[Double]("growth") > 3.0,
      s"cell ${r.get(0)} growth ${r.getAs[Double]("growth")}"))
    val drifted = Ivf.driftSummary(spark, dir).head
    assert(drifted.getAs[Boolean]("rebuild_recommended"))
    assert(drifted.getAs[Double]("appended_share") > 0.2)

    // recall really sags: the probe member's true top-5 are its
    // filament neighbors (alternating cells), nprobe=1 sees only the
    // same-side half
    val grown = base.unionByName(famDf).localCheckpoint(true)
    val q = famDf.filter(col("vec_id") === 10000L)
    val truth = graft.queries.VectorOps.knn(
      grown.select(col("vec_id"), col("embedding")),
      q.select(col("vec_id"), col("embedding")), 5)
      .collect().map(_.getLong(1)).toSet
    def recallNp1(path: String): Double = {
      val got = Ivf.searchIndex(spark, path, q, k = 5, nprobe = 1)
        .collect().map(_.getLong(1))
      got.count(truth.contains).toDouble / 5
    }
    val sagged = recallNp1(dir)
    assert(sagged <= 0.6, s"drifted recall@np1 $sagged should sag")

    // the documented repair: rebuild with centroids RETRAINED on the
    // grown corpus — the family gets centroids of its own, consecutive
    // members co-locate, recall recovers, and the drift baseline resets
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_drift_rb").toString
    Ivf.writeIndex(grown, Ivf.train(grown, 16, iters = 2), dir2)
    val restored = recallNp1(dir2)
    assert(restored >= 0.8, s"rebuilt recall@np1 $restored")
    assert(restored > sagged)
    assert(!Ivf.driftSummary(spark, dir2).head
      .getAs[Boolean]("rebuild_recommended"))
  }

  test("maybeRebuildAside: benign index untouched; drifted index rebuilds " +
      "at its OWN stored cell count (never the caller default) and clears") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_maybe").toString
    // cells = 8, deliberately NOT any default: the r14 advice hazard is
    // a scheduled loop silently re-graining a non-default index on its
    // first flagged drift
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 8), dir)
    assert(!Ivf.maybeRebuildAside(spark, dir),
      "benign fresh index must not rebuild")
    assert(spark.read.parquet(s"$dir/centroids").count() == 8)
    assert(graft.queries.VectorOps.indexHistory(spark, dir) == Seq("init"),
      "a declined maybe must leave the index byte-untouched")

    // drift it: a 200-member cluster hugging one centroid — that cell
    // grows ~8x (fixture cells hold ~60), appended share ~0.29
    val c0 = spark.read.parquet(s"$dir/centroids").orderBy("c_id")
      .head.getSeq[Float](1).toArray
    val fam = (0 until 200).map { j =>
      (20000L + j, c0.indices.map(i =>
        c0(i) + (if (i == j % 64) 0.01f else 0f)).toSeq)
    }
    val famDf = fam.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
      .select(col("vec_id"), col("embedding"),
        VectorExpressions.dotProduct(col("embedding"), col("embedding"))
          .as("n2"))
      .localCheckpoint(true)
    Ivf.appendIndex(spark, famDf, dir, "drift")
    assert(Ivf.driftSummary(spark, dir).head
      .getAs[Boolean]("rebuild_recommended"), "fixture must drift")

    // the wired loop: flags -> aside-rebuild with RETRAINED centroids
    // at the index's own granularity -> verdict clears idempotently
    assert(Ivf.maybeRebuildAside(spark, dir, iters = 2))
    assert(spark.read.parquet(s"$dir/centroids").count() == 8,
      "rebuild must preserve the stored cell count, not re-grain")
    assert(!Ivf.driftSummary(spark, dir).head
      .getAs[Boolean]("rebuild_recommended"), "rebuild must clear the verdict")
    assert(!Ivf.maybeRebuildAside(spark, dir), "clear verdict must not re-run")
    // the rebuilt index still answers, over the FULL grown corpus
    val got = Ivf.searchIndex(spark, dir,
      famDf.filter(col("vec_id") === 20000L), k = 5, nprobe = 2)
      .collect().map(_.getLong(1))
    assert(got.length == 5 && got.exists(id => id >= 20000L),
      s"post-rebuild search lost the appended family: ${got.toSeq}")
  }

  test("cross-family stale sentinels: a rebuild in EITHER direction is " +
      "the repair, never a permanent refusal") {
    import graft.operators.Pq
    val queries = base.filter(col("vec_id") < 5)

    // crashed PQ build (stale _pq_building), repaired by rebuilding as
    // plain IVF: the rebuild must clear the foreign sentinel, or
    // requireIvfReadable refuses the freshly built VALID index forever
    val dir1 = java.nio.file.Files.createTempDirectory("ivf_xfam").toString
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir1)
    assert(new java.io.File(s"$dir1/_pq_building").createNewFile())
    intercept[IllegalArgumentException] {
      Ivf.searchIndex(spark, dir1, queries, k = 5, nprobe = 4).count()
    }
    Ivf.writeIndex(base, Ivf.seedCentroids(base, 16), dir1)
    assert(!new java.io.File(s"$dir1/_pq_building").exists())
    Ivf.searchIndex(spark, dir1, queries, k = 5, nprobe = 4).count()

    // the mirror: crashed plain-IVF build (stale root _building),
    // repaired by rebuilding as PQ — the stale sentinel must not
    // outlive the PQ build and brick the index's VectorOps-guarded
    // lifecycle ops (compaction, Ivf entry points) forever
    val dir2 = java.nio.file.Files.createTempDirectory("pq_xfam").toString
    assert(new java.io.File(dir2, "_building").createNewFile())
    val m = 8
    Pq.writeIndex(base, Ivf.seedCentroids(base, 16),
      Pq.train(base, m, ks = 16, iters = 0), dir2, m)
    assert(!new java.io.File(s"$dir2/_building").exists(),
      "PQ rebuild left the stale root _building sentinel behind")
    assert(Pq.searchIndex(spark, dir2, queries, k = 5, nprobe = 4,
      shortlist = 50, m = m).count() == 25)
  }
}
