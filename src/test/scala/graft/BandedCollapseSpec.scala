package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BandedHamming

/** Equivalence pin for the r18 identical-hash collapse in
  * [[BandedHamming.pairs]]: the collapsed form must equal the per-member
  * reference ([[BandedHamming.pairsReference]]) BIT-FOR-BIT in every
  * regime — exact-dup-heavy corpora, hot-bucket drops (tiny caps),
  * star-edge rescue, multi-probe banding, wide and narrow gates — on
  * randomized corpora with planted identical clusters.
  */
class BandedCollapseSpec extends AnyFunSuite with SparkSessionFixture {

  private def norm(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Int)] =
    df.select(col("id1").cast("long"), col("id2").cast("long"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sorted.toSeq

  test("property: collapsed pairs ≡ per-member reference across every " +
      "(bands, multiProbe, rescueHot, maxBucket, maxHamming) regime") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for (trial <- 0 until 3) {
      // corpus: identical-hash clusters of varied size (the collapse
      // target), near-miss hashes at 1-7 flipped bits (banding and gate
      // boundaries), and random background hashes
      val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var id = 0L
      def add(h: Long): Unit = { rows += ((id, h)); id += 1 }
      for (c <- 0 until 6) {
        val base = rnd.nextLong()
        val k = 1 + rnd.nextInt(7) // cluster sizes 1..7
        (0 until k).foreach(_ => add(base))
        // near misses at controlled hamming distances off the cluster
        for (d <- Seq(1, 3, 6, 7)) {
          var h = base
          rnd.shuffle((0 until 64).toList).take(d).foreach(b => h ^= 1L << b)
          add(h)
        }
      }
      (0 until 20).foreach(_ => add(rnd.nextLong()))
      val df = rnd.shuffle(rows.toSeq).toDF("id", "h")
      for {
        bands <- Seq(4, 8)
        multiProbe <- Seq(false, true)
        rescueHot <- Seq(false, true)
        maxBucket <- Seq(3, 100000) // 3 forces guard drops + star edges
        maxHamming <- Seq(3, 6)
      } {
        val got = norm(BandedHamming.pairs(df, "id", "h", bands = bands,
          maxHamming = maxHamming, maxBucket = maxBucket,
          rescueHot = rescueHot, multiProbe = multiProbe))
        val want = norm(BandedHamming.pairsReference(df, "id", "h",
          bands = bands, maxHamming = maxHamming, maxBucket = maxBucket,
          rescueHot = rescueHot, multiProbe = multiProbe))
        assert(got == want,
          s"trial=$trial bands=$bands probe=$multiProbe rescue=$rescueHot " +
            s"cap=$maxBucket d=$maxHamming: got ${got.size} want ${want.size}")
      }
    }
  }

  test("collapsed pairs: within-cluster pairs appear exactly once with " +
      "hamming 0, and a fully over-cap cluster still drops") {
    import spark.implicits._
    // one 5-member identical cluster + unrelated rows
    val base = 0x5a5a5a5a5a5a5a5aL
    val df = ((0 until 5).map(i => (i.toLong, base)) ++
      Seq((10L, 0x1234L), (11L, -9876543210L))).toDF("id", "h")
    val got = norm(BandedHamming.pairs(df, "id", "h", bands = 8))
    val want = (for { a <- 0 until 5; b <- a + 1 until 5 }
      yield (a.toLong, b.toLong, 0)).sorted
    assert(got == want)
    // cap below the cluster size: every bucket of the cluster is over
    // cap, so (without rescue) the cluster must vanish — the degenerate
    // identical-content semantic the per-member guard has always had
    val guarded = norm(BandedHamming.pairs(df, "id", "h", bands = 8,
      maxBucket = 4))
    assert(guarded.isEmpty)
    // with rescue: exactly the star edges (min member ↔ each other)
    val rescued = norm(BandedHamming.pairs(df, "id", "h", bands = 8,
      maxBucket = 4, rescueHot = true))
    assert(rescued == (1 until 5).map(i => (0L, i.toLong, 0)).sorted)
  }
}
