package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Banded-Hamming near-duplicate candidate generation over a 64-bit
  * hash column — the shared plan behind SimHash text dedup
  * ([[graft.queries.VectorOps.dedupSimhash]]) and perceptual-hash image
  * dedup ([[graft.extract.Multimodal.imageDedup]]).
  *
  * The 64-bit hash splits into `bands` equal slices; two rows become a
  * candidate pair iff they agree on at least one whole slice, so pairs
  * meet in a shuffle keyed by (band index, band value) — never all-pairs —
  * and only candidates pay the exact `bit_count` Hamming check. With
  * `maxHamming < bands` the pigeonhole guarantees recall 1; above it
  * (e.g. the 6-vs-4 defaults) recall stays high because near-dup bit
  * flips rarely spread across every band.
  *
  * Hot-bucket guard: the "never all-pairs" claim has a standard LSH
  * failure mode — a degenerate band value shared by a large row
  * population (the all-zero band of short docs, the aHash of flat/
  * low-contrast images) makes in-bucket pairs quadratic. Every candidate
  * join here therefore drops buckets whose population exceeds
  * `maxBucket`, with a loud warning per dropped bucket; at cap B the
  * per-bucket pair cost is bounded by B². The count rides the same
  * shuffle the join needs (a window over the bucket key), not an extra
  * scan.
  *
  * Recall cost of the guard, stated precisely: members of an over-cap
  * bucket can still meet through any OTHER band whose value is not
  * itself over-cap — but when a cluster of > `maxBucket` rows carries
  * IDENTICAL hashes (boilerplate/empty docs, flat images), every band
  * bucket of that cluster is the same degenerate population, all of them
  * are dropped, and every true near-dup pair among those rows is LOST
  * (the WARN log is the only trace). Mitigations, in preference order:
  * run exact dedup first so identical content collapses to one member
  * before any LSH pass (the [[graft.queries.TextOps.curate]] stage
  * order); or handle over-cap buckets with a grouped exact-equality
  * reduction (group identical hashes, keep one representative edge per
  * group) instead of relying on banding for content that hashes
  * identically.
  */
object BandedHamming {

  /** Buckets above this population are dropped from candidate
    * generation. 10⁵ bounds any single bucket's pair blow-up at 10¹⁰
    * comparisons — loud long before that — while sitting far above any
    * non-degenerate LSH bucket at sane banding (buckets should hold
    * tens of rows; a miscalibrated scheme shows up in the warning).
    */
  val DefaultMaxBucket: Int = 100000

  /** Rows dropped by the hot-bucket guard — diagnostic telemetry for
    * tests and local-mode runs. At-least-once: the candidate self-join
    * evaluates the guarded subtree from both branches (and retries
    * re-run filters), so counts can double; per-executor in a real
    * cluster. The authoritative signal is the per-bucket WARN log line.
    */
  def droppedHotBucketRows: java.util.concurrent.atomic.AtomicLong =
    org.apache.spark.sql.graft.WarnHotBucket.droppedRows

  /** Drops rows of buckets whose population exceeds `maxBucket`, warning
    * at least once per dropped bucket (via the codegen'd WarnHotBucket
    * expression on the bucket's row_number()=1 marker row — no
    * interpreted UDF enters the plan). One window pass keyed by the
    * bucket tuple — the exact shuffle key the downstream candidate join
    * uses.
    */
  private def capHotBuckets(d: DataFrame, idCol: String,
      bucketCols: Seq[String], maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(bucketCols.map(col): _*)
    d.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(w.orderBy(col(idCol))))
      .filter(col("__n") <= maxBucket ||
        (col("__rn") === 1 &&
          org.apache.spark.sql.graft.WarnHotBucket.column(
            concat_ws(",", bucketCols.map(c => col(c).cast("string")): _*),
            col("__n"))))
      .drop("__n", "__rn")
  }

  /** Distinct candidate pairs (id1 < id2) of rows sharing a bucket — the
    * generic LSH candidate join: rows meet iff every `bucketCols` value
    * matches, i.e. the shuffle is keyed by the bucket tuple, never
    * all-pairs. Shared by MinHash (bucket = (band, sig)), SimHash/aHash
    * (via [[pairs]]) and hyperplane cosine LSH (bucket = (band, bits)).
    * Buckets above `maxBucket` rows are dropped with a warning (see the
    * hot-bucket guard note above).
    */
  def bucketedPairs(df: DataFrame, idCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val d = capHotBuckets(
      df.select((col(idCol).as("__id") +: bucketCols.map(col)): _*),
      "__id", bucketCols, maxBucket)
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.__id") < col("b.__id")
    d.as("a").join(d.as("b"), cond)
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"))
      .distinct()
  }

  /** Asymmetric probe form of [[bucketedPairs]] — the ANN-query shape:
    * candidate (probe id, base id) pairs sharing a bucket, deduplicated
    * across bands. The join is keyed by the bucket tuple, so at corpus
    * scale it shuffles by bucket — never probe × corpus — and when the
    * probe side is small (the usual ANN case) AQE broadcasts it so the
    * corpus never moves at all. The corpus side gets the hot-bucket
    * guard (a degenerate bucket would otherwise cost |probe|·|bucket|);
    * self-matches are NOT filtered here — the caller owns identity
    * semantics (probe ids need not be base ids).
    */
  def probedPairs(probe: DataFrame, base: DataFrame, probeIdCol: String,
      baseIdCol: String, bucketCols: Seq[String],
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val p = probe.select((col(probeIdCol).as("__pid") +: bucketCols.map(col)): _*)
    val b = capHotBuckets(
      base.select((col(baseIdCol).as("__bid") +: bucketCols.map(col)): _*),
      "__bid", bucketCols, maxBucket)
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    p.as("a").join(b.as("b"), cond)
      .select(col("a.__pid").as("id1"), col("b.__bid").as("id2"))
      .distinct()
  }

  /** Pairs (id1, id2, hamming ≤ maxHamming), id1 < id2, over
    * `df(idCol, hashCol)`. The id column may be any orderable type.
    * Over-cap (band, value) buckets are dropped with a warning.
    */
  def pairs(df: DataFrame, idCol: String, hashCol: String,
      bands: Int = 4, maxHamming: Int = 6,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val banded = capHotBuckets(
      df.select(col(idCol).as("__id"), col(hashCol).as("__h"),
          explode(sequence(lit(0), lit(bands - 1))).as("band"))
        .withColumn("bandval", expr(s"shiftright(__h, band * $bits) & $mask")),
      "__id", Seq("band", "bandval"), maxBucket)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bandval") === col("b.bandval") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id1"), col("b.__id").as("id2"),
        col("a.__h").as("h1"), col("b.__h").as("h2"))
      .distinct()
      .withColumn("hamming", expr("bit_count(h1 ^ h2)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
