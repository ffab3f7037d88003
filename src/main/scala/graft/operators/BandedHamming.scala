package graft.operators

import org.apache.spark.sql.DataFrame
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
  */
object BandedHamming {

  /** Distinct candidate pairs (id1 < id2) of rows sharing a bucket — the
    * generic LSH candidate join: rows meet iff every `bucketCols` value
    * matches, i.e. the shuffle is keyed by the bucket tuple, never
    * all-pairs. Shared by MinHash (bucket = (band, sig)), SimHash/aHash
    * (via [[pairs]]) and hyperplane cosine LSH (bucket = (band, bits)).
    */
  def bucketedPairs(df: DataFrame, idCol: String,
      bucketCols: Seq[String]): DataFrame = {
    val d = df.select((col(idCol).as("__id") +: bucketCols.map(col)): _*)
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
    * corpus never moves at all. Self-matches are NOT filtered here; the
    * caller owns identity semantics (probe ids need not be base ids).
    */
  def probedPairs(probe: DataFrame, base: DataFrame, probeIdCol: String,
      baseIdCol: String, bucketCols: Seq[String]): DataFrame = {
    val p = probe.select((col(probeIdCol).as("__pid") +: bucketCols.map(col)): _*)
    val b = base.select((col(baseIdCol).as("__bid") +: bucketCols.map(col)): _*)
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    p.as("a").join(b.as("b"), cond)
      .select(col("a.__pid").as("id1"), col("b.__bid").as("id2"))
      .distinct()
  }

  /** Pairs (id1, id2, hamming ≤ maxHamming), id1 < id2, over
    * `df(idCol, hashCol)`. The id column may be any orderable type.
    */
  def pairs(df: DataFrame, idCol: String, hashCol: String,
      bands: Int = 4, maxHamming: Int = 6): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val banded = df
      .select(col(idCol).as("__id"), col(hashCol).as("__h"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bandval", expr(s"shiftright(__h, band * $bits) & $mask"))
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
