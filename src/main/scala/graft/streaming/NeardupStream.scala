package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One (band, band value) bucket row of a banded SimHash signature. */
final case class BandedDoc(band: Int, bandval: Long, doc_id: Long, simhash: Long)

/** [[BandedDoc]] with the document's event time (epoch ms) — the
  * watermarked pipeline's row shape.
  */
final case class BandedDocT(band: Int, bandval: Long, doc_id: Long,
    simhash: Long, ts: java.sql.Timestamp)

/** A bucket member retained in stream state: (doc id, full signature). */
final case class BucketMember(id: Long, h: Long)

/** A bucket member with its event time (epoch ms) — watermarked state. */
final case class BucketMemberT(id: Long, h: Long, tsMs: Long)

/** An emitted near-dup candidate pair, verified to `hamming ≤ maxHamming`
  * (d1 < d2, matching the batch [[graft.operators.BandedHamming.pairs]]
  * orientation).
  */
final case class NeardupPair(d1: Long, d2: Long, hamming: Int)

/** Streaming near-duplicate detection — the Structured-Streaming twin of
  * the batch SimHash dedup ([[graft.queries.VectorOps.dedupSimhash]]):
  * documents arrive on an unbounded stream and each one is checked against
  * everything seen so far, without ever holding the corpus in one place.
  *
  * Plan shape (the streaming analog of the batch banded join):
  *
  *   1. per-row 64-bit SimHash ([[simhashCol]] — bit-identical to the
  *      batch aggregate signature, see note there);
  *   2. explode to `bands` (band, band value) bucket keys — the same
  *      bucketing as [[graft.operators.BandedHamming.pairs]], so two docs
  *      meet iff they agree on a whole band;
  *   3. `flatMapGroupsWithState` keyed by bucket: state holds the bucket's
  *      first-seen members (id, signature); each arriving doc is
  *      Hamming-checked against them and verified pairs are emitted.
  *
  * State is partitioned by bucket key — at scale it lives in the RocksDB
  * state store sharded across executors, and a doc only ever meets the
  * members of its own `bands` buckets, never the corpus.
  *
  * Caveats, stated precisely:
  *
  *  - A pair agreeing on multiple bands is emitted once per agreeing
  *    band (the batch form dedups with `distinct()`); downstream either
  *    tolerates duplicates (dedup decisions are idempotent) or appends a
  *    `dropDuplicates("d1","d2")` — itself stateful, so at scale prefer
  *    idempotent consumption.
  *  - State per bucket is capped at `maxBucket` first-seen members — the
  *    streaming analog of the batch hot-bucket guard. Docs arriving after
  *    a bucket is full still CHECK against the retained members (so dups
  *    of early docs are always caught) but are not retained, so a pair of
  *    two late arrivals that meet ONLY in an over-cap bucket is lost —
  *    same degraded-but-bounded posture as the batch guard, and the same
  *    mitigation applies (exact-dedup upstream so identical content
  *    collapses before LSH).
  *  - Group iterator order within a micro-batch is not defined, so rows
  *    are processed in doc_id order inside each (bucket, batch) — output
  *    is deterministic given the batch boundaries.
  */
object NeardupStream {

  /** Per-row 64-bit SimHash over whitespace tokens: bit b is set iff Σ
    * over token occurrences of (+1 if bit b of xxhash64(token) else −1)
    * is positive. Delegates to the same native expression the batch
    * signature build ([[graft.queries.VectorOps.simhashSignatures]])
    * uses, so batch/stream parity is structural rather than
    * spec-enforced. NULL text → NULL signature.
    */
  def simhashCol(text: Column): Column =
    org.apache.spark.sql.graft.ShingleExpressions.simhash64(text)

  /** Near-dup candidate pairs over a (doc_id, text) stream (or batch
    * frame — `flatMapGroupsWithState` degrades to empty-state groups in
    * batch mode, which is exactly the one-shot semantics).
    *
    * Banding is an EXPLICIT knob here, unlike the batch twin (which
    * derives it from the corpus count —
    * [[graft.operators.BandedHamming.simhashBanding]], r18): an
    * unbounded stream cannot be counted, and the derivation's
    * small-corpus pick (8-bit bands) would also key the state store on
    * only 8×256 distinct groups — a parallelism/skew ceiling the batch
    * shuffle does not have. Callers expecting ≤ ~524k docs who want
    * parity with the batch derivation pass `bands = 8`; the 4×16
    * default stays the scale-safe streaming shape (its exact-band
    * recall trade is measured in BASELINE.md SimhashGrid r18).
    */
  def pairsStream(docs: DataFrame, bands: Int = 4, maxHamming: Int = 6,
      maxBucket: Int = 100000): Dataset[NeardupPair] = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .withColumn("simhash", simhashCol(col("text")))
      .filter(col("simhash").isNotNull)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bandval", expr(s"shiftright(simhash, band * $bits) & $mask"))
      .select(col("band").cast("int").as("band"), col("bandval"),
        col("doc_id"), col("simhash"))
      .as[BandedDoc]
    banded
      .groupByKey(r => (r.band, r.bandval))
      .flatMapGroupsWithState[List[BucketMember], NeardupPair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state) =>
          val members = scala.collection.mutable.ArrayBuffer
            .from(state.getOption.getOrElse(Nil))
          val seen = scala.collection.mutable.HashSet.from(members.map(_.id))
          val out = Seq.newBuilder[NeardupPair]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!seen(r.doc_id)) {
              members.foreach { m =>
                val ham = java.lang.Long.bitCount(m.h ^ r.simhash)
                if (ham <= maxHamming)
                  out += NeardupPair(
                    math.min(m.id, r.doc_id), math.max(m.id, r.doc_id), ham)
              }
              if (members.size < maxBucket) {
                members += BucketMember(r.doc_id, r.simhash)
                seen += r.doc_id
              }
            }
          }
          state.update(members.toList)
          out.result().iterator
      }
  }

  /** [[pairsStream]] with an event-time watermark — the bounded-state form
    * an UNBOUNDED production stream must run: without it, every bucket's
    * member list grows with the corpus forever. `docs` needs a `ts`
    * timestamp column; `delay` is the watermark delay (e.g. "10 minutes").
    *
    * State bound and the EXACT loss contract, both spec-pinned
    * (StreamingNeardupSpec):
    *
    *  - a member is EVICTED once the watermark passes its event time, so
    *    per-bucket state holds only docs within (watermark-delay + skew)
    *    of the stream head — the state-size bound;
    *  - a row arriving with `ts` < current watermark is DROPPED by the
    *    engine before the stateful operator (standard late-data rule);
    *  - therefore pair (a, b), ts_a ≤ ts_b, SURVIVES iff when b's
    *    micro-batch runs, watermark ≤ ts_a — i.e. the near-dups arrive
    *    within the delay window of each other (plus batch-boundary
    *    slack). A "late-late" pair — b so late that the watermark passed
    *    ts_a (or ts_b itself) — is lost, by design, and ONLY those are.
    *
    * Choose `delay` as the max expected ingest disorder, exactly like the
    * windowed event pipelines ([[EventPipelines]]).
    */
  def pairsStreamWatermarked(docs: DataFrame, delay: String, bands: Int = 4,
      maxHamming: Int = 6, maxBucket: Int = 100000): Dataset[NeardupPair] = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    val bits = 64 / bands
    val mask = (1L << bits) - 1
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .withColumn("simhash", simhashCol(col("text")))
      .filter(col("simhash").isNotNull)
      .withWatermark("ts", delay)
      .select(col("doc_id"), col("simhash"), col("ts"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("bandval", expr(s"shiftright(simhash, band * $bits) & $mask"))
      .select(col("band").cast("int").as("band"), col("bandval"),
        col("doc_id"), col("simhash"), col("ts"))
      .as[BandedDocT]
    banded
      .groupByKey(r => (r.band, r.bandval))
      .flatMapGroupsWithState[List[BucketMemberT], NeardupPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (_, rows, state) =>
          val wm = state.getCurrentWatermarkMs()
          // evict members the watermark has passed — no ON-TIME row can
          // still arrive with a smaller event time, so dropping them
          // loses exactly the late-late pairs the contract gives up
          val members = scala.collection.mutable.ArrayBuffer
            .from(state.getOption.getOrElse(Nil).filter(_.tsMs >= wm))
          val seen = scala.collection.mutable.HashSet.from(members.map(_.id))
          val out = Seq.newBuilder[NeardupPair]
          rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
            if (!seen(r.doc_id)) {
              members.foreach { m =>
                val ham = java.lang.Long.bitCount(m.h ^ r.simhash)
                if (ham <= maxHamming)
                  out += NeardupPair(
                    math.min(m.id, r.doc_id), math.max(m.id, r.doc_id), ham)
              }
              if (members.size < maxBucket) {
                members += BucketMemberT(r.doc_id, r.simhash, r.ts.getTime)
                seen += r.doc_id
              }
            }
          }
          if (members.isEmpty) state.remove()
          else {
            state.update(members.toList)
            // wake when the watermark passes the oldest member so idle
            // buckets shed state without waiting for a new arrival
            state.setTimeoutTimestamp(
              math.max(members.map(_.tsMs).min, wm + 1L))
          }
          out.result().iterator
      }
  }
}
