package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One (shard, term, estimate) row per summary entry per micro-batch. */
case class HeavyHitter(shard: Int, tok: String, est: Long)

private[streaming] case class ShardedTok(shard: Int, tok: String)

/** Streaming heavy-hitters monitor — the "what is trending in the
  * ingest right now" view of a token/URL/event-type stream, as a SHARDED
  * Misra–Gries sketch over `flatMapGroupsWithState`
  * ([[graft.functions.TopKFreq]]'s reduce/merge, so stream/batch bound
  * semantics are one implementation).
  *
  * Sharding is the scale design: state is keyed by
  * `xxhash64(token) % shards`, so each shard's MG summary covers a
  * DISJOINT vocabulary slice — shards union to a global summary with the
  * per-shard bound `n_shard/(m+1)` (tighter than one global sketch's
  * bound, since n_shard ≈ n/shards), state is spread across the
  * executors like any keyed stream instead of funneling through one
  * group, and a hot token costs only its own shard. Every micro-batch
  * each touched shard re-emits its current ≤ m counters (Append mode) —
  * bounded output; the consumer takes the latest batch's union and
  * sorts for its top-k.
  *
  * Rows are folded in token order inside each (shard, batch), so the
  * summary is deterministic given batch boundaries — the
  * [[NeardupStream]] discipline. In the exact regime (shard vocabulary
  * ≤ m) the emitted counters ARE the running exact counts.
  */
object TopkStream {

  def heavyHitters(toks: DataFrame, tokCol: String = "tok",
      m: Int = 256, shards: Int = 16): Dataset[HeavyHitter] = {
    require(shards > 0, s"shards must be positive, got $shards")
    val spark = toks.sparkSession
    import spark.implicits._
    val mg = new graft.functions.TopKFreq(m)
    toks
      .select(col(tokCol).as("tok"))
      .filter(col("tok").isNotNull)
      .withColumn("shard", pmod(xxhash64(col("tok")), lit(shards)).cast("int"))
      .select(col("shard"), col("tok")).as[ShardedTok]
      .groupByKey(_.shard)
      .flatMapGroupsWithState[Map[String, Long], HeavyHitter](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (shard, rows, state) =>
          var buf = state.getOption.getOrElse(Map.empty[String, Long])
          rows.toSeq.sortBy(_.tok).foreach { r => buf = mg.reduce(buf, r.tok) }
          state.update(buf)
          buf.iterator.map { case (t, c) => HeavyHitter(shard, t, c) }
      }
  }
}
