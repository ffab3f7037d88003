package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One (shard, term, estimate) row per summary entry per micro-batch. */
case class HeavyHitter(shard: Int, tok: String, est: Long)

/** [[TopkStream.heavyHittersWindowed]] output: one summary entry of one
  * (window, shard) state. `ws_ms` = window start, epoch millis;
  * `closed = true` marks the FINAL snapshot emitted when the watermark
  * sealed the window (its state is dropped in the same step).
  */
case class WindowedHeavyHitter(ws_ms: Long, shard: Int, tok: String,
    est: Long, closed: Boolean)

private[streaming] case class ShardedTok(shard: Int, tok: String)

private[streaming] case class WinShardTok(ws_ms: Long, shard: Int, tok: String,
    ts: java.sql.Timestamp)

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

  /** [[heavyHitters]] with a STATE LIFECYCLE for unbounded day-scale
    * streams — the snapshot-and-reset convention [[NeardupStream]] got
    * in r10: [[heavyHitters]]'s per-shard state lives forever (bounded
    * in SIZE by m counters, unbounded in TIME), so "what trended
    * TODAY" is unanswerable and state never retires. Here state is
    * keyed by (event-time window, shard) and sealed by the watermark:
    *
    *  - while a window is open, each touched (window, shard) re-emits
    *    its current ≤ m counters per micro-batch (`closed = false`) —
    *    the live trending view;
    *  - once the watermark passes window end, the state FIRES
    *    ITS SNAPSHOT (`closed = true`, the window's final MG summary)
    *    and is REMOVED — the reset. Closed snapshots are immutable:
    *    exactly the per-window ≤ m-entry artifacts a rollup merges
    *    ([[graft.queries.EventOps.topkMergeDailyOn]]'s input shape);
    *  - a row arriving after its window sealed is dropped by the
    *    engine's late-data rule BEFORE the operator — it neither
    *    reopens the window nor starts fresh state, so a sealed
    *    window's summary can never be contradicted downstream
    *    (StreamingTopkSpec pins exactly what the reset drops).
    *
    * Live state is bounded by (windows inside the watermark horizon) ×
    * shards × m counters; choose `delayMs` as the max ingest disorder,
    * like every watermarked pipeline here.
    */
  def heavyHittersWindowed(events: DataFrame, tokCol: String = "tok",
      tsCol: String = "ts", windowMs: Long = 86400000L,
      delayMs: Long = 3600000L, m: Int = 256,
      shards: Int = 16): Dataset[WindowedHeavyHitter] = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(windowMs > 0 && delayMs >= 0,
      s"window/delay must be sane, got $windowMs/$delayMs")
    val spark = events.sparkSession
    import spark.implicits._
    val mg = new graft.functions.TopKFreq(m)
    events
      .select(col(tsCol).as("ts"), col(tokCol).as("tok"))
      .filter(col("tok").isNotNull)
      .withWatermark("ts", s"$delayMs milliseconds")
      .select(
        unix_millis(window(col("ts"), s"$windowMs milliseconds")
          .getField("start")).as("ws_ms"),
        pmod(xxhash64(col("tok")), lit(shards)).cast("int").as("shard"),
        // ts rides along: the event-time-timeout checker needs the
        // watermarked column to reach the stateful operator
        col("tok"), col("ts"))
      .as[WinShardTok]
      .groupByKey(r => (r.ws_ms, r.shard))
      .flatMapGroupsWithState[Map[String, Long], WindowedHeavyHitter](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((wsMs, shard), rows, state) =>
          if (state.hasTimedOut) {
            // the watermark sealed this window: final snapshot, then reset
            val buf = state.get
            state.remove()
            buf.iterator.map { case (t, c) =>
              WindowedHeavyHitter(wsMs, shard, t, c, closed = true)
            }
          } else {
            var buf = state.getOption.getOrElse(Map.empty[String, Long])
            rows.toSeq.sortBy(_.tok).foreach { r => buf = mg.reduce(buf, r.tok) }
            state.update(buf)
            // seal when the watermark passes window END: the watermark
            // already carries the delay (wm = max event time − delay),
            // and every admissible row has ts < window end ≤ wm at that
            // point — sealing later would only delay the snapshot by a
            // second full delay for no correctness gain
            state.setTimeoutTimestamp(wsMs + windowMs)
            buf.iterator.map { case (t, c) =>
              WindowedHeavyHitter(wsMs, shard, t, c, closed = false)
            }
          }
      }
  }
}
