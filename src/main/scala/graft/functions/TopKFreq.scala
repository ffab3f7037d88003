package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items (heavy-hitters) sketch — Misra–Gries with
  * the Agarwal et al. (PODS'12, "Mergeable Summaries") merge rule — as a
  * typed `Aggregator`, completing the engine's sketch family (HLL for
  * distincts, KLL for quantiles, MG for frequencies). At 100 TB an exact
  * token top-k shuffles the full vocabulary; this keeps `m` counters per
  * partial, merges associatively, and guarantees for every term
  *
  *   true − n/(m+1)  ≤  estimate  ≤  true
  *
  * (n = stream length): undercount only, bounded by n/(m+1), so any term
  * with true frequency above n/(m+1) is RETAINED in the summary. The
  * counter VALUES at the bound's margin depend on partition layout (like
  * every mergeable sketch — HLL included); UdafSpec pins the bound and
  * the heavy-hitter retention law across 1/4/32-partition layouts, and
  * Containment measures top-k overlap against the exact count each round.
  *
  * reduce: +1 on a present key; insert while < m keys; else decrement
  * ALL keys by 1, dropping zeros (each decrement is paid for by one
  * increment → amortized O(1) per element). merge: pointwise sum, then
  * subtract the (m+1)-largest value and drop ≤ 0 (the PODS'12 rule that
  * preserves the bound under arbitrary merge trees).
  */
class TopKFreq(m: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(m > 0, s"counter budget must be positive, got $m")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < m => b.updated(x, 1L)
      case None =>
        // decrement-all: drop keys reaching zero; x itself is absorbed
        // (its single occurrence cancels against the shared decrement)
        b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= m) sum
    else {
      // subtract the (m+1)-th largest count from everything, drop <= 0
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(m)
      sum.flatMap { case (k, c) => if (c > cut) Some(k -> (c - cut)) else None }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
