package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.queries.VectorOps

/** Streaming ingest deduplication — the production loop a continuously-
  * ingesting corpus runs, composed from the engine's incremental pieces:
  * each micro-batch is probed against the persisted MinHash index
  * ([[graft.queries.VectorOps.neardupDeltaIndexed]] — the corpus is never
  * re-shingled), near-dups are dropped, survivors are written out and
  * their signatures appended to the index so the NEXT batch sees them.
  *
  * Drop policy (keep-first, the cluster-rep convention): a batch doc is
  * dropped iff it near-dups an already-admitted corpus doc (cross pair —
  * drop the new end) or a smaller-id doc of its own batch (within pair —
  * drop the larger end). Conservative on chains: a doc whose only
  * near-dup was itself dropped is still dropped (pair-based, no CC in
  * the hot path) — over-drop is the safe direction for training data.
  *
  * Fault tolerance: the INDEX is the pipeline's state — durable parquet,
  * not stream-internal state, so a restart resumes from the checkpoint
  * with the corpus intact. foreachBatch is at-least-once: a replayed
  * batch overwrites its own `batch=<id>` output directory (idempotent)
  * and re-appends index rows — duplicated index rows only duplicate
  * candidates (deduplicated downstream) and verified pairs reduce
  * through DISTINCT drop-ids, while the d1 ≠ d2 guard keeps a replayed
  * survivor from near-dup-matching its own indexed copy.
  */
object IngestDedup {

  /** Start the pipeline over a streaming (doc_id, text) frame. The index
    * at `indexPath` must exist ([[graft.queries.VectorOps.writeNeardupIndex]]
    * over the existing corpus, or over an empty frame for a fresh start).
    */
  def run(docs: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexPath, outPath, threshold)
      }
      .start()

  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      indexPath: String, outPath: String, threshold: Double): Unit = {
    val spark = batch.sparkSession
    // materialized once: the batch feeds the probe, the survivor
    // anti-join, the output write and the index append
    val b = batch.select(col("doc_id"), col("text")).localCheckpoint(true)
    val pairs = VectorOps.neardupDeltaIndexed(spark, indexPath, b, threshold)
      .filter(col("d1") =!= col("d2")) // replayed batch vs its own indexed copy
    // the `cross` marker, not batch membership, classifies the pair: on a
    // replayed batch the survivors are ALREADY in the index, so a cross
    // pair's d2 can be a batch id too — inferring "within" from membership
    // would drop the previously-admitted doc (replay data loss)
    val dropCross = pairs.filter(col("cross")).select(col("d1").as("doc_id"))
    val dropWithin = pairs.filter(!col("cross")).select(col("d2").as("doc_id"))
    val survivors = b
      .join(dropCross.union(dropWithin).distinct(), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    survivors.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    VectorOps.appendNeardupIndex(survivors, indexPath)
  }
}
