package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming maintenance of the content-defined CHUNK store index
  * ([[graft.operators.Dedup.contentDefinedChunks]]) — the SIXTEENTH
  * ExactlyOnce maintainer, and the streaming face of d23: ingest keeps the
  * set of already-stored chunk hashes current, so each new batch persists
  * ONLY its never-seen chunks (the dedup-storage write path — edited
  * re-sends of known documents cost one new chunk, not a re-store) and
  * the per-batch "bytes actually written" statistic falls out of the
  * landed rows themselves.
  *
  * Same protocol-2 shape as [[StreamingContentHashIndex]]: new index rows
  * depend on what is already indexed, so each micro-batch anti-joins its
  * distinct chunk hashes against every OTHER batch's partitions and
  * overwrites only its own `batch_id=` partition — a replay re-derives
  * byte-identical survivors, exactly once. Unlike the id-keyed content
  * index, chunk-set identity with the batch-built equivalent holds for
  * ANY arrival order (the index stores presence, and (chunk_md5 → len) is
  * functional), which the spec pins across drains, idle re-runs, and the
  * landed-write/lost-commit crash window.
  */
object StreamingChunkIndex {

  /** Drain new files from `inGlob` once (AvailableNow), landing each
    * batch's never-seen distinct (chunk_md5, len) rows under its batch_id
    * partition. Re-invoke per ingest cycle; safe to re-run after a crash
    * at any point.
    * @param batchHook invoked AFTER the batch's write, BEFORE the
    *                  checkpoint commit — lets specs simulate the
    *                  output-landed/commit-lost crash window. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, textCol: String, indexPath: String, checkpoint: String,
          w: Int = 16, maskBits: Int = 6,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val hashed = Dedup.contentDefinedChunks(batch, idCol, textCol, w, maskBits)
          .groupBy("chunk_md5").agg(min(col("len").cast("long")).as("len"))
        val fresh = rawIndex(spark, indexPath) match {
          case Some(idx) =>
            // exclude this batch's own partition: a replay after a landed
            // write must not anti-join against its previous self
            hashed.join(
              idx.filter(col("batch_id") =!= batchId).select("chunk_md5"),
              Seq("chunk_md5"), "left_anti")
          case None => hashed
        }
        ExactlyOnce.landBatchPartition(fresh, indexPath, batchId)
        batchHook(batchId)
    }

  /** The maintained chunk set as (chunk_md5, len); None before the first
    * drain. Distinct across partitions — survivors are unique per batch by
    * construction, but a crash-replayed half-landed history stays a SET. */
  def indexSoFar(spark: SparkSession, indexPath: String): Option[DataFrame] =
    rawIndex(spark, indexPath).map(_.select("chunk_md5", "len").distinct())

  private def rawIndex(spark: SparkSession, indexPath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, indexPath))
      Some(spark.read.parquet(indexPath))
    else None
}
