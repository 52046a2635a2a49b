package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Images

/** Streaming maintenance of the per-image quality-stats store behind
  * m8_image_quality — the THIRTEENTH persisted artifact maintainer: as
  * media files land, each batch's images are decoded ONCE and their
  * luminance stats ([[Images.imageStats]] — the curation-filter inputs)
  * appended to the store, so downstream quality screens never re-decode
  * the corpus.
  *
  * A row's stats depend on nothing but its own bytes — semantically
  * protocol 1 — but the decode runs in `mapPartitions` (ImageIO is not an
  * expression), which a streaming transform cannot host, so the landing
  * goes through [[ExactlyOnce.drainAvailableNow]] + batch_id partitions
  * ([[ExactlyOnce.landBatchPartition]], protocol 2): a replayed batch
  * recomputes the identical per-row stats and overwrites exactly its own
  * partition — byte-identical, exactly once.
  */
object StreamingImageStats {

  /** Drain new media files once (AvailableNow), landing each batch's
    * (media_id, stats…) rows under its `batch_id=` partition. Re-invoke
    * per ingest cycle; safe to re-run after a crash at any point.
    * @param batchHook invoked AFTER the batch's write, BEFORE the
    *                  checkpoint commit — lets specs simulate the
    *                  output-landed/commit-lost crash window. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, binCol: String, storePath: String, checkpoint: String,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        ExactlyOnce.landBatchPartition(
          Images.imageStats(batch, idCol, binCol), storePath, batchId)
        batchHook(batchId)
    }

  /** The maintained store in [[Images.imageStats]] shape (batch_id
    * stripped); None before the first drain. */
  def statsView(spark: SparkSession, storePath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, storePath))
      Some(spark.read.parquet(storePath).drop("batch_id"))
    else None
}
