package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Streaming maintenance of the HLL register store
  * ([[graft.operators.Sketches.hllRegister]]) — the NINTH ExactlyOnce
  * maintainer: ingest keeps per-group cardinality registers current so
  * distinct-count estimates never rescan history — the sketch's whole
  * point at stream scale.
  *
  * Each micro-batch's register is a pure function of the batch (a
  * batch-local groupBy max — legal inside foreachBatch, illegal as a
  * streaming aggregate), landed under its `batch_id=` partition via
  * protocol 2 ([[ExactlyOnce.landBatchPartition]]); no cross-batch read
  * exists because max-merge is ASSOCIATIVE — the reader folds the store
  * with one `groupBy(group, bucket).max(mj)` ([[mergedRegister]]), so a
  * replayed batch overwrites its own partition with byte-identical rows
  * and the merged view cannot drift. Store size is bounded by
  * batches × groups × 256 rows, independent of input volume. */
object StreamingHllRegister {

  /** Drain new files from `inGlob` once (AvailableNow), landing each
    * batch's (group, bucket, mj) register under its batch_id partition.
    * Re-invoke per ingest cycle; safe to re-run after a crash.
    * @param schemaSource batch frame carrying the input schema
    * @param valueSql     STRING expression to sketch (hash input) */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          groupCol: String, valueSql: String, storePath: String,
          checkpoint: String): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        ExactlyOnce.landBatchPartition(
          Sketches.hllRegister(batch, groupCol, valueSql), storePath, batchId)
    }

  /** The maintained register view: max-merge across batch partitions —
    * identical to a batch-built register over the full history (spec-
    * pinned), in one aggregation over the (tiny) store. */
  def mergedRegister(spark: SparkSession, storePath: String,
                     groupCol: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col(groupCol), col("bucket"))
      .agg(max("mj").as("mj"))
}
