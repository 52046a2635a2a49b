package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Streaming maintenance of the dyadic range-sum register store
  * ([[graft.operators.Sketches.dyadicRegister]]) — the TENTH ExactlyOnce
  * maintainer: ingest keeps per-group multi-resolution counters current so
  * any [a, b] range count over the full history is answered from ≤ 2·16
  * register cells ([[graft.operators.Sketches.dyadicRangeCount]]) without
  * rescanning — the zone-map kept fresh at stream scale.
  *
  * Each micro-batch's register is a pure function of the batch (a
  * batch-local groupBy count — legal inside foreachBatch), landed under
  * its `batch_id=` partition via protocol 2
  * ([[ExactlyOnce.landBatchPartition]]). Cell SUM is ASSOCIATIVE (unlike
  * max it is not idempotent — replay safety comes from the protocol, not
  * the merge: a replayed batch OVERWRITES its own batch_id partition with
  * byte-identical rows, so the summed view cannot double-count). Store
  * size is bounded by batches × groups × the value domain (Σ 2^(16−l)
  * cells), independent of input volume. */
object StreamingDyadicRegister {

  /** Drain new files from `inGlob` once (AvailableNow), landing each
    * batch's (group, key, cnt) register under its batch_id partition.
    * Re-invoke per ingest cycle; safe to re-run after a crash.
    * @param valueCol BIGINT column in [0, 2^16) to register */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          groupCol: String, valueCol: String, storePath: String,
          checkpoint: String): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        ExactlyOnce.landBatchPartition(
          Sketches.dyadicRegister(batch, Seq(groupCol), valueCol),
          storePath, batchId)
    }

  /** The maintained register view: cell-sum across batch partitions —
    * identical to a batch-built register over the full history (spec-
    * pinned), in one aggregation over the (tiny) store. */
  def mergedRegister(spark: SparkSession, storePath: String,
                     groupCol: String): DataFrame =
    spark.read.parquet(storePath)
      .groupBy(col(groupCol), col("key"))
      .agg(sum("cnt").as("cnt"))
}
