package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming maintenance of the [[Similarity.semClusterIndex]] artifact —
  * the FIFTH persisted-artifact maintainer, and like the vector index a
  * direct payoff of the [[ExactlyOnce]] extraction: ingest assigns each
  * batch against the FROZEN centroid codebook and lands the (vid, cid, v)
  * rows exactly once, so [[Similarity.incrementalSemDedup]] always probes a
  * current cluster-keyed store with no corpus re-clustering anywhere.
  *
  * The assignment is an aggregation (argmin over the broadcast codebook),
  * so it cannot run as a per-row streaming expression (protocol 1): each
  * micro-batch computes BATCH-local assignment inside foreachBatch —
  * depending only on the batch and the static centroids, never the rest of
  * the store — and lands under its `batch_id=` partition via
  * [[ExactlyOnce.landBatchPartition]] (protocol 2). A replayed batch
  * recomputes the identical rows against the identical codebook and
  * overwrites only its own partition: byte-identical, exactly once.
  *
  * Stream-maintained cluster indexes are necessarily FROZEN-codebook: a
  * centroid refit re-assigns every already-indexed vector (the same
  * pinning argument as [[StreamingVectorIndex]]'s plane count). When drift
  * accumulates, rebuild with [[Similarity.semClusterIndex]] and flip the
  * path — the batch builder and this maintainer produce row-identical
  * stores (spec-pinned).
  */
object StreamingSemClusterIndex {

  /** Drain new embedding files once (AvailableNow), appending assigned
    * (vid, cid, v) rows to `storePath` partitioned by batch id. Re-invoke
    * per ingest cycle; safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the input schema
    * @param centroids    the frozen codebook (cid, c) — from the original
    *                     [[Similarity.semClusterIndex]] build
    * @param batchHook    invoked AFTER the batch's write, BEFORE the
    *                     checkpoint commit — lets specs simulate the
    *                     output-landed/commit-lost crash window. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, vecCol: String, centroids: DataFrame,
          storePath: String, checkpoint: String,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val b = batch.select(col(idCol).as("__vid"),
          expr(s"transform($vecCol, x -> cast(x as double))").as("__v"))
        val rows = Similarity.assignClusters(b, centroids, "__vid", "__v")
          .join(b, Seq("__vid"))
          .select(col("__vid").as("vid"), col("cid"), col("__v").as("v"))
        ExactlyOnce.landBatchPartition(rows, storePath, batchId)
        batchHook(batchId)
    }

  /** The maintained store in [[Similarity.incrementalSemDedup]]'s index
    * shape (batch_id stripped); None before the first drain. */
  def indexSoFar(spark: SparkSession, storePath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, storePath))
      Some(spark.read.parquet(storePath).select("vid", "cid", "v"))
    else None
}
