package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming maintenance of the [[Dedup.connectedComponents]] label table —
  * the third persisted dedup artifact to get a stream maintainer (band
  * index: [[StreamingBandIndex]]; content-hash index:
  * [[StreamingContentHashIndex]]): each micro-batch of near-dup PAIRS folds
  * into the persisted (id, component) table via
  * [[Dedup.incrementalCcDelta]], so cluster labels stay current without a
  * batch CC rebuild anywhere.
  *
  * Unlike the two index maintainers, label updates REWRITE existing rows
  * (a merge relabels a whole component), so the store is hive-partitioned
  * by a stable id-hash bucket and each batch overwrites ONLY the buckets
  * containing changed rows: ids never move buckets, changed rows are sized
  * by the touched components, and an untouched bucket's files are never
  * rewritten. The multi-bucket overwrite is made exactly-once by
  * [[ExactlyOnce.Journal]] (protocol 3): journal the affected buckets'
  * full content, apply, mark applied; recovery redoes any
  * complete-but-unapplied journal, and re-folding an already-applied batch
  * is a semantic no-op (its pairs connect already-connected vertices), so
  * checkpoint replay is safe at any crash point.
  */
object StreamingClusterLabels {

  /** Drain available pair files once (AvailableNow), folding each batch
    * into the label store at `labelsPath`. Re-invoke per ingest cycle;
    * safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the pair files' schema
    * @param nBuckets     stable id-hash partition count of the store —
    *                     size with [[bucketsForStore]] (the 64 default is
    *                     right only while the store holds ≲64M rows; it
    *                     must stay CONSTANT for a store's lifetime)
    * @param journalHook  post-journal, pre-apply hook for crash specs
    * @param batchHook    post-apply, pre-commit hook for crash specs */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          id1Col: String, id2Col: String, labelsPath: String,
          checkpoint: String, nBuckets: Int = 64,
          journalHook: Long => Unit = _ => (),
          batchHook: Long => Unit = _ => ()): Unit = {
    val journal = ExactlyOnce.Journal(labelsPath, Seq("bucket"))
    journal.recover(spark)
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (pairs, batchId) =>
        journal.recover(spark)
        val prior = labelsSoFar(spark, labelsPath).getOrElse(
          pairs.select(col(id1Col).as("id"),
            col(id1Col).as("component")).limit(0))
        val (changed, updated) =
          Dedup.incrementalCcDelta(prior, pairs, id1Col, id2Col)
        val bucket = pmod(xxhash64(col("id")), lit(nBuckets))
        // full content of every bucket that holds a changed row; the
        // journal apply later replaces exactly those partitions
        val affected = changed.select(bucket.as("bucket")).distinct()
          .localCheckpoint(true)
        if (!affected.isEmpty) { // an empty batch has no buckets to touch
          val frame = updated.withColumn("bucket", bucket)
            .join(broadcast(affected), Seq("bucket"), "left_semi")
          journal.land(frame, batchId)
          journalHook(batchId)
          journal.applyBatch(spark, batchId)
          journal.markApplied(spark, batchId)
        }
        batchHook(batchId)
    }
  }

  /** Bucket count for a label store of `nRows`: pins bucket SIZE (default
    * 1M rows) instead of bucket COUNT. Each affected bucket is rewritten
    * WHOLE (journal + apply), so per-batch cost is
    * touched_buckets × (c_dir + bucket_rows / throughput), where c_dir is
    * the fixed per-partition-directory cost of the dynamic overwrite.
    * Both extremes lose: a FIXED bucket count degrades to a full-store
    * rewrite once the store grows (rewrite rows ∝ store), while TINY
    * buckets pay c_dir per touched dir — measured ≈0.45 s/dir against
    * ≈3M rewrite rows/s (SclProbe, PLANS round 10: nb=1800 folds took
    * 10× longer than nb=64 at the same store). The cost-minimizing bucket
    * size is c_dir × throughput ≈ 1.4M rows; the 1M default sits at that
    * optimum, keeping per-batch cost ≈ touched_buckets × ~0.8 s,
    * independent of store size once the store outgrows one bucket. */
  def bucketsForStore(nRows: Long, targetRowsPerBucket: Long = 1000000L): Int =
    math.min(math.max(64L, nRows / targetRowsPerBucket), 1L << 20).toInt

  /** The maintained labels in [[Dedup.connectedComponents]] shape (bucket
    * column stripped); None before the first drain. */
  def labelsSoFar(spark: SparkSession, labelsPath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, labelsPath))
      Some(spark.read.parquet(labelsPath).select("id", "component"))
    else None

  /** Crash-recovery entry for external callers (specs, ops): re-apply any
    * complete-but-unapplied journal. */
  def recover(spark: SparkSession, labelsPath: String): Unit =
    ExactlyOnce.Journal(labelsPath, Seq("bucket")).recover(spark)
}
