package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the [[graft.operators.Dedup.contentHashIndex]]
  * artifact — the exact-dedup twin of [[StreamingBandIndex]]: ingest
  * appends each batch's NEVER-SEEN distinct (content_hash, kept_id) rows
  * to the persisted index exactly once, so `incrementalExactDedup` always
  * runs against a current index with no corpus-wide rehash anywhere.
  *
  * Unlike the band index (a pure per-row function, plain file sink), new
  * index rows depend on what is already indexed — so each micro-batch
  * anti-joins its distinct hashes against the index built by every OTHER
  * batch and lands the survivors via [[ExactlyOnce.landBatchPartition]]
  * (protocol 2): a replayed batch re-reads the same registry files,
  * excludes its own partition from the anti-join side, and overwrites only
  * that partition — byte-identical output, exactly once.
  *
  * Row identity with the batch-built index holds when ids are monotone in
  * arrival order (each content's minimum id arrives in its earliest
  * batch) — the natural ingest shape; the spec pins it across drains.
  * Null-text rows hash to null and are dropped, matching
  * `incrementalExactDedup`.
  */
object StreamingContentHashIndex {

  /** Drain new files from `inGlob` once (AvailableNow), appending the
    * never-seen (content_hash, kept_id) rows to `indexPath` partitioned by
    * batch id. Re-invoke per ingest cycle; safe to re-run after a crash at
    * any point.
    * @param schemaSource batch frame carrying the input schema
    * @param batchHook    invoked AFTER the batch's write, BEFORE the
    *                     checkpoint commit — lets specs simulate the
    *                     output-landed/commit-lost crash window. No-op in
    *                     production. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, textCol: String, indexPath: String, checkpoint: String,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val hashed = batch
          .select(md5(col(textCol)).as("content_hash"), col(idCol))
          .filter(col("content_hash").isNotNull)
          .groupBy("content_hash").agg(min(col(idCol)).as("kept_id"))
        val fresh = rawIndex(spark, indexPath) match {
          case Some(idx) =>
            // exclude this batch's own partition: a replay after a landed
            // write must not anti-join against its previous self
            hashed.join(
              idx.filter(col("batch_id") =!= batchId).select("content_hash"),
              Seq("content_hash"), "left_anti")
          case None => hashed
        }
        ExactlyOnce.landBatchPartition(fresh, indexPath, batchId)
        batchHook(batchId)
    }

  /** The maintained index in [[graft.operators.Dedup.contentHashIndex]]
    * shape (batch_id stripped); None before the first drain. */
  def indexSoFar(spark: SparkSession, indexPath: String): Option[DataFrame] =
    rawIndex(spark, indexPath).map(_.select("content_hash", "kept_id"))

  private def rawIndex(spark: SparkSession, indexPath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, indexPath))
      Some(spark.read.parquet(indexPath))
    else None
}
