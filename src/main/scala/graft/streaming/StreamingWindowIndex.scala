package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the
  * [[graft.operators.Dedup.substringWindowIndex]] artifact — the substring-
  * dedup twin of [[StreamingContentHashIndex]]: ingest appends each batch's
  * NEVER-SEEN distinct `w`-codepoint windows to the persisted index exactly
  * once, so `incrementalSubstringSpans` always probes a current index with
  * no corpus-wide window regeneration anywhere.
  *
  * Presence-only rows make this the simplest index of the family: a window
  * row carries no id, so absorption is a pure distinct + anti-join. Each
  * micro-batch anti-joins its distinct windows against the index built by
  * every OTHER batch and lands the survivors via
  * [[ExactlyOnce.landBatchPartition]] (protocol 2): a replayed batch
  * re-reads the same registry files, excludes its own partition from the
  * anti-join side, and overwrites only that partition — byte-identical
  * output, exactly once. Unlike the content-hash index there is no
  * id-monotonicity caveat: the streamed index equals the batch-built one
  * over ANY arrival order, because presence is order-free.
  */
object StreamingWindowIndex {

  /** Drain new files from `inGlob` once (AvailableNow), appending the
    * never-seen distinct windows to `indexPath` partitioned by batch id.
    * Re-invoke per ingest cycle; safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the input schema
    * @param batchHook    invoked AFTER the batch's write, BEFORE the
    *                     checkpoint commit — lets specs simulate the
    *                     output-landed/commit-lost crash window. No-op in
    *                     production. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          textCol: String, w: Int, indexPath: String, checkpoint: String,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val wins = batch
          .select(explode(graft.functions.SlidingWindows
            .slidingWindows(col(textCol), w)).as("win"))
          .distinct()
        val fresh = rawIndex(spark, indexPath) match {
          case Some(idx) =>
            // exclude this batch's own partition: a replay after a landed
            // write must not anti-join against its previous self
            wins.join(
              idx.filter(col("batch_id") =!= batchId).select("win"),
              Seq("win"), "left_anti")
          case None => wins
        }
        ExactlyOnce.landBatchPartition(fresh, indexPath, batchId)
        batchHook(batchId)
    }

  /** The maintained index in [[graft.operators.Dedup.substringWindowIndex]]
    * shape (batch_id stripped); None before the first drain. */
  def indexSoFar(spark: SparkSession, indexPath: String): Option[DataFrame] =
    rawIndex(spark, indexPath).map(_.select("win"))

  private def rawIndex(spark: SparkSession, indexPath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, indexPath))
      Some(spark.read.parquet(indexPath))
    else None
}
