package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end streaming corpus pipeline — the streaming twin of the batch
  * `llm_corpus_filter` capstone: continuously-ingested documents are
  * exact-deduped within the watermark ([[StreamingDedup]], St-family
  * semantics), then stream-enriched against a broadcast dimension and
  * landed idempotently per micro-batch ([[StreamEnrich]], dynamic
  * partition overwrite keyed on batch id).
  *
  * Exactly-once story, end to end: each stage carries its own checkpoint.
  * Stage 1's file-source registry + dedup state guarantee a raw file is
  * folded in once and a within-watermark duplicate never lands twice;
  * stage 2 re-reads the deduped landing as a file stream, so its registry
  * picks up exactly the files stage 1 added, and a replayed batch (crash
  * after write, before commit — the worst window) overwrites its OWN
  * batch-id partition, making the replay byte-idempotent. Killing the
  * flow anywhere and re-running resumes from the checkpoints without
  * duplicating or losing rows.
  *
  * Scale shape: both stages are incremental drains (AvailableNow) — state
  * is bounded by the watermark (stage 1) and the unprocessed-file set
  * (stage 2), never corpus history; the enrichment dim re-broadcasts per
  * batch (slowly-changing dimension, latest wins).
  */
object StreamingCorpusFlow {

  /** Drain raw → deduped → enriched once. Re-invoke to fold in newly
    * arrived raw files; safe to re-invoke after a crash at any point.
    * @param batchHook test seam forwarded to [[StreamEnrich.run]]. */
  def run(spark: SparkSession, rawGlob: String, schemaSource: DataFrame,
          tsCol: String, textCol: String, dim: DataFrame, joinCol: String,
          workDir: String, delay: String = "30 minutes",
          batchHook: Long => Unit = _ => ()): Unit = {
    val dedupedPath = s"$workDir/deduped"
    val outPath = s"$workDir/enriched"
    StreamingDedup.run(spark, rawGlob, schemaSource, tsCol, textCol,
      dedupedPath, s"$workDir/ckpt_dedup", delay)
    // stage 1 has completed its drain, so the landed schema is readable;
    // nothing landed yet (no raw input at all) → nothing to enrich
    val landed =
      try spark.read.parquet(dedupedPath)
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    StreamEnrich.run(spark, dedupedPath, landed, dim, joinCol,
      outPath, s"$workDir/ckpt_enrich", batchHook)
  }
}
