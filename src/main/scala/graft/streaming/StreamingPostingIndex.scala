package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Ir

/** Streaming maintenance of the inverted posting index
  * ([[graft.operators.Ir.postings]]) — the EIGHTH ExactlyOnce maintainer:
  * ingest appends each new document's (term, doc_id, tf, dl) rows exactly
  * once, so BM25 search runs against an index that is already current with
  * no corpus-wide rebuild anywhere.
  *
  * Postings are a pure per-document function (tokenize → count), so the
  * stream is STATELESS — protocol 1 ([[ExactlyOnce.appendFileSink]]), the
  * band-index twin: the file-source registry plus the file-sink manifest
  * give exactly-once, and a replayed batch overwrites its own uncommitted
  * files. Since the batch builder ([[Ir.postings]]) is itself a pure
  * explode of the native [[graft.functions.TermCounts]] kernel — no
  * groupBy anywhere — the stream runs the IDENTICAL code path, so
  * streamed and batch-built indexes are row-identical by construction
  * (the spec still pins it). The per-term df and the (N, T) corpus stats
  * that parameterize scoring are AGGREGATES over the store, recomputed by
  * the reader at search time (vocabulary-sized and 2 scalars respectively
  * — never maintained state, so there is nothing to drift).
  */
object StreamingPostingIndex {

  /** Drain new files from `inGlob` once (AvailableNow), appending posting
    * rows to `indexPath`. Re-invoke per ingest cycle; safe to re-run after
    * a crash at any point.
    * @param schemaSource batch frame carrying the input schema */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, textCol: String, indexPath: String,
          checkpoint: String): Unit =
    ExactlyOnce.appendFileSink(spark, inGlob, schemaSource, indexPath,
        checkpoint) { stream =>
      Ir.postings(stream, idCol, textCol)
    }
}
