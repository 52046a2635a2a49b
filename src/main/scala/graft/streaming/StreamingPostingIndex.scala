package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  * files. The batch builder's groupBy is a streaming aggregate (illegal in
  * an append sink), so the stream computes each document's tf rows
  * PER ROW instead — distinct tokens mapped to their in-array counts, then
  * exploded — which yields the exact same (term, doc_id, tf, dl) row set
  * ([[rowsFor]]; the spec pins streamed == [[Ir.postings]]). The per-term
  * df and the (N, T) corpus stats that parameterize scoring are AGGREGATES
  * over the store, recomputed by the reader at search time (vocabulary-
  * sized and 2 scalars respectively — never maintained state, so there is
  * nothing to drift).
  */
object StreamingPostingIndex {

  /** Stateless per-row posting rows: struct array of (term, tf) over the
    * distinct tokens, exploded — no aggregation, so it is legal under a
    * streaming append sink and row-identical to [[Ir.postings]]. */
  def rowsFor(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split($textCol, ' '), t -> t <> '')").as("__toks"))
      .withColumn("dl", size(col("__toks")).cast("long"))
      .select(col("doc_id"), col("dl"),
        explode(expr(
          "transform(array_distinct(__toks), " +
            "t -> struct(t AS term, " +
            "CAST(size(filter(__toks, x -> x = t)) AS BIGINT) AS tf))"))
          .as("__p"))
      .select(col("__p.term").as("term"), col("doc_id"),
        col("__p.tf").as("tf"), col("dl"))

  /** Drain new files from `inGlob` once (AvailableNow), appending posting
    * rows to `indexPath`. Re-invoke per ingest cycle; safe to re-run after
    * a crash at any point.
    * @param schemaSource batch frame carrying the input schema */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, textCol: String, indexPath: String,
          checkpoint: String): Unit =
    ExactlyOnce.appendFileSink(spark, inGlob, schemaSource, indexPath,
        checkpoint) { stream =>
      rowsFor(stream, idCol, textCol)
    }
}
