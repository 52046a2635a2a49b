package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BinarySig

/** Streaming maintenance of the 1-bit sign-signature index behind
  * [[graft.operators.Similarity.hammingTopKIndexed]] — the TWELFTH
  * persisted artifact maintainer, protocol 1 (stateless per-row function →
  * append file sink): a vector's signature depends on nothing but the
  * vector, so the maintainer is the packing expression plus one
  * [[ExactlyOnce.appendFileSink]] call.
  *
  * Unlike the LSH vector index (pinned plane count), the sign bitmap has
  * NO corpus-sized parameter at all — the coordinate hyperplanes are fixed
  * by the embedding space itself — so the index never needs a rebuild as
  * the corpus grows; the search stays exhaustive over 8-byte rows and the
  * recall knob is the search-side rerankR.
  */
object StreamingBinarySigIndex {

  /** Drain new embedding files once (AvailableNow), appending (cid, sig)
    * rows to `indexPath` — exactly the frame
    * [[graft.operators.Similarity.hammingTopKIndexed]] probes. Re-invoke
    * per ingest cycle; safe to re-run after a crash at any point. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, vecCol: String, indexPath: String,
          checkpoint: String): Unit =
    ExactlyOnce.appendFileSink(spark, inGlob, schemaSource, indexPath,
        checkpoint) { stream =>
      sigRows(stream, idCol, vecCol)
    }

  /** The per-row packing both the stream and the batch builder share. */
  def sigRows(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("cid"),
      BinarySig.signPack(expr(s"transform($vecCol, x -> cast(x as double))"))
        .as("sig"))
}
