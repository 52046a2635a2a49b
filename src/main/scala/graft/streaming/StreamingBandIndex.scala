package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MinhashBands

/** Streaming maintenance of the [[graft.operators.Dedup.minhashBandIndex]]
  * artifact — the piece that closes the incremental-dedup loop: ingest
  * appends each new document's band rows to the persisted index exactly
  * once, so the next `incrementalMinhashPairs` batch runs against an
  * index that is already current, with no corpus-wide rebuild anywhere.
  *
  * The stream is STATELESS — band rows are a pure per-row function of the
  * document (the native [[MinhashBands]] kernel), so there is no watermark
  * and no state store; exactly-once is [[ExactlyOnce.appendFileSink]]
  * (protocol 1: the file-source registry plus the file-sink manifest in
  * the checkpoint — a replayed batch overwrites its own uncommitted
  * files). Band layout and hash family are the batch operator's own — the
  * index a stream maintains and the index a batch job builds are
  * row-identical by construction, and the spec pins that equality.
  */
object StreamingBandIndex {

  /** Drain new files from `inGlob` once (AvailableNow), appending
    * (idCol, band_idx, bh) rows to `indexPath`. Re-invoke per ingest
    * cycle; safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the input schema
    * @param textCol      raw text column; tokens = whitespace split,
    *                     matching `TextOps.tokens` */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, textCol: String, indexPath: String, checkpoint: String,
          k: Int = 16, bands: Int = 8, w: Int = 3): Unit =
    ExactlyOnce.appendFileSink(spark, inGlob, schemaSource, indexPath,
        checkpoint) { stream =>
      stream
        .withColumn("__sb",
          MinhashBands.minhashBands(
            graft.operators.TextOps.tokens(col(textCol)), w, k, bands))
        .filter(col("__sb").isNotNull)
        .select(col(idCol), posexplode(col("__sb.bands")).as(Seq("band_idx", "bh")))
    }
}
