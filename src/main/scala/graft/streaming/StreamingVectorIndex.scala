package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming maintenance of the hyperplane-LSH vector index behind
  * [[Similarity.lshTopKPinned]] — the FOURTH persisted artifact maintainer,
  * and the proof of the [[ExactlyOnce]] extraction: band index and this one
  * are protocol 1 (stateless per-row function → append file sink), so the
  * whole maintainer is the bucketing expression plus one call.
  *
  * Stream-maintained ANN indexes are necessarily PINNED: the plane count is
  * fixed at index creation (`nPlanes`, choose with
  * [[Similarity.lshPlanesFor]] from the EXPECTED corpus size), because
  * re-sizing planes re-buckets every already-indexed vector — the
  * corpus-sized default that batch [[Similarity.lshTopK]] applies per call
  * cannot grow per micro-batch. When the corpus outgrows the pinned
  * occupancy envelope, rebuild the index at the next plane count — the
  * batch builder and this maintainer produce row-identical indexes
  * (spec-pinned), so the swap is a rebuild + path flip.
  */
object StreamingVectorIndex {

  /** Drain new embedding files once (AvailableNow), appending
    * (idCol, tbl, bucket) rows to `indexPath` — the shape
    * [[Similarity.lshTopKIndexed]] probes directly (rename idCol to `cid`
    * at read time). Re-invoke per ingest cycle; safe to re-run after a
    * crash at any point.
    * @param schemaSource batch frame carrying the input schema
    * @param vecCol       embedding column (array of float/double)
    * @param nPlanes      PINNED plane count per table (see scaladoc)
    * @param dim          embedding dimensionality
    * @param nTables      hash tables (bucket arrays per vector) */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, vecCol: String, indexPath: String, checkpoint: String,
          nPlanes: Int, dim: Int, nTables: Int = 2): Unit =
    ExactlyOnce.appendFileSink(spark, inGlob, schemaSource, indexPath,
        checkpoint) { stream =>
      bucketRows(stream, idCol, vecCol, nPlanes, dim, nTables)
    }

  /** The per-row bucketing both the stream and the batch builder share:
    * one pass over the vector computes all tables' buckets. */
  def bucketRows(df: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int, dim: Int, nTables: Int): DataFrame = {
    val vecD = expr(s"transform($vecCol, x -> cast(x as double))")
    df.select(col(idCol), vecD.as("__v"))
      .select(col(idCol), posexplode(
        Similarity.lshBucketsExpr("__v", nPlanes, dim, nTables))
        .as(Seq("tbl", "bucket")))
  }
}
