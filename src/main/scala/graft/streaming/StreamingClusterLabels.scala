package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Dedup
import graft.sources.Writers

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
  * containing changed rows (dynamic partition overwrite): ids never move
  * buckets, changed rows are sized by the touched components, and an
  * untouched bucket's files are never rewritten. Exactly-once: the write
  * is one job (all-or-nothing visibility), and re-folding an
  * already-landed batch is a semantic no-op — its pairs connect
  * already-connected vertices, so the replay rewrites the same buckets
  * with identical rows.
  */
object StreamingClusterLabels {

  /** Drain available pair files once (AvailableNow), folding each batch
    * into the label store at `labelsPath`. Re-invoke per ingest cycle;
    * safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the pair files' schema
    * @param nBuckets     stable id-hash partition count of the store
    * @param batchHook    post-write, pre-commit hook for crash specs */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          id1Col: String, id2Col: String, labelsPath: String,
          checkpoint: String, nBuckets: Int = 64,
          batchHook: Long => Unit = _ => ()): Unit = {
    val stream = spark.readStream.schema(schemaSource.schema).parquet(inGlob)
    val q = stream.writeStream
      .foreachBatch { (pairs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prior = labelsSoFar(spark, labelsPath).getOrElse(
          pairs.select(col(id1Col).as("id"),
            col(id1Col).as("component")).limit(0))
        val (changed, updated) =
          Dedup.incrementalCcDelta(prior, pairs, id1Col, id2Col)
        val bucket = pmod(xxhash64(col("id")), lit(nBuckets))
        // full content of every bucket that holds a changed row; dynamic
        // overwrite replaces exactly those partitions and no others
        val affected = changed.select(bucket.as("bucket")).distinct()
        val frame = updated.withColumn("bucket", bucket)
          .join(broadcast(affected), Seq("bucket"), "left_semi")
        Writers.overwritePartitions(frame, labelsPath, Seq("bucket"))
        batchHook(batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The maintained labels in [[Dedup.connectedComponents]] shape (bucket
    * column stripped); None before the first drain. */
  def labelsSoFar(spark: SparkSession, labelsPath: String): Option[DataFrame] = {
    val p = new Path(labelsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      Some(spark.read.parquet(labelsPath).select("id", "component"))
    else None
  }
}
