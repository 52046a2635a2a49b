package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
  * containing changed rows: ids never move buckets, changed rows are sized
  * by the touched components, and an untouched bucket's files are never
  * rewritten.
  *
  * Exactly-once across the MULTI-partition overwrite (whose commit swaps
  * bucket dirs one at a time — not atomic on its own) is a redo journal:
  * each batch first lands the full content of its affected buckets under
  * `<labelsPath>.journal/batch=<id>` (the write's own `_SUCCESS` is the
  * completeness marker), then applies it to the store, then drops an
  * applied marker. Recovery (run at start and before every fold) re-applies
  * any complete-but-unapplied journal — overwriting the same buckets with
  * the same rows, so it is idempotent at any crash point: journal
  * incomplete → store untouched, the batch simply replays; apply partial →
  * redo completes it; marker lost → redo is a no-op rewrite. Re-folding an
  * already-applied batch is a semantic no-op (its pairs connect
  * already-connected vertices), so checkpoint replay is safe too.
  */
object StreamingClusterLabels {

  /** Drain available pair files once (AvailableNow), folding each batch
    * into the label store at `labelsPath`. Re-invoke per ingest cycle;
    * safe to re-run after a crash at any point.
    * @param schemaSource batch frame carrying the pair files' schema
    * @param nBuckets     stable id-hash partition count of the store
    * @param journalHook  post-journal, pre-apply hook for crash specs
    * @param batchHook    post-apply, pre-commit hook for crash specs */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          id1Col: String, id2Col: String, labelsPath: String,
          checkpoint: String, nBuckets: Int = 64,
          journalHook: Long => Unit = _ => (),
          batchHook: Long => Unit = _ => ()): Unit = {
    recover(spark, labelsPath)
    val stream = spark.readStream.schema(schemaSource.schema).parquet(inGlob)
    val q = stream.writeStream
      .foreachBatch { (pairs: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        recover(spark, labelsPath)
        val prior = labelsSoFar(spark, labelsPath).getOrElse(
          pairs.select(col(id1Col).as("id"),
            col(id1Col).as("component")).limit(0))
        val (changed, updated) =
          Dedup.incrementalCcDelta(prior, pairs, id1Col, id2Col)
        val bucket = pmod(xxhash64(col("id")), lit(nBuckets))
        // full content of every bucket that holds a changed row; dynamic
        // overwrite later replaces exactly those partitions and no others
        val affected = changed.select(bucket.as("bucket")).distinct()
          .localCheckpoint(true)
        if (!affected.isEmpty) { // an empty batch has no buckets to touch
          val frame = updated.withColumn("bucket", bucket)
            .join(broadcast(affected), Seq("bucket"), "left_semi")
          val jdir = journalDir(labelsPath, batchId)
          frame.write.mode(SaveMode.Overwrite).parquet(jdir)
          journalHook(batchId)
          applyJournal(spark, jdir, labelsPath)
          markApplied(spark, labelsPath, batchId)
        }
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
    // hidden/underscore-only content (a crashed first write's staging or a
    // bare _SUCCESS) is NOT a store — parquet would fail schema inference
    val hasData = fs.exists(p) && fs.listStatus(p).exists { s =>
      val n = s.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (hasData) Some(spark.read.parquet(labelsPath).select("id", "component"))
    else None
  }

  private def journalDir(labelsPath: String, batchId: Long): String =
    s"$labelsPath.journal/batch=$batchId"

  private def appliedMarker(labelsPath: String, batchId: Long): Path =
    new Path(s"$labelsPath.applied/batch-$batchId")

  private def applyJournal(spark: SparkSession, jdir: String,
                           labelsPath: String): Unit =
    Writers.overwritePartitions(
      spark.read.parquet(jdir), labelsPath, Seq("bucket"))

  private def markApplied(spark: SparkSession, labelsPath: String,
                          batchId: Long): Unit = {
    val m = appliedMarker(labelsPath, batchId)
    val fs = m.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
    // prune superseded journals: once batch N is applied, earlier redo
    // records can never be needed again (recovery is always newest-first
    // impossible — batches apply in order)
    val jroot = new Path(s"$labelsPath.journal")
    if (fs.exists(jroot)) fs.listStatus(jroot).foreach { s =>
      val bid = s.getPath.getName.stripPrefix("batch=")
      if (bid.forall(_.isDigit) && bid.toLong < batchId) {
        fs.delete(s.getPath, true)
        fs.delete(appliedMarker(labelsPath, bid.toLong), false)
      }
    }
  }

  /** Re-apply any COMPLETE (journal `_SUCCESS` present) but unapplied
    * journal — idempotent redo of the bucket overwrite. Incomplete
    * journals are ignored: the store was never touched for them and the
    * stream will simply replay the batch. */
  def recover(spark: SparkSession, labelsPath: String): Unit = {
    val jroot = new Path(s"$labelsPath.journal")
    val fs = jroot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(jroot)) return
    fs.listStatus(jroot).map(_.getPath).foreach { jdir =>
      val bid = jdir.getName.stripPrefix("batch=")
      if (bid.forall(_.isDigit) && bid.nonEmpty &&
          fs.exists(new Path(jdir, "_SUCCESS")) &&
          !fs.exists(appliedMarker(labelsPath, bid.toLong))) {
        applyJournal(spark, jdir.toString, labelsPath)
        markApplied(spark, labelsPath, bid.toLong)
      }
    }
  }
}
