package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Web

/** Streaming maintenance of the per-domain cap membership store — the
  * SEVENTH ExactlyOnce maintainer (protocol 2): the persisted artifact is
  * the set of KEPT (domain, doc) rows, so the cap's state is just the
  * store's per-domain row count. Each micro-batch ranks its own docs
  * within each domain (md5 order — deterministic under replay), admits
  * them while the prior count from every OTHER batch's partition leaves
  * quota, and lands its admissions under its `batch_id=` partition.
  *
  * Crash window: a replay after a landed-write/lost-commit crash excludes
  * its own partition from the prior counts and re-ranks the identical
  * batch rows — byte-identical output, exactly once (the
  * StreamingContentHashIndex argument; later batches cannot have run
  * because the checkpoint never committed).
  *
  * Arrival-order priority is the SEMANTIC of the incremental cap (earlier
  * uploads hold their quota — the d12 later-batches-demoted rule), so
  * unlike the content-hash index the streamed store is NOT compared to a
  * global batch rebuild: the spec pins it against the sequential
  * [[Web.incrementalDomainCap]] fold, which is the batch twin of the same
  * semantic. */
object StreamingDomainMembership {

  /** Drain new files once (AvailableNow), admitting each batch's docs to
    * the capped membership store. `schemaSource` carries (idCol,
    * domainCol) schema. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          idCol: String, domainCol: String, cap: Int, storePath: String,
          checkpoint: String, batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val admitted = rawStore(spark, storePath) match {
          case Some(st) =>
            Web.incrementalDomainCap(
              st.filter(col("batch_id") =!= batchId)
                .select(col(idCol), col(domainCol)),
              batch, idCol, domainCol, cap)
          case None =>
            Web.incrementalDomainCap(
              batch.filter(lit(false)).select(col(idCol), col(domainCol)),
              batch, idCol, domainCol, cap)
        }
        ExactlyOnce.landBatchPartition(
          admitted.filter(col("kept")).select(col(idCol), col(domainCol)),
          storePath, batchId)
        batchHook(batchId)
    }

  /** The maintained membership store as (idCol, domainCol) rows; None
    * before the first drain. */
  def storeSoFar(spark: SparkSession, storePath: String,
                 idCol: String, domainCol: String): Option[DataFrame] =
    rawStore(spark, storePath).map(_.select(col(idCol), col(domainCol)))

  private def rawStore(spark: SparkSession, storePath: String): Option[DataFrame] =
    if (ExactlyOnce.storeNonEmpty(spark, storePath))
      Some(spark.read.parquet(storePath))
    else None
}
