package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Checks

/** Streaming maintenance of a functional-dependency / candidate-key audit
  * ([[graft.operators.Checks.fdAudit]]) — the FOURTEENTH ExactlyOnce
  * maintainer: ingest keeps per-rule violation counts current so data
  * contracts are monitored per drain instead of by rescanning history.
  *
  * Each micro-batch lands its (LHS[, RHS]) group COUNTS — a pure function
  * of the batch — under its `batch_id=` partition via protocol 2
  * ([[ExactlyOnce.landBatchPartition]]). No cross-batch read exists
  * because count-merge is ASSOCIATIVE: the reader folds the store with one
  * `groupBy(lhs).agg(sum(cnt), count_distinct(rhs))`
  * ([[mergedAudit]] — spec-pinned equal to the batch audit over the full
  * history), so a replayed batch overwrites its own partition with
  * byte-identical rows and the merged report cannot drift. Store size is
  * bounded by Σ per-batch DISTINCT key groups — audit-dimension data,
  * independent of row volume. */
object StreamingFdMonitor {

  /** Drain new files from `inGlob` once (AvailableNow), landing each
    * batch's (lhs[, rhs], cnt) group counts under its batch_id partition.
    * Re-invoke per ingest cycle; safe to re-run after a crash.
    * @param rhs Some(col) = FD rule lhs → rhs; None = uniqueness rule */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          lhs: Seq[String], rhs: Option[String], storePath: String,
          checkpoint: String): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val keys = (lhs ++ rhs.toSeq).map(col)
        ExactlyOnce.landBatchPartition(
          batch.groupBy(keys: _*).agg(count(lit(1)).as("cnt")),
          storePath, batchId)
    }

  /** The maintained audit view — identical to
    * `Checks.fdAudit(fullHistory, rule, lhs, rhs)` (spec-pinned), in one
    * aggregation over the (audit-dimension-sized) store. */
  def mergedAudit(spark: SparkSession, storePath: String, rule: String,
                  lhs: Seq[String], rhs: Option[String]): DataFrame = {
    val store = spark.read.parquet(storePath)
    val grouped = rhs match {
      case Some(r) => store.groupBy(lhs.map(col): _*)
        .agg(sum("cnt").as("__n"),
          (countDistinct(col(r)) +
            max(when(col(r).isNull, 1L).otherwise(0L))).as("__nd"))
      case None => store.groupBy(lhs.map(col): _*)
        .agg(sum("cnt").as("__n"), lit(1L).as("__nd"))
    }
    Checks.fdReport(grouped, rule, fd = rhs.isDefined)
  }
}
