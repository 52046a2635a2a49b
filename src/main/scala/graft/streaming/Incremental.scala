package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental-processing semantics (SURVEY §2.9 St1–St4): the reference's
  * new/ongoing/processed state-dir choreography and processed-file registry
  * become a Structured Streaming file source with checkpointed exactly-once
  * file tracking, run with Trigger.AvailableNow (drain-what-exists batch
  * semantics, streaming bookkeeping).
  */
object Incremental {

  /** St1: exactly-once file ingestion. Every run processes only files not
    * recorded in the checkpoint, applies `transform`, and appends to
    * `outPath`. Blocking (awaits drain) — the batch-DAG-parity mode. */
  def processNewFiles(spark: SparkSession, inPath: String, schemaSource: DataFrame,
                      transform: DataFrame => DataFrame,
                      outPath: String, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schemaSource.schema).parquet(inPath)
    val q: StreamingQuery = transform(stream).writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
