package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming exact dedup of a continuously-ingested corpus — the streaming
  * counterpart of the batch d1 operator (`operators/Dedup.exactDedup`).
  *
  * State is BOUNDED by the watermark: `dropDuplicatesWithinWatermark` keeps
  * one state row per content hash seen within the lateness window and
  * evicts it once the watermark passes first-arrival + delay. At 100 TB/day
  * ingest the state tracks the window, not corpus history — re-ingesting
  * yesterday's document is the downstream batch dedup's job (run d1 over
  * the landed output), while the stream guarantees no duplicate lands twice
  * WITHIN the window, which is where ingest retries and producer replays
  * actually cluster.
  *
  * First occurrences are emitted immediately (no watermark wait) — the
  * dedup gate adds no landing latency.
  */
object StreamingDedup {

  /** Exactly-once file-stream dedup on md5(text): every run drains new
    * files (AvailableNow), appends first-seen documents to `outPath`, and
    * carries both the file registry and the dedup state in `checkpoint`. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          tsCol: String, textCol: String, outPath: String, checkpoint: String,
          delay: String = "30 minutes"): Unit = {
    val stream = spark.readStream.schema(schemaSource.schema).parquet(inGlob)
    val deduped = stream
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
