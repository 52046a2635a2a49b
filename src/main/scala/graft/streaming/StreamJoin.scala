package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked stream-stream interval join: match each left event with
  * right events of the same key arriving within `window` AFTER it, as a
  * LEFT OUTER join — the attribution shape (view → purchase, request →
  * response, send → ack).
  *
  * State on both sides is bounded by the watermarks + interval condition:
  * a buffered left row can only match right rows with
  * rts ∈ [lts, lts + window], so once the right watermark passes
  * lts + window the row is evictable — matched rows emit immediately,
  * unmatched left rows emit with nulls exactly then (not before: earlier
  * emission could be contradicted by a late matching right event).
  */
object StreamJoin {

  /** Exactly-once file-stream left-outer interval join; both inputs and
    * the join state live in `checkpoint` across runs. Column names of the
    * two sides must be disjoint; `leftTs`/`rightTs` are event-time
    * timestamp columns. */
  def run(spark: SparkSession, leftGlob: String, leftProto: DataFrame,
          rightGlob: String, rightProto: DataFrame,
          leftTs: String, rightTs: String, leftKey: String, rightKey: String,
          outPath: String, checkpoint: String,
          delay: String = "30 minutes", window: String = "1 hour"): Unit = {
    val l = spark.readStream.schema(leftProto.schema).parquet(leftGlob)
      .withWatermark(leftTs, delay)
    val r = spark.readStream.schema(rightProto.schema).parquet(rightGlob)
      .withWatermark(rightTs, delay)
    val joined = l.join(r,
      expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
        s"AND $rightTs <= $leftTs + INTERVAL $window"),
      "leftOuter")
    val q = joined.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
