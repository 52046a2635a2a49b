package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked windowed aggregation over a file stream (St4 modeled
  * stream-natively): event-time tumbling windows with a lateness bound;
  * append mode emits a window only once its watermark closes, so late
  * events inside the bound still count and older ones are dropped —
  * exactly the reference's "previous day only" late-data stance
  * (`dgv/metrics/task.py:110-126,293-294`).
  */
object WindowedCounts {

  /** Drain available input once; closed windows append to `outPath`. */
  def run(spark: SparkSession, inPath: String, schemaSource: DataFrame,
          tsCol: String, keyCol: String, outPath: String, checkpoint: String,
          windowLen: String = "1 hour", lateness: String = "30 minutes"): Unit = {
    val stream = spark.readStream.schema(schemaSource.schema).parquet(inPath)
    val agg = stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col(keyCol), col("cnt"))
    val q = agg.writeStream.format("parquet")
      .option("path", outPath).option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
