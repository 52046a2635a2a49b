package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement harness for the substring-dedup family: at each arg dir,
  * time (a) the full corpus pass (`substringDedupSpans`) and (b) folding a
  * FIXED 500-doc batch against the dir's persisted window index
  * (`incrementalSubstringSpans`; index build untimed — it is the persisted
  * artifact the incremental premise assumes). The full pass should scale
  * ~linearly in corpus windows (one content-keyed shuffle); the incremental
  * fold's only corpus-sized work is the index probe join, so its growth
  * measures how the probe behaves as the index grows.
  */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (dir <- args) {
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val nDocs = docs.count()
      def fullOnce(): Unit =
        Dedup.substringDedupSpans(docs, "doc_id", "text", 40)
          .write.format("noop").mode("overwrite").save()
      val idxPath = "/tmp/graft-d16-idx-" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      Dedup.substringWindowIndex(docs, "text", 40)
        .write.mode("overwrite").parquet(idxPath)
      val index = spark.read.parquet(idxPath)
      val batch = docs.filter(col("doc_id") < 500)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      def incOnce(): Unit =
        Dedup.incrementalSubstringSpans(batch, index, "doc_id", "text", 40)
          .write.format("noop").mode("overwrite").save()
      fullOnce(); incOnce() // warm
      System.gc()
      val tf = timed(fullOnce())
      System.gc()
      val ti = timed(incOnce())
      println(f"""{"dir":"$dir","n_docs":$nDocs,"full_secs":$tf%.2f,"inc_secs":$ti%.2f}""")
    }
    spark.stop()
  }
}
