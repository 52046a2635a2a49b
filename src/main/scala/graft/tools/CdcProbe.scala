package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for content-defined chunking (d23): one codegen'd pass per
  * doc + a hash aggregation on the md5 chunk key — the key space is
  * content-derived, so corpus-wide chunk dedup must stay ~linear in total
  * text volume. Measures the chunk + corpus-distinct pipeline at 1x and
  * 10x documents (ScaleGen dir) and reports chunk counts + wall time.
  *
  * Usage: runMain graft.tools.CdcProbe <sfDir> [<sfDir> ...]
  */
object CdcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (d <- args) {
      val docs = graft.Tables.documents(spark, d).select("doc_id", "text")
        .localCheckpoint(true)
      val nDocs = docs.count()
      def timed(): (Long, Long, Double) = {
        System.gc()
        val t0 = System.nanoTime()
        val ch = Dedup.contentDefinedChunks(docs, "doc_id", "text")
        val total = ch.count()
        val distinct = ch.select("chunk_md5").distinct().count()
        (total, distinct, (System.nanoTime() - t0) / 1e9)
      }
      timed() // warm
      val (total, distinct, secs) = timed()
      println(f"""{"dir": "$d", "docs": $nDocs, "chunks": $total, "distinct_chunks": $distinct, "secs": $secs%.2f}""")
      docs.unpersist()
    }
    spark.stop()
  }
}
