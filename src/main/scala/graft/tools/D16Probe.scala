package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measurement harness for the substring-dedup family: at each arg dir,
  * time (a) the full corpus pass (`substringDedupSpans`) in BOTH key forms
  * (window string vs 64-bit rolling hash) and (b) folding a FIXED 500-doc
  * batch against the dir's persisted window index, again in both forms
  * (index build untimed — it is the persisted artifact the incremental
  * premise assumes). The full pass should scale ~linearly in corpus
  * windows (one content-keyed shuffle); the incremental fold's only
  * corpus-sized work is the index probe join, which the 100× probe showed
  * is INDEX-SCAN-BOUND — the hashed 8-byte key is the bytes-scanned lever.
  * `SPARK_GRAFT_PARTS` overrides shuffle partitions (default 32) for the
  * spill adjudication at the top scale. */
object D16Probe {
  def main(args: Array[String]): Unit = {
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (dir <- args) {
      val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
      val nDocs = docs.count()
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      def fullOnce(): Unit =
        noop(Dedup.substringDedupSpans(docs, "doc_id", "text", 40))
      def fullHOnce(): Unit =
        noop(Dedup.substringDedupSpansHashed(docs, "doc_id", "text", 40))
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val idxPath = "/tmp/graft-d16-idx-" + tag
      val idxHPath = "/tmp/graft-d16-idxh-" + tag
      Dedup.substringWindowIndex(docs, "text", 40)
        .write.mode("overwrite").parquet(idxPath)
      Dedup.substringWindowIndexHashed(docs, "text", 40)
        .write.mode("overwrite").parquet(idxHPath)
      val index = spark.read.parquet(idxPath)
      val indexH = spark.read.parquet(idxHPath)
      val batch = docs.filter(col("doc_id") < 500)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      def incOnce(): Unit =
        noop(Dedup.incrementalSubstringSpans(batch, index, "doc_id", "text", 40))
      def incHOnce(): Unit =
        noop(Dedup.incrementalSubstringSpansHashed(batch, indexH, "doc_id", "text", 40))
      fullOnce(); incOnce(); fullHOnce(); incHOnce() // warm
      System.gc()
      val tf = timed(fullOnce())
      System.gc()
      val tfh = timed(fullHOnce())
      System.gc()
      val ti = timed(incOnce())
      System.gc()
      val tih = timed(incHOnce())
      println(f"""{"dir":"$dir","n_docs":$nDocs,"parts":$parts,"full_secs":$tf%.2f,"full_hashed_secs":$tfh%.2f,"inc_secs":$ti%.2f,"inc_hashed_secs":$tih%.2f}""")
    }
    spark.stop()
  }
}
