package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{BinarySig, QuantizedVec}

/** Bandwidth-ladder probe for the 1-bit signature scan (s10): the SAME
  * synthetic corpus materialized as float64 arrays, int8 bytes, and packed
  * sign bitmaps, each brute-force-scanned for top-k. Extends Int8Probe's
  * measurement (PLANS r10) to the ladder's last rung — the hypothesis is
  * the same bandwidth-bound story with a further ~8× payload shrink over
  * int8.
  *
  * Usage: runMain graft.tools.BinSigProbe <n> [<n> ...]
  */
object BinSigProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (n <- args.map(_.toLong)) {
      val e = spark.range(n).select(col("id").as("cid"),
        expr("""transform(sequence(0, 63),
                 j -> (pmod(hash(id * 64 + j), 1000) / 1000.0d) - 0.5d)""").as("cvec"))
      val scratch = s"/tmp/graft-binsigprobe-${ProcessHandle.current().pid()}"
      val f64Path = s"$scratch/f64.parquet"
      val q8Path = s"$scratch/q8.parquet"
      val sigPath = s"$scratch/sig.parquet"
      e.write.mode("overwrite").parquet(f64Path)
      e.select(col("cid"),
          QuantizedVec.quantizeInt8(col("cvec"), 128.0).as("cq"))
        .write.mode("overwrite").parquet(q8Path)
      e.select(col("cid"), BinarySig.signPack(col("cvec")).as("sig"))
        .write.mode("overwrite").parquet(sigPath)
      val queries = e.filter(col("cid") < 20)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
        .localCheckpoint(true)
      val q8 = queries.select(col("qid"),
        QuantizedVec.quantizeInt8(col("qvec"), 128.0).as("__qq"))
        .localCheckpoint(true)
      val qs = queries.select(col("qid"),
        BinarySig.signPack(col("qvec")).as("__qs"))
        .localCheckpoint(true)

      def timeIt(mk: () => DataFrame): Double = {
        mk().count() // warm: JIT + page cache
        (1 to 2).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          mk().count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }

      import org.apache.spark.sql.expressions.Window
      import graft.functions.DotProduct.cosine
      val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
      val wh = Window.partitionBy("qid").orderBy(asc("ham"), asc("cid"))
      val floatSecs = timeIt(() => {
        spark.read.parquet(f64Path).crossJoin(broadcast(queries))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore", cosine(col("qvec"), col("cvec")))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      })
      val int8Secs = timeIt(() => {
        spark.read.parquet(q8Path).crossJoin(broadcast(q8))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore",
            QuantizedVec.quantizedDot(col("__qq"), col("cq")))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      })
      val sigSecs = timeIt(() => {
        spark.read.parquet(sigPath).crossJoin(broadcast(qs))
          .filter(col("qid") =!= col("cid"))
          .withColumn("ham", BinarySig.hamming(col("__qs"), col("sig")))
          .withColumn("rank", row_number().over(wh)).filter(col("rank") <= 10)
      })
      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
      }
      println(f"""{"n": $n, "float_secs": $floatSecs%.2f, "int8_secs": $int8Secs%.2f, "sig_secs": $sigSecs%.2f, "float_bytes": ${dirBytes(f64Path)}, "int8_bytes": ${dirBytes(q8Path)}, "sig_bytes": ${dirBytes(sigPath)}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      System.gc()
    }
    spark.stop()
  }
}
