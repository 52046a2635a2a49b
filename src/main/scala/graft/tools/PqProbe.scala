package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PqVec, QuantizedVec}
import graft.operators.Similarity

/** Measurement harness for the PQ claims: (1) once the corpus outgrows
  * cache the brute ANN scan is bandwidth-bound, so the nSub-byte code
  * payload (vs 64 int8 bytes vs 512 float bytes) sets the scan throughput;
  * (2) the quality price of that compression, measured as recall@1 of the
  * L2-ADC ranking against the float L2 brute-force ranking over the same
  * corpus and queries. Corpus vectors are a pure hash function of
  * (id, dim) — deterministic, re-runnable, in the embeddings envelope
  * (±0.5). Codebooks are trained per n (1 Lloyd iteration) and the train
  * time is reported separately from the scan.
  *
  * Usage: runMain graft.tools.PqProbe <n> [<n> ...]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nQ = 20
    for (n <- args.map(_.toLong)) {
      val e = spark.range(n).select(col("id").as("cid"),
        expr("""transform(sequence(0, 63),
                 j -> (pmod(hash(id * 64 + j), 1000) / 1000.0d) - 0.5d)""").as("cvec"))
      val scratch = s"/tmp/graft-pqprobe-${ProcessHandle.current().pid()}"
      val f64Path = s"$scratch/f64.parquet"
      val q8Path = s"$scratch/q8.parquet"
      val pqPath = s"$scratch/pq.parquet"
      e.write.mode("overwrite").parquet(f64Path)
      e.select(col("cid"),
          QuantizedVec.quantizeInt8(col("cvec"), 128.0).as("cq"))
        .write.mode("overwrite").parquet(q8Path)

      val tTrain0 = System.nanoTime()
      val cb = Similarity.pqCodebook(e, "cid", "cvec",
          dim = 64, nSub = 4, kCodes = 16, iters = 1)
        .localCheckpoint(true)
      Similarity.pqEncode(e, cb, "cid", "cvec", dim = 64, nSub = 4)
        .write.mode("overwrite").parquet(pqPath)
      val trainEncodeSecs = (System.nanoTime() - tTrain0) / 1e9

      val queries = e.filter(col("cid") < nQ)
        .select(col("cid").as("qid"), col("cvec").as("qvec"))
        .localCheckpoint(true)
      val q8 = queries.select(col("qid"),
        QuantizedVec.quantizeInt8(col("qvec"), 128.0).as("__qq"))
        .localCheckpoint(true)
      val luts = Similarity.pqLut(queries, cb, "qid", "qvec",
          dim = 64, nSub = 4, kCodes = 16)
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

      import graft.functions.DotProduct.cosine
      val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
      val wAsc = Window.partitionBy("qid").orderBy(asc("qscore"), asc("cid"))
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
      val pqSecs = timeIt(() => {
        spark.read.parquet(pqPath).crossJoin(broadcast(luts))
          .filter(col("qid") =!= col("cid"))
          .withColumn("qscore", PqVec.adcScore(col("lut"), col("codes"), 16))
          .withColumn("rank", row_number().over(wAsc)).filter(col("rank") <= 3)
      })

      // recall@1 vs the float L2 brute ranking (same metric PQ approximates)
      val exactW = Window.partitionBy("qid").orderBy(asc("d2"), asc("cid"))
      val exact1 = e.crossJoin(broadcast(queries))
        .filter(col("qid") =!= col("cid"))
        .withColumn("d2", graft.functions.DotProduct.dot(col("qvec"), col("qvec"))
          + graft.functions.DotProduct.dot(col("cvec"), col("cvec"))
          - lit(2.0) * graft.functions.DotProduct.dot(col("qvec"), col("cvec")))
        .withColumn("rank", row_number().over(exactW)).filter(col("rank") === 1)
        .select(col("qid"), col("cid").as("exact_cid"))
      val pq1 = spark.read.parquet(pqPath).crossJoin(broadcast(luts))
        .filter(col("qid") =!= col("cid"))
        .withColumn("qscore", PqVec.adcScore(col("lut"), col("codes"), 16))
        .withColumn("rank", row_number().over(wAsc)).filter(col("rank") === 1)
        .select(col("qid"), col("cid").as("pq_cid"))
      val hits = exact1.join(pq1, Seq("qid"))
        .filter(col("exact_cid") === col("pq_cid")).count()

      def dirBytes(p: String): Long = {
        val d = new java.io.File(p)
        Option(d.listFiles()).map(_.filter(_.isFile).map(_.length()).sum).getOrElse(0L)
      }
      println(f"""{"n": $n, "float_secs": $floatSecs%.2f, "int8_secs": $int8Secs%.2f, "pq_secs": $pqSecs%.2f, "train_encode_secs": $trainEncodeSecs%.2f, "float_bytes": ${dirBytes(f64Path)}, "int8_bytes": ${dirBytes(q8Path)}, "pq_bytes": ${dirBytes(pqPath)}, "recall1": ${hits.toDouble / nQ}}""")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(scratch))
      System.gc()
    }
    spark.stop()
  }
}
