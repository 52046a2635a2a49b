package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Scale probe for production BPE (t17b/t18b): wall time vs MERGE COUNT
  * for (a) the driver-local batched trainer over the bounded sample and
  * (b) the data-driven encode kernel over the full corpus. The r14 design
  * was O(merges) sequential Spark jobs for training and an unrolled
  * replace chain for encode; the rebuilt shape must be ~linear in merges
  * for training (each round rescans the shrinking sample once) and ~FLAT
  * for encode (greedy cost depends on row length, not table size).
  *
  * Usage: runMain graft.tools.BpeProbe <sfDir>
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val docs = graft.Tables.documents(spark, d)
      .filter(length(col("text")) > 0).select("doc_id", "text")
      .localCheckpoint(true)
    val nDocs = docs.count()
    val vocab = Bpe.sampleVocab(docs, "text", "doc_id")
    println(s"""{"dir": "$d", "docs": $nDocs, "sample_vocab": ${vocab.size}}""")

    def timeTrain(rounds: Int): (Vector[Bpe.Merge], Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val m = Bpe.trainBatched(vocab, rounds)
      (m, (System.nanoTime() - t0) / 1e9)
    }
    timeTrain(12) // warm
    val trains = Seq(12, 48, 192).map { r =>
      val (m, s) = timeTrain(r)
      println(f"""{"phase": "train", "rounds": $r, "merges": ${m.length}, "secs": $s%.3f}""")
      (m, s)
    }
    val (m1, s1) = trains.head
    val (m2, s2) = trains.last
    println(f"""{"phase": "train_exponent", "value": ${math.log(s2 / s1) / math.log(m2.length.toDouble / m1.length)}%.2f}""")

    def timeEncode(merges: Vector[Bpe.Merge]): Double = {
      System.gc()
      val t0 = System.nanoTime()
      docs.select(sum(length(graft.functions.BpeEncode.encode(col("text"), merges))))
        .collect()
      (System.nanoTime() - t0) / 1e9
    }
    val small = m1 // 12-round merges, already trained above
    val large = m2 // 192-round
    timeEncode(small) // warm
    val es = timeEncode(small)
    val el = timeEncode(large)
    println(f"""{"phase": "encode", "merges": ${small.length}, "secs": $es%.3f}""")
    println(f"""{"phase": "encode", "merges": ${large.length}, "secs": $el%.3f}""")
    println(f"""{"phase": "encode_exponent", "value": ${math.log(el / es) / math.log(large.length.toDouble / small.length)}%.2f}""")
    spark.stop()
  }
}
