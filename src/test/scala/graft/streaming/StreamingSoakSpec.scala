package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Streaming-capstone SOAK (VERDICT r6 item 5): 50 micro-batches at 10×
  * the spec family's usual corpus, watching the dedup state store the
  * whole way. The claim under test is the 100 TB story in
  * [[StreamingDedup]]'s scaladoc: state tracks the WATERMARK WINDOW, not
  * corpus history — so a long-running ingest holds a few batches' worth
  * of hashes steady while total landed rows grow without bound. A
  * regression here (state pinned by a missing watermark, eviction not
  * firing, duplicates extending lifetimes) shows up as monotone
  * numRowsTotal growth toward the corpus size.
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  test("50-batch soak: dedup state plateaus at the watermark window, not the corpus") {
    val root = Files.createTempDirectory("graft-soak").toString
    val in = s"$root/raw"
    val nBatches = 50
    val perBatch = 100

    // one file per micro-batch: batch b's docs sit 5 minutes after batch
    // b-1's, and 25 of b-1's docs are REPLAYED verbatim (same text ⇒ same
    // hash, within the 10-minute watermark — the producer-retry cluster)
    def doc(b: Int, i: Int) = {
      val id = b.toLong * perBatch + i
      (id, new Timestamp(t0 + b * 5L * 60000 + (i % 60) * 1000), s"doc $id")
    }
    (0 until nBatches).foreach { b =>
      val fresh = (0 until perBatch).map(doc(b, _))
      val replays = if (b == 0) Seq.empty
        else (0 until 25).map { i =>
          val (id, _, text) = doc(b - 1, perBatch - 25 + i)
          (id, new Timestamp(t0 + b * 5L * 60000), text) // re-sent NOW
        }
      (fresh ++ replays).toDF("doc_id", "ts", "text")
        .coalesce(1).write.parquet(f"$in/b$b%03d")
    }

    val proto = Seq((0L, new Timestamp(t0), "t")).toDF("doc_id", "ts", "text")
    val stream = spark.readStream.schema(proto.schema)
      .option("maxFilesPerTrigger", 1) // one ingest file = one micro-batch
      .parquet(s"$in/*")
    val deduped = stream
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_hash")
    val q = deduped.writeStream
      .format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val stateRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(p => p.batchId -> p.stateOperators.head.numRowsTotal)
    assert(stateRows.size >= 45, s"expected ~50 micro-batches, saw ${stateRows.size}")

    // eviction math: a hash first seen in batch b expires at its event
    // time + 10 min; the watermark trails the head by 10 min and advances
    // 5 min per batch, so a state row lives ~4-5 batches. Plateau ≈
    // 4-5 × perBatch ≈ 500; the cap below is that window with headroom,
    // and a fifth of the corpus — state pinned to history blows through it
    val corpus = nBatches.toLong * perBatch
    val cap = 8L * perBatch
    val peak = stateRows.map(_._2).max
    assert(peak <= cap, s"state peaked at $peak rows (> $cap): not evicting")
    assert(peak < corpus / 5, s"state $peak within 5x of corpus $corpus")
    // the plateau is REACHED and HELD: every post-warmup batch sits under
    // the cap too (monotone growth would pass a max-only check early)
    val steady = stateRows.drop(10)
    assert(steady.forall(_._2 <= cap),
      s"late-batch state exceeded the plateau: ${steady.filter(_._2 > cap)}")
    // and the store is genuinely populated (watermark actually trails)
    assert(steady.forall(_._2 >= perBatch),
      "state below one batch of hashes: watermark/eviction misconfigured")

    // exactly-once landing under the soak: every unique doc exactly once,
    // none of the 49 x 25 replays landed twice
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == corpus, s"landed ${out.count()}, want $corpus")
    assert(out.select("content_hash").distinct().count() == corpus)
  }
}
