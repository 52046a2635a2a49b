package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, ts: Timestamp, toks: Seq[String])

  private def ts(s: String) = Timestamp.valueOf(s)
  private val base = "the quick brown fox jumps over one lazy dog near the river".split(" ").toSeq

  test("watermark-bounded LSH near-dup pairs with state eviction") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Doc]
    val pairs = StreamingNearDup.pairs(input.toDF(), "doc_id", "ts", "toks",
      w = 2, k = 24, b = 6, minEst = 0.5, delayMs = 60000L)
    val q = pairs.writeStream.format("memory").queryName("neardup")
      .outputMode(OutputMode.Append).start()
    def found(): Set[(Long, Long)] = spark.table("neardup")
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    try {
      // doc 2 = exact copy of 1 (near-dup by construction, est 1.0);
      // doc 3 = one-token variant; doc 4 unrelated
      input.addData(
        Doc(1, ts("2024-01-01 10:00:00"), base),
        Doc(2, ts("2024-01-01 10:00:10"), base),
        Doc(3, ts("2024-01-01 10:00:20"), base.updated(4, "leaps")),
        Doc(4, ts("2024-01-01 10:00:30"),
          "completely different tokens about spark catalyst plans entirely".split(" ").toSeq))
      q.processAllAvailable()
      val first = found()
      assert(first.contains((1L, 2L)), s"exact copy must pair: $first")
      assert(first.contains((1L, 3L)) && first.contains((2L, 3L)),
        s"one-token variant must pair: $first")
      assert(!first.exists(p => p._1 == 4L || p._2 == 4L),
        s"unrelated doc must not pair: $first")
      // the exact copy agrees on the whole signature
      val est12 = spark.table("neardup").filter($"id1" === 1 && $"id2" === 2)
        .select("est_jaccard").as[Double].collect()
      assert(est12.nonEmpty && est12.forall(_ == 1.0))
      // near-dup estimate is high but below the exact-copy's 1.0
      val est13 = spark.table("neardup").filter($"id1" === 1 && $"id2" === 3)
        .select("est_jaccard").as[Double].collect()
      assert(est13.forall(e => e >= 0.5 && e < 1.0), est13.toSeq)

      // advance the watermark an hour: docs 1-4 evict from every bucket
      input.addData(Doc(5, ts("2024-01-01 11:10:00"),
        "filler advancing the watermark beyond the first batch retention".split(" ").toSeq))
      q.processAllAvailable()
      // a fresh copy of doc 1 after eviction: no cross-window pair
      input.addData(Doc(6, ts("2024-01-01 11:10:30"), base))
      q.processAllAvailable()
      assert(!found().exists(p => p._2 == 6L),
        s"evicted docs must not pair: ${found()}")
      // but a copy within doc 6's window pairs immediately
      input.addData(Doc(7, ts("2024-01-01 11:10:40"), base))
      q.processAllAvailable()
      assert(found().contains((6L, 7L)), s"in-window copy must pair: ${found()}")
    } finally q.stop()
  }

  test("signature agreement matches the signatures' actual overlap") {
    // deterministic unit check of the estimator itself
    val a = Array(1L, 2L, 3L, 4L)
    assert(StreamingNearDup.sigAgreement(a, a) == 1.0)
    assert(StreamingNearDup.sigAgreement(a, Array(1L, 2L, 9L, 9L)) == 0.5)
    assert(StreamingNearDup.sigAgreement(a, Array(9L, 9L, 9L, 9L)) == 0.0)
  }
}
