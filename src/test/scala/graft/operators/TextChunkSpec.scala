package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Chunk-window boundary cases the synthetic corpus may not hit: exact
  * window-size docs, one-past boundaries, and short docs must produce the
  * documented chunk counts and lengths. */
class TextChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksFor(n: Int, size: Int, stride: Int): Seq[(Int, Int)] = {
    val doc = Seq((1L, (1 to n).map(i => s"w$i").toArray))
      .toDF("doc_id", "toks")
    TextOps.chunkWindows(doc, "doc_id", "toks", size, stride)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("n_toks"))).toSeq
  }

  test("chunk counts and tail lengths at the stride boundaries") {
    // shorter than one window: one (short) chunk
    assert(chunksFor(10, 64, 48) === Seq((0, 10)))
    // exactly one window
    assert(chunksFor(64, 64, 48) === Seq((0, 64)))
    // one past: second chunk holds the 17-token tail (48 + 17 = 65)
    assert(chunksFor(65, 64, 48) === Seq((0, 64), (1, 17)))
    // exactly two strides + full window: 48*1 + 64 = 112 -> 2 chunks
    assert(chunksFor(112, 64, 48) === Seq((0, 64), (1, 64)))
    // one past that: third chunk is the 17-token tail at offset 96
    // (113 - 96 = 17)
    assert(chunksFor(113, 64, 48) === Seq((0, 64), (1, 64), (2, 17)))
  }

  test("chunk content is the exact token slice") {
    val doc = Seq((1L, (1 to 7).map(_.toString).toArray)).toDF("doc_id", "toks")
    val out = TextOps.chunkWindows(doc, "doc_id", "toks", size = 4, stride = 2)
      .orderBy("chunk_idx").collect()
    val expectSha = Seq("1 2 3 4", "3 4 5 6", "5 6 7").map(s =>
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    assert(out.map(_.getAs[String]("chunk_sha")).toSeq === expectSha)
  }
}
