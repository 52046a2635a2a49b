package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("contiguous fill: start-position assignment, boundary spans, oversized docs") {
    val docs = Seq(
      // shard A: 100+100 fill seq 0; 100 starts at 200 (seq 0, spills);
      // 300-token doc starts at 300 → seq 1 (oversized, owns it);
      // next starts at 600 → seq 2
      ("A", 1L, 100L), ("A", 2L, 100L), ("A", 3L, 100L), ("A", 4L, 300L), ("A", 5L, 50L),
      // shard B independent: restarts at 0
      ("B", 1L, 256L), ("B", 2L, 1L)
    ).toDF("source", "doc_id", "n_tok")
    val packed = Packing.contiguousPack(docs, "source", "doc_id", "n_tok", budget = 256L)
    val got = packed.select("source", "doc_id", "seq_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 0L), ("A", 4L, 1L), ("A", 5L, 2L),
      ("B", 1L, 0L), ("B", 2L, 1L)))
    val stats = Packing.packStats(packed, "source", "n_tok")
      .select("source", "seq_id", "n_docs", "seq_tokens")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats === Set(
      ("A", 0L, 3L, 300L), ("A", 1L, 1L, 300L), ("A", 2L, 1L, 50L),
      ("B", 0L, 1L, 256L), ("B", 1L, 1L, 1L)))
  }
}
