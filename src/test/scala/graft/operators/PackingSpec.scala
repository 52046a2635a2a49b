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

  test("property: distributed packing matches a sequential reference layout") {
    val budget = 256L
    val rnd = new scala.util.Random(42)
    // token lengths span the edge cases: 1, exactly budget, budget+1,
    // oversized multi-sequence docs
    def tok(): Long = rnd.nextInt(5) match {
      case 0 => 1L
      case 1 => budget
      case 2 => budget + 1
      case 3 => rnd.nextInt(3 * budget.toInt) + 1L
      case _ => rnd.nextInt(100) + 1L
    }
    val docs = for { shard <- Seq("A", "B", "C", "D", "E"); i <- 1 to 200 }
      yield (shard, i.toLong, tok())
    val packed = Packing.contiguousPack(
      docs.toDF("shard", "ord", "n_tok"), "shard", "ord", "n_tok", budget)
    val got = packed.select("shard", "ord", "tokens_before", "seq_id")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == docs.size)
    // independent reference: a sequential fold per shard
    docs.groupBy(_._1).foreach { case (shard, ds) =>
      var acc = 0L
      ds.sortBy(_._2).foreach { case (_, ord, n) =>
        assert(got((shard, ord)) == ((acc, acc / budget)),
          s"divergence at ($shard, $ord)")
        acc += n
      }
    }
    // conservation: per-shard seq_tokens sums equal the input token mass
    // (seq_ids need NOT be dense — an oversized doc spanning several
    // budgets leaves start-gaps by design, concat-then-chunk semantics)
    val stats = Packing.packStats(packed, "shard", "n_tok")
    val totals = stats.groupBy("shard")
      .agg(org.apache.spark.sql.functions.sum("seq_tokens"))
      .as[(String, Long)].collect().toMap
    docs.groupBy(_._1).foreach { case (sh, ds) =>
      assert(totals(sh) == ds.map(_._3).sum, s"token loss in shard $sh")
    }
  }
}
