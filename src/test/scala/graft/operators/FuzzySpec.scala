package graft.operators

import graft.SparkSpec

/** Fuzzy.scala: deletion-variant generation and the blocked deletion join
  * — exactly the deletion-edit pairs, verified lev, multi-match. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  test("deletionVariants enumerates every 1-deletion with its position") {
    val v = Fuzzy.deletionVariants(Seq(("abc")).toDF("s"), "s").collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("variant"))).sorted.toSeq
    assert(v === Seq((1L, "bc"), (2L, "ac"), (3L, "ab")))
  }

  test("deletionJoin matches deletion-distance-1 pairs only, with multi-match") {
    val refs = Seq((1L, "ring"), (2L, "rink"), (3L, "kings"), (4L, "ping")).toDF("rid", "name")
    val probes = Seq((10L, "rin"), (11L, "king"), (12L, "xyz")).toDF("pid", "p")
    val got = Fuzzy.deletionJoin(probes, "pid", "p", refs, "rid", "name")
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("rid"))).toSet
    // "rin" = ring-'g' = rink-'k'; "king" = kings-'s'; "xyz" matches nothing
    assert(got === Set((10L, 1L), (10L, 2L), (11L, 3L)))
  }

  test("a doubled letter yields one distinct pair despite two equal variants") {
    val refs = Seq((1L, "aab")).toDF("rid", "name")
    val probes = Seq((10L, "ab")).toDF("pid", "p")
    val got = Fuzzy.deletionJoin(probes, "pid", "p", refs, "rid", "name").collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("lev") === 1L)
  }
}
