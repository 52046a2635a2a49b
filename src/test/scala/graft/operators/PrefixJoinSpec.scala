package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** prefixJaccardSelfJoin is EXACT: its pair set must equal the
  * brute-force all-pairs Jaccard join on a fixture with planted
  * near-dups, at-threshold pairs, and decoys below threshold. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private val tauPpm = 500000L

  // 30 base docs of 12 tokens from a 40-token vocab (deterministic),
  // plus planted variants: doc i+100 = doc i with 2 tokens swapped out
  // (J = 10/14 ≈ 0.714 — in), doc i+200 = doc i with 6 swapped
  // (J = 6/18 ≈ 0.33 — out), and 300/301 an exactly-at-threshold pair
  // (8 shared of 12+12 → J = 8/16 = 0.5 — in, >= is inclusive).
  private def fixture: Seq[(Long, Seq[String])] = {
    def tok(j: Long) = s"t${DetHash.md5Long(s"v:$j") % 40}"
    val base = (0L until 30L).map { i =>
      i -> (0L until 12L).map(j => tok(i * 31 + j)).distinct
    }
    val near = base.take(10).map { case (i, ts) =>
      (i + 100) -> (ts.drop(2) ++ Seq(s"x$i", s"y$i"))
    }
    val far = base.take(5).map { case (i, ts) =>
      (i + 200) -> (ts.drop(6) ++ (0 until 6).map(j => s"z$i$j"))
    }
    val atT = Seq(
      300L -> ((0 until 8).map(j => s"s$j") ++ (0 until 4).map(j => s"a$j")),
      301L -> ((0 until 8).map(j => s"s$j") ++ (0 until 4).map(j => s"b$j")))
    base ++ near ++ far ++ atT
  }

  private def brute(fx: Seq[(Long, Seq[String])]): Set[(Long, Long, Long)] =
    (for {
      (i1, s1) <- fx; (i2, s2) <- fx if i1 < i2
      inter = s1.toSet.intersect(s2.toSet).size.toLong
      uni = s1.toSet.union(s2.toSet).size.toLong
      if inter * 1000000L >= tauPpm * uni
    } yield (i1, i2, inter * 1000000L / uni)).toSet

  test("prefix join == brute-force all-pairs Jaccard (exact recall)") {
    val fx = fixture
    val df = fx.toDF("id", "toks")
    val got = Dedup.prefixJaccardSelfJoin(df, "id", "toks", tauPpm)
      .collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Long]("jac_ppm"))).toSet
    val want = brute(fx)
    assert(got === want)
    // the fixture actually exercises all three regimes
    assert(want.exists { case (a, b, _) => b == a + 100 }, "near-dups found")
    assert(want.exists { case (a, b, p) => a == 300L && b == 301L && p == 500000L },
      "at-threshold pair is inclusive")
    assert(!want.exists { case (a, b, _) => b == a + 200 }, "far decoys out")
  }

  test("prefix join is invariant under input partitioning") {
    val df = fixture.toDF("id", "toks")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.prefixJaccardSelfJoin(d, "id", "toks", tauPpm).collect()
        .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(run(df) === run(df.repartition(7)))
  }

  // ——— directed containment ———

  private val contTauPpm = 750000L

  /** Containment fixture adds a pure-subset pair (quote inside a long
    * doc: containment 1.0, Jaccard 4/16 = 0.25 — the case Jaccard
    * misses) and an exactly-at-threshold containment (3 of 4 = 0.75). */
  private def contFixture: Seq[(Long, Seq[String])] =
    fixture ++ Seq(
      400L -> (0 until 4).map(j => s"q$j"),
      401L -> ((0 until 4).map(j => s"q$j") ++ (0 until 12).map(j => s"pad$j")),
      402L -> Seq("u0", "u1", "u2", "u3"),
      403L -> (Seq("u0", "u1", "u2") ++ (5 until 14).map(j => s"w$j")))

  private def bruteCont(fx: Seq[(Long, Seq[String])]): Set[(Long, Long, Long, Long)] =
    (for {
      (i1, s1) <- fx; (i2, s2) <- fx if i1 != i2
      inter = s1.toSet.intersect(s2.toSet).size.toLong
      n1 = s1.toSet.size.toLong
      if inter * 1000000L >= contTauPpm * n1
    } yield (i1, i2, inter, inter * 1000000L / n1)).toSet

  test("containment join == brute-force all-ordered-pairs (exact recall)") {
    val fx = contFixture
    val got = Dedup.containmentSelfJoin(fx.toDF("id", "toks"), "id", "toks", contTauPpm)
      .collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"),
        r.getAs[Long]("inter"), r.getAs[Long]("cont_ppm"))).toSet
    val want = bruteCont(fx)
    assert(got === want)
    // the quote pair is found in the quote->container direction only
    assert(want.exists { case (a, b, _, p) => a == 400L && b == 401L && p == 1000000L },
      "full containment of the short quote")
    assert(!want.exists { case (a, b, _, _) => a == 401L && b == 400L },
      "container is not contained")
    assert(want.exists { case (a, b, _, p) => a == 402L && b == 403L && p == 750000L },
      "at-threshold containment is inclusive")
  }

  test("containment join is invariant under input partitioning") {
    val df = contFixture.toDF("id", "toks")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.containmentSelfJoin(d, "id", "toks", contTauPpm).collect()
        .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(run(df) === run(df.repartition(7)))
  }
}
