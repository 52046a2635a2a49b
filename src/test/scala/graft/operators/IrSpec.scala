package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Keyword retrieval (operators/Ir.scala): postings layout, integer BM25
  * scoring against an in-test BigInt reference, stopword gating, top-k
  * determinism (two-phase == naive), and phrase adjacency semantics. */
class IrSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "red cat sat on the red mat"),
    (2L, "red dog ran to the red red barn"),
    (3L, "blue cat blue cat blue cat"),
    (4L, "green field and a green tree"),
    (5L, "the the the the the the the the the the")
  ).toDF("doc_id", "text")

  private lazy val post = Ir.postings(docs, "doc_id", "text")
  private lazy val dfreq = Ir.docFreq(post)
  private lazy val (n, t) = Ir.corpusStats(docs, "doc_id", "text")

  test("TermCounts postings == groupBy reference, incl unicode/empties/blank") {
    val d2 = Seq((1L, "héllo wörld héllo"), (2L, "  a  b a "), (3L, ""), (4L, "é"))
      .toDF("doc_id", "text")
    val viaExpr = Ir.postings(d2, "doc_id", "text")
    val ref = d2.select(col("doc_id"), split(col("text"), " ").as("__toks"))
      .withColumn("dl", expr("size(filter(__toks, t -> t <> ''))").cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .select("term", "doc_id", "tf", "dl")
    assert(viaExpr.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(viaExpr).count() == 0)
  }

  test("posting build is zero-exchange (native kernel, no groupBy)") {
    val plan = post.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"posting build must not shuffle:\n$plan")
  }

  test("postings carry tf and dl per (term, doc)") {
    val m = post.collect().map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toMap
    assert(m(("red", 1L)) === (2L, 7L))
    assert(m(("red", 2L)) === (3L, 8L))
    assert(m(("blue", 3L)) === (3L, 6L))
    assert(m(("the", 5L)) === (10L, 10L))
    assert(!m.contains(("cat", 2L)))
  }

  test("corpus stats count all docs and all non-empty tokens") {
    assert(n === 5L)
    assert(t === docs.select(size(split(col("text"), " "))).as[Int].collect().sum.toLong)
  }

  /** BigInt replica of the integer BM25 formula in Ir.termScoreSql. */
  private def refScore(tf: Long, dl: Long, df: Long): BigInt = {
    val (bn, bt) = (BigInt(n), BigInt(t))
    val idf = (bn - df) * 1000000 / bn + 1
    idf * (22 * tf * bt) / (10 * tf * bt + 3 * bt + 9 * dl * bn)
  }

  test("bm25TopK matches the BigInt reference scores and tiebreaks") {
    val q = Seq((0L, "red"), (1L, "blue"), (1L, "cat")).toDF("query_id", "term")
    val got = Ir.bm25TopK(post, dfreq, n, t, q, k = 10)
      .orderBy("query_id", "rank").collect()
    val postM = post.collect().map(r =>
      (r.getAs[String]("term"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("tf"), r.getAs[Long]("dl"))).toMap
    val dfM = dfreq.collect().map(r =>
      r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    def expScores(terms: Seq[String]): Seq[(Long, BigInt)] = {
      val cand = postM.keys.filter(k => terms.contains(k._1)).map(_._2).toSet
      cand.toSeq.map { d =>
        d -> terms.flatMap { w =>
          postM.get((w, d)).map { case (tf, dl) => refScore(tf, dl, dfM(w)) }
        }.sum
      }.sortBy { case (d, s) => (-s, d) }
    }
    val q0 = got.filter(_.getAs[Long]("query_id") == 0L)
    val exp0 = expScores(Seq("red"))
    assert(q0.map(_.getAs[Long]("doc_id")).toSeq === exp0.map(_._1))
    assert(q0.map(r => BigInt(r.getAs[Long]("score_fp"))).toSeq === exp0.map(_._2))
    val q1 = got.filter(_.getAs[Long]("query_id") == 1L)
    val exp1 = expScores(Seq("blue", "cat"))
    assert(q1.map(_.getAs[Long]("doc_id")).toSeq === exp1.map(_._1))
    assert(q1.map(r => BigInt(r.getAs[Long]("score_fp"))).toSeq === exp1.map(_._2))
  }

  test("stopword gate excludes terms at df >= 90% of the corpus") {
    // 'the' appears in 4 of 5 docs (80% < 90%: kept); plant a 19-doc
    // corpus where a term hits 18/19 docs (94% >= 90%: dropped).
    val wide = (1L to 19L).map(i =>
      (i, if (i == 1L) "only rare" else "common filler")).toDF("doc_id", "text")
    val p = Ir.postings(wide, "doc_id", "text")
    val (wn, wt) = Ir.corpusStats(wide, "doc_id", "text")
    val q = Seq((0L, "common"), (1L, "rare")).toDF("query_id", "term")
    val res = Ir.bm25TopK(p, Ir.docFreq(p), wn, wt, q, k = 25).collect()
    assert(res.filter(_.getAs[Long]("query_id") == 0L).isEmpty,
      "94%-df term must be gated out of candidates")
    assert(res.filter(_.getAs[Long]("query_id") == 1L)
      .map(_.getAs[Long]("doc_id")).toSeq === Seq(1L))
  }

  test("two-phase top-k equals the naive single-window top-k") {
    val q = Seq((0L, "red"), (0L, "cat"), (1L, "the")).toDF("query_id", "term")
    val got = Ir.bm25TopK(post, dfreq, n, t, q, k = 2)
      .orderBy("query_id", "rank").collect().toSeq
    // naive: same candidates, one global window
    import org.apache.spark.sql.expressions.Window
    val qq = q.distinct()
    val naive = post.join(dfreq.filter(col("df") * 10 < lit(n) * 9), "term")
      .join(qq, "term")
      .withColumn("__s", expr(
        s"""CAST((((($n - df) * 1000000L div $n) + 1L)
           | * (22 * CAST(tf AS DECIMAL(38,0)) * CAST($t AS DECIMAL(38,0))))
           | div (10 * CAST(tf AS DECIMAL(38,0)) * CAST($t AS DECIMAL(38,0))
           |      + 3 * CAST($t AS DECIMAL(38,0))
           |      + 9 * CAST(dl AS DECIMAL(38,0)) * CAST($n AS DECIMAL(38,0))) AS BIGINT)""".stripMargin))
      .groupBy("query_id", "doc_id").agg(sum("__s").as("score_fp"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score_fp").desc, col("doc_id"))))
      .filter(col("rank") <= 2)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score_fp"))
      .orderBy("query_id", "rank").collect().toSeq
    assert(got === naive)
  }

  test("phrase search counts overlapping adjacency occurrences") {
    val pd = Seq(
      (1L, "a a a b"),      // 'a a' overlaps: positions 1,2 -> 2 occurrences
      (2L, "a b a b a"),    // 'a b' at 1 and 3
      (3L, "b b b")
    ).toDF("doc_id", "text")
    val pos = Ir.positionalPostings(pd, "doc_id", "text")
    val res = Ir.phraseTopK(pos,
        Seq(0 -> Seq("a", "a"), 1 -> Seq("a", "b"), 2 -> Seq("a", "b", "a")), k = 5)
      .collect().map(r => (r.getAs[Long]("phrase_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("rank"), r.getAs[Long]("n_occ"))).toMap
    assert(res((0L, 1L)) === (1L, 2L))        // overlapping 'a a' counted twice
    assert(!res.contains((0L, 2L)))
    assert(res((1L, 2L)) === (1L, 2L))        // 'a b' twice in doc 2
    assert(res((1L, 1L)) === (2L, 1L))
    assert(res((2L, 2L)) === (1L, 2L))        // 'a b a' at 1 and 3 (overlap via pos 3)
  }

  test("positional postings are 1-based over the raw token stream") {
    val pos = Ir.positionalPostings(Seq((1L, "x y z")).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("pos").collect()
    assert(pos.map(r => (r.getAs[String]("term"), r.getAs[Long]("pos"))).toSeq ===
      Seq(("x", 1L), ("y", 2L), ("z", 3L)))
  }

  test("rrfFuse: exact integer RRF math, single-leg docs, doc-id tiebreak") {
    // leg A ranks: q0 -> (10, 11, 12); leg B ranks: q0 -> (11, 10, 13)
    val legA = Seq((0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val legB = Seq((0L, 11L, 1L), (0L, 10L, 2L), (0L, 13L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val out = Ir.rrfFuse(Seq(legA, legB), k = 4)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_fp"),
        r.getAs[Long]("n_legs"))).toSeq
    def c(rank: Long): Long = 1000000L / (60L + rank)
    // 10 and 11 both score c(1)+c(2) = 32651 — the tie breaks on doc_id;
    // 12 and 13 both score c(3) = 15873, doc_id again
    assert(out === Seq(
      (10L, c(1) + c(2), 2L), (11L, c(1) + c(2), 2L),
      (12L, c(3), 1L), (13L, c(3), 1L)))
  }

  test("proximityTopK: half-open window boundary and distinct-term counting") {
    val docs = Seq(
      (1L, "a x x x x x x x x b"),   // b at pos 10: inside a's [1, 11) span
      (2L, "a x x x x x x x x x b"), // b at pos 11: just outside
      (3L, "a a a x x x x x x x x")  // repeats count once (distinct terms)
    ).toDF("doc_id", "text")
    val pos = Ir.positionalPostings(docs, "doc_id", "text")
    val q = Seq((0L, "a"), (0L, "b")).toDF("query_id", "term")
    val got = Ir.proximityTopK(pos, q, window = 10, k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rank"), r.getAs[Long]("n_terms"), r.getAs[Long]("best_pos")))
      .toMap
    assert(got(1L) === ((1L, 2L, 1L)))   // both terms in the span from pos 1
    assert(got(2L) === ((2L, 1L, 1L)))   // window excludes pos 11; earliest anchor wins
    assert(got(3L) === ((3L, 1L, 1L)))   // three 'a's still count one distinct term
  }

  test("rrfFuse respects k per query independently") {
    val leg = Seq((0L, 1L, 1L), (0L, 2L, 2L), (1L, 9L, 1L))
      .toDF("query_id", "doc_id", "rank")
    val out = Ir.rrfFuse(Seq(leg), k = 1).collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))).toSet ===
      Set((0L, 1L), (1L, 9L)))
  }
}
