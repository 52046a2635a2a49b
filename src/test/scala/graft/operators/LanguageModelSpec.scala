package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLmScore is the exact smoothed integer formula on a hand corpus") {
    // corpus: "a b", "a b", "a c" → c1(a)=3, c12(a,b)=2, c12(a,c)=1, V=1
    // p(b|a) = floor((2+1)·1e6/(3+1)) = 750000
    // p(c|a) = floor((1+1)·1e6/(3+1)) = 500000
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
    val out = LanguageModel.bigramLmScore(docs, "doc_id", "toks")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("lm_score")))
    assert(out.toSeq == Seq((1L, 1L, 750000L), (2L, 1L, 750000L), (3L, 1L, 500000L)))
  }

  test("repeated-bigram docs average exactly, and <2-token docs drop out") {
    // "a b a b": bigrams (a,b)(b,a)(a,b) → c1(a)=2, c1(b)=1, V=2
    // p(b|a) = floor(3e6/4) = 750000, p(a|b) = floor(2e6/3) = 666666
    // score = floor((750000·2 + 666666)/3) = floor(2166666/3) = 722222
    val docs = Seq((1L, "a b a b"), (2L, "solo"), (3L, ""))
      .toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
    val out = LanguageModel.bigramLmScore(docs, "doc_id", "toks").collect()
    assert(out.length == 1) // docs 2 and 3 have no bigrams
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 1L)
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("lm_score") == 722222L)
  }

  test("hapax gibberish no longer scores perfectly (the smoothing term's job)") {
    // unsmoothed MLE gives every unique-token bigram p = 1.0 (c12=c1=1);
    // with +V in the denominator it collapses to ~scale/V
    val docs = (1L to 20L).map(i => (i, s"common text number $i"))
      .toDF("doc_id", "text")
      .unionByName(Seq((99L, "zq1 zq2 zq3 zq4")).toDF("doc_id", "text"))
      .select($"doc_id", split($"text", " ").as("toks"))
    // V=6 histories (common/text/number/zq1..3): every zq bigram is
    // p = floor(2e6/7) = 285714 — far from the 1e6 unsmoothed MLE would
    // award; the corpus-typical doc averages floor((807692·2+76923)/3)
    val scores = LanguageModel.bigramLmScore(docs, "doc_id", "toks")
    val gibberish = scores.filter($"doc_id" === 99L).head().getAs[Long]("lm_score")
    val typical = scores.filter($"doc_id" === 1L).head().getAs[Long]("lm_score")
    assert(gibberish == 285714L, s"hapax doc scored $gibberish")
    assert(typical == 564102L, s"typical doc scored $typical")
    assert(typical > gibberish)
  }

  test("boilerplate phrase outscores the same words scrambled") {
    // 100 docs share a template phrase; one doc IS the phrase, one is its
    // reversal (same unigrams, bigrams seen once) — the LM separates them
    val template = "please click here to subscribe to our newsletter today"
    val corpus = (1L to 100L).map(i => (i, s"$template extra$i"))
    val probe = Seq((1001L, template),
      (1002L, template.split(" ").reverse.mkString(" ")))
    val docs = (corpus ++ probe).toDF("doc_id", "text")
      .select($"doc_id", split($"text", " ").as("toks"))
    val scores = LanguageModel.bigramLmScore(docs, "doc_id", "toks").cache()
    val phrase = scores.filter($"doc_id" === 1001L).head().getAs[Long]("lm_score")
    val scrambled = scores.filter($"doc_id" === 1002L).head().getAs[Long]("lm_score")
    assert(phrase > 3 * scrambled, s"phrase $phrase vs scrambled $scrambled")
    // deterministic across runs
    val again = LanguageModel.bigramLmScore(docs, "doc_id", "toks")
    assert(scores.exceptAll(again).count() == 0)
    scores.unpersist()
  }
}
