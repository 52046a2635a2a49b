package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** The Aho–Corasick distinct-hits kernel must equal brute-force substring
  * containment term-by-term — including nested terms, shared prefixes,
  * overlapping occurrences, and suffix-link reporting (a term ending
  * mid-way through a longer term's path must still be counted). */
class AcScanSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, terms: Seq[String]): Int =
    terms.distinct.count(text.contains(_))

  test("matches brute-force containment on adversarial dictionaries") {
    // nested ("ab" ⊂ "abc"), shared-prefix ("abc"/"abd"), suffix-reported
    // ("bc" ends inside "abc"'s path), self-overlapping ("aa" in "aaa"),
    // cross-word (" b a" spans tokens), full-string, and absent terms
    val terms = Seq("ab", "abc", "abd", "bc", "aa", "a b", " b a", "zzz", "cab")
    val texts = Seq("", "a", "abc", "abcd", "aaa", "a b a b", "cabd",
      "xxabdyy", "abcabdbcaa", "zz", "b a b a", "abc abd", "aaaa aa")
    val a = AcAutomaton.build(terms)
    texts.foreach { t =>
      val got = AcDistinctHits.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), a)
      assert(got == brute(t, terms), s"text '$t'")
    }
  }

  test("randomized parity with brute force") {
    val rnd = new scala.util.Random(20260816L)
    val alpha = "ab c" // tiny alphabet => dense overlaps
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    val terms = Seq.fill(40)(word(1 + rnd.nextInt(4))).filter(_.nonEmpty).distinct
    (1 to 200).foreach { _ =>
      val t = word(rnd.nextInt(60))
      val got = AcDistinctHits.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t),
        AcAutomaton.build(terms))
      assert(got == brute(t, terms), s"text '$t'")
    }
  }

  test("non-ASCII parity: code-unit matching equals codepoint containment") {
    // the scaladoc's claim — for valid strings a UTF-16 code-unit match ≡
    // a codepoint match ≡ DuckDB's UTF-8 byte match — exercised with
    // multi-byte chars (é, 中) and a surrogate-pair emoji (😀, 2 UTF-16
    // units): a term must never match across a codepoint boundary
    val terms = Seq("éclair", "中文", "é", "文 a", "😀b", "a😀")
    val texts = Seq("un éclair au café", "中文 abc 中", "café", "中文 a b",
      "x😀bé", "a😀😀b", "éclair")
    val a = AcAutomaton.build(terms)
    texts.foreach { t =>
      val got = AcDistinctHits.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), a)
      assert(got == brute(t, terms), s"text '$t'")
    }
  }

  test("duplicate terms collapse; empty dictionary counts zero; null in null out") {
    val dup = AcAutomaton.build(Seq("ab", "ab", "b"))
    assert(dup.nTerms == 2)
    assert(AcDistinctHits.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), dup) == 2)
    assert(AcDistinctHits.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("xx"),
      AcAutomaton.build(Nil)) == 0)
    val df = Seq(Some("ab"), None).toDF("t")
      .select(AcDistinctHits.distinctHits(col("t"), Seq("ab")).as("n"))
    assert(df.collect().map(r =>
      if (r.isNullAt(r.fieldIndex("n"))) -1 else r.getAs[Int]("n")).toSeq
      == Seq(1, -1))
  }

  test("kernel equals the contains-fold on real documents (t20 contract)") {
    val docs = graft.Tables.documents(spark, sf())
      .select($"doc_id", $"text")
    val dict = docs.select(TextOps.tokens($"text").as("toks"))
      .select(explode(expr(TextOps.allGramsSql("toks", 2))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("g")).limit(64)
      .collect().map(_.getAs[String]("g")).toSeq
    val fold = dict.map(t => when(contains($"text", lit(t)), 1).otherwise(0))
      .reduce(_ + _)
    val diff = docs
      .select(AcDistinctHits.distinctHits($"text", dict).as("nat"),
        fold.as("ref"))
      .filter($"nat" =!= $"ref").count()
    assert(diff == 0)
    // and at least one document actually matches (non-vacuous corpus test)
    assert(docs.select(AcDistinctHits.distinctHits($"text", dict).as("n"))
      .filter($"n" >= 1).count() > 0)
  }

  test("interpreted path matches codegen path") {
    val terms = Seq("table", "fast table", "agg", "row scan", "a a")
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try graft.Tables.documents(spark, sf()).limit(80)
        .select(AcDistinctHits.distinctHits($"text", terms).as("n"))
        .as[Int].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }
}
