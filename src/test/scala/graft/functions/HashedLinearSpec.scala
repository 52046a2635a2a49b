package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

/** The native hashed-linear scorer must be bit-identical to the HOF/SQL
  * twin the DuckDB oracle replays, across both execution paths, and match
  * hand-computed fixtures (python hashlib ground truth).
  */
class HashedLinearSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fixtures (python hashlib ground truth)") {
    // n_grams = unigrams + bigrams; score = sum of slot weights,
    // slot = md5_60(gram) % 4096, weight = md5_60("w:"+slot) % 2001 - 1000
    val got = Seq("the cat sat", "", "hello", "a a a a").toDF("text")
      .select(HashedLinearScore.hashedLinearScore(
        TextOps.tokens($"text"), 4096).as("hl"))
      .select($"hl.n_grams", $"hl.score_sum")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((5L, -573L), (1L, -677L), (1L, 659L), (7L, -3987L)))
  }

  test("native == HOF/SQL twin on the real corpus (bit parity)") {
    val docs = graft.Tables.documents(spark, sf()).select($"doc_id", $"text")
      .withColumn("__tv", TextOps.tokens($"text"))
    val both = docs
      .withColumn("nat", HashedLinearScore.hashedLinearScore($"__tv", 4096))
      .withColumn("hof", expr(TextOps.hashedLinearSql("__tv", 4096)))
      .filter($"nat.n_grams" =!= $"hof.n_grams" ||
        $"nat.score_sum" =!= $"hof.score_sum")
    assert(both.isEmpty, "native and HOF twin disagree")
  }

  test("interpreted path matches codegen path") {
    val df = Seq("one two three four", "x").toDF("text")
      .withColumn("__tv", TextOps.tokens($"text"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try df.select(HashedLinearScore.hashedLinearScore($"__tv", 4096)
          .cast("string")).as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("operator form: keep is the integer mean-threshold decision") {
    val out = TextOps.hashedLinearQuality(
        Seq((1L, "the cat sat"), (2L, "hello")).toDF("doc_id", "text"),
        "doc_id", "text", 4096, thresholdMilli = -105L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // doc 1: -573 > -105*5 = -525 is false; doc 2: 659 > -105 is true
    assert(out == Seq((1L, 5L, -573L, false), (2L, 1L, 659L, true)))
  }
}
