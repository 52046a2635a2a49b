package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins TextOps.repetitionSignals on planted documents where every signal
  * is hand-computable: the multiset dup-gram char ppm (integer
  * floor-division fixed point — no double in the output, the
  * engine-version-proof invariant), the top-bigram count ppm, and the flag
  * thresholds. Rows are read by FIELD NAME. */
class RepetitionSignalsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    val df = spark.createDataFrame(rows).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    TextOps.repetitionSignals(df, "doc_id", "text", "n_chars")
      .orderBy("doc_id").collect()
  }

  test("pure repetition: one bigram repeated wall-to-wall") {
    // "ab ab ab ab" — 3 bigram occurrences, all the same gram "ab ab"
    // (len 5); 2 duplicate occurrences cover 10 chars of 11.
    val Array(r) = run(Seq((1L, "ab ab ab ab")))
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Long]("dup2_char_ppm") === 10L * 1000000L / 11L)
    assert(r.getAs[Long]("top2_count_ppm") === 1000000L)
    assert(r.getAs[Boolean]("rep_flagged"))
  }

  test("no repetition: all grams distinct") {
    val Array(r) = run(Seq((1L, "a b c d e f g h")))
    assert(r.getAs[Long]("n_bigrams") === 7L)
    assert(r.getAs[Long]("dup2_char_ppm") === 0L)
    assert(r.getAs[Long]("dup5_char_ppm") === 0L)
    assert(r.getAs[Long]("top2_count_ppm") === 1000000L / 7L)
    assert(!r.getAs[Boolean]("rep_flagged"))
  }

  test("5-gram repetition flags independently of bigram share") {
    // A 10-token text that is the same 5 tokens twice: the repeated
    // 5-gram "a b c d e" (len 9) occurs twice among 6 five-grams ->
    // dup5 chars 9 of 19 > 10% flags even though dup2 char ppm is
    // driven only by the seam bigrams.
    val Array(r) = run(Seq((1L, "a b c d e a b c d e")))
    assert(r.getAs[Long]("n_tokens") === 10L)
    assert(r.getAs[Long]("dup5_char_ppm") === 9L * 1000000L / 19L)
    assert(r.getAs[Boolean]("rep_flagged"))
  }

  test("gram-less docs survive with zeroed signals (left-join path)") {
    val rs = run(Seq((1L, "solo"), (2L, "a b")))
    val byId = rs.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rs.length === 2)
    val solo = byId(1L)
    assert(solo.getAs[Long]("n_tokens") === 1L)
    assert(solo.getAs[Long]("n_bigrams") === 0L)
    assert(solo.getAs[Long]("dup2_char_ppm") === 0L)
    assert(solo.getAs[Long]("top2_count_ppm") === 0L)
    assert(!solo.getAs[Boolean]("rep_flagged"))
    // 2 tokens: one bigram, zero 5-grams — dup5 must be 0, not null
    assert(byId(2L).getAs[Long]("dup5_char_ppm") === 0L)
  }

  test("multiset vs distinct: repeated grams counted per occurrence") {
    // "x y x y z": bigrams [x y, y x, x y, y z] — "x y" occurs twice
    // (1 duplicate occurrence, 3 chars of the 9-char doc).
    val Array(r) = run(Seq((1L, "x y x y z")))
    assert(r.getAs[Long]("n_bigrams") === 4L)
    assert(r.getAs[Long]("dup2_char_ppm") === 3L * 1000000L / 9L)
    assert(r.getAs[Long]("top2_count_ppm") === 500000L)
  }

  test("kernel form equals the exchange twin on real documents, both exec paths") {
    val docs = graft.Tables.documents(spark, sf())
    def both(df: org.apache.spark.sql.DataFrame) = (
      TextOps.repetitionSignals(df, "doc_id", "text", "n_chars")
        .orderBy("doc_id").collect().toSeq,
      TextOps.repetitionSignalsExchange(df, "doc_id", "text", "n_chars")
        .orderBy("doc_id").collect().toSeq)
    val (kernel, exchange) = both(docs)
    assert(kernel === exchange)
    // interpreted == codegen for the kernel path
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try TextOps.repetitionSignals(docs.limit(50), "doc_id", "text", "n_chars")
        .orderBy("doc_id").collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("kernel is evaluated once per row, not once per extracted field") {
    // catalyst-eval-cost: the struct-producing expression is referenced by
    // 6 output columns — CollapseProject must NOT inline it 6×
    val df = spark.createDataFrame(Seq((1L, "a b a b"))).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val plan = TextOps.repetitionSignals(df, "doc_id", "text", "n_chars")
      .queryExecution.optimizedPlan.toString
    assert("rep_signals|RepSignals".r.findAllIn(plan).size <= 2,
      s"RepSignals inlined per field:\n$plan")
  }
}
