package graft.operators

import graft.SparkSpec

/** Pins TextOps.c4Rules on hand fixtures: each line rule (terminal
  * punctuation, >=minWords words, no "javascript") and each page rule
  * ("lorem ipsum", brace, < minKept survivors) in isolation, plus the
  * md5-of-clean-text byte proof. Rows are read by FIELD NAME. */
class C4RulesSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(rows: Seq[(Long, Seq[String])]) = {
    val df = spark.createDataFrame(rows).toDF("doc_id", "lines")
    TextOps.c4Rules(df, "doc_id", "lines").orderBy("doc_id").collect()
  }

  private val good = Seq(
    "the quick brown fox jumps over the lazy dog.",
    "a stitch in time saves nine every single day.",
    "all good things come to an end eventually here.")

  test("clean page: every line kept, page kept, md5 proves bytes") {
    val Array(r) = run(Seq((1L, good)))
    assert(r.getAs[Long]("n_lines") === 3L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(!r.getAs[Boolean]("has_lorem"))
    assert(!r.getAs[Boolean]("has_brace"))
    assert(r.getAs[Boolean]("page_keep"))
    assert(r.getAs[String]("clean_md5") === md5hex(good.mkString(" ")))
  }

  test("line rules drop independently: no punct, short, javascript") {
    val lines = good ++ Seq(
      "this line has no terminal punctuation at all",  // rule 1
      "too short.",                                    // rule 2
      "this javascript line would otherwise be kept fine.") // rule 3
    val Array(r) = run(Seq((1L, lines)))
    assert(r.getAs[Long]("n_lines") === 6L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Boolean]("page_keep"))
    assert(r.getAs[String]("clean_md5") === md5hex(good.mkString(" ")))
  }

  test("page rules: lorem ipsum and brace drop the whole page") {
    val rows = Seq(
      (1L, good :+ "some lorem ipsum boilerplate filler text right here."),
      (2L, good :+ "function foo() { return the usual markup noise."),
      (3L, good.take(2))) // only 2 survivors < minKept
    val rs = run(rows)
    assert(rs(0).getAs[Boolean]("has_lorem") && !rs(0).getAs[Boolean]("page_keep"))
    assert(rs(1).getAs[Boolean]("has_brace") && !rs(1).getAs[Boolean]("page_keep"))
    assert(!rs(2).getAs[Boolean]("has_lorem") && !rs(2).getAs[Boolean]("page_keep"))
  }

  test("empty survivor set hashes the empty string") {
    val Array(r) = run(Seq((1L, Seq("no punct here at all"))))
    assert(r.getAs[Long]("n_kept") === 0L)
    assert(r.getAs[String]("clean_md5") === md5hex(""))
  }
}
