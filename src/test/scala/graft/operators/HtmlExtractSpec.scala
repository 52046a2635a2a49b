package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins TextOps.htmlToTextSql stage by stage: script/style blocks removed
  * with content, tags stripped, the three entities decoded in the
  * double-escape-safe order, whitespace collapsed and trimmed. */
class HtmlExtractSpec extends SparkSpec {

  private def extract(h: String*): Seq[String] = {
    import spark.implicits._
    h.toDF("h").select(expr(TextOps.htmlToTextSql("h")).as("t"))
      .collect().map(_.getString(0)).toSeq
  }

  test("tags stripped, text content kept") {
    assert(extract("<p>hello <b>bold</b> world</p>") === Seq("hello bold world"))
  }

  test("script and style blocks removed WITH their content") {
    assert(extract(
      "a<script>var x = '<evil>';</script>b",
      "a<style>p { color: red; }</style>b") === Seq("a b", "a b"))
  }

  test("entities decode; double-escaped &amp;lt; yields literal &lt;") {
    assert(extract("x &lt;tag&gt; y &amp; z", "e &amp;lt; e") ===
      Seq("x <tag> y & z", "e &lt; e"))
  }

  test("whitespace collapses and trims across removed regions") {
    assert(extract("  <div> a  </div><br/>  b  ") === Seq("a b"))
  }

  test("full shell: head/style/script vanish, body text survives") {
    val h = "<html><head><title>T</title><style>x{}</style>" +
      "<script>track();</script></head><body><h1>T</h1><p>body text</p></body></html>"
    assert(extract(h) === Seq("T T body text"))
  }
}
