package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class XmlFreshSpec extends SparkSpec {
  import spark.implicits._

  test("xml scan extracts row-tag elements, child text and attributes") {
    val dir = Files.createTempDirectory("graft-xml").toString
    val doc =
      """<?xml version="1.0"?>
        |<stations>
        |  <station id="s1" cp="75001">
        |    <prix>1.85</prix>
        |    <ville>Paris</ville>
        |  </station>
        |  <station id="s2" cp="13001">
        |    <prix>1.79</prix>
        |    <ville>Marseille</ville>
        |  </station>
        |</stations>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f.xml"), doc)
    val out = Xml.read(spark, dir, "station",
        Seq(("id", "@id"), ("cp", "@cp"), ("prix", "prix"), ("ville", "ville")))
      .as[(String, String, String, String)].collect().toSet
    assert(out == Set(("s1", "75001", "1.85", "Paris"), ("s2", "13001", "1.79", "Marseille")))
  }

  test("attribute extraction does not match suffixes of longer attribute names") {
    val dir = Files.createTempDirectory("graft-xml2").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/f.xml"),
      """<r><item uuid="u-long" id="short"/></r>""")
    val out = Xml.read(spark, dir, "item", Seq(("id", "@id"), ("uuid", "@uuid")))
      .as[(String, String)].collect().toSet
    assert(out == Set(("short", "u-long")))
  }

  test("freshness watermark keeps only newer-than-last-ingest sources") {
    val sources = Seq(("a", 100L), ("b", 200L), ("c", 300L)).toDF("src", "modified")
    val state = Seq(("a", 100L), ("b", 150L)).toDF("src", "modified")
    val fresh = Writers.freshSourcesOnly(sources, state, "src", "modified")
      .as[(String, Long)].collect().toSet
    // a unchanged (100 !> 100) → skipped; b newer → kept; c unseen → kept
    assert(fresh == Set(("b", 200L), ("c", 300L)))
  }
}
