package graft.sources

import graft.SparkSpec

/** Tree-listing walk (S13 family) and SPARQL JSON results parsing (S12
  * family): engine semantics over stub transports. */
class ListingsSparqlSpec extends SparkSpec {
  import spark.implicits._

  private val tree: Map[String, Seq[Listings.Entry]] = Map(
    "/" -> Seq(
      Listings.Entry("/2024", isDir = true, 0, 0),
      Listings.Entry("/2025", isDir = true, 0, 0),
      Listings.Entry("/readme.txt", isDir = false, 10, 1000L)),
    "/2024" -> Seq(
      Listings.Entry("/2024/a.csv", isDir = false, 100, 2000L),
      Listings.Entry("/2024/sub", isDir = true, 0, 0)),
    "/2024/sub" -> Seq(
      Listings.Entry("/2024/sub/b.csv", isDir = false, 200, 3000L),
      // symlink-style loop back to the root: must not recurse forever
      Listings.Entry("/", isDir = true, 0, 0)),
    "/2025" -> Seq(
      Listings.Entry("/2025/c.csv", isDir = false, 300, 9000L)))

  test("walkTree lists every file across the tree, loop-guarded") {
    var calls = 0
    val df = Listings.walkTree(spark, { d => calls += 1; tree.getOrElse(d, Nil) }, "/")
    val got = df.as[(String, Long, Long)].collect().toSet
    assert(got == Set(("/readme.txt", 10L, 1000L), ("/2024/a.csv", 100L, 2000L),
      ("/2024/sub/b.csv", 200L, 3000L), ("/2025/c.csv", 300L, 9000L)))
    assert(calls == 4, s"each directory listed exactly once, got $calls")
  }

  test("walkTree composes with freshSourcesOnly for the FTP recency filter") {
    val listing = Listings.walkTree(spark, d => tree.getOrElse(d, Nil), "/")
    // state: everything under /2024 ingested at mtime 2500; c.csv unseen
    val state = Seq(("/2024/a.csv", 2500L), ("/2024/sub/b.csv", 2500L),
      ("/readme.txt", 1000L)).toDF("path", "mtime_us")
    val fresh = Writers.freshSourcesOnly(listing, state, "path", "mtime_us")
    val got = fresh.select("path").as[String].collect().toSet
    // b.csv (3000 > 2500) and the never-seen c.csv pass; a.csv and the
    // equal-stamp readme do not (strictly-newer semantics)
    assert(got == Set("/2024/sub/b.csv", "/2025/c.csv"))
  }

  test("SPARQL JSON results parse into one string column per var, null when unbound") {
    val page1 =
      """{"head": {"vars": ["zone", "code"]},
        | "results": {"bindings": [
        |   {"zone": {"type": "uri", "value": "http://z/fr"},
        |    "code": {"type": "literal", "value": "FR", "datatype": "http://www.w3.org/2001/XMLSchema#string"}},
        |   {"zone": {"type": "uri", "value": "http://z/de"}}
        |]}}""".stripMargin
    val page2 =
      """{"head": {"vars": ["zone", "code"]},
        | "results": {"bindings": [
        |   {"zone": {"type": "uri", "value": "http://z/it"},
        |    "code": {"type": "literal", "value": "IT"}}
        |]}}""".stripMargin
    val df = Sparql.bindings(Seq(page1, page2).toDF("record"), Seq("zone", "code"))
    val got = df.as[(String, Option[String])].collect().toSet
    assert(got == Set(("http://z/fr", Some("FR")), ("http://z/de", None),
      ("http://z/it", Some("IT"))))
  }
}
