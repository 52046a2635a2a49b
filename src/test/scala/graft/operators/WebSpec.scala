package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Web.registrableDomainSql (public-suffix resolution incl. the
  * two-level suffixes and deep subdomain chains), Web.hostSql, and the
  * determinism + exactness of Web.domainCap. */
class WebSpec extends SparkSpec {

  private def domains(hosts: String*): Seq[String] = {
    import spark.implicits._
    hosts.toDF("host")
      .select(expr(Web.registrableDomainSql("host")).as("d"))
      .collect().map(_.getString(0)).toSeq
  }

  test("registrable domain: eTLD+1 with two-level suffix table") {
    assert(domains("www.alpha.co.uk", "blog.beta.com", "gamma.org",
      "alpha.co.uk", "a.b.c.delta.com.au") ===
      Seq("alpha.co.uk", "beta.com", "gamma.org", "alpha.co.uk", "delta.com.au"))
  }

  test("host extraction from http(s) URLs") {
    import spark.implicits._
    val hs = Seq("https://www.x.com/p/1", "http://y.org/deep/path?q=1")
      .toDF("url").select(expr(Web.hostSql("url")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(hs === Seq("www.x.com", "y.org"))
  }

  test("domainCap: exact per-domain quota, deterministic md5 rank") {
    import spark.implicits._
    val df = ((1L to 5L).map(i => (i, "big.com")) ++
      Seq((6L, "small.org"), (7L, "small.org"))).toDF("id", "domain")
    val out = Web.domainCap(df, "id", "domain", cap = 3)
    val kept = out.filter(col("kept")).groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept === Map("big.com" -> 3L, "small.org" -> 2L))
    // rank 1..n within each domain, and stable across runs
    val rks = out.filter(col("domain") === "big.com")
      .orderBy("rk").select("id").collect().map(_.getLong(0)).toSeq
    assert(out.filter(col("domain") === "big.com")
      .select("rk").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    val rks2 = Web.domainCap(df, "id", "domain", cap = 3)
      .filter(col("domain") === "big.com")
      .orderBy("rk").select("id").collect().map(_.getLong(0)).toSeq
    assert(rks === rks2)
    // domain_docs carries the pre-cap total
    assert(out.filter(col("domain") === "big.com")
      .select("domain_docs").distinct().collect().head.getLong(0) === 5L)
  }
}
