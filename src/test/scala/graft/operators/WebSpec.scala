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

  test("canonicalizeUrlSql: fragment, case, trailing slash, utm params") {
    import spark.implicits._
    val in = Seq(
      "https://www.alpha.com/p/3",
      "HTTPS://WWW.ALPHA.COM/p/3/?utm_medium=m",
      "https://www.alpha.com/p/3?utm_source=feed&utm_campaign=c#top",
      "https://www.alpha.com/p/3?page=2&utm_source=f",
      "http://beta.co.uk/x")
    val out = in.toDF("url")
      .select(expr(Web.canonicalizeUrlSql("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq(
      "https://www.alpha.com/p/3",
      "https://www.alpha.com/p/3",
      "https://www.alpha.com/p/3",
      "https://www.alpha.com/p/3?page=2",
      "http://beta.co.uk/x"))
  }

  test("incrementalDomainCap == full cap under index-first ordering") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val cap = 10
    // a.com saturated (12 > cap), b.org has slack (5), c.net unseen
    val corpus = ((1L to 12L).map(i => (i, "a.com")) ++
      (21L to 25L).map(i => (i, "b.org"))).toDF("id", "domain")
    val idx = Web.domainKeptIndex(corpus, "id", "domain", cap)
    val batch = ((101L to 110L).map(i => (i, "a.com")) ++
      (121L to 123L).map(i => (i, "b.org")) ++
      Seq((131L, "c.net"))).toDF("id", "domain")
    val inc = Web.incrementalDomainCap(idx, batch, "id", "domain", cap)
    // the full pass, with index docs sorting strictly before batch docs
    val union = corpus.withColumn("pri", lit(0))
      .unionByName(batch.withColumn("pri", lit(1)))
    val w = Window.partitionBy($"domain")
      .orderBy($"pri", md5($"id".cast("string")), $"id")
    val full = union.withColumn("rk", row_number().over(w))
      .filter($"pri" === 1 && $"rk" <= cap)
    assert(inc.filter($"kept").select("id").collect().map(_.getLong(0)).toSet ===
      full.select("id").collect().map(_.getLong(0)).toSet)
    // prior counts surface per domain; unseen domains start at zero
    def prior(dm: String) = inc.filter($"domain" === dm)
      .select("prior").distinct().collect().head.getLong(0)
    assert(prior("a.com") === 10L)
    assert(prior("b.org") === 5L)
    assert(prior("c.net") === 0L)
    // partial quota: b.org admits exactly cap - prior = 5 more at most
    assert(inc.filter($"domain" === "b.org" && $"kept").count() === 3L)
    assert(inc.filter($"domain" === "a.com" && $"kept").count() === 0L)
  }
}
