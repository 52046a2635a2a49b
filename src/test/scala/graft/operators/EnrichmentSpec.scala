package graft.operators

import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

/** Cache-join enrichment (SURVEY §7.4.5): fetch runs ONLY for cache misses,
  * the cache grows by exactly the unseen keys, and re-runs fetch nothing.
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  // standalone value so the closure captures only the accumulator, not the spec
  private def stubFetch(calls: LongAccumulator): Iterator[String] => Iterator[(String, String)] =
    EnrichmentSpec.stub(calls)

  test("fetches only misses; cache grows; enrichment is complete") {
    val input = Seq("a", "b", "a", "c", "b").toDF("addr")
    val cache = Seq(("a", "geo(a)")).toDF("addr", "geo")
    val calls = spark.sparkContext.longAccumulator("fetch-calls")
    val (enriched, updated) =
      Enrichment.enrichWithCache(input, "addr", cache, "geo")(stubFetch(calls))
    val rows = enriched.as[(String, String)].collect().toSeq.sorted
    assert(rows == Seq("a" -> "geo(a)", "a" -> "geo(a)", "b" -> "geo(b)",
      "b" -> "geo(b)", "c" -> "geo(c)"))
    assert(updated.count() == 3)
    // fetch ran ONCE per miss even though two downstream actions consumed it
    assert(calls.value == 2)

    // idempotent re-run against the updated cache: zero fetches
    val calls2 = spark.sparkContext.longAccumulator("fetch-calls-2")
    val (again, cache2) =
      Enrichment.enrichWithCache(input, "addr", updated, "geo")(stubFetch(calls2))
    again.collect()
    cache2.collect()
    assert(calls2.value == 0)
  }

  test("durable fetchedDir pins fetched rows to parquet, one fetch per miss") {
    val dir = java.nio.file.Files.createTempDirectory("enrich").toString
    val input = Seq("x", "y").toDF("addr")
    val cache = Seq.empty[(String, String)].toDF("addr", "geo")
    val calls = spark.sparkContext.longAccumulator("fetch-durable")
    val (enriched, updated) = Enrichment.enrichWithCache(
      input, "addr", cache, "geo", Some(s"$dir/fetched"))(stubFetch(calls))
    assert(enriched.count() == 2)
    assert(updated.count() == 2)
    assert(calls.value == 2) // both downstream actions served from parquet
    // the durable copy is on disk and matches
    assert(spark.read.parquet(s"$dir/fetched").count() == 2)
  }

  /** Stub paginated endpoint: `nPages` pages of `perPage` records, sorted
    * DESCENDING by created ts (page p record i has ts = top - (p*perPage+i)),
    * counting every page served. Record format "id:<n>;created:<ts>". */
  private class StubApi(nPages: Int, perPage: Int, top: Long) {
    var pagesServed = 0
    val fetch: Enrichment.PageFetch = cursor => {
      val p = cursor.map(_.toInt).getOrElse(0)
      pagesServed += 1
      val items = (0 until perPage).map { i =>
        val n = p * perPage + i
        s"id:$n;created:${top - n}"
      }
      (items, if (p + 1 < nPages) Some((p + 1).toString) else None)
    }
  }
  private def createdOf(r: String): Long = r.split(";created:")(1).toLong

  test("pageWalk streams every record across cursor pages, lazily") {
    val api = new StubApi(nPages = 5, perPage = 10, top = 1000L)
    val it = Enrichment.pageWalk(api.fetch)
    // laziness: building the iterator fetches nothing
    assert(api.pagesServed == 0)
    // consuming only the first page's worth touches one page
    assert(it.take(10).size == 10)
    assert(api.pagesServed == 1)
    // full drain sees all 50, 5 pages total
    val all = Enrichment.pageWalk({ c => api.fetch(c) }).toSeq
    assert(all.size == 50 && all.distinct.size == 50)
  }

  test("lastItems early-stops on the sorted created date: later pages never fetched") {
    val api = new StubApi(nPages = 100, perPage = 10, top = 10000L)
    // want items created >= 9985 — the first 16 records, i.e. within 2 pages
    val out = Enrichment.lastItems(spark, api.fetch, createdOf, startTs = 9985L)
    assert(out.count() == 16)
    // the break fired inside page 2: pages 3..100 were never served
    assert(api.pagesServed == 2, s"served ${api.pagesServed} pages")
    // frame is a real distributed source downstream
    val ids = out.selectExpr("cast(split(record, ';')[0] as string) AS id")
    assert(ids.distinct().count() == 16)
  }

  test("lastItems skips items newer than endTs without breaking (continue semantics)") {
    val api = new StubApi(nPages = 10, perPage = 10, top = 1000L)
    // window [985, 995]: skips the first 5 (too new), keeps 11, breaks after
    val out = Enrichment.lastItems(spark, api.fetch, createdOf,
      startTs = 985L, endTs = Some(995L))
    val created = out.as[String].collect().map(createdOf).sorted.toSeq
    assert(created == (985L to 995L))
    // break still bounds the walk: only 2 pages served
    assert(api.pagesServed == 2)
  }

  test("fieldMaskHeader formats the datagouv X-Fields mask with pagination kept") {
    assert(Enrichment.fieldMaskHeader(Seq("id", "created_at", "internal{last_modified}"))
      == "data{id,created_at,internal{last_modified}},next_page")
  }

  test("DST switch day parses unambiguously under the UTC session tz (§7.4.6)") {
    // Europe/Paris fell back on 2024-10-27: 02:30 exists at +02:00 AND +01:00.
    // With offsets in the data and a UTC session, the two map to distinct
    // instants 1h apart — the reference's utc=True cast for DST days
    // (dgv/tabular_metrics/task_functions.py:134-135).
    val df = Seq("2024-10-27T02:30:00+02:00", "2024-10-27T02:30:00+01:00")
      .toDF("iso")
      .selectExpr("unix_timestamp(to_timestamp(iso)) AS epoch")
    val e = df.as[Long].collect().toSeq
    assert(e(1) - e(0) == 3600L)
    assert(java.time.Instant.ofEpochSecond(e(0)).toString == "2024-10-27T00:30:00Z")
  }
}

object EnrichmentSpec {
  def stub(calls: LongAccumulator): Iterator[String] => Iterator[(String, String)] =
    keys => keys.map { k => calls.add(1); (k, s"geo($k)") }
}
