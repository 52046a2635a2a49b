package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

/** External-service enrichment as cache-table joins (SURVEY §7.4.5): the
  * reference's per-row HTTP enrichers — BAN geocoding
  * (`insee/sirene/geocodage/scripts/geocode.py`), Validata checks, Matomo
  * lookups — become a pure-engine pattern:
  *
  *   1. left-anti join input keys against the cache table → the MISS set;
  *   2. fetch ONLY the misses, batched per partition via the pluggable
  *      fetcher (a real HTTP client in production, a stub in tests);
  *   3. union fresh rows into the cache and broadcast-join it back.
  *
  * The fetch cost is proportional to the miss count, not the input size —
  * the property that makes per-row HTTP survive 100 TB inputs (the cache is
  * the only state, and it only ever grows by distinct unseen keys).
  */
object Enrichment {

  /** @param fetch partition-batch fetcher: unseen keys → (key, value) rows.
    *              MUST be deterministic for idempotent re-runs.
    * @param fetchedDir when set, the fetched rows land in this parquet dir —
    *                   DURABLE pinning that survives executor loss (the
    *                   production choice for expensive HTTP fetches); when
    *                   None, an executor-memory localCheckpoint (fine for
    *                   tests and short jobs).
    * @return (enriched input, updated cache) — the caller persists the new
    *         cache table for the next run.
    * @note the fetch runs EAGERLY at call time, so both returned frames
    *       share one execution — call only when you intend to consume. */
  def enrichWithCache(input: DataFrame, keyCol: String, cache: DataFrame,
                      valueCol: String, fetchedDir: Option[String] = None)
                     (fetch: Iterator[String] => Iterator[(String, String)])
      : (DataFrame, DataFrame) = {
    val spark = input.sparkSession
    import spark.implicits._
    val misses = input.select(col(keyCol)).distinct()
      .join(cache.select(col(keyCol)), Seq(keyCol), "left_anti")
    // Materialize the fetch ONCE: both returned frames reference it, and
    // without pinning, each downstream action would re-run the external
    // fetch for every miss (breaking the miss-proportional-cost contract).
    val fetched0 = misses.select(col(keyCol).cast("string")).as[String]
      .mapPartitions(fetch)
      .toDF(keyCol, valueCol)
    val fetched = fetchedDir match {
      case Some(dir) =>
        fetched0.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      case None => fetched0.localCheckpoint(true)
    }
    val updated = cache.select(col(keyCol), col(valueCol)).unionByName(fetched)
    (input.join(updated, Seq(keyCol), "left"), updated)
  }

  /** Pluggable page transport for cursor-paginated APIs: cursor in (None =
    * first page), (record batch, next cursor) out. Production wires an HTTP
    * client; tests wire a stub. Records ride as raw strings — downstream
    * parsing is `from_json` over the resulting frame, fully distributed. */
  type PageFetch = Option[String] => (Seq[String], Option[String])

  /** Field-mask header value in the datagouv API's `X-Fields` syntax
    * (`data{f1,f2},next_page`) — the transport passes it so the server only
    * serializes the needed fields; pagination metadata must stay unmasked
    * or the cursor walk dies after page one. */
  def fieldMaskHeader(fields: Seq[String]): String =
    s"data{${fields.mkString(",")}},next_page"

  /** Lazy cursor walk: pages are fetched one at a time AS CONSUMED, so a
    * downstream early-stop (`lastItems`) never touches the pages after its
    * break point — the property that makes "latest items since yesterday"
    * O(new items), not O(catalog). `maxPages` guards a transport that never
    * returns a null cursor. */
  def pageWalk(fetch: PageFetch, maxPages: Int = 100000): Iterator[String] =
    new Iterator[String] {
      private var cursor: Option[String] = None
      private var first = true
      private var pages = 0
      private var batch: Iterator[String] = Iterator.empty
      // Cursors an API hands out are bounded in count (one per page), so a
      // seen-set is O(pages walked); it catches any revisit — A→B→A cycles
      // included — not just an immediately self-repeating cursor.
      private val seen = scala.collection.mutable.HashSet.empty[String]
      private def pull(): Unit =
        while (!batch.hasNext && (first || cursor.isDefined) && pages < maxPages) {
          val (items, next) = fetch(cursor)
          next.foreach(c =>
            require(seen.add(c), s"cursor cycle: revisited $c after $pages pages"))
          first = false
          pages += 1
          cursor = next
          batch = items.iterator
        }
      def hasNext: Boolean = { pull(); batch.hasNext }
      def next(): String = { pull(); batch.next() }
    }

  /** The reference's get_last_items (`utils/datagouv.py:134-151`) as an
    * engine source: the endpoint is sorted DESCENDING by creation date, so
    * items newer than `endTs` are SKIPPED (continue) and the walk BREAKS at
    * the first item older than `startTs` — nothing after it can qualify,
    * and the lazy [[pageWalk]] guarantees those pages are never fetched.
    *
    * The cursor walk is inherently sequential (each page names the next),
    * so it runs on the driver exactly like the reference; the result is
    * API-bounded (items in the date window), never data-scale. Everything
    * downstream — parse, join, aggregate — is a distributed frame.
    *
    * @param createdOf creation timestamp (epoch micros) extracted from a
    *                  raw record — the date_key of the reference, nested
    *                  keys included, supplied by the caller. */
  def lastItems(spark: SparkSession, fetch: PageFetch, createdOf: String => Long,
                startTs: Long, endTs: Option[Long] = None): DataFrame = {
    val kept = pageWalk(fetch)
      .takeWhile(r => createdOf(r) >= startTs)
      .filter(r => endTs.forall(e => createdOf(r) <= e))
    spark.createDataset(kept.toSeq)(Encoders.STRING).toDF("record")
  }
}
