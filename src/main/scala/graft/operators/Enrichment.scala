package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
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
}
