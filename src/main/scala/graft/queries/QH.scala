package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One declared query: a Spark implementation plus (optionally) the
  * equivalent ANSI SQL the driver replays in DuckDB as the oracle.
  *
  * `setup` is an optional UNTIMED preparation step: Bench runs it before
  * the timed window so a query that advertises "incremental work against a
  * persisted artifact" is timed on the incremental work, not on building
  * the artifact its premise assumes already exists. The fn must stay
  * correct WITHOUT setup having run (Verify never calls it) — setup may
  * only warm caches, never change results. */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String],
                   setup: Option[(SparkSession, String) => Unit] = None)

/** Shared helpers keeping Spark results bit-identical to the DuckDB oracle.
  *
  * Money aggregates go through DECIMAL(18,2): summing doubles is order-
  * dependent (Spark's partial aggregation adds in partition order, DuckDB
  * single-threaded), while decimal sums are exact and associative on both
  * engines. The final cast back to DOUBLE is deterministic because the
  * decimal value is exact.
  */
object QH {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact, order-independent sum of a 2-decimal monetary double. */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact mean of a 2-decimal monetary double (exact sum / count). */
  def moneyAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(lit(1))

  /** DuckDB-side twin of [[moneySum]]. */
  def sqlMoneySum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB-side twin of [[moneyAvg]]. */
  def sqlMoneyAvg(x: String): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))"

  /** CTE exposing events with the same derived ts columns Spark sees.
    * `ts` has shipped as both nanosecond parquet and plain timestamp[us]
    * (graft.Tables.events dispatches); `epoch_us(ts)` / `ts::TIMESTAMP`
    * yield identical microsecond values for either input — so all shared
    * timestamp arithmetic is standardized on epoch MICROseconds (exact
    * integers on both engines). */
  val evCte: String =
    "WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us_long, " +
      "ts::TIMESTAMP AS ts_us, user_id, event_type, value, props FROM events)"

  /** Per-sf-dir memo of a persisted-artifact frame (the d13/ir2/pq setup
    * pattern): rebuilds when absent OR when the cached value belongs to a
    * DEAD SparkSession — localCheckpoint blocks die with their session, so
    * serving a stale entry fails at runtime. The liveness check lives HERE,
    * once: call sites supply only how to reach a representative frame
    * (identity for plain DataFrames, a projection for tuples of them). */
  def sessionMemo[T](cache: scala.collection.concurrent.TrieMap[String, T],
                     d: String, s: SparkSession)(rep: T => DataFrame)
                    (build: => T): T =
    cache.get(d).filter(t => rep(t).sparkSession eq s).getOrElse {
      val built = build
      cache(d) = built
      built
    }
}
