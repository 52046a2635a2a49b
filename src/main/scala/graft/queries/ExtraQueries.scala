package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Distribution
import QH._

/** Remaining SURVEY §2 aggregation/window/sort inventory (A2/A6/A9–A12/
  * A15/A16/A18, W4, O2/O3), each with a DuckDB oracle. */
object ExtraQueries {

  val all: Seq[Q] = Seq(

    // A2: whole-period grain (same metric family as A1, no month axis).
    Q("a2_whole_period_stats",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), moneyAvg(col("l_extendedprice")).as("avg_price"),
          round(median(col("l_extendedprice")), 4).as("med_price"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlMoneyAvg("l_extendedprice")} AS avg_price,
               ROUND(MEDIAN(l_extendedprice), 4) AS med_price
               FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // A6: plain count per group (groupby.size).
    Q("a6_count_per_group",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
        .orderBy("user_id"),
      Some("""SELECT user_id, COUNT(*) AS n_events FROM events
              GROUP BY user_id ORDER BY user_id""")),

    // A9: nested full-outer of three grand-total monthly aggregates (the
    // metrics site view, `dgv/metrics/sql/create_tables.sql:275-295`).
    Q("a9_nested_outer_totals",
      (s, d) => {
        val o = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m1"))
          .agg(moneySum(col("o_totalprice")).as("order_rev"))
        val l = Tables.lineitem(s, d)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("m2"))
          .agg(count(lit(1)).as("n_ship"))
        val e = Tables.events(s, d)
          .groupBy(date_format(col("ts_us"), "yyyy-MM").as("m3"))
          .agg(count(lit(1)).as("n_events"))
        o.join(l, col("m1") === col("m2"), "full")
          .withColumn("m12", coalesce(col("m1"), col("m2")))
          .join(e, col("m12") === col("m3"), "full")
          .select(coalesce(col("m12"), col("m3")).as("month"),
            coalesce(col("order_rev"), lit(0.0)).as("order_rev"),
            coalesce(col("n_ship"), lit(0L)).as("n_ship"),
            coalesce(col("n_events"), lit(0L)).as("n_events"))
          .orderBy("month")
      },
      Some(s"""${evCte},
               o AS (SELECT strftime(o_orderdate, '%Y-%m') AS m1,
                 ${sqlMoneySum("o_totalprice")} AS order_rev FROM orders GROUP BY 1),
               l AS (SELECT strftime(l_shipdate, '%Y-%m') AS m2, COUNT(*) AS n_ship
                 FROM lineitem GROUP BY 1),
               e AS (SELECT strftime(ts_us, '%Y-%m') AS m3, COUNT(*) AS n_events
                 FROM ev GROUP BY 1)
               SELECT COALESCE(m1, m2, m3) AS month, COALESCE(order_rev, 0.0) AS order_rev,
                 COALESCE(n_ship, 0) AS n_ship, COALESCE(n_events, 0) AS n_events
               FROM o FULL JOIN l ON m1 = m2
               FULL JOIN e ON COALESCE(m1, m2) = m3
               ORDER BY month""")),

    // A10: MIN surrogate-key retention per group.
    Q("a10_min_surrogate_key",
      (s, d) => Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(min(col("c_custkey")).as("first_key"), count(lit(1)).as("cnt"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, MIN(c_custkey) AS first_key, COUNT(*) AS cnt
              FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // A11: groupBy-sum + left join + fill(0) (`dgv/metrics/task_functions.py:125-136`).
    Q("a11_sum_join_fill",
      (s, d) => {
        val sums = Tables.customer(s, d).groupBy("c_nationkey")
          .agg(moneySum(col("c_acctbal")).as("total_bal"))
        Tables.nation(s, d)
          .join(sums, col("n_nationkey") === col("c_nationkey"), "left")
          .select(col("n_name"), coalesce(col("total_bal"), lit(0.0)).as("total_bal"))
          .orderBy("n_name")
      },
      Some(s"""SELECT n_name, COALESCE(total_bal, 0.0) AS total_bal
               FROM nation LEFT JOIN (SELECT c_nationkey,
                 ${sqlMoneySum("c_acctbal")} AS total_bal FROM customer GROUP BY 1) s
                 ON n_nationkey = c_nationkey
               ORDER BY n_name""")),

    // A12: mean over boolean vectors per cohort (quality score,
    // `dgv/monitoring/dashboard/task_functions.py:424-445`).
    Q("a12_bool_mean",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(avg(when(col("value") > 100, 1).otherwise(0)), 6).as("share_high"),
          round(avg(when(col("user_id") % 2 === 0, 1).otherwise(0)), 6).as("share_even_user"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
                ROUND(AVG(CASE WHEN value > 100 THEN 1 ELSE 0 END), 6) AS share_high,
                ROUND(AVG(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END), 6) AS share_even_user
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // A15: streaming-style format/type counters.
    Q("a15_format_counters",
      (s, d) => Tables.part(s, d)
        .groupBy("p_type", "p_brand").agg(count(lit(1)).as("cnt"))
        .orderBy("p_type", "p_brand"),
      Some("""SELECT p_type, p_brand, COUNT(*) AS cnt FROM part
              GROUP BY p_type, p_brand ORDER BY p_type, p_brand""")),

    // A16: groupBy-date sum.
    Q("a16_date_sum",
      (s, d) => Tables.events(s, d)
        .groupBy(to_date(col("ts_us")).as("day"))
        .agg(moneySum(col("value")).as("total_value"))
        .orderBy("day"),
      Some(s"""${evCte}
               SELECT CAST(date_trunc('day', ts_us) AS DATE) AS day,
                 ${sqlMoneySum("value")} AS total_value
               FROM ev GROUP BY 1 ORDER BY day""")),

    // A18: partial aggregation across files — two scans of the same table
    // union'd (the per-year file loop); Spark's partial+final hash agg
    // merges map-side, so the union costs one extra scan, zero extra shuffle
    // passes.
    Q("a18_partial_agg_files",
      (s, d) => Tables.lineitem(s, d).select("l_returnflag", "l_quantity")
        .unionByName(Tables.lineitem(s, d).select("l_returnflag", "l_quantity"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), moneySum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlMoneySum("l_quantity")} AS qty
               FROM (SELECT l_returnflag, l_quantity FROM lineitem
                     UNION ALL SELECT l_returnflag, l_quantity FROM lineitem)
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // W4: early-stop scan over a sorted stream = date predicate that prunes
    // at the scan (parquet row-group stats carry min/max shipdate).
    Q("w4_early_stop_filter",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2001-01-01"))
        .agg(count(lit(1)).as("cnt"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_kept"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_kept")),
      Some("""SELECT COUNT(*) AS cnt, strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_kept,
                strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_kept
              FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01'""")),

    // O2: sort by derived key.
    Q("o2_sort_by_derived",
      (s, d) => Tables.orders(s, d)
        .withColumn("prio_digit", substring(col("o_orderpriority"), 1, 1))
        .select("o_orderkey", "prio_digit", "o_totalprice")
        .orderBy(desc("prio_digit"), asc("o_orderkey")).limit(50),
      Some("""SELECT o_orderkey, SUBSTRING(o_orderpriority, 1, 1) AS prio_digit, o_totalprice
              FROM orders ORDER BY prio_digit DESC, o_orderkey LIMIT 50""")),

    // O3: limit/head.
    Q("o3_limit_head",
      (s, d) => Tables.customer(s, d)
        .select("c_custkey", "c_name").orderBy("c_custkey").limit(20),
      Some("""SELECT c_custkey, c_name FROM customer ORDER BY c_custkey LIMIT 20""")),

    // Single-pass table profile: per-column nulls / distincts / extremes /
    // exact mean in ONE aggregation over one scan — the trust-a-new-drop
    // profiling pass. Multiple count-distincts expand map-side but still
    // read the table once; doubles surface as doubles (data values, never
    // engine-formatted strings).
    Q("prof1_table_profile",
      (s, d) => Tables.orders(s, d)
        .agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderkey")).as("key_distinct"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("cust_nulls"),
          countDistinct(col("o_orderpriority")).as("prio_distinct"),
          min(col("o_orderpriority")).as("prio_min"),
          max(col("o_orderpriority")).as("prio_max"),
          min(col("o_totalprice")).as("price_min"),
          max(col("o_totalprice")).as("price_max"),
          moneyAvg(col("o_totalprice")).as("price_avg"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("date_min"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("date_max")),
      Some(s"""SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT o_orderkey) AS key_distinct,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS cust_nulls,
               COUNT(DISTINCT o_orderpriority) AS prio_distinct,
               MIN(o_orderpriority) AS prio_min, MAX(o_orderpriority) AS prio_max,
               MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max,
               ${sqlMoneyAvg("o_totalprice")} AS price_avg,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS date_min,
               strftime(MAX(o_orderdate), '%Y-%m-%d') AS date_max
               FROM orders""")),

    // F18+F19 combined: the full distribution stage (quantiles on distinct
    // values, bin rounding with collision repair, histogram over the
    // repaired non-uniform bins, support threshold). The repair fold replays
    // in DuckDB as a recursive CTE; Spark's rint is half-to-even, so the
    // oracle spells banker's rounding out explicitly (DuckDB round() is
    // half-away-from-zero). Edges surface as 11 scalar double columns —
    // never strings built from doubles.
    Q("f18b_distribution_repair",
      (s, d) => {
        val dist = Distribution.priceDistribution(Tables.lineitem(s, d),
          Seq("l_returnflag"), "l_extendedprice",
          nBins = 10, step = 100.0, minSupport = 100L)
        dist.select(col("l_returnflag") +: col("n") +:
          ((1 to 11).map(i => element_at(col("edges"), i).as(s"e$i")) ++
            (1 to 10).map(i => col(s"bin_$i"))): _*)
          .orderBy("l_returnflag")
      },
      Some(f18bOracle))
  )

  /** DuckDB twin of `Distribution.priceDistribution` (nBins=10, step=100,
    * minSupport=100): quantiles of the DISTINCT set, then the repair fold as
    * a recursive CTE carrying (i, edges, last). */
  private def f18bOracle: String = {
    // Banker's rounding (Spark rint): half-to-even, not DuckDB's round().
    def rint(x: String): String =
      s"(CASE WHEN ($x) - floor($x) = 0.5 THEN " +
        s"(CASE WHEN CAST(floor($x) AS BIGINT) % 2 = 0 THEN floor($x) ELSE floor($x) + 1 END) " +
        s"ELSE floor(($x) + 0.5) END)"
    val r = s"(${rint("raw_edges[i + 1] / 100.0")} * 100.0)"
    val v = s"(CASE WHEN last IS NOT NULL AND $r <= last THEN last + 100.0 ELSE $r END)"
    val binCols = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) AS BIGINT) AS bin_$i").mkString(", ")
    val eOut = (1 to 11).map(i =>
      s"CASE WHEN s.n >= 100 THEN r.edges[$i] END AS e$i").mkString(", ")
    val bOut = (1 to 10).map(i =>
      s"CASE WHEN s.n >= 100 THEN c.bin_$i END AS bin_$i").mkString(", ")
    s"""WITH RECURSIVE
       |dist AS (SELECT DISTINCT l_returnflag, l_extendedprice FROM lineitem),
       |edges0 AS (
       |  SELECT l_returnflag, quantile_cont(l_extendedprice,
       |           [0.0,0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9,1.0]) AS raw_edges
       |  FROM dist GROUP BY l_returnflag),
       |rep AS (
       |  SELECT l_returnflag, raw_edges, 0 AS i, CAST([] AS DOUBLE[]) AS edges,
       |         CAST(NULL AS DOUBLE) AS last
       |  FROM edges0
       |  UNION ALL
       |  SELECT l_returnflag, raw_edges, i + 1, edges || [$v], $v
       |  FROM rep WHERE i < 11),
       |repaired AS (SELECT l_returnflag, edges FROM rep WHERE i = 11),
       |support AS (SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1),
       |bucketed AS (
       |  SELECT l.l_returnflag,
       |         greatest(len(list_filter(r.edges[1:10], e -> e <= l.l_extendedprice)), 1) AS bucket
       |  FROM lineitem l JOIN repaired r USING (l_returnflag)),
       |counts AS (SELECT l_returnflag, $binCols FROM bucketed GROUP BY 1)
       |SELECT s.l_returnflag, s.n, $eOut, $bOut
       |FROM support s JOIN repaired r USING (l_returnflag)
       |JOIN counts c USING (l_returnflag)
       |ORDER BY s.l_returnflag""".stripMargin
  }
}
