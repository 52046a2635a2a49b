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
          // exact median of doubles ((a+b)/2 is bit-identical both
          // engines); ⌊·10⁴⌋ fixed point instead of round() — the
          // engine-version-proof output rule
          floor(median(col("l_extendedprice")) * lit(10000.0)).cast("long")
            .as("med_price_fp"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlMoneyAvg("l_extendedprice")} AS avg_price,
               CAST(floor(MEDIAN(l_extendedprice) * 10000.0) AS BIGINT) AS med_price_fp
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
        .agg(sum(when(col("value") > 100, 1L).otherwise(0L)).as("__nh"),
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("__ne"),
          count(lit(1)).as("__n"))
        // boolean shares as exact ppm (integer floor-division) — no
        // round()-of-double output
        .select(col("event_type"),
          expr("__nh * 1000000L div __n").as("share_high_ppm"),
          expr("__ne * 1000000L div __n").as("share_even_user_ppm"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
                CAST(SUM(CASE WHEN value > 100 THEN 1 ELSE 0 END) * 1000000
                     // COUNT(*) AS BIGINT) AS share_high_ppm,
                CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) * 1000000
                     // COUNT(*) AS BIGINT) AS share_even_user_ppm
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

    // A19 (beyond survey): explicit GROUPING SETS — the general form
    // behind a4/a8's rollups: all four (flag, status) grains in ONE
    // aggregation pass (Spark expands sets map-side, one shuffle), with
    // the grouping-bit id disambiguating a real value from a grain NULL
    // (both engines compute grouping() identically).
    Q("a19_grouping_sets",
      (s, d) => Tables.lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_quantity")).as("sum_qty"),
          (grouping(col("l_returnflag")).cast("long") * 2 +
            grouping(col("l_linestatus")).cast("long")).as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "rf", "ls"),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         |  COALESCE(l_linestatus, 'ALL') AS ls,
         |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT)
         |    AS gid,
         |  COUNT(*) AS n, ${sqlMoneySum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
         |  (l_returnflag), (l_linestatus), ())
         |ORDER BY gid, rf, ls""".stripMargin)),

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
        // repaired edges are exact multiples of the 100.0 step (rint·step),
        // so the long cast is value-exact — integer output, no doubles
        dist.select(col("l_returnflag") +: col("n") +:
          ((1 to 11).map(i => element_at(col("edges"), i).cast("long").as(s"e$i")) ++
            (1 to 10).map(i => col(s"bin_$i"))): _*)
          .orderBy("l_returnflag")
      },
      Some(f18bOracle)),

    // ——— DVF §3.1 capstone: the flagship trace end-to-end ———————————
    // The reference's full spine in ONE gated query (previously only
    // piecewise via j12/a1/a4/f18): DvfStats.prepare (distinct, monobien,
    // unit price — run FIRST on the narrow fact frame; see inline note) →
    // geoloc-style as-of enrichment → the one-shuffle multi-scale melt
    // with exact per-type measures → per-nation price distribution
    // (quantile edges + collision repair + histogram) joined back. Float parity: per-row unit-price division is deterministic on
    // both engines; aggregated measures run on floor(×100) cents (exact
    // long sums, exact interpolated median), and the distribution stage is
    // the f18b-proven exact pattern. The as-of timestamp is a synthetic
    // total order (day micros + orderkey — unique, deterministic) so the
    // "latest strictly-earlier order" is well-defined on both engines.
    Q("dvf1_end_to_end",
      (s, d) => {
        import graft.operators.Relational
        import graft.pipelines.DvfStats
        val o2 = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_orderpriority"),
          (datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
            .cast("long") * 86400000000L + col("o_orderkey")).as("ts"))
        // prepare FIRST, on the narrow lineitem frame: every enrichment
        // column (month, as-of type, geo) is a function of sale_id, so the
        // distinct set and the monobien counts are identical whether
        // computed before or after enrichment — but running them first
        // shrinks the as-of/geo input ~30x (the dedup shuffles carry 3
        // columns instead of the enriched row)
        val prepared0 = DvfStats.prepare(
          Tables.lineitem(s, d).select(col("l_orderkey").as("sale_id"),
            col("l_extendedprice").as("price"), col("l_quantity").as("qty")),
          "sale_id", "price", "qty")
        val sales = prepared0
          .join(o2, col("sale_id") === col("o_orderkey"))
          .select(col("sale_id"), col("price"), col("qty"), col("unit_price"),
            col("o_custkey").as("cust"),
            date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("ts"))
        // strictly-prior as-of: right ts shifted +1 so the inclusive match
        // (right.ts <= left.ts) becomes right.ts < left.ts — no self-match
        val rights = o2.select(col("o_custkey").as("cust"),
          (col("ts") + 1L).as("ts"), col("o_orderpriority").as("prev_prio"))
        val enr = Relational.asOfJoin(sales, rights, "cust", "ts", Seq("prev_prio"))
          .withColumn("type", when(col("asof_prev_prio").isNull, lit("N"))
            .otherwise(substring(col("asof_prev_prio"), 1, 1)))
        // materialize the enriched frame ONCE: the stats branch and the
        // distribution stage's four passes (distinct values, NDV probe,
        // support, histogram) would otherwise each re-run the whole
        // join + as-of upstream (measured: 9.0s -> 6.8s from this
        // checkpoint alone, -> ~3s with prepare-first above)
        val prepared = enr
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("cust") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select("n_nationkey", "n_name", "n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).select("r_regionkey", "r_name")),
            col("n_regionkey") === col("r_regionkey"))
          .select("sale_id", "unit_price", "month", "type", "n_name", "r_name")
          .localCheckpoint(true)
        val melted = DvfStats.multiScaleMelt(prepared,
            Seq("region" -> "r_name", "nation" -> "n_name"), "month", "type")
          .withColumn("cents", floor(col("unit_price") * 100).cast("long"))
        val types = Seq("1", "2", "3", "4", "5", "N")
        val aggs = Seq(
          count(lit(1)).as("nb"),
          median(col("cents").cast("double")).as("med_cents")) ++
          types.map(t => sum(when(col("type") === t, 1L).otherwise(0L)).as(s"nb_$t")) ++
          types.map(t => sum(when(col("type") === t, col("cents"))).as(s"sc_$t"))
        val stats = melted.groupBy("echelle", "code_geo", "month")
          .agg(aggs.head, aggs.tail: _*)
        val dist = Distribution.priceDistribution(
            prepared.select(col("n_name"), col("unit_price")),
            Seq("n_name"), "unit_price", nBins = 4, step = 100.0,
            minSupport = 50L)
          .select(col("n_name").as("code_geo") +: col("n").as("dist_n") +:
            ((1 to 5).map(i => element_at(col("edges"), i).cast("long").as(s"e$i")) ++
              (1 to 4).map(i => col(s"bin_$i").as(s"b$i"))): _*)
        stats.join(dist, Seq("code_geo"), "left")
          .orderBy("echelle", "code_geo", "month")
      },
      Some(dvf1Oracle)),

    // ——— Schema-consolidation §3.3 capstone (`schema/utils/
    // consolidation.py:977-1041`) in ONE gated query: three heterogeneous
    // "producer files" carved from orders (one missing the optional
    // priority column, one missing price, one with an extra column and
    // planted NULL required fields) → projectToSchema (typed-null fill,
    // extra-column drop, declared casts) → required-null drop →
    // unionByName → keep-most-recent per primary key with the provenance
    // tiebreak. Overlapping key slices (%15, %21) exercise BOTH dedup rule
    // levels: recency wins across files, file order breaks exact ties.
    // Scale: narrow projections + one union + ONE key-space shuffle (the
    // dedup); price rides as DECIMAL(18,2) INTERNALLY (exact cast of
    // 2-dec money, never a raw double) but SHIPS as integer cents — raw
    // DECIMAL output columns hash-diverge on the driver (r13 post-mortem,
    // the DECIMAL twin of the r10 double lesson).
    Q("cons1_end_to_end",
      (s, d) => {
        import org.apache.spark.sql.types._
        val o = Tables.orders(s, d)
        def dt = date_format(col("o_orderdate"), "yyyy-MM-dd")
        val fileA = o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey").as("id"), col("o_totalprice").as("price"),
            dt.as("updated"), col("o_orderstatus").as("status_extra"))
        val fileB = o
          .filter(col("o_orderkey") % 3 === 1 || col("o_orderkey") % 15 === 0)
          .select(col("o_orderkey").as("id"),
            col("o_orderpriority").as("priority"),
            when(col("o_orderkey") % 15 === 0,
              date_format(date_add(col("o_orderdate"), 1), "yyyy-MM-dd"))
              .otherwise(dt).as("updated"))
        val fileC = o
          .filter(col("o_orderkey") % 3 === 2 || col("o_orderkey") % 21 === 0)
          .select(col("o_orderkey").as("id"),
            col("o_orderpriority").as("priority"),
            col("o_totalprice").as("price"),
            when(col("o_orderkey") % 11 === 5, lit(null).cast("string"))
              .otherwise(dt).as("updated"))
        val schema = StructType(Seq(
          StructField("id", LongType), StructField("priority", StringType),
          StructField("price", DecimalType(18, 2)),
          StructField("updated", StringType)))
        graft.pipelines.Consolidation.consolidate(
            Seq(fileA, fileB, fileC), schema,
            requiredCols = Seq("id", "updated"), primaryKey = Seq("id"),
            recencyCol = "updated")
          // DECIMAL(18,2) * 100 is value-exact; the long cast is the
          // driver-safe integer-cents rendering of 2-dec money
          .select(col("id"), col("priority"),
            (col("price") * 100).cast("long").as("price_cents"),
            col("updated"))
          .orderBy("id")
      },
      Some(
        """WITH o AS (SELECT o_orderkey AS k, o_orderpriority, o_totalprice,
          |       strftime(o_orderdate, '%Y-%m-%d') AS dt,
          |       strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d') AS dt1
          |     FROM orders),
          |fa AS (SELECT k AS id, CAST(NULL AS VARCHAR) AS priority,
          |         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          |         dt AS updated, 0 AS src
          |       FROM o WHERE k % 3 = 0),
          |fb AS (SELECT k, o_orderpriority, CAST(NULL AS DECIMAL(18,2)),
          |         CASE WHEN k % 15 = 0 THEN dt1 ELSE dt END, 1
          |       FROM o WHERE k % 3 = 1 OR k % 15 = 0),
          |fc AS (SELECT k, o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)),
          |         CASE WHEN k % 11 = 5 THEN NULL ELSE dt END, 2
          |       FROM o WHERE k % 3 = 2 OR k % 21 = 0),
          |u AS (SELECT * FROM fa UNION ALL SELECT * FROM fb
          |      UNION ALL SELECT * FROM fc),
          |flt AS (SELECT * FROM u WHERE id IS NOT NULL AND updated IS NOT NULL),
          |r AS (SELECT *, row_number() OVER (PARTITION BY id
          |        ORDER BY updated DESC, src ASC) AS rn FROM flt)
          |SELECT id, priority, CAST(price * 100 AS BIGINT) AS price_cents,
          |  updated FROM r WHERE rn = 1
          |ORDER BY id""".stripMargin))
  )

  // Banker's rounding (Spark rint): half-to-even, not DuckDB's round().
  private def rintSql(x: String): String =
    s"(CASE WHEN ($x) - floor($x) = 0.5 THEN " +
      s"(CASE WHEN CAST(floor($x) AS BIGINT) % 2 = 0 THEN floor($x) ELSE floor($x) + 1 END) " +
      s"ELSE floor(($x) + 0.5) END)"

  /** DuckDB twin of `Distribution.priceDistribution` (nBins=10, step=100,
    * minSupport=100): quantiles of the DISTINCT set, then the repair fold as
    * a recursive CTE carrying (i, edges, last). */
  private def f18bOracle: String = {
    def rint(x: String): String = rintSql(x)
    val r = s"(${rint("raw_edges[i + 1] / 100.0")} * 100.0)"
    val v = s"(CASE WHEN last IS NOT NULL AND $r <= last THEN last + 100.0 ELSE $r END)"
    val binCols = (1 to 10).map(i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) AS BIGINT) AS bin_$i").mkString(", ")
    val eOut = (1 to 11).map(i =>
      s"CAST(CASE WHEN s.n >= 100 THEN r.edges[$i] END AS BIGINT) AS e$i").mkString(", ")
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

  /** DuckDB twin of the dvf1 capstone: the same spine as a WITH chain —
    * as-of enrichment (DuckDB's native ASOF LEFT JOIN), DISTINCT +
    * monobien + unit price, the two-scale melt as a UNION ALL, exact cents
    * measures, and the f18b-pattern distribution (nBins=4, step=100,
    * minSupport=50) keyed by nation. */
  private def dvf1Oracle: String = {
    val tsO = "datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))" +
      "::BIGINT * 86400000000 + o_orderkey"
    val types = Seq("1", "2", "3", "4", "5", "N")
    val nbCols = types.map(t =>
      s"CAST(SUM(CASE WHEN type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS nb_$t").mkString(", ")
    val scCols = types.map(t =>
      s"CAST(SUM(CASE WHEN type = '$t' THEN cents END) AS BIGINT) AS sc_$t").mkString(", ")
    val r = s"(${rintSql("raw_edges[i + 1] / 100.0")} * 100.0)"
    val v = s"(CASE WHEN last IS NOT NULL AND $r <= last THEN last + 100.0 ELSE $r END)"
    val binCols = (1 to 4).map(i =>
      s"CAST(SUM(CASE WHEN bucket = $i THEN 1 ELSE 0 END) AS BIGINT) AS b$i").mkString(", ")
    val eOut = (1 to 5).map(i =>
      s"CAST(CASE WHEN su.n >= 50 THEN rp.edges[$i] END AS BIGINT) AS e$i").mkString(", ")
    val bOut = (1 to 4).map(i =>
      s"CASE WHEN su.n >= 50 THEN ct.b$i END AS b$i").mkString(", ")
    s"""WITH RECURSIVE
       |o2 AS (SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od,
       |         o_orderpriority, $tsO AS ts FROM orders),
       |sales0 AS (SELECT DISTINCT l_orderkey AS sale_id,
       |             l_extendedprice AS price, l_quantity AS qty FROM lineitem),
       |mono AS (SELECT sale_id FROM sales0 GROUP BY sale_id HAVING COUNT(*) = 1),
       |prep0 AS (SELECT s0.*, s0.price / s0.qty AS unit_price
       |          FROM sales0 s0 JOIN mono USING (sale_id)),
       |sales AS (SELECT p0.sale_id, p0.unit_price, o2.o_custkey AS cust,
       |            strftime(o2.od, '%Y-%m') AS month, o2.ts
       |          FROM prep0 p0 JOIN o2 ON p0.sale_id = o2.o_orderkey),
       |rights AS (SELECT o_custkey AS cust, ts + 1 AS rts,
       |             o_orderpriority AS prev_prio FROM o2),
       |enr AS (SELECT s.*, CASE WHEN r.prev_prio IS NULL THEN 'N'
       |                         ELSE substring(r.prev_prio, 1, 1) END AS type
       |        FROM sales s ASOF LEFT JOIN rights r
       |          ON s.cust = r.cust AND s.ts >= r.rts),
       |prep AS (SELECT e.sale_id, e.unit_price, e.month, e.type,
       |          n.n_name, rg.r_name
       |        FROM enr e JOIN customer c ON e.cust = c.c_custkey
       |        JOIN nation n ON c.c_nationkey = n.n_nationkey
       |        JOIN region rg ON n.n_regionkey = rg.r_regionkey),
       |melted AS (SELECT 'region' AS echelle, r_name AS code_geo, month, type,
       |             CAST(floor(unit_price * 100) AS BIGINT) AS cents FROM prep
       |           UNION ALL
       |           SELECT 'nation', n_name, month, type,
       |             CAST(floor(unit_price * 100) AS BIGINT) FROM prep),
       |stats AS (SELECT echelle, code_geo, month, COUNT(*) AS nb,
       |            median(CAST(cents AS DOUBLE)) AS med_cents, $nbCols, $scCols
       |          FROM melted GROUP BY echelle, code_geo, month),
       |dv AS (SELECT DISTINCT n_name, unit_price FROM prep),
       |edges0 AS (SELECT n_name,
       |             quantile_cont(unit_price, [0.0,0.25,0.5,0.75,1.0]) AS raw_edges
       |           FROM dv GROUP BY n_name),
       |rep AS (SELECT n_name, raw_edges, 0 AS i, CAST([] AS DOUBLE[]) AS edges,
       |          CAST(NULL AS DOUBLE) AS last
       |        FROM edges0
       |        UNION ALL
       |        SELECT n_name, raw_edges, i + 1, edges || [$v], $v
       |        FROM rep WHERE i < 5),
       |repaired AS (SELECT n_name, edges FROM rep WHERE i = 5),
       |support AS (SELECT n_name, COUNT(*) AS n FROM prep GROUP BY n_name),
       |bucketed AS (SELECT p.n_name,
       |               greatest(len(list_filter(rp.edges[1:4], x -> x <= p.unit_price)), 1) AS bucket
       |             FROM prep p JOIN repaired rp USING (n_name)),
       |counts AS (SELECT n_name, $binCols FROM bucketed GROUP BY n_name),
       |dist AS (SELECT su.n_name AS code_geo, su.n AS dist_n, $eOut, $bOut
       |         FROM support su JOIN repaired rp USING (n_name)
       |         JOIN counts ct USING (n_name))
       |SELECT st.*, d.dist_n, d.e1, d.e2, d.e3, d.e4, d.e5,
       |       d.b1, d.b2, d.b3, d.b4
       |FROM stats st LEFT JOIN dist d USING (code_geo)
       |ORDER BY st.echelle, st.code_geo, st.month""".stripMargin
  }
}
