package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Relational
import QH._

/** SURVEY.md §2 relational inventory (P/J/A/W/O families) on the driver's
  * TPC-H-ish tables, each with a DuckDB oracle. Every query ends in a
  * deterministic ORDER BY (unique key) so results are order-stable on both
  * engines; every computed column is aliased identically on both sides.
  */
object RelationalQueries {

  private def L(s: SparkSession, d: String)  = Tables.lineitem(s, d)
  private def O(s: SparkSession, d: String)  = Tables.orders(s, d)
  private def C(s: SparkSession, d: String)  = Tables.customer(s, d)
  private def N(s: SparkSession, d: String)  = Tables.nation(s, d)
  private def R(s: SparkSession, d: String)  = Tables.region(s, d)
  private def P(s: SparkSession, d: String)  = Tables.part(s, d)
  private def EV(s: SparkSession, d: String) = Tables.events(s, d)

  val all: Seq[Q] = Seq(

    // ——— P: projections / predicates ————————————————————————————————

    Q("p1_project_rename",
      (s, d) => L(s, d)
        .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
        .orderBy("okey", "line"),
      Some("""SELECT l_orderkey AS okey, l_linenumber AS line, l_quantity AS qty,
              l_extendedprice AS price FROM lineitem ORDER BY okey, line""")),

    Q("p2_isin_filter",
      (s, d) => L(s, d)
        .filter(col("l_returnflag").isin("A", "R") && col("l_linestatus").isin("F"))
        .groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
              WHERE l_returnflag IN ('A','R') AND l_linestatus IN ('F')
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("p3_range_filter",
      (s, d) => L(s, d)
        .filter(col("l_quantity").between(10, 20) &&
          col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1996-01-01"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), moneySum(col("l_extendedprice")).as("rev"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag, COUNT(*) AS cnt, ${sqlMoneySum("l_extendedprice")} AS rev
               FROM lineitem
               WHERE l_quantity BETWEEN 10 AND 20
                 AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
               GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("p4_null_predicates",
      (s, d) => L(s, d)
        .withColumn("disc_n", expr("nullif(l_discount, 0.0)"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"), count(col("disc_n")).as("n_disc"),
          // exact: DECIMAL(18,2) sum (discounts are 2-dec) over the
          // non-null count, one bit-identical double division — never a
          // raw-double sum or round() output (a repo invariant)
          (sum(col("disc_n").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast("double") / count(col("disc_n"))).as("avg_disc"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, COUNT(*) AS n_rows, COUNT(disc_n) AS n_disc,
                (CAST(SUM(CAST(disc_n AS DECIMAL(18,2))) AS DOUBLE) / COUNT(disc_n)) AS avg_disc
              FROM (SELECT l_returnflag, NULLIF(l_discount, 0.0) AS disc_n FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("p5_string_filters",
      (s, d) => C(s, d)
        .filter(col("c_name").startsWith("Customer#") && col("c_name").contains("9") &&
          length(col("c_name")) === 18)
        .select("c_custkey", "c_name").orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE c_name LIKE 'Customer#%' AND c_name LIKE '%9%' AND LENGTH(c_name) = 18
              ORDER BY c_custkey""")),

    Q("p6_band_filter",
      (s, d) => EV(s, d)
        .filter(col("value").between(100, 250))
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type"),
      Some("""SELECT event_type, COUNT(*) AS cnt FROM events
              WHERE value BETWEEN 100 AND 250 GROUP BY event_type ORDER BY event_type""")),

    Q("p7_conditional_column",
      (s, d) => O(s, d)
        .withColumn("prio_class",
          when(substring(col("o_orderpriority"), 1, 1) === "1", "urgent")
            .when(substring(col("o_orderpriority"), 1, 1) === "2", "high")
            .otherwise("normal"))
        .groupBy("prio_class")
        .agg(count(lit(1)).as("cnt"), moneySum(col("o_totalprice")).as("total"))
        .orderBy("prio_class"),
      Some(s"""SELECT prio_class, COUNT(*) AS cnt, ${sqlMoneySum("o_totalprice")} AS total
               FROM (SELECT CASE WHEN SUBSTRING(o_orderpriority,1,1)='1' THEN 'urgent'
                                 WHEN SUBSTRING(o_orderpriority,1,1)='2' THEN 'high'
                                 ELSE 'normal' END AS prio_class, o_totalprice FROM orders)
               GROUP BY prio_class ORDER BY prio_class""")),

    Q("p8_fillna_derived",
      (s, d) => O(s, d)
        .withColumn("status_or_prio",
          coalesce(expr("nullif(o_orderstatus, 'O')"), substring(col("o_orderpriority"), 1, 1)))
        .groupBy("status_or_prio").agg(count(lit(1)).as("cnt"))
        .orderBy("status_or_prio"),
      Some("""SELECT COALESCE(NULLIF(o_orderstatus,'O'), SUBSTRING(o_orderpriority,1,1)) AS status_or_prio,
                COUNT(*) AS cnt
              FROM orders GROUP BY 1 ORDER BY status_or_prio""")),

    Q("p9_inf_to_null",
      (s, d) => {
        val ratio = when(col("l_discount") =!= 0.0, col("l_extendedprice") / col("l_discount"))
          .otherwise(lit(Double.PositiveInfinity))
        val cleaned = when(ratio === Double.PositiveInfinity, lit(null)).otherwise(ratio)
        // per-row ⌊r·100⌋ cents (bit-identical double ratio, exact floor),
        // then an EXACT integer mean (long sum, floor division) — no
        // order-sensitive double sum, no round() output
        L(s, d).withColumn("r", cleaned)
          .withColumn("r_cents", floor(col("r") * lit(100.0)).cast("long"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_rows"), (count(lit(1)) - count(col("r"))).as("n_nulled"),
            expr("sum(r_cents) div count(r_cents)").as("avg_ratio_cents"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_rows, COUNT(*) - COUNT(r) AS n_nulled,
                CAST(SUM(CAST(floor(r * 100.0) AS BIGINT))
                     // COUNT(CASE WHEN r IS NOT NULL THEN 1 END) AS BIGINT) AS avg_ratio_cents
              FROM (SELECT l_returnflag,
                      CASE WHEN isinf(CASE WHEN l_discount = 0 THEN 'infinity'::DOUBLE
                                           ELSE l_extendedprice / l_discount END)
                           THEN NULL ELSE l_extendedprice / l_discount END AS r
                    FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ——— J: joins ———————————————————————————————————————————————————

    Q("j1_broadcast_dim_join",
      (s, d) => C(s, d)
        .join(broadcast(N(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(R(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("acct"))
        .orderBy("r_name", "n_name"),
      Some(s"""SELECT r_name, n_name, COUNT(*) AS n_cust, ${sqlMoneySum("c_acctbal")} AS acct
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    Q("j2_large_join_agg",
      (s, d) => L(s, d)
        .join(O(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(20, 4)))
            .cast("double").as("revenue"))
        .orderBy("o_orderstatus", "l_returnflag"),
      Some("""SELECT o_orderstatus, l_returnflag, COUNT(*) AS cnt,
                CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(20,4))) AS DOUBLE) AS revenue
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus, l_returnflag ORDER BY o_orderstatus, l_returnflag""")),

    Q("j3_full_outer",
      (s, d) => {
        val oagg = O(s, d).groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        C(s, d).select("c_custkey", "c_mktsegment")
          .join(oagg, col("c_custkey") === col("o_custkey"), "full")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_mktsegment"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy("custkey")
      },
      Some("""SELECT COALESCE(c_custkey, o_custkey) AS custkey, c_mktsegment,
                COALESCE(n_orders, 0) AS n_orders
              FROM (SELECT c_custkey, c_mktsegment FROM customer) c
              FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1) o
                ON c_custkey = o_custkey
              ORDER BY custkey""")),

    Q("j4_composite_key_outer",
      (s, d) => {
        val ev = EV(s, d).withColumn("day", to_date(col("ts_us")))
        val a = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "day").agg(count(lit(1)).as("n_purchase"))
        val b = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id").as("u2"), col("day").as("d2")).agg(count(lit(1)).as("n_click"))
        a.join(b, col("user_id") === col("u2") && col("day") === col("d2"), "full")
          .select(coalesce(col("user_id"), col("u2")).as("uid"),
            coalesce(col("day"), col("d2")).as("day"),
            coalesce(col("n_purchase"), lit(0L)).as("n_purchase"),
            coalesce(col("n_click"), lit(0L)).as("n_click"))
          .orderBy("uid", "day")
      },
      Some(s"""${evCte}, base AS (SELECT user_id, CAST(date_trunc('day', ts_us) AS DATE) AS day,
                 event_type FROM ev),
               a AS (SELECT user_id, day, COUNT(*) AS n_purchase FROM base
                     WHERE event_type = 'purchase' GROUP BY 1, 2),
               b AS (SELECT user_id AS u2, day AS d2, COUNT(*) AS n_click FROM base
                     WHERE event_type = 'click' GROUP BY 1, 2)
               SELECT COALESCE(user_id, u2) AS uid, COALESCE(day, d2) AS day,
                 COALESCE(n_purchase, 0) AS n_purchase, COALESCE(n_click, 0) AS n_click
               FROM a FULL JOIN b ON user_id = u2 AND day = d2
               ORDER BY uid, day""")),

    Q("j5_coalesce_keys",
      (s, d) => {
        val a = O(s, d).groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("m1"))
          .agg(moneySum(col("o_totalprice")).as("order_rev"))
        val b = L(s, d).groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("m2"))
          .agg(moneySum(col("l_extendedprice")).as("item_rev"))
        a.join(b, col("m1") === col("m2"), "full")
          .select(coalesce(col("m1"), col("m2")).as("month"),
            coalesce(col("order_rev"), lit(0.0)).as("order_rev"),
            coalesce(col("item_rev"), lit(0.0)).as("item_rev"))
          .orderBy("month")
      },
      Some(s"""WITH a AS (SELECT strftime(o_orderdate, '%Y-%m') AS m1,
                 ${sqlMoneySum("o_totalprice")} AS order_rev FROM orders GROUP BY 1),
               b AS (SELECT strftime(l_shipdate, '%Y-%m') AS m2,
                 ${sqlMoneySum("l_extendedprice")} AS item_rev FROM lineitem GROUP BY 1)
               SELECT COALESCE(m1, m2) AS month, COALESCE(order_rev, 0.0) AS order_rev,
                 COALESCE(item_rev, 0.0) AS item_rev
               FROM a FULL JOIN b ON m1 = m2 ORDER BY month""")),

    Q("j6_join_preagg",
      (s, d) => {
        val la = L(s, d).groupBy(col("l_orderkey"))
          .agg(moneySum(col("l_quantity")).as("qty"), count(lit(1)).as("n_lines"))
        O(s, d).join(la, col("o_orderkey") === col("l_orderkey"), "left")
          .select(col("o_orderkey"), col("o_totalprice"),
            coalesce(col("qty"), lit(0.0)).as("qty"),
            coalesce(col("n_lines"), lit(0L)).as("n_lines"))
          .orderBy("o_orderkey")
      },
      Some(s"""SELECT o_orderkey, o_totalprice, COALESCE(qty, 0.0) AS qty,
                 COALESCE(n_lines, 0) AS n_lines
               FROM orders LEFT JOIN (
                 SELECT l_orderkey, ${sqlMoneySum("l_quantity")} AS qty, COUNT(*) AS n_lines
                 FROM lineitem GROUP BY 1) la ON o_orderkey = l_orderkey
               ORDER BY o_orderkey""")),

    Q("j7_semi_on_count",
      (s, d) => {
        val renamed = L(s, d).withColumnRenamed("l_orderkey", "o_orderkey")
        Relational.keepKeysWithCount(renamed, "o_orderkey", 1L)
          .join(O(s, d), Seq("o_orderkey"), "left_semi")
          .select("o_orderkey", "l_extendedprice").orderBy("o_orderkey")
      },
      Some("""SELECT l_orderkey AS o_orderkey, l_extendedprice FROM lineitem
              WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING COUNT(*) = 1)
                AND l_orderkey IN (SELECT o_orderkey FROM orders)
              ORDER BY o_orderkey""")),

    Q("j8_anti_flag",
      (s, d) => {
        val urgent = O(s, d).filter(col("o_orderpriority").startsWith("1"))
          .select(col("o_custkey").as("c_custkey"))
        Relational.antiFlagJoin(C(s, d), urgent, Seq("c_custkey"), "has_urgent")
          .select("c_custkey", "has_urgent").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, (u.o_custkey IS NOT NULL) AS has_urgent
              FROM customer LEFT JOIN (
                SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '1%') u
                ON c_custkey = u.o_custkey
              ORDER BY c_custkey""")),

    Q("j9_left_anti",
      (s, d) => {
        val urgent = O(s, d).filter(col("o_orderpriority").startsWith("1"))
        C(s, d).join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_orderpriority LIKE '1%')
              ORDER BY c_custkey""")),

    Q("j10_nway_outer",
      (s, d) => {
        val o = O(s, d)
        val f1 = o.filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey").as("k1")).agg(count(lit(1)).as("n_open"))
        val f2 = o.filter(col("o_orderstatus") === "F")
          .groupBy(col("o_custkey").as("k2")).agg(moneySum(col("o_totalprice")).as("rev_f"))
        val f3 = o.filter(col("o_orderstatus") === "P")
          .groupBy(col("o_custkey").as("k3"))
          .agg(max(date_format(col("o_orderdate"), "yyyy-MM")).as("last_p_month"))
        f1.join(f2, col("k1") === col("k2"), "full")
          .withColumn("k12", coalesce(col("k1"), col("k2")))
          .join(f3, col("k12") === col("k3"), "full")
          .select(coalesce(col("k12"), col("k3")).as("custkey"),
            coalesce(col("n_open"), lit(0L)).as("n_open"),
            coalesce(col("rev_f"), lit(0.0)).as("rev_f"),
            coalesce(col("last_p_month"), lit("none")).as("last_p_month"))
          .orderBy("custkey")
      },
      Some(s"""WITH f1 AS (SELECT o_custkey AS k1, COUNT(*) AS n_open FROM orders
                 WHERE o_orderstatus = 'O' GROUP BY 1),
               f2 AS (SELECT o_custkey AS k2, ${sqlMoneySum("o_totalprice")} AS rev_f FROM orders
                 WHERE o_orderstatus = 'F' GROUP BY 1),
               f3 AS (SELECT o_custkey AS k3, MAX(strftime(o_orderdate, '%Y-%m')) AS last_p_month
                 FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
               SELECT COALESCE(k1, k2, k3) AS custkey, COALESCE(n_open, 0) AS n_open,
                 COALESCE(rev_f, 0.0) AS rev_f, COALESCE(last_p_month, 'none') AS last_p_month
               FROM f1 FULL JOIN f2 ON k1 = k2
               FULL JOIN f3 ON COALESCE(k1, k2) = k3
               ORDER BY custkey""")),

    Q("j11_right_join",
      (s, d) => O(s, d)
        .join(C(s, d), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
              FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    Q("j12_asof_join",
      (s, d) => {
        val ev = EV(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us_long")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts_us_long"), col("event_id").as("sig_id"))
        Relational.asOfJoin(purchases, signups, "user_id", "ts_us_long", Seq("sig_id"))
          .select(col("event_id"), col("user_id"),
            col("asof_ts").as("signup_ts_us"), col("asof_sig_id").as("signup_event_id"))
          .orderBy("event_id")
      },
      Some(s"""${evCte},
               p AS (SELECT event_id, user_id, ts_us_long FROM ev WHERE event_type = 'purchase'),
               sg AS (SELECT event_id AS sig_id, user_id, ts_us_long FROM ev WHERE event_type = 'signup')
               SELECT p.event_id, p.user_id, sg.ts_us_long AS signup_ts_us, sg.sig_id AS signup_event_id
               FROM p ASOF LEFT JOIN sg ON p.user_id = sg.user_id AND p.ts_us_long >= sg.ts_us_long
               ORDER BY p.event_id""")),

    // J12 full parity: the reference retries rows that missed the backward
    // as-of against the NEXT snapshot (`dvf/geoloc/task_functions.py:290-305`).
    // Same single shuffle — the forward pass is one extra window function
    // over the already-sorted frame. Misses drop 190 -> 0 at sf0.01.
    Q("j12b_asof_forward_retry",
      (s, d) => {
        val ev = EV(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts_us_long")
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts_us_long"), col("event_id").as("sig_id"))
        Relational.asOfJoin(purchases, signups, "user_id", "ts_us_long",
            Seq("sig_id"), forwardRetry = true)
          .select(col("event_id"), col("user_id"),
            col("asof_ts").as("signup_ts_us"), col("asof_sig_id").as("signup_event_id"),
            col("asof_dir"))
          .orderBy("event_id")
      },
      Some(s"""${evCte},
               p AS (SELECT event_id, user_id, ts_us_long FROM ev WHERE event_type = 'purchase'),
               sg AS (SELECT event_id AS sig_id, user_id, ts_us_long FROM ev WHERE event_type = 'signup'),
               b AS (SELECT p.event_id, p.user_id, sg.ts_us_long AS b_ts, sg.sig_id AS b_sig
                     FROM p ASOF LEFT JOIN sg
                       ON p.user_id = sg.user_id AND p.ts_us_long >= sg.ts_us_long),
               f AS (SELECT p.event_id, sg.ts_us_long AS f_ts, sg.sig_id AS f_sig
                     FROM p ASOF LEFT JOIN sg
                       ON p.user_id = sg.user_id AND p.ts_us_long <= sg.ts_us_long)
               SELECT b.event_id, b.user_id,
                 COALESCE(b.b_ts, f.f_ts) AS signup_ts_us,
                 COALESCE(b.b_sig, f.f_sig) AS signup_event_id,
                 CASE WHEN b.b_ts IS NOT NULL THEN 'backward'
                      WHEN f.f_ts IS NOT NULL THEN 'forward' END AS asof_dir
               FROM b JOIN f USING (event_id)
               ORDER BY b.event_id""")),

    // Skew-salted join: documents.source has 20 values at EVERY scale — a
    // raw shuffle join hot-spots 20 reducers forever. The salt spreads each
    // source over 8 sub-keys (deterministic doc_id % 8, dim replicated 8x);
    // results are identical to the plain join, which is what the oracle runs.
    Q("j15_salted_skew_join",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
        val dim = docs.groupBy("source")
          .agg(count(lit(1)).as("src_docs"), sum("n_chars").as("src_chars"))
        Relational.saltedJoin(docs, dim, "source", col("doc_id"), nSalts = 8)
          .select("doc_id", "source", "src_docs", "src_chars")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, src_docs, src_chars
              FROM documents JOIN (
                SELECT source, COUNT(*) AS src_docs,
                  CAST(SUM(n_chars) AS BIGINT) AS src_chars
                FROM documents GROUP BY source) dim USING (source)
              ORDER BY doc_id""")),

    Q("j14_range_join",
      (s, d) => {
        val buckets = s.range(0, 10).select(col("id").cast("int").as("bucket_id"),
          (col("id") * 50.0).as("lo"), ((col("id") + 1) * 50.0).as("hi"))
        EV(s, d).join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy("bucket_id")
          .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("total"))
          .orderBy("bucket_id")
      },
      Some(s"""SELECT bucket_id, COUNT(*) AS cnt, ${sqlMoneySum("value")} AS total
               FROM (SELECT CAST(i AS INTEGER) AS bucket_id, i*50.0 AS lo, (i+1)*50.0 AS hi
                     FROM range(10) t(i)) b
               JOIN events ON value >= lo AND value < hi
               GROUP BY bucket_id ORDER BY bucket_id""")),

    // ——— A: aggregations ————————————————————————————————————————————

    Q("a1_groupby_stats",
      (s, d) => L(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), moneyAvg(col("l_quantity")).as("avg_qty"),
          floor(median(col("l_extendedprice")) * lit(10000.0)).cast("long")
            .as("med_price_fp"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                 ${sqlMoneyAvg("l_quantity")} AS avg_qty,
                 CAST(floor(MEDIAN(l_extendedprice) * 10000.0) AS BIGINT) AS med_price_fp
               FROM lineitem GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    Q("a3_grand_total",
      (s, d) => L(s, d)
        .agg(count(lit(1)).as("n_rows"), moneySum(col("l_quantity")).as("total_qty"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"),
          countDistinct(col("l_suppkey")).as("n_supp")),
      Some(s"""SELECT COUNT(*) AS n_rows, ${sqlMoneySum("l_quantity")} AS total_qty,
                 strftime(MIN(l_shipdate), '%Y-%m-%d') AS first_ship,
                 strftime(MAX(l_shipdate), '%Y-%m-%d') AS last_ship,
                 COUNT(DISTINCT l_suppkey) AS n_supp
               FROM lineitem""")),

    // Multi-scale aggregation via GROUP BY ROLLUP, run through spark.sql on
    // registered views (also exercises the SQL-query source, SURVEY S10).
    // Note: selecting coalesce(groupCol) after a DataFrame .rollup trips
    // Spark's ambiguous-self-join detector (the Expand node re-emits the
    // grouping columns), so the SQL form is the idiomatic route here.
    Q("a4_rollup_multiscale",
      (s, d) => {
        O(s, d).createOrReplaceTempView("v_orders")
        C(s, d).createOrReplaceTempView("v_customer")
        N(s, d).createOrReplaceTempView("v_nation")
        R(s, d).createOrReplaceTempView("v_region")
        s.sql(s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
                    COUNT(*) AS n_orders, ${sqlMoneySum("o_totalprice")} AS rev
                  FROM v_orders JOIN v_customer ON o_custkey = c_custkey
                  JOIN v_nation ON c_nationkey = n_nationkey
                  JOIN v_region ON n_regionkey = r_regionkey
                  GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""")
      },
      Some(s"""SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
                 COUNT(*) AS n_orders, ${sqlMoneySum("o_totalprice")} AS rev
               FROM orders JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY ROLLUP(r_name, n_name) ORDER BY region, nation""")),

    Q("a5_conditional_pivot",
      (s, d) => {
        val ev = EV(s, d).withColumn("day", to_date(col("ts_us")))
        Relational.conditionalCountPivot(ev, Seq("day"), "event_type",
            Seq("click", "purchase", "error", "signup", "view"), "nb")
          .orderBy("day")
      },
      Some(s"""${evCte}
               SELECT CAST(date_trunc('day', ts_us) AS DATE) AS day,
                 CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS nb_click,
                 CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS nb_purchase,
                 CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS nb_error,
                 CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS nb_signup,
                 CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS nb_view
               FROM ev GROUP BY 1 ORDER BY day""")),

    Q("a7_value_counts",
      (s, d) => P(s, d).groupBy("p_brand").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("p_brand")),
      Some("""SELECT p_brand, COUNT(*) AS cnt FROM part GROUP BY p_brand
              ORDER BY cnt DESC, p_brand""")),

    Q("a8_rollup_chain",
      (s, d) => {
        val daily = O(s, d).groupBy(col("o_orderdate").as("day"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("day_rev"))
        daily.groupBy(date_format(col("day"), "yyyy-MM").as("month"))
          .agg(sum(col("day_rev")).cast("double").as("monthly_rev"),
            count(lit(1)).as("n_days"))
          .orderBy("month")
      },
      Some("""SELECT strftime(day, '%Y-%m') AS month,
                CAST(SUM(day_rev) AS DOUBLE) AS monthly_rev, COUNT(*) AS n_days
              FROM (SELECT o_orderdate AS day, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_rev
                    FROM orders GROUP BY 1)
              GROUP BY 1 ORDER BY month""")),

    Q("a13_capped_mean",
      (s, d) => O(s, d)
        .groupBy("o_orderstatus")
        // integer day-diff sums -> exact ppm mean (floor division), not a
        // round()-of-double average
        .agg(graft.operators.TextOps.divPpm(
            sum(least(datediff(to_date(lit("1998-01-01")), to_date(col("o_orderdate"))),
              lit(30)).cast("long")), count(lit(1)))
          .as("avg_capped_age_ppm"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus,
                CAST(SUM(LEAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01'), 30))
                     * 1000000 // COUNT(*) AS BIGINT) AS avg_capped_age_ppm
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    Q("a14_top1000_mean",
      (s, d) => O(s, d)
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(1000)
        .agg(moneyAvg(col("o_totalprice")).as("avg_top"), count(lit(1)).as("n")),
      Some(s"""SELECT ${sqlMoneyAvg("o_totalprice")} AS avg_top, COUNT(*) AS n
               FROM (SELECT o_totalprice FROM orders
                     ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000)""")),

    Q("a17_nunique_check",
      (s, d) => O(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_rows"),
          (countDistinct(col("o_orderkey")) === count(lit(1))).as("key_unique")),
      Some("""SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_rows,
                COUNT(DISTINCT o_orderkey) = COUNT(*) AS key_unique
              FROM orders""")),

    // ——— W: windows —————————————————————————————————————————————————

    Q("w1_sessionize",
      (s, d) => {
        val gapUs = 30L * 60 * 1000000L
        Relational.sessionize(EV(s, d), "user_id", "ts_us_long", "event_id", gapUs)
          .groupBy("user_id")
          .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some(s"""${evCte},
               l AS (SELECT user_id, ts_us_long,
                       lag(ts_us_long) OVER (PARTITION BY user_id ORDER BY ts_us_long, event_id) AS prev
                     FROM ev)
               SELECT user_id,
                 CAST(SUM(CASE WHEN prev IS NULL OR ts_us_long - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions,
                 COUNT(*) AS n_events
               FROM l GROUP BY user_id ORDER BY user_id""")),

    // Same semantics and ORACLE as w1, via the scalable engine: range-
    // partitioned by (key, ts), per-partition run scan with broadcast
    // boundary carry, distributed (pid, key) offset join — no per-key
    // window, so one key's history may span many tasks (the 100× case
    // where a single key exceeds one task's memory).
    Q("w1b_sessionize_scalable",
      (s, d) => {
        val gapUs = 30L * 60 * 1000000L
        Relational.sessionizeScalable(EV(s, d), "user_id", "ts_us_long",
            "event_id", gapUs)
          .groupBy("user_id")
          .agg(max(col("session_id")).as("n_sessions"), count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some(s"""${evCte},
               l AS (SELECT user_id, ts_us_long,
                       lag(ts_us_long) OVER (PARTITION BY user_id ORDER BY ts_us_long, event_id) AS prev
                     FROM ev)
               SELECT user_id,
                 CAST(SUM(CASE WHEN prev IS NULL OR ts_us_long - prev > 1800000000 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sessions,
                 COUNT(*) AS n_events
               FROM l GROUP BY user_id ORDER BY user_id""")),

    Q("w2_keep_one_priority",
      (s, d) => Relational.dedupKeepFirst(EV(s, d), Seq("user_id"),
          Seq(desc("value"), asc("event_id")))
        .select("user_id", "event_id", "value").orderBy("user_id"),
      Some(s"""${evCte}
               SELECT user_id, event_id, value FROM (
                 SELECT user_id, event_id, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
                 FROM ev) WHERE rn = 1 ORDER BY user_id""")),

    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so the
    // priority order includes enough columns for a total order on both sides.
    Q("w3_dedup_keep_first",
      (s, d) => Relational.dedupKeepFirst(L(s, d), Seq("l_orderkey"),
          Seq(asc("l_linenumber"), asc("l_partkey"), asc("l_suppkey"), asc("l_extendedprice")))
        .select(col("l_orderkey"), col("l_partkey").as("first_part"),
          col("l_quantity").as("first_qty"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey, l_partkey AS first_part, l_quantity AS first_qty FROM (
                SELECT *, row_number() OVER (PARTITION BY l_orderkey
                  ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice) AS rn
                FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""")),

    Q("w5_topk_per_group",
      (s, d) => Relational.topKPerGroup(O(s, d), Seq("o_custkey"),
          Seq(desc("o_totalprice"), asc("o_orderkey")), 3)
        .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rank"),
      Some("""SELECT o_custkey, CAST(rank AS INTEGER) AS rank,
                o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
                    AS rank
                FROM orders) WHERE rank <= 3 ORDER BY o_custkey, rank""")),

    Q("w6_recent_valid",
      (s, d) => Relational.dedupKeepFirst(EV(s, d).filter(col("value") > 50),
          Seq("user_id"), Seq(desc("ts_us_long"), desc("event_id")))
        .select("user_id", "event_id", "ts_us_long").orderBy("user_id"),
      Some(s"""${evCte}
               SELECT user_id, event_id, ts_us_long FROM (
                 SELECT user_id, event_id, ts_us_long,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts_us_long DESC, event_id DESC) AS rn
                 FROM ev WHERE value > 50) WHERE rn = 1 ORDER BY user_id""")),

    // W7 (beyond survey): rolling 7-day RANGE-frame metric per event type —
    // the sliding-window flavor of the mv family's calendar months. Daily
    // sums first (shuffle on (type, day)), then a PARTITIONED window over
    // the integer day number; the in-frame sum runs in DECIMAL because
    // engines disagree on frame-accumulation order for doubles (Spark
    // slides, DuckDB segment-trees).
    Q("w7_rolling_7day",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts_us")).as("day"))
          .agg(moneySum(col("value")).as("day_value"))
          .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
        val w = Window.partitionBy("event_type").orderBy(col("day_num"))
          .rangeBetween(-6, 0)
        daily
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            sum(col("day_value").cast("decimal(18,2)")).over(w).cast("double").as("roll7"),
            count(lit(1)).over(w).as("n_days"))
          .orderBy("event_type", "day")
      },
      Some(s"""${evCte},
               |daily AS (SELECT event_type, CAST(date_trunc('day', ts_us) AS DATE) AS day,
               |            ${sqlMoneySum("value")} AS day_value
               |          FROM ev GROUP BY 1, 2),
               |dn AS (SELECT event_type, day, day_value,
               |         datediff('day', DATE '1970-01-01', day) AS day_num FROM daily)
               |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               |  CAST(SUM(CAST(day_value AS DECIMAL(18,2))) OVER (
               |    PARTITION BY event_type ORDER BY day_num
               |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll7,
               |  COUNT(*) OVER (
               |    PARTITION BY event_type ORDER BY day_num
               |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS n_days
               |FROM dn ORDER BY event_type, day""".stripMargin)),

    // ——— O: sort / distinct / set ops ———————————————————————————————

    Q("o1_multisort_limit",
      (s, d) => L(s, d)
        .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
        .orderBy(asc("l_returnflag"), desc("l_quantity"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(100),
      Some("""SELECT l_returnflag, l_quantity, l_orderkey, l_linenumber FROM lineitem
              ORDER BY l_returnflag, l_quantity DESC, l_orderkey, l_linenumber LIMIT 100""")),

    Q("o4_distinct_rows",
      (s, d) => L(s, d).select("l_returnflag", "l_linestatus", "l_quantity")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "l_quantity"),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
              ORDER BY l_returnflag, l_linestatus, l_quantity""")),

    Q("o5_dedup_subset",
      (s, d) => L(s, d)
        .select(col("l_orderkey"), (col("l_orderkey") % 7).as("bucket"))
        .dropDuplicates("l_orderkey")
        .orderBy("l_orderkey"),
      Some("""SELECT DISTINCT l_orderkey, l_orderkey % 7 AS bucket FROM lineitem
              ORDER BY l_orderkey""")),

    Q("o6_union_by_name",
      (s, d) => {
        val a = O(s, d).select(col("o_orderkey").as("key")).withColumn("src", lit("orders"))
        val b = L(s, d).select(lit("lineitem").as("src"), col("l_orderkey").as("key"))
        a.unionByName(b).groupBy("src").agg(count(lit(1)).as("cnt")).orderBy("src")
      },
      Some("""SELECT src, COUNT(*) AS cnt FROM (
                SELECT o_orderkey AS key, 'orders' AS src FROM orders
                UNION ALL SELECT l_orderkey, 'lineitem' FROM lineitem)
              GROUP BY src ORDER BY src""")),

    Q("o7_key_set_diff",
      (s, d) => O(s, d).select(col("o_orderkey").as("key")).distinct()
        .except(L(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("key")).distinct())
        .orderBy("key"),
      Some("""SELECT * FROM (
                SELECT DISTINCT o_orderkey AS key FROM orders
                EXCEPT
                SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
              ORDER BY key""")),

    Q("o8_exceptall_cdc",
      (s, d) => {
        val old = L(s, d).filter(col("l_returnflag").isin("A", "R"))
          .select("l_partkey", "l_quantity")
        val neu = L(s, d).filter(col("l_returnflag").isin("N", "R"))
          .select("l_partkey", "l_quantity")
        Relational.cdcDiff(neu, old)._1.orderBy("l_partkey", "l_quantity")
      },
      Some("""SELECT * FROM (
                SELECT l_partkey, l_quantity FROM lineitem WHERE l_returnflag IN ('N','R')
                EXCEPT ALL
                SELECT l_partkey, l_quantity FROM lineitem WHERE l_returnflag IN ('A','R'))
              ORDER BY l_partkey, l_quantity""")),

    Q("o9_distinct_union",
      (s, d) => O(s, d).select(col("o_custkey").as("key"))
        .union(C(s, d).select(col("c_custkey").as("key")))
        .distinct().orderBy("key"),
      Some("""SELECT DISTINCT key FROM (
                SELECT o_custkey AS key FROM orders
                UNION ALL SELECT c_custkey FROM customer)
              ORDER BY key"""))
  )
}
