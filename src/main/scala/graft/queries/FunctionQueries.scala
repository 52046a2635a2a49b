package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Unaccent.unaccent
import QH._

/** SURVEY.md §2.7/§2.8 scalar-function and reshape inventory (F/R families),
  * each paired with a DuckDB oracle. Strings are built from integer/string
  * columns (never double→string casts, whose formatting differs between
  * engines).
  */
object FunctionQueries {

  val all: Seq[Q] = Seq(

    Q("f1_substring",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"), substring(col("p_name"), 1, 5).as("name5"),
          substring(col("p_type"), 2, 3).as("type_mid"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, SUBSTRING(p_name, 1, 5) AS name5,
                SUBSTRING(p_type, 2, 3) AS type_mid
              FROM part ORDER BY p_partkey""")),

    Q("f2_lpad_zerofill",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 9, "0").as("code"),
          rpad(col("c_mktsegment"), 12, ".").as("seg_pad"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, LPAD(CAST(c_custkey AS VARCHAR), 9, '0') AS code,
                RPAD(c_mktsegment, 12, '.') AS seg_pad
              FROM customer ORDER BY c_custkey""")),

    Q("f3_concat_date_reformat",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          concat(col("o_orderkey").cast("string"), lit("-"), col("o_orderstatus")).as("id2"),
          date_format(col("o_orderdate"), "dd/MM/yyyy").as("fr_date"),
          to_date(date_format(col("o_orderdate"), "dd/MM/yyyy"), "dd/MM/yyyy").as("back"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(o_orderkey AS VARCHAR) || '-' || o_orderstatus AS id2,
                strftime(o_orderdate, '%d/%m/%Y') AS fr_date,
                CAST(strptime(strftime(o_orderdate, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS back
              FROM orders ORDER BY o_orderkey""")),

    // Decimal-comma parse (`dvf/geoloc/task_functions.py:184-186`): the
    // comma-string is built from integer columns so both engines agree on
    // the text, then parsed back with replace+cast.
    Q("f4_decimal_comma",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat(col("l_orderkey").cast("string"), lit(","),
            col("l_linenumber").cast("string")).as("s"))
        .withColumn("parsed", regexp_replace(col("s"), ",", ".").cast("double"))
        .orderBy("l_orderkey", "l_linenumber", "parsed"),
      Some("""SELECT l_orderkey, l_linenumber, s, CAST(REPLACE(s, ',', '.') AS DOUBLE) AS parsed
              FROM (SELECT l_orderkey, l_linenumber,
                      CAST(l_orderkey AS VARCHAR) || ',' || CAST(l_linenumber AS VARCHAR) AS s
                    FROM lineitem)
              ORDER BY l_orderkey, l_linenumber, parsed""")),

    Q("f5_regexp_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .orderBy("event_id"),
      Some("""SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k
              FROM events ORDER BY event_id""")),

    Q("f6_regexp_replace",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          trim(col("p_type")).as("trimmed"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                TRIM(p_type) AS trimmed
              FROM part ORDER BY p_partkey""")),

    Q("f7_initcap",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"), initcap(col("p_name")).as("title"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
                array_to_string(list_transform(string_split(p_name, ' '),
                  w -> upper(w[1]) || lower(w[2:])), ' ') AS title
              FROM part ORDER BY p_partkey""")),

    // unaccent vs DuckDB strip_accents; ligature transliteration (which
    // strip_accents lacks) is covered by the ScalaTest suite instead.
    Q("f8_unaccent",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          unaccent(concat(col("c_name"), lit(" Café Señor àéîõü"))).as("u"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, strip_accents(c_name || ' Café Señor àéîõü') AS u
              FROM customer ORDER BY c_custkey""")),

    Q("f10_url_parse",
      (s, d) => {
        val url = concat(lit("https://example.org/api/v1/items?id="),
          col("c_custkey").cast("string"), lit("&seg="), col("c_mktsegment"))
        Tables.customer(s, d)
          .select(col("c_custkey"), url.as("url"))
          .withColumn("path", parse_url(col("url"), lit("PATH")))
          .withColumn("q_id", parse_url(col("url"), lit("QUERY"), lit("id")))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, url, regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                regexp_extract(url, '[?&]id=([^&]*)', 1) AS q_id
              FROM (SELECT c_custkey,
                      'https://example.org/api/v1/items?id=' || CAST(c_custkey AS VARCHAR)
                        || '&seg=' || c_mktsegment AS url
                    FROM customer)
              ORDER BY c_custkey""")),

    Q("f11_date_arith",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), month(col("o_orderdate")).as("m"),
          add_months(to_date(col("o_orderdate")), 1).as("next_month"),
          datediff(to_date(lit("2000-01-01")), to_date(col("o_orderdate"))).as("days_to_y2k"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, CAST(month(o_orderdate) AS INTEGER) AS m,
                CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER)
                  AS days_to_y2k
              FROM orders ORDER BY o_orderkey""")),

    Q("f12_iso_ts_parse",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("iso"))
        .withColumn("parsed",
          date_format(to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ss"),
            "yyyy-MM-dd HH:mm:ss"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS iso,
                strftime(strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S'),
                  '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS parsed
              FROM orders ORDER BY o_orderkey""")),

    Q("f13_epoch_duration",
      (s, d) => Tables.events(s, d)
        .groupBy("user_id")
        .agg(expr("(max(ts_us_long) - min(ts_us_long)) div 1000000").as("span_s"),
          expr("min(ts_us_long) div 1000000").as("first_epoch_s"))
        .orderBy("user_id"),
      Some(s"""${evCte}
               SELECT user_id, (MAX(ts_us_long) - MIN(ts_us_long)) // 1000000 AS span_s,
                 MIN(ts_us_long) // 1000000 AS first_epoch_s
               FROM ev GROUP BY user_id ORDER BY user_id""")),

    // Both outputs are the SAME from_json subtree, so whole-stage codegen's
    // subexpression elimination parses each row once. (The round-2 version
    // mixed get_json_object with from_json — two different parse exprs CSE
    // cannot merge, and the one multi-second-variance query in the bench.)
    Q("f14_json_extract",
      (s, d) => {
        val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
        Tables.events(s, d)
          .select(col("event_id"), parsed.getField("k").as("k_int"),
            parsed.getField("k").as("k_struct"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_struct
              FROM events ORDER BY event_id""")),

    Q("f15_array_ops",
      (s, d) => {
        val words = split(col("text"), " ")
        Tables.documents(s, d)
          .select(col("doc_id"), size(words).as("n_words"),
            array_join(slice(words, 1, 3), " ").as("first3"),
            element_at(reverse(words), 1).as("last_word"),
            array_join(slice(array_sort(array_distinct(words)), 1, 5), ",").as("first5_sorted"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, CAST(len(w) AS INTEGER) AS n_words,
                array_to_string(list_slice(w, 1, 3), ' ') AS first3,
                w[-1] AS last_word,
                array_to_string(list_slice(list_sort(list_distinct(w)), 1, 5), ',') AS first5_sorted
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              ORDER BY doc_id""")),

    Q("f16_map_lookup",
      (s, d) => {
        val m = map(lit("AFRICA"), lit("AF"), lit("AMERICA"), lit("AM"),
          lit("ASIA"), lit("AS"), lit("EUROPE"), lit("EU"), lit("MIDDLE EAST"), lit("ME"))
        Tables.region(s, d)
          .select(col("r_regionkey"), col("r_name"),
            coalesce(element_at(m, col("r_name")), lit("??")).as("code"))
          .orderBy("r_regionkey")
      },
      Some("""SELECT r_regionkey, r_name,
                CASE r_name WHEN 'AFRICA' THEN 'AF' WHEN 'AMERICA' THEN 'AM'
                  WHEN 'ASIA' THEN 'AS' WHEN 'EUROPE' THEN 'EU'
                  WHEN 'MIDDLE EAST' THEN 'ME' ELSE '??' END AS code
              FROM region ORDER BY r_regionkey""")),

    Q("f17_sha2",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"), sha2(col("c_name"), 256).as("h"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, sha256(c_name) AS h FROM customer ORDER BY c_custkey""")),

    // Quantiles of the DISTINCT value set, not the multiset — the reference's
    // subtle choice (`dvf/explore/task_functions.py:846-849`, SURVEY §7.4.1).
    Q("f18_quantiles_distinct",
      (s, d) => {
        val distinctPrices = Tables.lineitem(s, d)
          .select("l_returnflag", "l_extendedprice").distinct()
        distinctPrices.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, array(0.1, 0.25, 0.5, 0.75, 0.9))").as("qs"),
            count(lit(1)).as("n_distinct"))
          .select(col("l_returnflag"), col("n_distinct"),
            floor(element_at(col("qs"), 1) * lit(10000.0)).cast("long").as("q10_fp"),
            floor(element_at(col("qs"), 2) * lit(10000.0)).cast("long").as("q25_fp"),
            floor(element_at(col("qs"), 3) * lit(10000.0)).cast("long").as("q50_fp"),
            floor(element_at(col("qs"), 4) * lit(10000.0)).cast("long").as("q75_fp"),
            floor(element_at(col("qs"), 5) * lit(10000.0)).cast("long").as("q90_fp"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_distinct,
                CAST(floor(quantile_cont(l_extendedprice, 0.1) * 10000.0) AS BIGINT) AS q10_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.25) * 10000.0) AS BIGINT) AS q25_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.5) * 10000.0) AS BIGINT) AS q50_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.75) * 10000.0) AS BIGINT) AS q75_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.9) * 10000.0) AS BIGINT) AS q90_fp
              FROM (SELECT DISTINCT l_returnflag, l_extendedprice FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // f18's semantics through the O(1)-task-memory distributed-selection
    // path (operators/Distribution.distributedQuantiles): the few-huge-
    // groups scale shape — 3 return flags over all of lineitem — where the
    // buffered percentile aggregate would hold a group's whole distinct set
    // in one buffer. Same oracle as f18: the two paths are bit-identical
    // (DistributedQuantilesSpec) so they must also hash-match DuckDB alike.
    Q("f18c_quantiles_distributed",
      (s, d) => {
        val distinctPrices = Tables.lineitem(s, d)
          .select("l_returnflag", "l_extendedprice").distinct()
        graft.operators.Distribution.distributedQuantiles(
            distinctPrices, "l_returnflag", "l_extendedprice",
            Seq(0.1, 0.25, 0.5, 0.75, 0.9))
          .select(col("l_returnflag"), col("n").as("n_distinct"),
            floor(element_at(col("qs"), 1) * lit(10000.0)).cast("long").as("q10_fp"),
            floor(element_at(col("qs"), 2) * lit(10000.0)).cast("long").as("q25_fp"),
            floor(element_at(col("qs"), 3) * lit(10000.0)).cast("long").as("q50_fp"),
            floor(element_at(col("qs"), 4) * lit(10000.0)).cast("long").as("q75_fp"),
            floor(element_at(col("qs"), 5) * lit(10000.0)).cast("long").as("q90_fp"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n_distinct,
                CAST(floor(quantile_cont(l_extendedprice, 0.1) * 10000.0) AS BIGINT) AS q10_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.25) * 10000.0) AS BIGINT) AS q25_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.5) * 10000.0) AS BIGINT) AS q50_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.75) * 10000.0) AS BIGINT) AS q75_fp,
                CAST(floor(quantile_cont(l_extendedprice, 0.9) * 10000.0) AS BIGINT) AS q90_fp
              FROM (SELECT DISTINCT l_returnflag, l_extendedprice FROM lineitem)
              GROUP BY l_returnflag ORDER BY l_returnflag""")),

    Q("f19_histogram",
      (s, d) => Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
        .orderBy("bucket"),
      Some("""SELECT CAST(FLOOR(l_extendedprice / 10000) AS BIGINT) AS bucket, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1 ORDER BY bucket""")),

    Q("f20_levenshtein",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          levenshtein(col("p_name"), lit("small widget")).as("lev"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, CAST(levenshtein(p_name, 'small widget') AS INTEGER) AS lev
              FROM part ORDER BY p_partkey""")),

    Q("f21_keyword_rlike",
      (s, d) => Tables.documents(s, d)
        .withColumn("flagged", col("text").rlike("(spark|stream|vector)"))
        .groupBy("lang", "flagged").agg(count(lit(1)).as("cnt"))
        .orderBy("lang", "flagged"),
      Some("""SELECT lang, regexp_matches(text, '(spark|stream|vector)') AS flagged,
                COUNT(*) AS cnt
              FROM documents GROUP BY 1, 2 ORDER BY lang, flagged""")),

    Q("f22_version_sort_key",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          concat((col("p_partkey") % 3).cast("string"), lit("."),
            (col("p_partkey") % 10).cast("string"), lit("."),
            (col("p_partkey") % 7).cast("string")).as("version"))
        .withColumn("sort_key",
          expr("""CAST(split(version, '\\.')[0] AS BIGINT) * 10000 +
                  CAST(split(version, '\\.')[1] AS BIGINT) * 100 +
                  CAST(split(version, '\\.')[2] AS BIGINT)"""))
        .orderBy("sort_key", "p_partkey"),
      Some("""SELECT p_partkey, version,
                CAST(parts[1] AS BIGINT) * 10000 + CAST(parts[2] AS BIGINT) * 100 +
                  CAST(parts[3] AS BIGINT) AS sort_key
              FROM (SELECT p_partkey,
                      CAST(p_partkey % 3 AS VARCHAR) || '.' || CAST(p_partkey % 10 AS VARCHAR)
                        || '.' || CAST(p_partkey % 7 AS VARCHAR) AS version,
                      string_split(CAST(p_partkey % 3 AS VARCHAR) || '.'
                        || CAST(p_partkey % 10 AS VARCHAR) || '.'
                        || CAST(p_partkey % 7 AS VARCHAR), '.') AS parts
                    FROM part)
              ORDER BY sort_key, p_partkey""")),

    Q("f24_try_cast",
      (s, d) => Tables.part(s, d)
        .withColumn("s", when(col("p_partkey") % 3 === 0, lit("not_a_number"))
          .otherwise(col("p_size").cast("string")))
        .select(col("p_partkey"), col("s"), expr("try_cast(s AS INT)").as("v"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, s, TRY_CAST(s AS INTEGER) AS v
              FROM (SELECT p_partkey,
                      CASE WHEN p_partkey % 3 = 0 THEN 'not_a_number'
                           ELSE CAST(p_size AS VARCHAR) END AS s
                    FROM part)
              ORDER BY p_partkey""")),

    // ——— R: reshape ———————————————————————————————————————————————————

    Q("r1_pivot_wide",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_linestatus").pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(count(lit(1)))
        .select(col("l_linestatus"), coalesce(col("A"), lit(0L)).as("nb_A"),
          coalesce(col("N"), lit(0L)).as("nb_N"), coalesce(col("R"), lit(0L)).as("nb_R"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
                CAST(COUNT(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS nb_A,
                CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N') AS BIGINT) AS nb_N,
                CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS nb_R
              FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    Q("r2_wide_metric_columns",
      (s, d) => Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .groupBy("month").pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(moneySum(col("o_totalprice")))
        .select(col("month"), coalesce(col("O"), lit(0.0)).as("revenue_O"),
          coalesce(col("F"), lit(0.0)).as("revenue_F"),
          coalesce(col("P"), lit(0.0)).as("revenue_P"))
        .orderBy("month"),
      Some(s"""SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'O') AS DOUBLE), 0.0) AS revenue_O,
                 COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'F') AS DOUBLE), 0.0) AS revenue_F,
                 COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   FILTER (WHERE o_orderstatus = 'P') AS DOUBLE), 0.0) AS revenue_P
               FROM orders GROUP BY 1 ORDER BY month""")),

    Q("r3_cross_product",
      (s, d) => Tables.region(s, d)
        .crossJoin(s.range(1, 13).select(col("id").cast("int").as("m")))
        .select("r_name", "m").orderBy("r_name", "m"),
      Some("""SELECT r_name, CAST(i AS INTEGER) AS m
              FROM region CROSS JOIN range(1, 13) t(i)
              ORDER BY r_name, m""")),

    Q("r4_explode_long",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(slice(split(col("text"), " "), 1, 5)).as("word"))
        .orderBy("doc_id", "word"),
      Some("""SELECT doc_id, unnest(list_slice(string_split(text, ' '), 1, 5)) AS word
              FROM documents ORDER BY doc_id, word""")),

    // R5 (beyond survey): standalone UNPIVOT — r1's pivot inverted: the
    // four lineitem measures melted to (metric, value) long form via
    // Dataset.unpivot (one Expand, no join/union re-scan), then a
    // DECIMAL-exact per-(flag, metric) sum. The oracle uses the UNION
    // ALL spelling (portable across DuckDB versions; the row set is
    // definitionally identical).
    Q("r5_unpivot_metrics",
      (s, d) => Tables.lineitem(s, d)
        .select("l_returnflag", "l_quantity", "l_extendedprice",
          "l_discount", "l_tax")
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy("l_returnflag", "metric")
        .agg(count(lit(1)).as("n"), QH.moneySum(col("value")).as("total"))
        .orderBy("l_returnflag", "metric"),
      Some(s"""WITH long AS (
         |  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value
         |    FROM lineitem
         |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
         |    FROM lineitem
         |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount
         |    FROM lineitem
         |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
         |SELECT l_returnflag, metric, COUNT(*) AS n,
         |  ${QH.sqlMoneySum("value")} AS total
         |FROM long GROUP BY 1, 2 ORDER BY l_returnflag, metric""".stripMargin))
  )
}
