package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sketches

/** Cardinality-sketch catalog entries (operators/Sketches.scala): integer-
  * exact HyperLogLog daily-actives and KMV cross-group overlap, each
  * emitted NEXT TO the exact answer so the query itself demonstrates
  * accuracy — the catalog-SF role of the sketches; at deployment scale the
  * exact leg is what the sketch replaces. */
object SketchQueries {

  /** The sketched value: one integer per (user, day) — pure epoch-micro
    * arithmetic (ts_us_long div 86.4e9), no date formatting. */
  private val valueSparkSql = "CAST(user_id * 100000 + ts_us_long div 86400000000 AS STRING)"
  private val valueDuckSql = "CAST(user_id * 100000 + ts_us_long // 86400000000 AS VARCHAR)"

  private def dMd5Long(x: String) = s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"

  private val kmvK = 64

  /** Oracle helper: Z + integer estimate CTEs over a register CTE. */
  private def estSql(reg: String, z: String, est: String): String =
    s"""$z AS (SELECT event_type,
       |        SUM((1::BIGINT << (53 - mj))::HUGEINT)
       |          + (256 - COUNT(*))::HUGEINT * (1::BIGINT << 53) AS zz
       |      FROM $reg GROUP BY 1),
       |$est AS (SELECT event_type,
       |          CAST((718272::HUGEINT * 65536 * (1::BIGINT << 53))
       |               // (zz * 1000000) AS BIGINT) AS est
       |        FROM $z)""".stripMargin

  /** sk6's quantized value stream — ONE definition feeds both the register
    * build (v_reg) and the exact sort-rank leg (v_exact), so the two legs
    * cannot desynchronize on the quantization. */
  private def sk6Fx(s: org.apache.spark.sql.SparkSession,
                    d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), (col("user_id") % 2).as("src"),
        // domain clamp — the dyadicRegister contract (see its scaladoc):
        // an unclamped v ≥ 2^16 falls outside the root cell (the r15 s7
        // sf0.1 catch: 2 click events at value ≥ 512 made the register
        // total diverge from COUNT(*))
        least(greatest(floor(col("value") * lit(128)).cast("long"), lit(0L)),
          lit(65535L)).as("v"))

  /** sk6's persisted merged dyadic register — per-source registers
    * cell-SUM-merged, the artifact an ingest maintains on disk (the
    * streaming dyadic maintainer's store), memoized per sf dir with the
    * d13/ir2 localCheckpoint/setup discipline. */
  private val sk6RegCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  private def sk6Register(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame =
    QH.sessionMemo(sk6RegCache, d, s)(identity) {
      Sketches.dyadicRegister(sk6Fx(s, d), Seq("event_type", "src"), "v")
        .groupBy("event_type", "key").agg(sum("cnt").as("cnt"))
        .localCheckpoint(true)
    }

  val all: Seq[Q] = Seq(

    // HLL-256 daily actives per event_type, est vs exact. Register build
    // is ONE (group, bucket) shuffle with map-side-combined max — the
    // 100 TB shape; countDistinct's value-wide shuffle is the exact leg
    // the sketch replaces. Integer-exact estimator (Sketches scaladoc).
    Q("sk1_hll_daily_actives",
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_type"), expr(valueSparkSql).as("__v"))
        val est = Sketches.hllEstimate(
          Sketches.hllRegister(base, "event_type", "__v"), "event_type")
        val exact = base.groupBy("event_type")
          .agg(countDistinct("__v").as("n_exact"))
        est.join(exact, "event_type")
          .withColumn("err_ppm", expr("abs(est - n_exact) * 1000000L div n_exact"))
          .select(col("event_type"), col("est"), col("n_buckets"), col("v_zero"),
            col("n_exact"), col("err_ppm"))
          .orderBy("event_type")
      },
      Some(s"""${QH.evCte},
         |vals AS (SELECT event_type, $valueDuckSql AS v FROM ev),
         |h AS (SELECT event_type, ${dMd5Long("v")} AS h FROM vals),
         |rb AS (SELECT event_type, h % 256 AS bucket, h // 256 AS rem FROM h),
         |rr AS (SELECT event_type, bucket,
         |         CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END AS rho
         |       FROM rb),
         |reg AS (SELECT event_type, bucket, MAX(rho) AS mj FROM rr GROUP BY 1, 2),
         |z AS (SELECT event_type,
         |        SUM((1::BIGINT << (53 - mj))::HUGEINT)
         |          + (256 - COUNT(*))::HUGEINT * (1::BIGINT << 53) AS zz,
         |        COUNT(*) AS n_buckets
         |      FROM reg GROUP BY 1),
         |est AS (SELECT event_type,
         |          CAST((718272::HUGEINT * 65536 * (1::BIGINT << 53))
         |               // (zz * 1000000) AS BIGINT) AS est,
         |          CAST(n_buckets AS BIGINT) AS n_buckets,
         |          CAST(256 - n_buckets AS BIGINT) AS v_zero
         |        FROM z),
         |exact AS (SELECT event_type, COUNT(DISTINCT v) AS n_exact FROM vals GROUP BY 1)
         |SELECT e.event_type, est, n_buckets, v_zero, n_exact,
         |  abs(est - n_exact) * 1000000 // n_exact AS err_ppm
         |FROM est e JOIN exact USING (event_type)
         |ORDER BY event_type""".stripMargin)),

    // KMV-64 pairwise user-day overlap across event types: per-pair union
    // and intersection estimates from two tiny (k longs) registers, next
    // to the exact join answers. Sketch side never touches the raw values
    // after the per-group bottom-k — the cross-source-overlap shape where
    // sources are too big to join exactly.
    Q("sk2_kmv_overlap",
      (s, d) => {
        val base = Tables.events(s, d)
          .select(col("event_type"), expr(valueSparkSql).as("__v"))
        val sk = Sketches.kmvSketch(base, "event_type", "__v", kmvK)
        val over = Sketches.kmvOverlap(sk, "event_type", kmvK)
        // materialize-once (r15 opt): the exact-overlap legs read the
        // distinct value set three times (self-join both sides + sizes)
        val dv = base.distinct().localCheckpoint(true)
        val ex = dv.toDF("ga", "v")
          .join(dv.toDF("gb", "v"), Seq("v"))
          .filter(col("ga") < col("gb"))
          .groupBy("ga", "gb").agg(count(lit(1)).as("n_inter_exact"))
        val sizes = dv.groupBy("event_type").agg(count(lit(1)).as("nd"))
        over.join(ex, Seq("ga", "gb"), "left")
          .withColumn("n_inter_exact", coalesce(col("n_inter_exact"), lit(0L)))
          .join(sizes.toDF("ga", "na"), "ga")
          .join(sizes.toDF("gb", "nb"), "gb")
          .withColumn("n_union_exact", col("na") + col("nb") - col("n_inter_exact"))
          .select(col("ga"), col("gb"), col("n_common"), col("est_union"),
            col("est_inter"), col("n_union_exact"), col("n_inter_exact"))
          .orderBy("ga", "gb")
      },
      Some(s"""${QH.evCte},
         |vals AS (SELECT DISTINCT event_type, $valueDuckSql AS v FROM ev),
         |hs AS (SELECT DISTINCT event_type, ${dMd5Long("v")} AS h FROM vals),
         |sk AS (SELECT event_type, h FROM (
         |         SELECT event_type, h,
         |           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |         FROM hs) WHERE rn <= $kmvK),
         |pairs AS (SELECT a.event_type AS ga, b.event_type AS gb
         |          FROM (SELECT DISTINCT event_type FROM sk) a,
         |               (SELECT DISTINCT event_type FROM sk) b
         |          WHERE a.event_type < b.event_type),
         |uni AS (SELECT DISTINCT ga, gb, h FROM (
         |          SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.event_type = p.ga
         |          UNION ALL
         |          SELECT p.ga, p.gb, s.h FROM pairs p JOIN sk s ON s.event_type = p.gb)),
         |bk AS (SELECT ga, gb, h FROM (
         |         SELECT ga, gb, h,
         |           row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
         |         FROM uni) WHERE rn <= $kmvK),
         |uk AS (SELECT ga, gb, MAX(h) AS u_k, COUNT(*) AS n_k FROM bk GROUP BY 1, 2),
         |com AS (SELECT bk.ga, bk.gb, COUNT(*) AS n_common
         |        FROM bk
         |        JOIN sk sa ON sa.event_type = bk.ga AND sa.h = bk.h
         |        JOIN sk sb ON sb.event_type = bk.gb AND sb.h = bk.h
         |        GROUP BY 1, 2),
         |over_ AS (SELECT uk.ga, uk.gb, coalesce(com.n_common, 0) AS n_common,
         |           CASE WHEN uk.n_k < $kmvK THEN uk.n_k
         |                ELSE CAST((${kmvK - 1}::HUGEINT * ${1L << 60})
         |                          // u_k AS BIGINT) END AS est_union,
         |           CASE WHEN uk.n_k < $kmvK THEN coalesce(com.n_common, 0)
         |                ELSE CAST((coalesce(com.n_common, 0)::HUGEINT * ${kmvK - 1}
         |                           * ${1L << 60})
         |                          // ($kmvK::HUGEINT * u_k) AS BIGINT) END AS est_inter
         |          FROM uk LEFT JOIN com ON com.ga = uk.ga AND com.gb = uk.gb),
         |ex AS (SELECT a.event_type AS ga, b.event_type AS gb, COUNT(*) AS n_inter_exact
         |       FROM vals a JOIN vals b ON a.v = b.v AND a.event_type < b.event_type
         |       GROUP BY 1, 2),
         |sizes AS (SELECT event_type, COUNT(*) AS nd FROM vals GROUP BY 1)
         |SELECT o.ga, o.gb, CAST(n_common AS BIGINT) AS n_common,
         |  est_union, est_inter,
         |  CAST(sa.nd + sb.nd - coalesce(ex.n_inter_exact, 0) AS BIGINT) AS n_union_exact,
         |  CAST(coalesce(ex.n_inter_exact, 0) AS BIGINT) AS n_inter_exact
         |FROM over_ o
         |LEFT JOIN ex ON ex.ga = o.ga AND ex.gb = o.gb
         |JOIN sizes sa ON sa.event_type = o.ga
         |JOIN sizes sb ON sb.event_type = o.gb
         |ORDER BY o.ga, o.gb""".stripMargin)),

    // Sketch CUBE: HLL registers built ONCE at the finest (event_type,
    // day) cell; any coarser slice — here the first two weeks and the
    // full month — is answered by max-merging cell registers, never
    // rescanning raw data. The OLAP pre-aggregation pattern sketches
    // exist for; both slices emitted beside their exact answers.
    Q("sk3_hll_cube",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr(valueSparkSql).as("__v"),
            expr("ts_us_long div 86400000000").as("day"))
        val reg = Sketches.hllRegisterBy(ev, Seq("event_type", "day"), "__v")
        val dmin = ev.agg(min("day")).head().getLong(0)
        def merged(cond: org.apache.spark.sql.Column) =
          reg.filter(cond).groupBy("event_type", "bucket")
            .agg(max("mj").as("mj"))
        val est2w = Sketches.hllEstimate(merged(col("day") < dmin + 14), "event_type")
          .select(col("event_type"), col("est").as("est_2w"))
        val estAll = Sketches.hllEstimate(merged(lit(true)), "event_type")
          .select(col("event_type"), col("est").as("est_month"))
        // Both exact legs from ONE data-sized shuffle: per-(type, value)
        // first-seen day, then tiny per-type folds — a value is in the
        // 2-week slice iff its MIN day is (two full countDistinct
        // shuffles folded into one map-side-combined pass, r12 verdict).
        val perV = ev.groupBy("event_type", "__v").agg(min("day").as("__d0v"))
        val ex = perV.groupBy("event_type")
          .agg(sum(when(col("__d0v") < dmin + 14, 1L).otherwise(0L))
            .as("exact_2w"),
            count(lit(1)).as("exact_month"))
        est2w.join(estAll, "event_type").join(ex, "event_type")
          .select("event_type", "est_2w", "est_month", "exact_2w", "exact_month")
          .orderBy("event_type")
      },
      Some(s"""${QH.evCte},
         |vals AS (SELECT event_type, ts_us_long // 86400000000 AS day,
         |           $valueDuckSql AS v FROM ev),
         |dmin AS (SELECT MIN(day) AS d0 FROM vals),
         |h AS (SELECT event_type, day, ${dMd5Long("v")} AS h FROM vals),
         |rb AS (SELECT event_type, day, h % 256 AS bucket, h // 256 AS rem FROM h),
         |rr AS (SELECT event_type, day, bucket,
         |         CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END AS rho
         |       FROM rb),
         |reg AS (SELECT event_type, day, bucket, MAX(rho) AS mj
         |        FROM rr GROUP BY 1, 2, 3),
         |m2w AS (SELECT event_type, bucket, MAX(mj) AS mj
         |        FROM reg, dmin WHERE day < d0 + 14 GROUP BY 1, 2),
         |mall AS (SELECT event_type, bucket, MAX(mj) AS mj
         |         FROM reg GROUP BY 1, 2),
         |${estSql("m2w", "z2w", "e2w")},
         |${estSql("mall", "zall", "eall")},
         |pv AS (SELECT event_type, v, MIN(day) AS d0v
         |       FROM vals GROUP BY 1, 2),
         |x AS (SELECT event_type,
         |        CAST(SUM(CASE WHEN d0v < (SELECT d0 FROM dmin) + 14
         |                 THEN 1 ELSE 0 END) AS BIGINT) AS exact_2w,
         |        COUNT(*) AS exact_month
         |      FROM pv GROUP BY 1)
         |SELECT e2w.event_type, e2w.est AS est_2w, eall.est AS est_month,
         |  exact_2w, exact_month
         |FROM e2w JOIN eall USING (event_type)
         |JOIN x USING (event_type)
         |ORDER BY event_type""".stripMargin)),

    // Count-Min frequency sketch: the corpus term-frequency stream folded
    // into 4×1024 integer counters (4 KB regardless of vocabulary size,
    // cells merge by sum); point estimates = min over the 4 rows — an
    // OVERestimate by construction (collisions only add), emitted beside
    // exact counts with the nonneg overcount. One unseen probe term
    // exercises the empty-cell path. Completes the sketch trio:
    // cardinality (HLL), set overlap (KMV), frequency (CM).
    Q("sk4_countmin_heavy",
      (s, d) => {
        // NOT checkpointed (r15 opt adjudication): materializing the
        // postings for the three consumers measured 1.76 → 1.94 s — the
        // exploded table is wide relative to the reused tokenize shuffle,
        // the d19-docs lesson again
        val post = graft.operators.Ir.postings(
          Tables.documents(s, d), "doc_id", "text")
        val reg = Sketches.cmRegister(post, "term", "tf")
        import s.implicits._
        val cand = post.select("term").distinct()
          .unionByName(Seq("zzz_unseen").toDF("term"))
        val est = Sketches.cmEstimate(reg, cand, "term")
        val exact = post.groupBy("term").agg(sum("tf").as("exact"))
        est.join(exact, Seq("term"), "left")
          .withColumn("exact", coalesce(col("exact"), lit(0L)))
          .withColumn("overcount", col("est") - col("exact"))
          .select("term", "est", "exact", "overcount")
          .orderBy("term")
      },
      Some(s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS tl
         |              FROM documents),
         |items AS (SELECT doc_id, t AS term, COUNT(*) AS tf
         |          FROM (SELECT doc_id, unnest(tl) AS t FROM docs)
         |          WHERE t <> '' GROUP BY 1, 2),
         |cells AS (SELECT i AS r,
         |            ${dMd5Long("concat(i, ':', term)")} % 1024 AS bucket,
         |            SUM(tf) AS cnt
         |          FROM items CROSS JOIN (SELECT unnest(range(0, 4)) AS i)
         |          GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT term FROM items
         |         UNION ALL SELECT 'zzz_unseen'),
         |probes AS (SELECT term, i AS r,
         |             ${dMd5Long("concat(i, ':', term)")} % 1024 AS bucket
         |           FROM cand CROSS JOIN (SELECT unnest(range(0, 4)) AS i)),
         |est AS (SELECT term, MIN(COALESCE(cnt, 0)) AS est
         |        FROM probes LEFT JOIN cells USING (r, bucket) GROUP BY 1),
         |exact AS (SELECT term, SUM(tf) AS exact FROM items GROUP BY 1)
         |SELECT e.term, CAST(est AS BIGINT) AS est,
         |  CAST(COALESCE(x.exact, 0) AS BIGINT) AS exact,
         |  CAST(est - COALESCE(x.exact, 0) AS BIGINT) AS overcount
         |FROM est e LEFT JOIN exact x USING (term)
         |ORDER BY e.term""".stripMargin)),

    // Dyadic range-sum register: the segment-tree-as-a-table — one count
    // per (group, level, value>>level) cell over a 16-bit fixed-point
    // domain (floor(value·128): a power-of-two multiply is exponent
    // arithmetic, bit-identical on both engines). EXACT and mergeable by
    // cell SUM with per-group size bounded by the value DOMAIN, never the
    // row count; any [a,b] count is answered from ≤ 2·16 cells (the
    // canonical cover, a planning-time constant — the register is
    // FILTERED on those keys, never scanned). The query emits the
    // register-derived range count NEXT TO the direct-scan count: equal
    // by construction, demonstrated in the result. Median comes from the
    // level-0 cells via the histogram cumwalk (ts2's shape) — same
    // register, no second pass over the data.
    Q("sk5_dyadic_rangesum",
      (s, d) => {
        val (a, b) = (12800L, 31999L) // values in [100.0, 250.0)
        val fx = Tables.events(s, d)
          .select(col("event_type"),
            least(greatest(floor(col("value") * lit(128)).cast("long"),
              lit(0L)), lit(65535L)).as("v")) // domain clamp (register contract)
        val reg = Sketches.dyadicRegister(fx, Seq("event_type"), "v")
        val root = reg.filter(col("key") === Sketches.dyadicKey(16, 0L))
          .select(col("event_type"), col("cnt").as("n_total"))
        val wCum = Window.partitionBy("event_type").orderBy("key")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        val med = reg.filter(col("key") < 131072L)
          .withColumn("__cum", sum("cnt").over(wCum))
          .withColumn("__n", sum("cnt").over(wAll))
          .groupBy("event_type")
          .agg(min(when(col("__cum") >= expr("(__n + 1) div 2"), col("key")))
            .as("med_fp128"))
        val range = Sketches.dyadicRangeCount(reg, Seq("event_type"), a, b)
        val exact = fx.filter(col("v").between(a, b))
          .groupBy("event_type").agg(count(lit(1)).as("n_exact_range"))
        root.join(med, "event_type")
          .join(range, Seq("event_type"), "left")
          .join(exact, Seq("event_type"), "left")
          .withColumn("range_cnt", coalesce(col("range_cnt"), lit(0L)))
          .withColumn("n_exact_range", coalesce(col("n_exact_range"), lit(0L)))
          .select("event_type", "n_total", "med_fp128", "range_cnt",
            "n_exact_range")
          .orderBy("event_type")
      },
      Some {
        val keys = Sketches.dyadicCover(12800L, 31999L)
          .map { case (l, bk) => Sketches.dyadicKey(l, bk) }
          .mkString(", ")
        s"""${QH.evCte},
           |fx AS (SELECT event_type,
           |         LEAST(GREATEST(CAST(FLOOR(value * 128) AS BIGINT), 0), 65535) AS v FROM ev),
           |reg AS (SELECT event_type, l * 131072 + (v >> CAST(l AS INT)) AS key,
           |          COUNT(*) AS cnt
           |        FROM fx CROSS JOIN (SELECT unnest(range(0, 17)) AS l)
           |        GROUP BY 1, 2),
           |root AS (SELECT event_type, cnt AS n_total FROM reg
           |         WHERE key = 2097152),
           |lvl0 AS (SELECT event_type, key,
           |           SUM(cnt) OVER (PARTITION BY event_type ORDER BY key) AS cum,
           |           SUM(cnt) OVER (PARTITION BY event_type) AS n
           |         FROM reg WHERE key < 131072),
           |med AS (SELECT event_type,
           |          MIN(CASE WHEN cum >= (n + 1) // 2 THEN key END) AS med_fp128
           |        FROM lvl0 GROUP BY 1),
           |rng AS (SELECT event_type, SUM(cnt) AS range_cnt FROM reg
           |        WHERE key IN ($keys) GROUP BY 1),
           |exact AS (SELECT event_type, COUNT(*) AS n_exact_range FROM fx
           |          WHERE v BETWEEN 12800 AND 31999 GROUP BY 1)
           |SELECT r.event_type, r.n_total, m.med_fp128,
           |  CAST(COALESCE(g.range_cnt, 0) AS BIGINT) AS range_cnt,
           |  CAST(COALESCE(x.n_exact_range, 0) AS BIGINT) AS n_exact_range
           |FROM root r JOIN med m USING (event_type)
           |LEFT JOIN rng g USING (event_type)
           |LEFT JOIN exact x USING (event_type)
           |ORDER BY r.event_type""".stripMargin
      }),

    // Exact quantiles from MERGED dyadic registers — the rank-select the
    // persisted-register premise exists for: per-source registers (the
    // daily/shard artifacts) merge by cell SUM, then any quantile is a
    // segment-tree DESCENT reading 16 cells per (group, rank) — raw data
    // is never re-touched, and unlike sk5's level-0 cumwalk the cost is
    // independent of domain width. Ranks are pure-integer ceil(q·n) from
    // the register's own root count. The exact leg (per-group sort rank)
    // rides beside: equal by construction — the register is exact — and
    // it is what the merged-register path replaces at scale. The merged
    // register is a memoized setup artifact (the ir2/s3b persisted-index
    // pattern — StreamingChunkIndex's dyadic sibling maintains exactly
    // this store at ingest), so the timed number is the advertised
    // register-query work, not the ingest-time build.
    Q("sk6_dyadic_quantiles",
      (s, d) => {
        val fx = sk6Fx(s, d)
        val reg = sk6Register(s, d)
        val ranks = reg.filter(col("key") === Sketches.dyadicKey(16, 0L))
          .select(col("event_type"), col("cnt").as("n_total"))
          .select(col("event_type"), col("n_total"),
            expr("stack(3, 'p50', (1 * n_total + 1) div 2, " +
              "'p90', (9 * n_total + 9) div 10, " +
              "'p99', (99 * n_total + 99) div 100) AS (q, k)"))
        val sel = Sketches.dyadicRankSelect(reg, Seq("event_type"), ranks, "k")
          .withColumnRenamed("value", "v_reg")
        val exact = fx
          .withColumn("rn", row_number().over(
            Window.partitionBy("event_type").orderBy("v")))
          .select(col("event_type"), col("rn"), col("v").as("v_exact"))
        sel.join(exact, sel("event_type") === exact("event_type") &&
            sel("k") === exact("rn"))
          .select(sel("event_type"), col("q"), col("k"), col("n_total"),
            col("v_reg"), col("v_exact"))
          .orderBy("event_type", "q")
      },
      Some(
        s"""${QH.evCte},
           |fx AS (SELECT event_type,
           |         LEAST(GREATEST(CAST(FLOOR(value * 128) AS BIGINT), 0), 65535) AS v FROM ev),
           |n AS (SELECT event_type, COUNT(*) AS n_total FROM fx GROUP BY 1),
           |qs AS (SELECT * FROM (VALUES ('p50', 1, 2), ('p90', 9, 10),
           |         ('p99', 99, 100)) t(q, num, den)),
           |rk AS (SELECT event_type, q,
           |         (num * n_total + den - 1) // den AS k, n_total
           |       FROM n CROSS JOIN qs),
           |ord AS (SELECT event_type, v,
           |          row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
           |        FROM fx)
           |SELECT r.event_type, r.q, CAST(r.k AS BIGINT) AS k,
           |  CAST(r.n_total AS BIGINT) AS n_total,
           |  CAST(o.v AS BIGINT) AS v_reg, CAST(o.v AS BIGINT) AS v_exact
           |FROM rk r JOIN ord o ON r.event_type = o.event_type AND r.k = o.rn
           |ORDER BY r.event_type, r.q""".stripMargin),
      setup = Some((s, d) => { sk6Register(s, d); () })),

    // Sliding-window distinct actives from day-cell registers: rolling
    // 7-day distinct-user counts are THE case where sketches beat exact —
    // exact sliding distinct re-shuffles every (window, user) pair (the
    // 7x-fanout exact leg below, shrunk by deduping (type, day, user)
    // first), while the sketch merges 7 tiny day registers per window
    // (max-merge, 256 cells each) and never touches raw data again. The
    // day grid is calendar-bounded, so the register range join stays
    // small at ANY corpus scale. Estimates per (type, window) beside the
    // exact leg, integer-exact estimator throughout.
    Q("sk7_hll_sliding_actives",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts_us_long div 86400000000").as("day"),
            col("user_id").cast("string").as("__v"))
        val reg = Sketches.hllRegisterBy(ev, Seq("event_type", "day"), "__v")
        val days = ev.select(col("day").as("gday")).distinct()
        val winReg = days
          .join(reg, col("day").between(col("gday") - 6, col("gday")))
          .groupBy("event_type", "gday", "bucket").agg(max("mj").as("mj"))
        val est = Sketches.hllEstimateBy(winReg, Seq("event_type", "gday"))
          .select(col("event_type"), col("gday"), col("est"))
        val exact = days
          .join(ev.dropDuplicates("event_type", "day", "__v"),
            col("day").between(col("gday") - 6, col("gday")))
          .groupBy("event_type", "gday")
          .agg(countDistinct("__v").as("n_exact"))
        est.join(exact, Seq("event_type", "gday"))
          .withColumn("err_ppm",
            expr("abs(est - n_exact) * 1000000L div n_exact"))
          .select(col("event_type"), col("gday").as("day"), col("est"),
            col("n_exact"), col("err_ppm"))
          .orderBy("event_type", "day")
      },
      Some(s"""${QH.evCte},
         |vals AS (SELECT event_type, ts_us_long // 86400000000 AS day,
         |           CAST(user_id AS VARCHAR) AS v FROM ev),
         |dv AS (SELECT DISTINCT event_type, day, v FROM vals),
         |h AS (SELECT event_type, day, ${dMd5Long("v")} AS h FROM dv),
         |rb AS (SELECT event_type, day, h % 256 AS bucket, h // 256 AS rem
         |       FROM h),
         |rr AS (SELECT event_type, day, bucket,
         |         CASE WHEN rem = 0 THEN 53 ELSE 53 - length(bin(rem)) END
         |           AS rho
         |       FROM rb),
         |reg AS (SELECT event_type, day, bucket, MAX(rho) AS mj
         |        FROM rr GROUP BY 1, 2, 3),
         |grid AS (SELECT DISTINCT day AS gday FROM vals),
         |win AS (SELECT event_type, gday, bucket, MAX(mj) AS mj
         |        FROM grid JOIN reg ON reg.day BETWEEN gday - 6 AND gday
         |        GROUP BY 1, 2, 3),
         |z AS (SELECT event_type, gday,
         |        SUM((1::BIGINT << (53 - mj))::HUGEINT)
         |          + (256 - COUNT(*))::HUGEINT * (1::BIGINT << 53) AS zz
         |      FROM win GROUP BY 1, 2),
         |est AS (SELECT event_type, gday,
         |          CAST((718272::HUGEINT * 65536 * (1::BIGINT << 53))
         |               // (zz * 1000000) AS BIGINT) AS est
         |        FROM z),
         |exact AS (SELECT event_type, gday, COUNT(DISTINCT v) AS n_exact
         |          FROM grid JOIN dv ON dv.day BETWEEN gday - 6 AND gday
         |          GROUP BY 1, 2)
         |SELECT e.event_type, e.gday AS day, est, n_exact,
         |  abs(est - n_exact) * 1000000 // n_exact AS err_ppm
         |FROM est e JOIN exact USING (event_type, gday)
         |ORDER BY event_type, day""".stripMargin)))
}
