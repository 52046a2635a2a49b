package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Checks, Fuzzy, Relational, TextOps, ZOrder}

/** Session-11 analytics additions: time-series gap-fill with forward
  * fill, sequential funnel stages, the deletion-neighborhood fuzzy JOIN
  * (the join form of F20's scalar levenshtein), and tokenizer-prep
  * vocabulary/OOV accounting. All outputs integer/string — the
  * float-parity invariant. */
object AnalyticsQueries {

  /** Deterministic in-day ordering key: zero-padded (ts, event_id) —
    * lexicographic == numeric (the pack2 idiom). */
  private val ordKeySpark = "format_string('%020d%012d', ts_us_long, event_id)"
  private val ordKeyDuck = "printf('%020d%012d', ts_us_long, event_id)"

  private val vocabV = 20

  /** mb1/mb2's shared frequent-pair artifact: support-pruned (minSup 3)
    * within-basket pair counts + item supports over the distinct
    * (order, part) stream — built IDENTICALLY by both queries, so it is
    * one memoized localCheckpoint (the corpusNearDupPairs pattern) warmed
    * by both queries' setup; nOrders rides along (the one sanctioned
    * driver-side scalar). Correct without setup — Verify builds on
    * demand. */
  private val mbCache = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.sql.DataFrame, Long)]
  private[queries] def basketPairs(s: org.apache.spark.sql.SparkSession,
                                   d: String)
      : (org.apache.spark.sql.DataFrame, Long) =
    QH.sessionMemo(mbCache, d, s)(_._1) {
      val minSup = 3L
      val items = Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey").distinct()
        .localCheckpoint(true)
      val nOrders = items.select("l_orderkey").distinct().count()
      val freq = items
        .join(items.groupBy("l_partkey").agg(count(lit(1)).as("item_sup"))
          .filter(col("item_sup") >= minSup), "l_partkey")
      val a = freq.select(col("l_orderkey"), col("l_partkey").as("p1"),
        col("item_sup").as("sup1"))
      val b = freq.select(col("l_orderkey"), col("l_partkey").as("p2"),
        col("item_sup").as("sup2"))
      val pairs = a.join(b, "l_orderkey").filter(col("p1") < col("p2"))
        .groupBy("p1", "p2")
        .agg(count(lit(1)).as("pair_cnt"),
          max("sup1").as("sup1"), max("sup2").as("sup2"))
        .filter(col("pair_cnt") >= minSup)
        .localCheckpoint(true)
      // pairs is materialized; the intermediate basket checkpoint is done
      org.apache.spark.sql.graft.Bridge.freeCheckpoint(items)
      (pairs, nOrders)
    }

  /** WITH-body CTEs replaying `Bpe.merges` over the documents lowercase
    * word vocabulary: v0 (vocab), and per round r: p_r (pair counts),
    * b_r (argmax merge), v_r (merged vocab). Shared by the t17 and t18
    * oracles (validated against a scalar reference — see BpeSpec for the
    * Spark side of the same conventions). */
  private def dBpeCtes(rounds: Int): String = {
    val v0 =
      """v0 AS MATERIALIZED (
        |  SELECT w AS s, CAST(COUNT(*) AS BIGINT) AS f FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      val sym = ('A' + r - 1).toChar
      s"""p$r AS MATERIALIZED (SELECT substr(s, i, 2) AS p, SUM(f) AS cnt FROM (
         |  SELECT s, f, unnest(range(1, length(s))) AS i FROM v${r - 1}) GROUP BY 1),
         |b$r AS MATERIALIZED (SELECT p, cnt FROM p$r ORDER BY cnt DESC, p LIMIT 1),
         |v$r AS MATERIALIZED (SELECT replace(s, (SELECT p FROM b$r), '$sym') AS s, f
         |  FROM v${r - 1})""".stripMargin
    }
    s"$v0,\n${roundCtes.mkString(",\n")}"
  }

  /** Unrolled-rounds DuckDB twin of `Bpe.merges` (t17's oracle). */
  private def dBpeOracle(rounds: Int): String = {
    val sel = (1 to rounds).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, p AS pair, CAST(cnt AS BIGINT) AS cnt, " +
        s"'${('A' + r - 1).toChar}' AS sym FROM b$r"
    }.mkString("\nUNION ALL ")
    s"WITH ${dBpeCtes(rounds)}\n$sel\nORDER BY round"
  }

  /** Nested-replace application of the learned merges to a word `w`
    * (each b_r's pair via scalar subquery — DuckDB replays the merges it
    * derived itself, no literals pass between engines). */
  private def dBpeApply(w: String, rounds: Int): String =
    (1 to rounds).foldLeft(w) { (acc, r) =>
      s"replace($acc, (SELECT p FROM b$r), '${('A' + r - 1).toChar}')"
    }

  // ---- production-scale batched BPE (t17b/t18b) --------------------------

  /** Rounds unrolled in the batched-trainer oracle. 48 rounds at batch 16
    * yields 300+ merges on the sf0.01/sf0.1 corpora (the conflict filter
    * under-fills rounds, measured fill ~6-10), comfortably past the 256-
    * merge bar while keeping the oracle's CTE unroll budget at R, not at
    * the merge count. */
  private val bpeRounds = 48

  /** Batched-BPE CTEs replaying `Bpe.trainBatched` over the bounded
    * hash-ranked document sample — v0 (sample vocab), then per round r:
    * p_r (overlap-counted pair sums), c_r (top-CandK candidates by
    * (cnt DESC, pair ASC)), b_r (survivors of the symbol-disjoint conflict
    * filter, first BatchM, with their deterministic chr(SymBase + (r-1)·M
    * + rk - 1) symbols), v_r (the batch applied in rank order via a
    * list_reduce of replace over 3-char pair||sym codes — the exact fold
    * `BpeEncode`'s table replays). Every convention mirrors the Scala
    * trainer; nothing corpus-derived passes between engines as a literal. */
  private def dBpeBatchCtes(rounds: Int): String = {
    import graft.operators.Bpe.{BatchM, CandK, SampleCap, SymBase}
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT text AS s, CAST(COUNT(*) AS BIGINT) AS f FROM (
         |    SELECT text FROM documents WHERE length(text) > 0
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $SampleCap)
         |  GROUP BY text)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT substr(s, i, 2) AS p, SUM(f) AS cnt FROM (
         |  SELECT s, f, unnest(range(1, length(s))) AS i FROM v${r - 1}) GROUP BY 1),
         |c$r AS MATERIALIZED (SELECT p, cnt, row_number() OVER (ORDER BY cnt DESC, p) AS rk0
         |  FROM p$r QUALIFY rk0 <= $CandK),
         |b$r AS MATERIALIZED (
         |  SELECT p, cnt, row_number() OVER (ORDER BY rk0) AS rk,
         |         chr($SymBase + ($r - 1) * $BatchM
         |             + CAST(row_number() OVER (ORDER BY rk0) AS INT) - 1) AS sym
         |  FROM c$r x
         |  WHERE NOT EXISTS (SELECT 1 FROM c$r y WHERE y.rk0 < x.rk0 AND (
         |    substr(y.p,1,1) IN (substr(x.p,1,1), substr(x.p,2,1)) OR
         |    substr(y.p,2,1) IN (substr(x.p,1,1), substr(x.p,2,1))))
         |  QUALIFY rk <= $BatchM),
         |v$r AS MATERIALIZED (SELECT list_reduce(list_prepend(s,
         |    coalesce((SELECT list(p || sym ORDER BY rk) FROM b$r), [])),
         |    (acc, mm) -> replace(acc, substr(mm,1,2), substr(mm,3,1))) AS s, f
         |  FROM v${r - 1})""".stripMargin
    }
    s"$v0,\n${roundCtes.mkString(",\n")}"
  }

  /** Per-sf-dir memo of the (deterministic, plain-data) trained merge list:
    * no Spark lineage is cached, so no session-liveness check is needed. */
  private val bpeBatchMemo =
    scala.collection.concurrent.TrieMap.empty[String, Vector[graft.operators.Bpe.Merge]]

  private def bpeBatchTrain(s: SparkSession, d: String): Vector[graft.operators.Bpe.Merge] = {
    val vocab = graft.operators.Bpe.sampleVocab(
      Tables.documents(s, d), "text", "doc_id")
    val merges = graft.operators.Bpe.trainBatched(vocab, bpeRounds)
    bpeBatchMemo(d) = merges
    merges
  }

  val all: Seq[Q] = Seq(

    // Time-series gap-fill: per (user, day) activity regularized onto each
    // user's full [min_day, max_day] grid — gap days materialized with
    // n_events = 0, the last active day's dominant event type forward-
    // filled, and an exact days-since-activity counter. Day = pure
    // epoch-micro integer division (no date formatting); the grid explode
    // is per-user (sequence over a bounded span), everything else is one
    // (user, day) aggregation + one per-user window.
    Q("ts1_gapfill_ffill",
      (s, d) => {
        val daily = Tables.events(s, d)
          .withColumn("day", expr("ts_us_long div 86400000000"))
          .groupBy("user_id", "day")
          .agg(count(lit(1)).as("n_events"),
            max_by(col("event_type"), expr(ordKeySpark)).as("day_type"))
        val grid = daily.groupBy("user_id")
          .agg(min("day").as("__mind"), max("day").as("__maxd"))
          .select(col("user_id"),
            explode(expr("sequence(__mind, __maxd)")).as("day"))
        val w = Window.partitionBy("user_id").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(daily, Seq("user_id", "day"), "left")
          .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
          .withColumn("last_type", last(col("day_type"), ignoreNulls = true).over(w))
          .withColumn("days_since",
            col("day") - last(when(col("n_events") > 0, col("day")),
              ignoreNulls = true).over(w))
          .select("user_id", "day", "n_events", "last_type", "days_since")
          .orderBy("user_id", "day")
      },
      Some(s"""${QH.evCte},
         |daily AS (SELECT user_id, ts_us_long // 86400000000 AS day,
         |            COUNT(*) AS n_events,
         |            arg_max(event_type, $ordKeyDuck) AS day_type
         |          FROM ev GROUP BY 1, 2),
         |grid AS (SELECT user_id, unnest(range(mind, maxd + 1)) AS day
         |         FROM (SELECT user_id, MIN(day) AS mind, MAX(day) AS maxd
         |               FROM daily GROUP BY 1)),
         |j AS (SELECT g.user_id, g.day,
         |        COALESCE(d.n_events, 0) AS n_events, d.day_type
         |      FROM grid g LEFT JOIN daily d
         |        ON d.user_id = g.user_id AND d.day = g.day)
         |SELECT user_id, day, CAST(n_events AS BIGINT) AS n_events,
         |  last_value(day_type IGNORE NULLS) OVER w AS last_type,
         |  day - last_value(CASE WHEN n_events > 0 THEN day END IGNORE NULLS)
         |          OVER w AS days_since
         |FROM j
         |WINDOW w AS (PARTITION BY user_id ORDER BY day
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, day""".stripMargin)),

    // Sequential funnel view -> click -> purchase: each user's first view,
    // first click strictly after it, first purchase strictly after that —
    // stage timestamps in exact epoch micros plus the reached-stage count.
    // Two passes over the (tiny) per-user event set expressed as
    // conditional mins: stage k+1 = min ts of the next type past stage k.
    Q("fn1_funnel_stages",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us_long"))
        val t0 = ev.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts_us_long").as("t_view"))
        val t1 = ev.join(t0, "user_id")
          .filter(col("event_type") === "click" && col("ts_us_long") > col("t_view"))
          .groupBy("user_id").agg(min("ts_us_long").as("t_click"))
        val t2 = ev.join(t1, "user_id")
          .filter(col("event_type") === "purchase" && col("ts_us_long") > col("t_click"))
          .groupBy("user_id").agg(min("ts_us_long").as("t_purchase"))
        t0.join(t1, Seq("user_id"), "left").join(t2, Seq("user_id"), "left")
          .withColumn("stage_reached",
            lit(1L) + when(col("t_click").isNotNull, 1L).otherwise(0L)
              + when(col("t_purchase").isNotNull, 1L).otherwise(0L))
          .select("user_id", "t_view", "t_click", "t_purchase", "stage_reached")
          .orderBy("user_id")
      },
      Some(s"""${QH.evCte},
         |t0 AS (SELECT user_id, MIN(ts_us_long) AS t_view FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |t1 AS (SELECT ev.user_id, MIN(ts_us_long) AS t_click
         |       FROM ev JOIN t0 ON t0.user_id = ev.user_id
         |       WHERE event_type = 'click' AND ts_us_long > t0.t_view
         |       GROUP BY 1),
         |t2 AS (SELECT ev.user_id, MIN(ts_us_long) AS t_purchase
         |       FROM ev JOIN t1 ON t1.user_id = ev.user_id
         |       WHERE event_type = 'purchase' AND ts_us_long > t1.t_click
         |       GROUP BY 1)
         |SELECT t0.user_id, t_view, t_click, t_purchase,
         |  CAST(1 + (CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
         |    + (CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS stage_reached
         |FROM t0
         |LEFT JOIN t1 ON t1.user_id = t0.user_id
         |LEFT JOIN t2 ON t2.user_id = t0.user_id
         |ORDER BY t0.user_id""".stripMargin)),

    // Deletion-neighborhood fuzzy JOIN (operators/Fuzzy.scala): probes =
    // every 7th part name with one md5-chosen NON-FIRST character deleted;
    // candidates from an equi-join on the reference side's 1-deletion
    // variants (never all-pairs), verified levenshtein == 1. A probe may
    // legitimately match several parts.
    Q("fz1_fuzzy_deletion_join",
      (s, d) => {
        val parts = Tables.part(s, d).select("p_partkey", "p_name")
        val probes = parts.filter(col("p_partkey") % 7 === 0)
          .withColumn("__h", expr(TextOps.md5LongSql("cast(p_partkey as string)")))
          .withColumn("__pos", col("__h") % (length(col("p_name")) - 1) + 2)
          .select(col("p_partkey").as("probe_key"),
            expr("concat(substring(p_name, 1, __pos - 1)," +
              " substring(p_name, __pos + 1, length(p_name)))").as("probe_name"))
        Fuzzy.deletionJoin(probes, "probe_key", "probe_name",
            parts, "p_partkey", "p_name")
          .select(col("probe_key"), col("p_partkey").as("match_key"), col("lev"))
          .orderBy("probe_key", "match_key")
      },
      Some(s"""WITH probes AS (
         |  SELECT p_partkey AS probe_key,
         |    substr(p_name, 1, pos - 1) || substr(p_name, pos + 1, length(p_name))
         |      AS probe_name
         |  FROM (SELECT p_partkey, p_name,
         |          (('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 15))::BIGINT)
         |            % (length(p_name) - 1) + 2 AS pos
         |        FROM part WHERE p_partkey % 7 = 0)),
         |vars AS (
         |  SELECT p_partkey, p_name,
         |    substr(p_name, 1, p - 1) || substr(p_name, p + 1, length(p_name)) AS variant
         |  FROM (SELECT p_partkey, p_name, unnest(range(1, length(p_name) + 1)) AS p
         |        FROM part)),
         |cand AS (SELECT DISTINCT probe_key, p_partkey AS match_key,
         |           levenshtein(probe_name, p_name) AS lev
         |         FROM probes JOIN vars ON probe_name = variant)
         |SELECT probe_key, match_key, CAST(lev AS BIGINT) AS lev
         |FROM cand WHERE lev = 1
         |ORDER BY probe_key, match_key""".stripMargin)),

    // Tokenizer-prep vocabulary accounting: top-V corpus vocabulary by
    // total tf (deterministic term tiebreak), per-doc OOV token count and
    // ppm rate — the coverage check run before committing to a vocab size.
    Q("t16_vocab_oov",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
          .filter(col("term") =!= "")
        val w = Window.orderBy(col("__tf").desc, col("term"))
        val vocab = toks.groupBy("term").agg(count(lit(1)).as("__tf"))
          .withColumn("__r", row_number().over(w)).filter(col("__r") <= vocabV)
          .select(col("term"), lit(1L).as("__inv"))
        toks.join(broadcast(vocab), Seq("term"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_toks"),
            sum(when(col("__inv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_ppm", expr("n_oov * 1000000L div n_toks"))
          .select("doc_id", "n_toks", "n_oov", "oov_ppm")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, t AS term
         |        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |              FROM documents)
         |        WHERE t <> ''),
         |vocab AS (SELECT term FROM (
         |            SELECT term, row_number() OVER (
         |              ORDER BY COUNT(*) DESC, term) AS r
         |            FROM toks GROUP BY term) WHERE r <= $vocabV),
         |agg AS (SELECT doc_id, COUNT(*) AS n_toks,
         |          SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
         |        FROM toks LEFT JOIN vocab v USING (term)
         |        GROUP BY doc_id)
         |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
         |  CAST(n_oov AS BIGINT) AS n_oov,
         |  CAST(n_oov * 1000000 // n_toks AS BIGINT) AS oov_ppm
         |FROM agg ORDER BY doc_id""".stripMargin)),

    // BPE merge induction (the tokenizer-vocabulary step after t16's
    // coverage check): 8 byte-pair merges learned from the lowercase word
    // vocabulary — every convention pinned replayable (single-char
    // symbols with a reserved 'A'-'Z' merge alphabet, overlapping
    // position counts, left-to-right non-overlapping replace, (count
    // DESC, pair ASC) argmax); the oracle unrolls all 8 rounds in
    // MATERIALIZED CTEs (the g4 idiom) and reproduces every merge
    // bit-for-bit. Rounds run over the distinct-word vocab, never the
    // corpus (one aggregation, checkpointed once).
    Q("t17_bpe_merges",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+\\z"))
          .groupBy("w").agg(count(lit(1)).as("f"))
        graft.operators.Bpe.merges(vocab, "w", "f", rounds = 8)
          .orderBy("round")
      },
      Some(dBpeOracle(8))),

    // Tokenizer APPLICATION (train + encode in one pipeline): apply t17's
    // 8 learned merges to every document's lowercase words and report the
    // token count under the learned vocab — with single-char symbols,
    // token count == length of the merged string, so the whole encode is
    // a literal-pair replace chain and the compression ratio is exact
    // integer ppm. The merges come off the driver as the 8-row argmax
    // (the sanctioned kcore-style collect); the encode itself is one
    // codegen'd per-word expression chain, no joins.
    Q("t18_bpe_tokenize",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+\\z"))
          .groupBy("w").agg(count(lit(1)).as("f"))
        val merges = graft.operators.Bpe.merges(vocab, "w", "f", rounds = 8)
          .orderBy("round").collect()
          .map(r => (r.getAs[String]("pair"), r.getAs[String]("sym")))
        val applied = merges.foldLeft("w") { case (acc, (p, sym)) =>
          s"replace($acc, '$p', '$sym')"
        }
        Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w").rlike("^[a-z]+\\z"))
          .withColumn("enc", expr(applied))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_words"),
            sum(length(col("w"))).as("n_chars"),
            sum(length(col("enc"))).as("n_bpe_tokens"))
          .withColumn("compression_ppm",
            expr("n_bpe_tokens * 1000000 div n_chars"))
          .select("doc_id", "n_words", "n_chars", "n_bpe_tokens",
            "compression_ppm")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${dBpeCtes(8)},
         |toks AS (SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE regexp_matches(w, '^[a-z]+$$')),
         |enc AS (SELECT doc_id, w, ${dBpeApply("w", 8)} AS e FROM toks)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(length(w)) AS BIGINT) AS n_chars,
         |  CAST(SUM(length(e)) AS BIGINT) AS n_bpe_tokens,
         |  CAST(SUM(length(e)) * 1000000 // SUM(length(w)) AS BIGINT)
         |    AS compression_ppm
         |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // PRODUCTION-SCALE BPE training (the r14 verdict's one weak component,
    // rebuilt): SentencePiece-shaped whole-sequence induction (space
    // in-alphabet, so merges grow into multi-word phrases instead of
    // capping at the 31-word testdata vocabulary), batched 16 merges per
    // round under a symbol-disjoint conflict filter, symbols drawn from
    // fresh BMP codepoints (no 26-symbol alphabet bound), and the whole
    // induction driver-local over a BOUNDED hash-ranked 4096-doc sample —
    // zero per-merge Spark jobs; the only corpus-wide passes are the
    // top-k sample selection here and the encode kernel in t18b. 48
    // rounds yield 300+ merges (>= the 256-merge bar) on every SF.
    Q("t17b_bpe_batched_merges",
      (s, d) => {
        val merges = bpeBatchTrain(s, d)
        import s.implicits._
        merges.map(m => (m.round.toLong, m.rk.toLong, m.pair, m.cnt, m.sym))
          .toDF("round", "rk", "pair", "cnt", "sym")
          .orderBy("round", "rk")
      },
      Some(s"""WITH ${dBpeBatchCtes(bpeRounds)}
         |${(1 to bpeRounds).map(r =>
            s"SELECT CAST($r AS BIGINT) AS round, CAST(rk AS BIGINT) AS rk, " +
              s"p AS pair, CAST(cnt AS BIGINT) AS cnt, sym FROM b$r")
            .mkString("\nUNION ALL ")}
         |ORDER BY round, rk""".stripMargin)),

    // BPE tokenization at production shape: the 300+ learned merges applied
    // by ONE data-driven native kernel (functions/BpeEncode — greedy
    // lowest-rank pair loop per row, merge table as a broadcast map
    // reference), never an unrolled replace chain; per-row cost is
    // independent of the merge count, so the encode is the same plan at 256
    // merges or 100k. The oracle re-derives the merges in the batched CTEs
    // and folds the SAME rank-ordered 3-char codes with list_reduce +
    // replace — sequential rank-order application, which the kernel's
    // greedy loop provably equals (BpeScaleSpec pins it, plus interpreted
    // == codegen). Output stays pure-integer (lengths and a div ppm).
    Q("t18b_bpe_encode_kernel",
      (s, d) => {
        val merges = bpeBatchMemo.getOrElse(d, bpeBatchTrain(s, d))
        Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"),
            length(col("text")).cast("long").as("n_chars"),
            length(graft.functions.BpeEncode.encode(col("text"), merges))
              .cast("long").as("n_bpe_tokens"))
          .withColumn("compression_ppm",
            expr("n_bpe_tokens * 1000000 div n_chars"))
          .select("doc_id", "n_chars", "n_bpe_tokens", "compression_ppm")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${dBpeBatchCtes(bpeRounds)},
         |ml AS MATERIALIZED (SELECT list(p || sym ORDER BY round, rk) AS l FROM (
         |  ${(1 to bpeRounds).map(r => s"SELECT $r AS round, rk, p, sym FROM b$r")
              .mkString(" UNION ALL ")}))
         |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
         |  CAST(length(v.s) AS BIGINT) AS n_bpe_tokens,
         |  CAST(length(v.s) * 1000000 // length(d.text) AS BIGINT) AS compression_ppm
         |FROM documents d JOIN (
         |  SELECT orig, list_reduce(list_prepend(orig, (SELECT l FROM ml)),
         |    (acc, mm) -> replace(acc, substr(mm,1,2), substr(mm,3,1))) AS s
         |  FROM (SELECT DISTINCT text AS orig FROM documents
         |        WHERE length(text) > 0)) v
         |ON v.orig = d.text
         |ORDER BY d.doc_id""".stripMargin),
      setup = Some((s, d) => { bpeBatchMemo.getOrElse(d, bpeBatchTrain(s, d)); () })),

    // Nucleus (top-p) corpus cut per source — the data-mixing selection
    // between samp2's exact quotas and w5's top-k: within each source,
    // rank docs by (n_chars DESC, doc_id) and keep the SMALLEST prefix
    // whose cumulative mass reaches 60% of the source's chars (keep while
    // mass-before-this-doc < 0.6·total — the standard nucleus rule, so
    // the boundary doc is included). Pure integer comparisons; the
    // window is per-source partition-parallel.
    Q("samp5_nucleus_cut",
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("source")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("cum", sum("n_chars").over(w))
          .withColumn("total", sum("n_chars").over(wAll))
          .withColumn("kept",
            when((col("cum") - col("n_chars")) * lit(1000000L) <
              lit(600000L) * col("total"), 1L).otherwise(0L))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            sum("kept").as("n_kept"),
            max("total").as("chars_total"),
            sum(when(col("kept") === 1L, col("n_chars")).otherwise(0L))
              .as("chars_kept"))
          .withColumn("kept_ppm", expr("chars_kept * 1000000 div chars_total"))
          .select("source", "n_total", "n_kept", "chars_total", "chars_kept",
            "kept_ppm")
          .orderBy("source")
      },
      Some("""WITH r AS (
         |  SELECT doc_id, source, n_chars,
         |    SUM(n_chars) OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    SUM(n_chars) OVER (PARTITION BY source) AS total
         |  FROM documents),
         |k AS (SELECT *, CASE WHEN (cum - n_chars) * 1000000 < 600000 * total
         |        THEN 1 ELSE 0 END AS kept FROM r)
         |SELECT source, COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept,
         |  CAST(MAX(total) AS BIGINT) AS chars_total,
         |  CAST(SUM(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         |    AS chars_kept,
         |  CAST(SUM(CASE WHEN kept = 1 THEN n_chars ELSE 0 END) * 1000000
         |    // MAX(total) AS BIGINT) AS kept_ppm
         |FROM k GROUP BY source ORDER BY source""".stripMargin)),

    // CUSUM drift detection on the zero-filled daily count series — the
    // SEQUENTIAL recurrence s_t = max(0, s_{t-1} + dev_t) has the
    // window-expressible closed form s_t = P_t − min_{j<=t} P_j (P =
    // prefix sum of deviations), so the whole detector is two running
    // extrema over the calendar-bounded grid, no iteration. Deviations
    // are scaled integer (n·c_t − total: mean subtraction without
    // division); the demo threshold (cusum·10 > total — a tenth of the
    // corpus's cumulative mass) is a pinned constant, production
    // calibrates to ts2's MAD. Both drift directions emitted.
    Q("ts6_cusum_drift",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("ts_us_long div 86400000000").as("day"))
        val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        val grid = bounds.select(explode(expr("sequence(d0, d1)")).as("day"))
        val cnt = grid.join(
            ev.groupBy("day").agg(count(lit(1)).as("c0")), Seq("day"), "left")
          .select(col("day"), coalesce(col("c0"), lit(0L)).as("c"))
        val wAll = Window.partitionBy(lit(1))
        val wCum = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cnt
          .withColumn("n", count(lit(1)).over(wAll))
          .withColumn("tot", sum("c").over(wAll))
          .withColumn("pre", sum(col("n") * col("c") - col("tot")).over(wCum))
          .withColumn("cusum_pos", col("pre") - min("pre").over(wCum))
          .withColumn("cusum_neg", max("pre").over(wCum) - col("pre"))
          .withColumn("drift_pos",
            when(col("cusum_pos") * 10L > col("tot"), 1L).otherwise(0L))
          .withColumn("drift_neg",
            when(col("cusum_neg") * 10L > col("tot"), 1L).otherwise(0L))
          .select("day", "c", "cusum_pos", "cusum_neg", "drift_pos",
            "drift_neg")
          .orderBy("day")
      },
      Some(s"""${QH.evCte},
         |ed AS (SELECT ts_us_long // 86400000000 AS day FROM ev),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ed),
         |grid AS (SELECT unnest(range((SELECT d0 FROM bounds),
         |           (SELECT d1 FROM bounds) + 1)) AS day),
         |cnt AS (SELECT g.day, COUNT(e.day) AS c
         |        FROM grid g LEFT JOIN ed e ON g.day = e.day GROUP BY 1),
         |st AS (SELECT COUNT(*) AS n, SUM(c) AS tot FROM cnt),
         |p AS (SELECT day, c,
         |        SUM((SELECT n FROM st) * c - (SELECT tot FROM st))
         |          OVER (ORDER BY day
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
         |      FROM cnt),
         |cu AS (SELECT day, c, pre,
         |        pre - MIN(pre) OVER (ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum_pos,
         |        MAX(pre) OVER (ORDER BY day
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - pre AS cusum_neg
         |      FROM p)
         |SELECT day, CAST(c AS BIGINT) AS c,
         |  CAST(cusum_pos AS BIGINT) AS cusum_pos,
         |  CAST(cusum_neg AS BIGINT) AS cusum_neg,
         |  CAST(CASE WHEN cusum_pos * 10 > (SELECT tot FROM st)
         |    THEN 1 ELSE 0 END AS BIGINT) AS drift_pos,
         |  CAST(CASE WHEN cusum_neg * 10 > (SELECT tot FROM st)
         |    THEN 1 ELSE 0 END AS BIGINT) AS drift_neg
         |FROM cu ORDER BY day""".stripMargin)),

    // Referential-integrity audit across the star schema: per FK
    // relation, row count, distinct FK values, orphan rows (left-anti
    // against the parent key) and orphaned distinct values — the
    // contract check (dq1's sibling) a warehouse runs after every load.
    // Each relation is one left-anti-shaped aggregate join; the report
    // frame is the 5-row relation domain.
    Q("dq4_referential_integrity",
      (s, d) => {
        def audit(rel: String, child: org.apache.spark.sql.DataFrame,
                  fk: String, parent: org.apache.spark.sql.DataFrame,
                  pk: String) = {
          // pre-agg the child on the FK first: ONE map-side-combined
          // shuffle into distinct-key space, the parent join then carries
          // distinct keys only, and the audit agg needs no distinct
          // (each group IS a distinct fk) — the naive row-level join +
          // two countDistinct legs shuffles every child row TWICE (Expand)
          val p = parent.select(col(pk).as("__pk")).distinct()
          child.groupBy(col(fk).as("__fk")).agg(count(lit(1)).as("__c"))
            .join(p, col("__fk") === col("__pk"), "left")
            // a NULL fk forms its own group: counted in n_rows and
            // n_orphan_rows (it matches nothing) but never as a distinct
            // VALUE — exactly the countDistinct semantics this replaces
            // coalesce(sum, 0): an EMPTY child yields zero groups, so the
            // global agg's sums come back NULL (as they would in the
            // row-level form too) — an audit must report zeros, and the
            // oracle coalesces the same way
            .agg(coalesce(sum("__c"), lit(0L)).as("n_rows"),
              count(col("__fk")).as("n_distinct_fk"),
              coalesce(sum(when(col("__pk").isNull, col("__c")).otherwise(0L)),
                lit(0L)).as("n_orphan_rows"),
              coalesce(sum(when(col("__pk").isNull && col("__fk").isNotNull, 1L)
                .otherwise(0L)), lit(0L)).as("n_orphan_values"))
            .select(lit(rel).as("relation"), col("n_rows"),
              col("n_distinct_fk"), col("n_orphan_rows"),
              col("n_orphan_values"))
        }
        val li = Tables.lineitem(s, d)
        audit("customer.nationkey->nation", Tables.customer(s, d),
            "c_nationkey", Tables.nation(s, d), "n_nationkey")
          .unionByName(audit("lineitem.orderkey->orders", li, "l_orderkey",
            Tables.orders(s, d), "o_orderkey"))
          .unionByName(audit("lineitem.partkey->part", li, "l_partkey",
            Tables.part(s, d), "p_partkey"))
          .unionByName(audit("lineitem.suppkey->supplier", li, "l_suppkey",
            Tables.supplier(s, d), "s_suppkey"))
          .unionByName(audit("orders.custkey->customer", Tables.orders(s, d),
            "o_custkey", Tables.customer(s, d), "c_custkey"))
          .orderBy("relation")
      },
      Some("""WITH a AS (
         |  SELECT 'customer.nationkey->nation' AS relation,
         |    COUNT(*) AS n_rows, COUNT(DISTINCT c_nationkey) AS n_distinct_fk,
         |    SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS n_orphan_rows,
         |    COUNT(DISTINCT CASE WHEN n.n_nationkey IS NULL THEN c_nationkey END)
         |      AS n_orphan_values
         |  FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  UNION ALL
         |  SELECT 'lineitem.orderkey->orders',
         |    COUNT(*), COUNT(DISTINCT l_orderkey),
         |    SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END),
         |    COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l_orderkey END)
         |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  UNION ALL
         |  SELECT 'lineitem.partkey->part',
         |    COUNT(*), COUNT(DISTINCT l_partkey),
         |    SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END),
         |    COUNT(DISTINCT CASE WHEN p.p_partkey IS NULL THEN l_partkey END)
         |  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
         |  UNION ALL
         |  SELECT 'lineitem.suppkey->supplier',
         |    COUNT(*), COUNT(DISTINCT l_suppkey),
         |    SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END),
         |    COUNT(DISTINCT CASE WHEN s.s_suppkey IS NULL THEN l_suppkey END)
         |  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
         |  UNION ALL
         |  SELECT 'orders.custkey->customer',
         |    COUNT(*), COUNT(DISTINCT o_custkey),
         |    SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END),
         |    COUNT(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o_custkey END)
         |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
         |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
         |  CAST(n_distinct_fk AS BIGINT) AS n_distinct_fk,
         |  CAST(COALESCE(n_orphan_rows, 0) AS BIGINT) AS n_orphan_rows,
         |  CAST(n_orphan_values AS BIGINT) AS n_orphan_values
         |FROM a ORDER BY relation""".stripMargin)),

    // Z-ORDER layout: events clustered by the Morton interleave of
    // (user_id, day), landed through the deterministic RangeShard writer
    // (exact cut keys — no sampled boundaries), then read back. The
    // per-shard bounding boxes over BOTH dimensions are the point: a
    // range predicate on either dimension prunes most shards. The oracle
    // replays the whole layout from the rank closed form over the same
    // z expression (engine-exact shift/mask arithmetic).
    Q("layout3_zorder_sharded",
      (s, d) => {
        val path = new java.io.File(
          new java.io.File(sys.props("java.io.tmpdir")),
          s"graft-zorder-${d.replaceAll("[^A-Za-z0-9.]", "_")}" +
            s"-p${ProcessHandle.current.pid}").toString
        graft.sources.Writers.deleteTreeOnExit(path)
        val ev = Tables.events(s, d)
          .withColumn("day", expr("ts_us_long div 86400000000"))
          .withColumn("__z",
            expr(ZOrder.zSparkSql("(user_id % 65536)", "(day % 65536)")))
          .withColumn("__key", col("__z") * lit(100000000L) + col("event_id"))
          .select("__key", "event_id", "user_id", "day")
        graft.operators.RangeShard.layout(ev, "__key", path, nShards = 16)
        s.read.parquet(path)
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(count(lit(1)).as("n_events"),
            min("user_id").as("u_min"), max("user_id").as("u_max"),
            min("day").as("d_min"), max("day").as("d_max"))
          .orderBy("shard")
      },
      Some(s"""${QH.evCte},
         |z AS (SELECT event_id, user_id, ts_us_long // 86400000000 AS day,
         |        ${ZOrder.zDuckSql("(user_id % 65536)",
                    "((ts_us_long // 86400000000) % 65536)")} AS zv
         |      FROM ev),
         |r AS (SELECT user_id, day,
         |        row_number() OVER (ORDER BY zv * 100000000 + event_id) - 1 AS r0,
         |        COUNT(*) OVER () AS n
         |      FROM z)
         |SELECT CAST(r0 * 16 // n AS BIGINT) AS shard,
         |  COUNT(*) AS n_events,
         |  MIN(user_id) AS u_min, MAX(user_id) AS u_max,
         |  CAST(MIN(day) AS BIGINT) AS d_min, CAST(MAX(day) AS BIGINT) AS d_max
         |FROM r GROUP BY 1 ORDER BY shard""".stripMargin)),

    // Data-contract validation report: the engine-side form of the
    // reference's assertion checks (operators/Checks.scala) — one row per
    // rule with its violation count over a corpus with DETERMINISTICALLY
    // planted corruption (every 97th order re-uploaded with a null
    // custkey, negated price, and a colliding key; every 89th lineitem
    // re-pointed past the orderkey range): null-rate, key uniqueness,
    // value range, referential orphans. Each rule is one aggregation —
    // at scale they share a single pass per table.
    Q("dq1_contract_report",
      (s, d) => {
        val orders = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val bad = orders.filter(col("o_orderkey") % 97 === 0)
          .select(col("o_orderkey"),
            lit(null).cast("long").as("o_custkey"),
            (-col("o_totalprice")).as("o_totalprice"))
        val ord = orders.unionByName(bad)
        val li = Tables.lineitem(s, d).select("l_orderkey")
          .withColumn("l_orderkey",
            when(col("l_orderkey") % 89 === 0, col("l_orderkey") + 900000000L)
              .otherwise(col("l_orderkey")))
        // Row-level rules share ONE pass per table (the scale shape the
        // comment above promises); only uniqueness (groupBy) and the
        // referential rule (join) need their own.
        val ordRow = ord.agg(count(lit(1)).as("n"),
          sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("nulls"),
          sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg"))
          .head()
        val (nOrd, nullCk, negPrice) =
          (ordRow.getLong(0), ordRow.getLong(1), ordRow.getLong(2))
        val dupKeys = ord.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(coalesce(sum(col("c") - 1), lit(0L)))
          .head().getLong(0)
        val liRow = li.join(
            ord.select("o_orderkey").distinct().withColumn("__hit", lit(1)),
            col("l_orderkey") === col("o_orderkey"), "left")
          .agg(count(lit(1)).as("n"),
            sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("orph"))
          .head()
        val (nLi, orphans) = (liRow.getLong(0), liRow.getLong(1))
        import s.implicits._
        Seq(
          ("not_null:o_custkey", nullCk, nOrd),
          ("unique:o_orderkey", dupKeys, nOrd),
          ("range:o_totalprice>=0", negPrice, nOrd),
          ("ref:l_orderkey->orders", orphans, nLi))
          .toDF("check_name", "n_violations", "n_rows_checked")
          .orderBy("check_name")
      },
      Some("""WITH ord AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, NULL AS o_custkey, -o_totalprice
         |  FROM orders WHERE o_orderkey % 97 = 0),
         |li AS (SELECT CASE WHEN l_orderkey % 89 = 0
         |                THEN l_orderkey + 900000000 ELSE l_orderkey END
         |         AS l_orderkey FROM lineitem),
         |checks AS (
         |  SELECT 'not_null:o_custkey' AS check_name,
         |    (SELECT COUNT(*) FROM ord WHERE o_custkey IS NULL) AS n_violations,
         |    (SELECT COUNT(*) FROM ord) AS n_rows_checked
         |  UNION ALL
         |  SELECT 'unique:o_orderkey',
         |    (SELECT COALESCE(SUM(c - 1), 0) FROM (
         |       SELECT COUNT(*) AS c FROM ord GROUP BY o_orderkey) WHERE c > 1),
         |    (SELECT COUNT(*) FROM ord)
         |  UNION ALL
         |  SELECT 'range:o_totalprice>=0',
         |    (SELECT COUNT(*) FROM ord WHERE o_totalprice < 0),
         |    (SELECT COUNT(*) FROM ord)
         |  UNION ALL
         |  SELECT 'ref:l_orderkey->orders',
         |    (SELECT COUNT(*) FROM li WHERE l_orderkey NOT IN
         |       (SELECT o_orderkey FROM ord)),
         |    (SELECT COUNT(*) FROM li))
         |SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
         |  CAST(n_rows_checked AS BIGINT) AS n_rows_checked
         |FROM checks ORDER BY check_name""".stripMargin)),

    // SCD2 history build (slowly-changing dimension, type 2): each user's
    // event_type stream collapsed into validity intervals — the
    // gaps-and-islands shape (lag-detected change flag, running-sum
    // version number, per-version MIN/COUNT, lead() for valid_to; -1
    // marks the open current version). The windows are keyed per user
    // (partition-parallel; the one-giant-key caveat and its mitigation
    // are w1/w1b's). All columns integer/string.
    Q("w8_scd2_intervals",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select("user_id", "event_type", "ts_us_long", "event_id")
        val wOrd = Window.partitionBy("user_id")
          .orderBy(col("ts_us_long"), col("event_id"))
        val prev = lag(col("event_type"), 1).over(wOrd)
        val hist = ev
          .withColumn("__chg",
            when(prev.isNull.or(prev =!= col("event_type")), 1L).otherwise(0L))
          .withColumn("version", sum(col("__chg")).over(wOrd))
          .groupBy("user_id", "version", "event_type")
          .agg(min("ts_us_long").as("valid_from"),
            count(lit(1)).as("n_events"))
        val wVer = Window.partitionBy("user_id").orderBy("version")
        hist
          .withColumn("valid_to",
            coalesce(lead(col("valid_from"), 1).over(wVer), lit(-1L)))
          .select("user_id", "version", "event_type", "valid_from",
            "valid_to", "n_events")
          .orderBy("user_id", "version")
      },
      Some(s"""${QH.evCte},
         |seg AS (SELECT user_id, event_type, ts_us_long, event_id,
         |          CASE WHEN lag(event_type) OVER (PARTITION BY user_id
         |                 ORDER BY ts_us_long, event_id)
         |               IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
         |        FROM ev),
         |ver AS (SELECT user_id, event_type, ts_us_long,
         |          SUM(chg) OVER (PARTITION BY user_id
         |            ORDER BY ts_us_long, event_id) AS version
         |        FROM seg),
         |hist AS (SELECT user_id, CAST(version AS BIGINT) AS version,
         |           event_type, MIN(ts_us_long) AS valid_from,
         |           COUNT(*) AS n_events
         |         FROM ver GROUP BY 1, 2, 3)
         |SELECT user_id, version, event_type, valid_from,
         |  COALESCE(lead(valid_from) OVER (PARTITION BY user_id
         |    ORDER BY version), -1) AS valid_to,
         |  n_events
         |FROM hist ORDER BY user_id, version""".stripMargin)),

    // Robust anomaly detection: per-type median/MAD outlier flags with
    // every comparison integer-exact — value lands in fixed point as
    // floor(value*1024) (a power-of-two multiply is an exponent shift,
    // bit-identical on both engines), and both medians are HISTOGRAM
    // medians: count per distinct value, cumulative sum over the (small)
    // distinct-value domain, lower median = min value whose cumsum
    // reaches rank (n+1) div 2. No per-row rank window — the cumwalk
    // runs over distinct values, so a 5-type/billion-row corpus windows
    // over the value domain, not the data.
    Q("ts2_anomaly_mad",
      (s, d) => {
        val fx = Tables.events(s, d)
          .select(col("event_type"),
            floor(col("value") * lit(1024)).cast("long").as("v"))
        def lowerMedian(in: org.apache.spark.sql.DataFrame,
                        valueCol: String, out: String) = {
          val wCum = Window.partitionBy("event_type").orderBy(valueCol)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wAll = Window.partitionBy("event_type")
          in.groupBy(col("event_type"), col(valueCol))
            .agg(count(lit(1)).as("__c"))
            .withColumn("__cum", sum("__c").over(wCum))
            .withColumn("__n", sum("__c").over(wAll))
            .groupBy("event_type")
            .agg(min(when(col("__cum") >= expr("(__n + 1) div 2"),
              col(valueCol))).as(out))
        }
        val med = lowerMedian(fx, "v", "med_fp")
        val dv = fx.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("v") - col("med_fp")))
        val mad = lowerMedian(dv, "dev", "mad_fp")
        dv.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            max("med_fp").as("med_fp"),
            max("mad_fp").as("mad_fp"),
            sum(when(col("dev") > lit(3L) * col("mad_fp"), 1L)
              .otherwise(0L)).as("n_anomalies"),
            max("dev").as("max_dev"))
          .orderBy("event_type")
      },
      Some(s"""${QH.evCte},
         |fx AS (SELECT event_type,
         |         CAST(FLOOR(value * 1024) AS BIGINT) AS v FROM ev),
         |c1 AS (SELECT event_type, v, COUNT(*) AS c FROM fx GROUP BY 1, 2),
         |m1 AS (SELECT event_type, v,
         |         SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         |         SUM(c) OVER (PARTITION BY event_type) AS n
         |       FROM c1),
         |med AS (SELECT event_type,
         |          MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS med_fp
         |        FROM m1 GROUP BY 1),
         |dv AS (SELECT f.event_type, f.v, med.med_fp,
         |         ABS(f.v - med.med_fp) AS dev
         |       FROM fx f JOIN med USING (event_type)),
         |c2 AS (SELECT event_type, dev, COUNT(*) AS c FROM dv GROUP BY 1, 2),
         |m2 AS (SELECT event_type, dev,
         |         SUM(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
         |         SUM(c) OVER (PARTITION BY event_type) AS n
         |       FROM c2),
         |mad AS (SELECT event_type,
         |          MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad_fp
         |        FROM m2 GROUP BY 1)
         |SELECT d.event_type, COUNT(*) AS n,
         |  MAX(d.med_fp) AS med_fp, MAX(m.mad_fp) AS mad_fp,
         |  CAST(SUM(CASE WHEN d.dev > 3 * m.mad_fp THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_anomalies,
         |  MAX(d.dev) AS max_dev
         |FROM dv d JOIN mad m USING (event_type)
         |GROUP BY 1 ORDER BY d.event_type""".stripMargin)),

    // Market-basket frequent pairs (a-priori pruned): items below the
    // support threshold are dropped BEFORE the within-basket pair
    // expansion — a pair can only be frequent if both items are (the
    // apriori property), so the quadratic-in-basket-size fanout runs on
    // the pruned stream. Basket size bounds the per-order expansion
    // (TPC-H baskets ≤ 7 items); lift lands as an integer ppm through
    // DECIMAL. The one driver-side scalar is the basket count (a single
    // count, SURVEY §7.4's sanctioned shape).
    //
    // Scale fence (tools/MbProbe, PLANS r12 s1): with bounded baskets the
    // pair expansion is LINEAR in baskets (measured exponent 1.0 at ×10,
    // max pruned basket 13→17); a basket whose size GROWS with the data
    // contributes C(m,2) alone (an injected every-20th-part basket added
    // 4 950 → 499 500 pair rows at ×10). Deployment rule: cap or sample
    // baskets past a size threshold BEFORE the self-join — no downstream
    // support filter can undo a C(m,2) shuffle already emitted.
    Q("mb1_frequent_pairs",
      (s, d) => {
        val (pairs, nOrders) = basketPairs(s, d)
        pairs
          .withColumn("lift_ppm",
            expr(s"CAST(CAST(pair_cnt AS DECIMAL(38,0)) * $nOrders * 1000000" +
              " div (CAST(sup1 AS DECIMAL(38,0)) * sup2) AS BIGINT)"))
          .select("p1", "p2", "pair_cnt", "sup1", "sup2", "lift_ppm")
          .orderBy(desc("pair_cnt"), col("p1"), col("p2"))
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
         |sup AS (SELECT l_partkey, COUNT(*) AS item_sup FROM items
         |        GROUP BY 1 HAVING COUNT(*) >= 3),
         |freq AS (SELECT i.l_orderkey, i.l_partkey, s.item_sup
         |         FROM items i JOIN sup s USING (l_partkey)),
         |pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         |            a.item_sup AS sup1, b.item_sup AS sup2
         |          FROM freq a JOIN freq b
         |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
         |SELECT p1, p2, COUNT(*) AS pair_cnt,
         |  MAX(sup1) AS sup1, MAX(sup2) AS sup2,
         |  CAST(CAST(COUNT(*) AS HUGEINT) * (SELECT n_orders FROM n) * 1000000
         |    // (CAST(MAX(sup1) AS HUGEINT) * MAX(sup2)) AS BIGINT) AS lift_ppm
         |FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 3
         |ORDER BY pair_cnt DESC, p1, p2""".stripMargin),
      setup = Some((s, d) => { basketPairs(s, d); () })),

    // First-order Markov transition matrix over each user's event stream:
    // (prev_type -> type) counts from one per-user lag window, row-
    // normalized to integer ppm. The 5x5 output is the model a
    // sequence-aware sampler or session simulator consumes.
    Q("fn2_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us_long"), col("event_id"))
        val wRow = Window.partitionBy("prev_type")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us_long"),
            col("event_id"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy("prev_type", "event_type")
          .agg(count(lit(1)).as("n"))
          .withColumn("row_total", sum("n").over(wRow))
          .withColumn("ppm", expr("n * 1000000 div row_total"))
          .select("prev_type", "event_type", "n", "row_total", "ppm")
          .orderBy("prev_type", "event_type")
      },
      Some(s"""${QH.evCte},
         |tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id
         |           ORDER BY ts_us_long, event_id) AS prev_type,
         |         event_type
         |       FROM ev),
         |cnt AS (SELECT prev_type, event_type, COUNT(*) AS n FROM tr
         |        WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         |SELECT prev_type, event_type, n,
         |  CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
         |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT)
         |    AS ppm
         |FROM cnt ORDER BY prev_type, event_type""".stripMargin)),

    // Entity-resolution capstone: a dirty registry (the distinct part
    // names + deterministically planted 1-deletion corruptions and exact
    // duplicates) resolved to canonical entities — symmetric SymSpell
    // blocking (Fuzzy.symmetricSelfJoin: candidates from an equi-join on
    // the deletion-neighborhood key set, never all-pairs), exact
    // levenshtein <= 1 verify, connected components, min-key canonical.
    // The registry here is the DISTINCT-name set (part replicates 64
    // names up to 347x — exact-dup cliques belong to d1's hash-groupBy,
    // not the edit-distance blocker; the operator scaladoc owns that
    // contract). Composes fz1's blocker with d6's components.
    Q("er1_entity_resolution",
      (s, d) => {
        val canon = Tables.part(s, d).groupBy(col("p_name").as("name"))
          .agg(min("p_partkey").as("rec_key"))
        val delDup = canon.filter(col("rec_key") % 2 === 0)
          .withColumn("__pos",
            expr(TextOps.md5LongSql("name")) % (length(col("name")) - 1) + 2)
          .select((col("rec_key") + 1000000L).as("rec_key"),
            expr("concat(substring(name, 1, __pos - 1), " +
              "substring(name, __pos + 1, length(name)))").as("name"))
        val exactDup = canon.filter(col("rec_key") % 3 === 0)
          .select((col("rec_key") + 2000000L).as("rec_key"), col("name"))
        val reg = canon.select("rec_key", "name")
          .unionByName(delDup).unionByName(exactDup)
        val edges = Fuzzy.symmetricSelfJoin(reg, "rec_key", "name")
        val comp = graft.operators.Dedup.connectedComponents(
          edges.select("id1", "id2"), "id1", "id2")
        reg.join(comp, reg("rec_key") === comp("id"), "left")
          .withColumn("entity_key", coalesce(col("component"), col("rec_key")))
          .groupBy("entity_key")
          .agg(count(lit(1)).as("n_records"),
            countDistinct("name").as("n_names"))
          .orderBy("entity_key")
      },
      Some(s"""WITH RECURSIVE
         |canon AS (SELECT p_name AS name, MIN(p_partkey) AS rec_key
         |          FROM part GROUP BY 1),
         |deld AS (SELECT rec_key + 1000000 AS rec_key,
         |           substr(name, 1, pos - 1) ||
         |             substr(name, pos + 1, length(name)) AS name
         |         FROM (SELECT rec_key, name,
         |                 (('0x' || substr(md5(name), 1, 15))::BIGINT)
         |                   % (length(name) - 1) + 2 AS pos
         |               FROM canon WHERE rec_key % 2 = 0)),
         |exd AS (SELECT rec_key + 2000000 AS rec_key, name
         |        FROM canon WHERE rec_key % 3 = 0),
         |reg AS (SELECT rec_key, name FROM canon
         |        UNION ALL SELECT * FROM deld
         |        UNION ALL SELECT * FROM exd),
         |keys AS (SELECT rec_key, name, name AS k FROM reg
         |         UNION
         |         SELECT rec_key, name,
         |           substr(name, 1, p - 1) || substr(name, p + 1, length(name))
         |         FROM (SELECT rec_key, name,
         |                 unnest(range(1, length(name) + 1)) AS p FROM reg)),
         |cand AS (SELECT DISTINCT a.rec_key AS id1, b.rec_key AS id2,
         |           levenshtein(a.name, b.name) AS lev
         |         FROM keys a JOIN keys b
         |           ON a.k = b.k AND a.rec_key < b.rec_key),
         |edges0 AS (SELECT id1, id2 FROM cand WHERE lev <= 1),
         |edges AS (SELECT id1 AS a, id2 AS b FROM edges0
         |          UNION SELECT id2, id1 FROM edges0),
         |reach(id, r) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.id),
         |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
         |mapped AS (SELECT r.rec_key, r.name,
         |             COALESCE(c.component, r.rec_key) AS entity_key
         |           FROM reg r LEFT JOIN comp c ON r.rec_key = c.id)
         |SELECT entity_key, COUNT(*) AS n_records,
         |  COUNT(DISTINCT name) AS n_names
         |FROM mapped GROUP BY 1 ORDER BY entity_key""".stripMargin)),

    // Sweep-line max concurrency: events become half-open usage intervals
    // [ts, ts + floor(value·2^6)·1s) (power-of-two fixed point), each
    // interval contributes +1/-1 boundary points, a per-type running sum
    // over (t, delta, event_id) — ends sort before starts at the same
    // instant, the half-open convention — gives instantaneous
    // concurrency; max + first time it is attained per type. The classic
    // interval-overlap aggregate without any interval self-join.
    Q("fn3_max_concurrency",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("ts_us_long"), col("event_id"),
            (floor(col("value") * lit(64)).cast("long") * lit(1000000L))
              .as("dur_us"))
        val pts = ev.select(col("event_type"), col("ts_us_long").as("t"),
            lit(1L).as("delta"), col("event_id"))
          .unionByName(ev.select(col("event_type"),
            (col("ts_us_long") + col("dur_us")).as("t"),
            lit(-1L).as("delta"), col("event_id")))
        val w = Window.partitionBy("event_type")
          .orderBy(col("t"), col("delta"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.partitionBy("event_type")
        pts.withColumn("run", sum("delta").over(w))
          .withColumn("mx", max("run").over(wAll))
          .groupBy("event_type")
          .agg(max("run").as("max_conc"),
            min(when(col("run") === col("mx"), col("t"))).as("first_t"))
          .orderBy("event_type")
      },
      Some(s"""${QH.evCte},
         |iv AS (SELECT event_type, ts_us_long, event_id,
         |         CAST(FLOOR(value * 64) AS BIGINT) * 1000000 AS dur_us
         |       FROM ev),
         |pts AS (SELECT event_type, ts_us_long AS t, 1 AS delta, event_id
         |        FROM iv
         |        UNION ALL
         |        SELECT event_type, ts_us_long + dur_us, -1, event_id
         |        FROM iv),
         |sw AS (SELECT event_type, t,
         |         SUM(delta) OVER (PARTITION BY event_type
         |           ORDER BY t, delta, event_id) AS run
         |       FROM pts),
         |sw2 AS (SELECT event_type, t, run,
         |          MAX(run) OVER (PARTITION BY event_type) AS mx
         |        FROM sw)
         |SELECT event_type, CAST(MAX(run) AS BIGINT) AS max_conc,
         |  MIN(CASE WHEN run = mx THEN t END) AS first_t
         |FROM sw2 GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Retention cohort matrix: users grouped by first-activity day, each
    // cohort's distinct actives tracked per week offset, retained rate as
    // integer ppm of cohort size. Two aggregations and one broadcast-able
    // cohort-size join — days are epoch-micro integer division
    // throughout, ppm the only rate.
    Q("ts3_retention_cohorts",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), expr("ts_us_long div 86400000000").as("day"))
        val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
        val act = ev.join(cohort, "user_id")
          .withColumn("wk", expr("(day - cohort_day) div 7"))
          .groupBy("cohort_day", "wk")
          .agg(countDistinct("user_id").as("n_active"))
        val sizes = cohort.groupBy("cohort_day")
          .agg(count(lit(1)).as("cohort_size"))
        act.join(sizes, "cohort_day")
          .withColumn("ret_ppm",
            expr("n_active * 1000000L div cohort_size"))
          .select("cohort_day", "wk", "n_active", "cohort_size", "ret_ppm")
          .orderBy("cohort_day", "wk")
      },
      Some(s"""${QH.evCte},
         |ud AS (SELECT user_id, ts_us_long // 86400000000 AS day FROM ev),
         |cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM ud GROUP BY 1),
         |act AS (SELECT cohort_day, (day - cohort_day) // 7 AS wk,
         |          COUNT(DISTINCT u.user_id) AS n_active
         |        FROM ud u JOIN cohort c ON u.user_id = c.user_id
         |        GROUP BY 1, 2),
         |sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size
         |          FROM cohort GROUP BY 1)
         |SELECT a.cohort_day, a.wk, a.n_active, s.cohort_size,
         |  a.n_active * 1000000 // s.cohort_size AS ret_ppm
         |FROM act a JOIN sizes s USING (cohort_day)
         |ORDER BY a.cohort_day, a.wk""".stripMargin)),

    // Last-touch attribution: each purchase attributed to the user's most
    // recent click within a 7-day lookback, then one (purchase) groupBy
    // argmax via the zero-padded (ts, id) ordering key (pack2's
    // lexicographic == numeric idiom — both engines' max_by on the same
    // key string); unattributed purchases keep -1.
    //
    // The lookback is a BANDED range join, keyed (user, 7-day bucket) with
    // each purchase probing its own band and the previous one (a click in
    // [pts-7d, pts] lives in exactly one of the two, so no pair dedup):
    // per-user fanout is purchases_band x clicks_band, never the global
    // |P_u| x |C_u| a bare user-key join pays before its range filter.
    // FnSkewProbe, injected bot user on sf0.1 organic events: at a
    // 2x100k-event bot the bare join burns 2.5e9 pairs in one task
    // (8.5 s) where the band join holds 3.9 s with identical output —
    // and the gap grows quadratically with bot size. (The window
    // RANGE-frame alternative is a trap: Spark re-aggregates sliding
    // frames per row — 33 s already at a 2x20k bot.)
    Q("fn4_last_touch_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val W = 604800000000L
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts_us_long").as("pts"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("click_id"),
            col("ts_us_long").as("cts"))
        val att = Relational.bandedLookbackJoin(pur, clk, "user_id", "pts", "cts", W)
          .groupBy("purchase_id")
          .agg(max_by(col("click_id"),
              expr("format_string('%020d%012d', cts, click_id)")).as("att_click"),
            max("cts").as("att_cts"))
        pur.join(att, Seq("purchase_id"), "left")
          .select(col("purchase_id"), col("user_id"),
            coalesce(col("att_click"), lit(-1L)).as("click_id"),
            coalesce(col("pts") - col("att_cts"), lit(-1L)).as("gap_us"))
          .orderBy("purchase_id")
      },
      Some(s"""${QH.evCte},
         |pur AS (SELECT user_id, event_id AS purchase_id, ts_us_long AS pts
         |        FROM ev WHERE event_type = 'purchase'),
         |clk AS (SELECT user_id, event_id AS click_id, ts_us_long AS cts
         |        FROM ev WHERE event_type = 'click'),
         |att AS (SELECT purchase_id,
         |          max_by(click_id, printf('%020d%012d', cts, click_id))
         |            AS att_click,
         |          MAX(cts) AS att_cts
         |        FROM pur p JOIN clk c USING (user_id)
         |        WHERE c.cts BETWEEN p.pts - 604800000000 AND p.pts
         |        GROUP BY 1)
         |SELECT p.purchase_id, p.user_id,
         |  COALESCE(a.att_click, -1) AS click_id,
         |  COALESCE(p.pts - a.att_cts, -1) AS gap_us
         |FROM pur p LEFT JOIN att a USING (purchase_id)
         |ORDER BY p.purchase_id""".stripMargin)),

    // Conversion-latency distribution — the step after fn4's attribution:
    // per purchase DAY, the click→purchase gap's count/min/median/p90/max,
    // every quantile RANK-BASED (value at rank (n+1) div 2 and ceil(0.9n)
    // — ts2's lower-median convention, the stratify lesson: no
    // interpolation, integer epoch-µs end to end). Per-day windows are
    // calendar-bounded; the attribution join is fn4's BANDED 7-day
    // lookback (per-band fanout — see fn4's comment and FnSkewProbe).
    Q("fn9_conversion_latency",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
        val W = 604800000000L
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            col("ts_us_long").as("pts"))
        val clk = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us_long").as("cts"))
        val gaps = Relational.bandedLookbackJoin(pur, clk, "user_id", "pts", "cts", W)
          .groupBy("purchase_id")
          .agg(min("pts").as("pts"), max("cts").as("att_cts"))
          .withColumn("gap_us", col("pts") - col("att_cts"))
          .withColumn("day", expr("pts div 86400000000L"))
        val w = Window.partitionBy("day").orderBy(col("gap_us"), col("purchase_id"))
        val ranked = gaps.withColumn("rnk", row_number().over(w))
        val stats = gaps.groupBy("day")
          .agg(count(lit(1)).as("n"), min("gap_us").as("min_us"),
            max("gap_us").as("max_us"))
        stats
          .join(ranked.select(col("day").as("dm"), col("rnk").as("mrnk"),
              col("gap_us").as("med_us")),
            col("day") === col("dm") && col("mrnk") === expr("(n + 1) div 2"))
          .join(ranked.select(col("day").as("dp"), col("rnk").as("prnk"),
              col("gap_us").as("p90_us")),
            col("day") === col("dp") && col("prnk") === expr("(9 * n + 9) div 10"))
          .select("day", "n", "min_us", "med_us", "p90_us", "max_us")
          .orderBy("day")
      },
      Some(s"""${QH.evCte},
         |pur AS (SELECT user_id, event_id AS purchase_id, ts_us_long AS pts
         |        FROM ev WHERE event_type = 'purchase'),
         |clk AS (SELECT user_id, ts_us_long AS cts
         |        FROM ev WHERE event_type = 'click'),
         |g AS (SELECT purchase_id, MIN(pts) AS pts, MAX(cts) AS att_cts
         |      FROM pur p JOIN clk c USING (user_id)
         |      WHERE c.cts BETWEEN p.pts - 604800000000 AND p.pts
         |      GROUP BY 1),
         |gd AS (SELECT purchase_id, pts // 86400000000 AS day,
         |         pts - att_cts AS gap_us FROM g),
         |rk AS (SELECT day, gap_us, purchase_id,
         |         row_number() OVER (PARTITION BY day
         |           ORDER BY gap_us, purchase_id) AS rnk
         |       FROM gd),
         |st AS (SELECT day, COUNT(*) AS n, MIN(gap_us) AS min_us,
         |         MAX(gap_us) AS max_us FROM gd GROUP BY 1)
         |SELECT CAST(st.day AS BIGINT) AS day, st.n,
         |  st.min_us, m.gap_us AS med_us, p.gap_us AS p90_us, st.max_us
         |FROM st
         |JOIN rk m ON m.day = st.day AND m.rnk = (st.n + 1) // 2
         |JOIN rk p ON p.day = st.day AND p.rnk = (9 * st.n + 9) // 10
         |ORDER BY day""".stripMargin)),

    // Distribution drift between corpus snapshots: two-sample chi-square
    // homogeneity over (o_orderpriority, l_returnflag) cells, period A =
    // orders before 1998-01-01 vs B = after. Pure-integer fixed point:
    // each side's term is (o·N − c·N_j)² scaled ×10⁶ and floor-divided by
    // N·c·N_j entirely in DECIMAL(38,0)/HUGEINT — no doubles, no libm
    // (validated against the float formula: 18215887 ppm ≈ χ² 18.2159 at
    // sf0.01). The cell frame is domain-bounded (priorities × flags ≤ 15
    // rows at any corpus size), so the unpartitioned totals window is
    // free; the one data-sized pass is the join+groupBy. At extreme N
    // pre-scale the counts — (o·N)²·10⁶ must fit 38 digits, fine through
    // ~10¹² rows per cell.
    // Numeric-distribution drift — dq2's sibling for CONTINUOUS columns:
    // total-variation distance between the before/after-1998 order-value
    // distributions over value-domain buckets ($25k-wide, capped at 20 —
    // the bucket grid is a constant, never data-derived), every share an
    // integer ppm (counts via exact DECIMAL cents — the money invariant),
    // TVD = Σ|share_a − share_b| div 2. The only data-sized pass is one
    // groupBy; the totals/TVD windows run over ≤ 21 bucket rows.
    Q("dq5_tvd_drift",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .withColumn("__cents",
            expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .withColumn("bucket", expr("least(__cents div 2500000L, 20L)"))
          .withColumn("__a",
            when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1L)
              .otherwise(0L))
          .groupBy("bucket")
          .agg(sum("__a").as("n_a"), sum(lit(1L) - col("__a")).as("n_b"))
        val wAll = Window.partitionBy(lit(1))
        cells
          .withColumn("__na", sum("n_a").over(wAll))
          .withColumn("__nb", sum("n_b").over(wAll))
          .withColumn("share_a_ppm", expr("n_a * 1000000L div __na"))
          .withColumn("share_b_ppm", expr("n_b * 1000000L div __nb"))
          .withColumn("abs_diff_ppm", abs(col("share_a_ppm") - col("share_b_ppm")))
          .withColumn("__ts", sum("abs_diff_ppm").over(wAll))
          .withColumn("tvd_ppm", expr("__ts div 2"))
          .select("bucket", "n_a", "n_b", "share_a_ppm", "share_b_ppm",
            "abs_diff_ppm", "tvd_ppm")
          .orderBy("bucket")
      },
      Some("""WITH c AS (
           |  SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |           // 2500000, 20) AS bucket,
           |    CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS a
           |  FROM orders),
           |g AS (SELECT bucket, SUM(a) AS n_a, SUM(1 - a) AS n_b
           |      FROM c GROUP BY 1),
           |t AS (SELECT SUM(n_a) AS na, SUM(n_b) AS nb FROM g),
           |sh AS (SELECT bucket, n_a, n_b,
           |         n_a * 1000000 // na AS share_a_ppm,
           |         n_b * 1000000 // nb AS share_b_ppm
           |       FROM g CROSS JOIN t)
           |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(n_a AS BIGINT) AS n_a,
           |  CAST(n_b AS BIGINT) AS n_b,
           |  CAST(share_a_ppm AS BIGINT) AS share_a_ppm,
           |  CAST(share_b_ppm AS BIGINT) AS share_b_ppm,
           |  CAST(ABS(share_a_ppm - share_b_ppm) AS BIGINT) AS abs_diff_ppm,
           |  CAST((SELECT SUM(ABS(share_a_ppm - share_b_ppm)) FROM sh) // 2 AS BIGINT)
           |    AS tvd_ppm
           |FROM sh ORDER BY bucket""".stripMargin)),

    Q("dq2_drift_chisq",
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select("l_orderkey", "l_returnflag")
          .join(Tables.orders(s, d)
              .select("o_orderkey", "o_orderdate", "o_orderpriority"),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("__a",
            when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1L)
              .otherwise(0L))
          .groupBy("o_orderpriority", "l_returnflag")
          .agg(sum("__a").as("n_a"), sum(lit(1L) - col("__a")).as("n_b"))
        val wAll = Window.partitionBy(lit(1))
        val term = (o: String, nj: String) =>
          s"""CAST((1000000 * (CAST($o AS DECIMAL(38,0)) * (na_tot + nb_tot)
             |  - (n_a + n_b) * CAST($nj AS DECIMAL(38,0)))
             |  * (CAST($o AS DECIMAL(38,0)) * (na_tot + nb_tot)
             |  - (n_a + n_b) * CAST($nj AS DECIMAL(38,0))))
             |  div ((CAST(na_tot AS DECIMAL(38,0)) + nb_tot)
             |  * (n_a + n_b) * $nj) AS BIGINT)""".stripMargin
        cells
          .withColumn("na_tot", sum("n_a").over(wAll))
          .withColumn("nb_tot", sum("n_b").over(wAll))
          .withColumn("chi2_ppm",
            expr(term("n_a", "na_tot")) + expr(term("n_b", "nb_tot")))
          .withColumn("chi2_total_ppm",
            sum("chi2_ppm").over(wAll).cast("long"))
          .withColumn("drifted",
            when(col("chi2_ppm") > 1000000L, 1L).otherwise(0L))
          .select("o_orderpriority", "l_returnflag", "n_a", "n_b",
            "chi2_ppm", "chi2_total_ppm", "drifted")
          .orderBy("o_orderpriority", "l_returnflag")
      },
      Some("""WITH cells AS (
         |  SELECT o_orderpriority, l_returnflag,
         |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
         |        THEN 1 ELSE 0 END) AS n_a,
         |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
         |        THEN 0 ELSE 1 END) AS n_b
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |tot AS (SELECT o_orderpriority, l_returnflag, n_a, n_b,
         |          SUM(n_a) OVER () AS na_tot, SUM(n_b) OVER () AS nb_tot
         |        FROM cells),
         |terms AS (SELECT o_orderpriority, l_returnflag,
         |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(
         |   (1000000 * (n_a::HUGEINT * (na_tot + nb_tot)
         |        - (n_a + n_b) * na_tot::HUGEINT)
         |      * (n_a::HUGEINT * (na_tot + nb_tot)
         |        - (n_a + n_b) * na_tot::HUGEINT))
         |    // ((na_tot::HUGEINT + nb_tot) * (n_a + n_b) * na_tot)
         |  + (1000000 * (n_b::HUGEINT * (na_tot + nb_tot)
         |        - (n_a + n_b) * nb_tot::HUGEINT)
         |      * (n_b::HUGEINT * (na_tot + nb_tot)
         |        - (n_a + n_b) * nb_tot::HUGEINT))
         |    // ((na_tot::HUGEINT + nb_tot) * (n_a + n_b) * nb_tot)
         |    AS BIGINT) AS chi2_ppm
         |  FROM tot)
         |SELECT o_orderpriority, l_returnflag, n_a, n_b, chi2_ppm,
         |  CAST(SUM(chi2_ppm) OVER () AS BIGINT) AS chi2_total_ppm,
         |  CAST(CASE WHEN chi2_ppm > 1000000 THEN 1 ELSE 0 END AS BIGINT)
         |    AS drifted
         |FROM terms ORDER BY o_orderpriority, l_returnflag""".stripMargin)),

    // Top journey paths: the most frequent length-3 consecutive
    // event-type paths (fn2's bigram matrix generalized to trigrams) —
    // two per-user lags, one count over a domain-bounded trigram space
    // (|event_type|³), deterministic top-20 on (n desc, path asc). The
    // per-user windows are partition-parallel; the ranked frame is
    // domain-sized, never data-sized.
    Q("fn5_top_paths",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_us_long"), col("event_id"))
        val wRank = Window.partitionBy(lit(1))
          .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts_us_long"),
            col("event_id"))
          .withColumn("e1", lag(col("event_type"), 2).over(w))
          .withColumn("e2", lag(col("event_type"), 1).over(w))
          .filter(col("e1").isNotNull && col("e2").isNotNull)
          .groupBy(col("e1"), col("e2"), col("event_type").as("e3"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rank", row_number().over(wRank).cast("long"))
          .filter(col("rank") <= 20)
          .select("rank", "e1", "e2", "e3", "n")
          .orderBy("rank")
      },
      Some(s"""${QH.evCte},
         |tri AS (SELECT
         |    lag(event_type, 2) OVER w AS e1,
         |    lag(event_type, 1) OVER w AS e2,
         |    event_type AS e3
         |  FROM ev WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts_us_long, event_id)),
         |cnt AS (SELECT e1, e2, e3, COUNT(*) AS n FROM tri
         |        WHERE e1 IS NOT NULL AND e2 IS NOT NULL GROUP BY 1, 2, 3)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, e1, e2, e3)
         |    AS BIGINT) AS rank,
         |  e1, e2, e3, CAST(n AS BIGINT) AS n
         |FROM cnt ORDER BY n DESC, e1, e2, e3 LIMIT 20""".stripMargin)),

    // Per-interval overlap degrees WITHOUT a pairs join: each order's
    // fulfillment window [least, greatest](order day, last ship day)
    // overlaps #{s_j <= e_i} − #{e_j < s_i} − 1 others (valid because
    // s <= e after normalization — ~21% of the synthetic windows arrive
    // inverted) — two prefix counts read from ONE day-domain cumulative
    // table (calendar-bounded window, the ts2 value-domain cumwalk
    // shape) broadcast back onto the intervals. fn3's sweep-line gives
    // per-type MAX concurrency; this gives every interval's overlap
    // count with no quadratic pair set and no data-sized window
    // (validated 147/147 against a brute-force pair join at sf0.01).
    // Monthly rollup, ppm average.
    Q("fn6_overlap_counts",
      (s, d) => {
        val epoch = to_date(lit("1970-01-01"))
        val ships = Tables.lineitem(s, d)
          .groupBy("l_orderkey").agg(max("l_shipdate").as("max_ship"))
        val iv = Tables.orders(s, d)
          .select(col("o_orderkey").as("id"),
            datediff(to_date(col("o_orderdate")), epoch).cast("long").as("s0"))
          .join(ships.select(col("l_orderkey").as("id"),
            datediff(to_date(col("max_ship")), epoch).cast("long").as("e0")),
            Seq("id"))
          .select(col("id"), least(col("s0"), col("e0")).as("s"),
            greatest(col("s0"), col("e0")).as("e"))
        val days = iv.select(col("s").as("d"), lit(1L).as("ns"), lit(0L).as("ne"))
          .unionByName(iv.select(col("e").as("d"), lit(0L).as("ns"), lit(1L).as("ne")))
          .groupBy("d").agg(sum("ns").as("n_starts"), sum("ne").as("n_ends"))
        val wCum = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = days
          .withColumn("cum_s", sum("n_starts").over(wCum))
          .withColumn("cum_e", sum("n_ends").over(wCum))
        val ov = iv
          .join(broadcast(cum.select(col("d").as("e"), col("cum_s"))), Seq("e"))
          .join(broadcast(cum.select(col("d").as("s"), col("cum_e"),
            col("n_ends"))), Seq("s"))
          .withColumn("n_overlap",
            col("cum_s") - (col("cum_e") - col("n_ends")) - lit(1L))
        ov.groupBy(date_format(
            expr("date_add(to_date('1970-01-01'), cast(s as int))"), "yyyy-MM")
            .as("month"))
          .agg(count(lit(1)).as("n_orders"),
            min("n_overlap").as("min_ov"), max("n_overlap").as("max_ov"),
            TextOps.divPpm(sum("n_overlap"), count(lit(1)))
              .as("avg_ov_ppm"))
          .orderBy("month")
      },
      Some("""WITH iv AS (
         |  SELECT id, least(s0, e0) AS s, greatest(s0, e0) AS e FROM (
         |    SELECT o.o_orderkey AS id,
         |      datediff('day', DATE '1970-01-01', CAST(o.o_orderdate AS DATE)) AS s0,
         |      MAX(datediff('day', DATE '1970-01-01', CAST(l.l_shipdate AS DATE))) AS e0
         |    FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
         |    GROUP BY 1, 2)),
         |days AS (
         |  SELECT d, SUM(ns) AS n_starts, SUM(ne) AS n_ends FROM (
         |    SELECT s AS d, 1 AS ns, 0 AS ne FROM iv
         |    UNION ALL SELECT e, 0, 1 FROM iv) GROUP BY d),
         |cum AS (
         |  SELECT d, SUM(n_starts) OVER (ORDER BY d) AS cum_s,
         |    SUM(n_ends) OVER (ORDER BY d) AS cum_e, n_ends
         |  FROM days),
         |ov AS (
         |  SELECT iv.id, iv.s,
         |    ce.cum_s - (cs.cum_e - cs.n_ends) - 1 AS n_overlap
         |  FROM iv JOIN cum ce ON iv.e = ce.d JOIN cum cs ON iv.s = cs.d)
         |SELECT strftime(DATE '1970-01-01' + INTERVAL (s) DAY, '%Y-%m') AS month,
         |  COUNT(*) AS n_orders,
         |  CAST(MIN(n_overlap) AS BIGINT) AS min_ov,
         |  CAST(MAX(n_overlap) AS BIGINT) AS max_ov,
         |  CAST(SUM(n_overlap) * 1000000 // COUNT(*) AS BIGINT) AS avg_ov_ppm
         |FROM ov GROUP BY month ORDER BY month""".stripMargin)),

    // Seasonality scan: integer-exact autocorrelation of each type's
    // daily count series over the zero-filled calendar grid. Deviations
    // are pre-scaled by n (d_t = n·c_t − S — integers, no mean division);
    // acf_ppm(L) = num(L)·10⁶·n div (den·(n−L)) with the num/den
    // products in DECIMAL(38,0) on Spark and HUGEINT in the oracle
    // (sf0.1 already overflows BIGINT in num·10⁶·n; DuckDB's DECIMAL
    // `//` FLOORS while HUGEINT `//` truncates like Spark's div — the
    // negative-autocorrelation parity hinges on both sides truncating).
    // Every frame after the one data-sized count is domain-bounded
    // (|event_type| × calendar days); the lag self-join runs on that
    // grid, never on events.
    Q("ts4_autocorr_daily",
      (s, d) => {
        val maxLag = 14
        val ev = Tables.events(s, d)
          .select(col("event_type"), expr("ts_us_long div 86400000000").as("day"))
        val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        val grid = ev.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
        val cnt = grid.join(
            ev.groupBy("event_type", "day").agg(count(lit(1)).as("c0")),
            Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("c0"), lit(0L)).as("c"))
        val stats = cnt.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("s"))
        val dev = cnt.join(broadcast(stats), "event_type")
          .withColumn("dv", col("n") * col("c") - col("s"))
        val den = dev.groupBy("event_type")
          .agg(sum(expr("CAST(dv AS DECIMAL(38,0)) * dv")).as("den"),
            max("n").as("n"))
        val a = dev.select(col("event_type"), col("day"), col("dv"),
            explode(expr(s"sequence(1, $maxLag)")).as("lag"))
          .withColumn("jday", col("day") + col("lag"))
        val num = a.join(
            dev.select(col("event_type"), col("day").as("jday"),
              col("dv").as("bdv")),
            Seq("event_type", "jday"))
          .groupBy("event_type", "lag")
          .agg(sum(expr("CAST(dv AS DECIMAL(38,0)) * bdv")).as("num"))
        num.join(broadcast(den), "event_type")
          .withColumn("acf_ppm", expr(
            "CAST((num * 1000000 * n) div (den * (n - lag)) AS BIGINT)"))
          .select(col("event_type"), col("lag").cast("long").as("lag"),
            col("acf_ppm"))
          .orderBy("event_type", "lag")
      },
      Some(s"""${QH.evCte},
         |ed AS (SELECT event_type, ts_us_long // 86400000000 AS day FROM ev),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ed),
         |grid AS (SELECT et.event_type, g.day FROM
         |  (SELECT DISTINCT event_type FROM ed) et,
         |  (SELECT unnest(range((SELECT d0 FROM bounds),
         |     (SELECT d1 FROM bounds) + 1)) AS day) g),
         |cnt AS (SELECT g.event_type, g.day, COUNT(e.day) AS c
         |        FROM grid g LEFT JOIN ed e
         |          ON g.event_type = e.event_type AND g.day = e.day
         |        GROUP BY 1, 2),
         |stats AS (SELECT event_type, COUNT(*) AS n, SUM(c) AS s
         |          FROM cnt GROUP BY 1),
         |dev AS (SELECT c.event_type, c.day, st.n * c.c - st.s AS dv
         |        FROM cnt c JOIN stats st USING (event_type)),
         |den AS (SELECT d.event_type, SUM(d.dv::HUGEINT * d.dv) AS den,
         |          ANY_VALUE(st.n) AS n
         |        FROM dev d JOIN stats st USING (event_type) GROUP BY 1),
         |a AS (SELECT event_type, day + l.lag AS jday, dv, l.lag
         |      FROM dev, (SELECT unnest(range(1, 15)) AS lag) l),
         |num AS (SELECT a.event_type, a.lag, SUM(a.dv::HUGEINT * b.dv) AS num
         |        FROM a JOIN dev b
         |          ON a.event_type = b.event_type AND a.jday = b.day
         |        GROUP BY 1, 2)
         |SELECT nm.event_type, CAST(nm.lag AS BIGINT) AS lag,
         |  CAST((nm.num * 1000000 * dn.n) // (dn.den * (dn.n - nm.lag))
         |    AS BIGINT) AS acf_ppm
         |FROM num nm JOIN den dn USING (event_type)
         |ORDER BY nm.event_type, nm.lag""".stripMargin)),

    // Behavioral sequence patterns: each user's journey as the ordered
    // string of event-type initials, regex-counted conversion paths
    // (click → views/errors → purchase) and error bursts. The pattern
    // alphabet is the enumerated type set (strings from ENUMS, never
    // doubles) and the patterns stay in the Java∩RE2 common subset (the
    // t6/t9 rule) with identical non-overlapping left-to-right counting.
    // Per-user strings are the sessionized-behavior representation —
    // bounded by per-user activity (the w1 giant-key caveat applies to
    // pathological single users).
    Q("fn7_sequence_patterns",
      (s, d) => {
        val seqs = Tables.events(s, d)
          .select(col("user_id"),
            struct(col("ts_us_long"), col("event_id"),
              substring(col("event_type"), 1, 1).as("i")).as("__e"))
          .groupBy("user_id")
          .agg(expr("array_join(transform(array_sort(collect_list(__e)), x -> x.i), '')")
            .as("seq"))
        seqs.select(col("user_id"),
            length(col("seq")).cast("long").as("n_events"),
            size(expr("regexp_extract_all(seq, 'c[ve]*p', 0)")).cast("long")
              .as("n_convert"),
            size(expr("regexp_extract_all(seq, 'ee', 0)")).cast("long")
              .as("n_error_bursts"))
          .orderBy("user_id")
      },
      Some(s"""${QH.evCte},
         |s AS (SELECT user_id,
         |        string_agg(substr(event_type, 1, 1), ''
         |          ORDER BY ts_us_long, event_id) AS seq
         |      FROM ev GROUP BY user_id)
         |SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
         |  CAST(len(regexp_extract_all(seq, 'c[ve]*p')) AS BIGINT) AS n_convert,
         |  CAST(len(regexp_extract_all(seq, 'ee')) AS BIGINT) AS n_error_bursts
         |FROM s ORDER BY user_id""".stripMargin)),

    // RFM segmentation: per-customer recency (days since last order,
    // anchored at the corpus max date — pure epoch-microsecond integer
    // division), frequency (order count) and monetary (exact DECIMAL
    // cents), each quintiled by NTILE(5) over a TOTAL order (metric +
    // custkey tiebreak — NTILE is rank-based, no interpolation, so both
    // engines place every customer identically; the llm_corpus_stratify
    // lesson). The ranked frame is the CUSTOMER AGGREGATE — dim-sized,
    // 1:40 of the fact table here; at warehouse scale the same scores
    // come from f18c rank boundaries instead of one global window.
    Q("fn8_rfm_segments",
      (s, d) => {
        val cust = Tables.orders(s, d)
          .select(col("o_custkey"),
            // o_orderdate ships as TIMESTAMP_NTZ; the session is pinned
            // UTC, so the cast is the identity wall-clock and unix_micros
            // equals DuckDB's epoch_us on the same value
            expr("unix_micros(cast(o_orderdate as timestamp))").as("ous"),
            col("o_totalprice"))
          .groupBy("o_custkey")
          .agg(max("ous").as("last_us"),
            count(lit(1)).as("freq"),
            expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)")
              .as("cents"))
        val anchored = cust
          .withColumn("anchor_us", max("last_us").over(Window.partitionBy(lit(1))))
          .withColumn("recency_days",
            expr("(anchor_us - last_us) div 86400000000"))
        val scored = anchored
          .withColumn("r_score",
            ntile(5).over(Window.orderBy(col("recency_days").desc, col("o_custkey"))))
          .withColumn("f_score",
            ntile(5).over(Window.orderBy(col("freq"), col("o_custkey"))))
          .withColumn("m_score",
            ntile(5).over(Window.orderBy(col("cents"), col("o_custkey"))))
        scored.groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_cust"),
            sum("freq").as("sum_orders"),
            sum("cents").as("sum_cents"))
          .orderBy("r_score", "f_score", "m_score")
      },
      Some("""WITH cust AS (
         |  SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS last_us,
         |    COUNT(*) AS freq,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |anch AS (SELECT *, MAX(last_us) OVER () AS anchor_us FROM cust),
         |scored AS (SELECT o_custkey, freq, cents,
         |    (anchor_us - last_us) // 86400000000 AS recency_days,
         |    ntile(5) OVER (ORDER BY (anchor_us - last_us) // 86400000000 DESC,
         |      o_custkey) AS r_score,
         |    ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         |    ntile(5) OVER (ORDER BY cents, o_custkey) AS m_score
         |  FROM anch)
         |SELECT CAST(r_score AS INTEGER) AS r_score,
         |  CAST(f_score AS INTEGER) AS f_score,
         |  CAST(m_score AS INTEGER) AS m_score, COUNT(*) AS n_cust,
         |  CAST(SUM(freq) AS BIGINT) AS sum_orders,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM scored GROUP BY 1, 2, 3
         |ORDER BY r_score, f_score, m_score""".stripMargin)),

    // fn8's SCALABLE sibling (the w1b pattern): identical RFM shape with
    // ZERO global windows — quintile boundaries come from RangeShard's
    // exact distributed selection (Θ(shards) collects, one range shuffle
    // per metric), scores assigned by the codegen'd branch chain over
    // the broadcast cut keys, and the anchor is one driver scalar. Score
    // of the customer at 0-based rank r is the ⌊r·5/n⌋ closed form (on
    // the unique metric·10⁸+custkey key), which the oracle replays via
    // row_number — edge distribution differs from fn8's NTILE by design,
    // each is exactly pinned to its own formula.
    Q("fn8b_rfm_scalable",
      (s, d) => {
        val cust = Tables.orders(s, d)
          .select(col("o_custkey"),
            expr("unix_micros(cast(o_orderdate as timestamp))").as("ous"),
            col("o_totalprice"))
          .groupBy("o_custkey")
          .agg(max("ous").as("last_us"),
            count(lit(1)).as("freq"),
            expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)")
              .as("cents"))
        val anchorUs = cust.agg(max("last_us")).head().getLong(0)
        val base = cust
          .withColumn("recency_days",
            expr(s"(${anchorUs}L - last_us) div 86400000000"))
          .withColumn("rk", expr("recency_days * 100000000L + o_custkey"))
          .withColumn("fk", expr("freq * 100000000L + o_custkey"))
          .withColumn("mk", expr("cents * 100000000L + o_custkey"))
          .localCheckpoint()
        val (_, cutsR) = graft.operators.RangeShard.cuts(base, "rk", 5)
        val (_, cutsF) = graft.operators.RangeShard.cuts(base, "fk", 5)
        val (_, cutsM) = graft.operators.RangeShard.cuts(base, "mk", 5)
        base
          .withColumn("r_score",
            lit(5) - graft.operators.RangeShard.shardCol(col("rk"), cutsR))
          .withColumn("f_score",
            graft.operators.RangeShard.shardCol(col("fk"), cutsF) + lit(1))
          .withColumn("m_score",
            graft.operators.RangeShard.shardCol(col("mk"), cutsM) + lit(1))
          .groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).as("n_cust"),
            sum("freq").as("sum_orders"),
            sum("cents").as("sum_cents"))
          .orderBy("r_score", "f_score", "m_score")
      },
      Some("""WITH cust AS (
         |  SELECT o_custkey, MAX(epoch_us(o_orderdate)) AS last_us,
         |    COUNT(*) AS freq,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
         |  FROM orders GROUP BY 1),
         |nn AS (SELECT COUNT(*) AS n FROM cust),
         |anch AS (SELECT MAX(last_us) AS a FROM cust),
         |k AS (SELECT o_custkey, freq, cents,
         |        ((SELECT a FROM anch) - last_us) // 86400000000 AS rec
         |      FROM cust),
         |sc AS (SELECT o_custkey, freq, cents,
         |    5 - ((row_number() OVER (ORDER BY rec * 100000000 + o_custkey) - 1)
         |      * 5 // (SELECT n FROM nn)) AS r_score,
         |    (row_number() OVER (ORDER BY freq * 100000000 + o_custkey) - 1)
         |      * 5 // (SELECT n FROM nn) + 1 AS f_score,
         |    (row_number() OVER (ORDER BY cents * 100000000 + o_custkey) - 1)
         |      * 5 // (SELECT n FROM nn) + 1 AS m_score
         |  FROM k)
         |SELECT CAST(r_score AS INTEGER) AS r_score,
         |  CAST(f_score AS INTEGER) AS f_score,
         |  CAST(m_score AS INTEGER) AS m_score, COUNT(*) AS n_cust,
         |  CAST(SUM(freq) AS BIGINT) AS sum_orders,
         |  CAST(SUM(cents) AS BIGINT) AS sum_cents
         |FROM sc GROUP BY 1, 2, 3
         |ORDER BY r_score, f_score, m_score""".stripMargin)),

    // Benford first-digit drift: leading digit of the EXACT integer cent
    // value (never a digit of a formatted double) against the hardcoded
    // Benford ppm table (the same literal constants on both engines —
    // log10(1+1/d) is irrational, so the table IS the spec), chi-square
    // in fixed-point ppm through DECIMAL(38,0)/HUGEINT like dq2. All
    // terms non-negative, so DuckDB's flooring HUGEINT // matches
    // Spark's truncating DECIMAL div.
    Q("dq3_benford",
      (s, d) => {
        import s.implicits._
        val benfordPpm = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)
        val obs = Tables.orders(s, d)
          .select(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
            .as("cents"))
          .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS BIGINT)")
            .as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("obs"))
        val pTab = benfordPpm.zipWithIndex
          .map { case (p, i) => (i + 1L, p) }
          .toDF("digit", "p_ppm")
        val wAll = Window.partitionBy(lit(1))
        broadcast(pTab).join(obs, Seq("digit"), "left")
          .withColumn("obs", coalesce(col("obs"), lit(0L)))
          .withColumn("n", sum("obs").over(wAll))
          .withColumn("exp_ppm", col("n") * col("p_ppm"))
          .withColumn("term_ppm", expr(
            """CAST((CAST(obs AS DECIMAL(38,0)) * 1000000 - CAST(n AS DECIMAL(38,0)) * p_ppm)
              |  * (CAST(obs AS DECIMAL(38,0)) * 1000000 - CAST(n AS DECIMAL(38,0)) * p_ppm)
              |  div (CAST(n AS DECIMAL(38,0)) * p_ppm) AS BIGINT)""".stripMargin))
          .withColumn("chi2_total_ppm", sum("term_ppm").over(wAll).cast("long"))
          .select("digit", "obs", "p_ppm", "term_ppm", "chi2_total_ppm")
          .orderBy("digit")
      },
      Some("""WITH p AS (SELECT * FROM (VALUES
         |    (1, 301030), (2, 176091), (3, 124939), (4, 96910), (5, 79181),
         |    (6, 66947), (7, 57992), (8, 51153), (9, 45757)) t(digit, p_ppm)),
         |o AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |          AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         |        COUNT(*) AS c
         |      FROM orders GROUP BY 1),
         |j AS (SELECT p.digit, COALESCE(o.c, 0) AS obs, p.p_ppm,
         |        SUM(COALESCE(o.c, 0)) OVER () AS n
         |      FROM p LEFT JOIN o ON p.digit = o.digit),
         |t AS (SELECT CAST(digit AS BIGINT) AS digit, CAST(obs AS BIGINT) AS obs,
         |        CAST(p_ppm AS BIGINT) AS p_ppm,
         |        CAST((obs::HUGEINT * 1000000 - n::HUGEINT * p_ppm)
         |          * (obs::HUGEINT * 1000000 - n::HUGEINT * p_ppm)
         |          // (n::HUGEINT * p_ppm) AS BIGINT) AS term_ppm
         |      FROM j)
         |SELECT digit, obs, p_ppm, term_ppm,
         |  CAST(SUM(term_ppm) OVER () AS BIGINT) AS chi2_total_ppm
         |FROM t ORDER BY digit""".stripMargin)),

    // Association rules from the mb1 frequent pairs: both directed rules
    // per pair, with support / confidence / lift in integer ppm (exact
    // DECIMAL/HUGEINT division — all non-negative). The rule frame is
    // the FREQUENT-pair set (already support-pruned), so the directed
    // explosion is 2× a filtered set, never 2× all pairs.
    Q("mb2_association_rules",
      (s, d) => {
        val minConfPpm = 100000L
        val (pairs, nOrders) = basketPairs(s, d)
        val rules = pairs.select(col("p1").as("ante"), col("p2").as("cons"),
            col("pair_cnt"), col("sup1").as("sup_ante"), col("sup2").as("sup_cons"))
          .unionByName(pairs.select(col("p2").as("ante"), col("p1").as("cons"),
            col("pair_cnt"), col("sup2").as("sup_ante"), col("sup1").as("sup_cons")))
        rules
          .withColumn("support_ppm", expr(s"pair_cnt * 1000000 div $nOrders"))
          .withColumn("conf_ppm", expr("pair_cnt * 1000000 div sup_ante"))
          .withColumn("lift_ppm",
            expr(s"CAST(CAST(pair_cnt AS DECIMAL(38,0)) * $nOrders * 1000000" +
              " div (CAST(sup_ante AS DECIMAL(38,0)) * sup_cons) AS BIGINT)"))
          .filter(col("conf_ppm") >= minConfPpm)
          .select("ante", "cons", "pair_cnt", "sup_ante", "sup_cons",
            "support_ppm", "conf_ppm", "lift_ppm")
          .orderBy(desc("conf_ppm"), col("ante"), col("cons"))
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
         |sup AS (SELECT l_partkey, COUNT(*) AS item_sup FROM items
         |        GROUP BY 1 HAVING COUNT(*) >= 3),
         |freq AS (SELECT i.l_orderkey, i.l_partkey, s.item_sup
         |         FROM items i JOIN sup s USING (l_partkey)),
         |pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         |            COUNT(*) AS pair_cnt,
         |            MAX(a.item_sup) AS sup1, MAX(b.item_sup) AS sup2
         |          FROM freq a JOIN freq b
         |            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |          GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         |rules AS (
         |  SELECT p1 AS ante, p2 AS cons, pair_cnt,
         |    sup1 AS sup_ante, sup2 AS sup_cons FROM pairs
         |  UNION ALL
         |  SELECT p2, p1, pair_cnt, sup2, sup1 FROM pairs)
         |SELECT ante, cons, pair_cnt, sup_ante, sup_cons,
         |  CAST(pair_cnt * 1000000 // (SELECT n_orders FROM n) AS BIGINT)
         |    AS support_ppm,
         |  CAST(pair_cnt * 1000000 // sup_ante AS BIGINT) AS conf_ppm,
         |  CAST(CAST(pair_cnt AS HUGEINT) * (SELECT n_orders FROM n) * 1000000
         |    // (CAST(sup_ante AS HUGEINT) * sup_cons) AS BIGINT) AS lift_ppm
         |FROM rules
         |WHERE pair_cnt * 1000000 // sup_ante >= 100000
         |ORDER BY conf_ppm DESC, ante, cons""".stripMargin),
      setup = Some((s, d) => { basketPairs(s, d); () })),

    // Dyadic-kernel EWMA trend over the zero-filled global daily count
    // series: smoothed_t = Σ_{j=0..7} c_{t−j}·2^(7−j) (integer numerator,
    // denominator 255 implied) — an exponential smoother whose weights
    // are exact powers of two, so both engines agree bit-for-bit with no
    // float parity machinery at all. Rows start at the first full
    // window; spike days flag where c_t·255 > 2·smoothed (today more
    // than twice the smoothed level). Day grid is domain-bounded (the
    // ts4 calendar-grid idiom).
    Q("ts5_ewma_trend",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("ts_us_long div 86400000000").as("day"))
        val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        val grid = bounds.select(explode(expr("sequence(d0, d1)")).as("day"))
        val cnt = grid.join(
            ev.groupBy("day").agg(count(lit(1)).as("c0")), Seq("day"), "left")
          .select(col("day"), coalesce(col("c0"), lit(0L)).as("c"))
        val w = Window.orderBy("day")
        val lagged = cnt.select(col("day") +: col("c") +:
          (1 to 7).map(j => coalesce(lag(col("c"), j).over(w), lit(-1L))
            .as(s"l$j")): _*)
        lagged
          .filter((1 to 7).map(j => col(s"l$j") >= 0L).reduce(_ && _))
          .withColumn("ewma_num", expr(
            "c * 128 + l1 * 64 + l2 * 32 + l3 * 16 + l4 * 8 + l5 * 4 + l6 * 2 + l7"))
          .withColumn("spike",
            when(col("c") * lit(255L) > lit(2L) * col("ewma_num"), 1L)
              .otherwise(0L))
          .select("day", "c", "ewma_num", "spike")
          .orderBy("day")
      },
      Some(s"""${QH.evCte},
         |ed AS (SELECT ts_us_long // 86400000000 AS day FROM ev),
         |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ed),
         |grid AS (SELECT unnest(range((SELECT d0 FROM bounds),
         |           (SELECT d1 FROM bounds) + 1)) AS day),
         |cnt AS (SELECT g.day, COUNT(e.day) AS c
         |        FROM grid g LEFT JOIN ed e ON g.day = e.day GROUP BY 1),
         |lg AS (SELECT day, c,
         |    COALESCE(lag(c, 1) OVER (ORDER BY day), -1) AS l1,
         |    COALESCE(lag(c, 2) OVER (ORDER BY day), -1) AS l2,
         |    COALESCE(lag(c, 3) OVER (ORDER BY day), -1) AS l3,
         |    COALESCE(lag(c, 4) OVER (ORDER BY day), -1) AS l4,
         |    COALESCE(lag(c, 5) OVER (ORDER BY day), -1) AS l5,
         |    COALESCE(lag(c, 6) OVER (ORDER BY day), -1) AS l6,
         |    COALESCE(lag(c, 7) OVER (ORDER BY day), -1) AS l7
         |  FROM cnt)
         |SELECT day, CAST(c AS BIGINT) AS c,
         |  CAST(c * 128 + l1 * 64 + l2 * 32 + l3 * 16 + l4 * 8 + l5 * 4
         |    + l6 * 2 + l7 AS BIGINT) AS ewma_num,
         |  CAST(CASE WHEN c * 255 > 2 * (c * 128 + l1 * 64 + l2 * 32 + l3 * 16
         |    + l4 * 8 + l5 * 4 + l6 * 2 + l7) THEN 1 ELSE 0 END AS BIGINT)
         |    AS spike
         |FROM lg
         |WHERE l1 >= 0 AND l2 >= 0 AND l3 >= 0 AND l4 >= 0 AND l5 >= 0
         |  AND l6 >= 0 AND l7 >= 0
         |ORDER BY day""".stripMargin)),

    // Fast-vs-slow EWMA divergence (the MACD shape) — ts5 extended to
    // momentum: fast = 8 dyadic taps (denominator 255), slow = 16
    // (denominator 65535); macd_fp = fast·65535 − slow·255 compares them
    // on the common denominator in PURE integers (no float machinery at
    // all); cross = 1 where the divergence sign flips vs the previous
    // day. Day grid is domain-bounded (the ts4 calendar idiom).
    Q("ts7_macd_trend",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("ts_us_long div 86400000000").as("day"))
        val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
        val grid = bounds.select(explode(expr("sequence(d0, d1)")).as("day"))
        val cnt = grid.join(
            ev.groupBy("day").agg(count(lit(1)).as("c0")), Seq("day"), "left")
          .select(col("day"), coalesce(col("c0"), lit(0L)).as("c"))
        val w = Window.orderBy("day")
        val lagged = cnt.select(col("day") +: col("c") +:
          (1 to 15).map(j => coalesce(lag(col("c"), j).over(w), lit(-1L))
            .as(s"l$j")): _*)
        val fast = (("c * 128" +: (1 to 7).map(j => s"l$j * ${1L << (7 - j)}"))
          ).mkString(" + ")
        val slow = (("c * 32768" +: (1 to 15).map(j => s"l$j * ${1L << (15 - j)}"))
          ).mkString(" + ")
        lagged
          .filter((1 to 15).map(j => col(s"l$j") >= 0L).reduce(_ && _))
          .withColumn("fast_num", expr(fast))
          .withColumn("slow_num", expr(slow))
          .withColumn("macd_fp", expr("fast_num * 65535L - slow_num * 255L"))
          .withColumn("sgn", signum(col("macd_fp")).cast("long"))
          .withColumn("cross", when(lag(col("sgn"), 1).over(w).isNull, 0L)
            .otherwise(when(col("sgn") =!= lag(col("sgn"), 1).over(w), 1L)
              .otherwise(0L)))
          .select("day", "c", "fast_num", "slow_num", "macd_fp", "cross")
          .orderBy("day")
      },
      Some {
        val lagCtes = (1 to 15).map(j =>
          s"COALESCE(lag(c, $j) OVER (ORDER BY day), -1) AS l$j").mkString(",\n    ")
        val fast = ("c * 128" +: (1 to 7).map(j => s"l$j * ${1L << (7 - j)}"))
          .mkString(" + ")
        val slow = ("c * 32768" +: (1 to 15).map(j => s"l$j * ${1L << (15 - j)}"))
          .mkString(" + ")
        val guard = (1 to 15).map(j => s"l$j >= 0").mkString(" AND ")
        s"""${QH.evCte},
           |ed AS (SELECT ts_us_long // 86400000000 AS day FROM ev),
           |bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ed),
           |grid AS (SELECT unnest(range((SELECT d0 FROM bounds),
           |           (SELECT d1 FROM bounds) + 1)) AS day),
           |cnt AS (SELECT g.day, COUNT(e.day) AS c
           |        FROM grid g LEFT JOIN ed e ON g.day = e.day GROUP BY 1),
           |lg AS (SELECT day, c,
           |    $lagCtes
           |  FROM cnt),
           |m AS (SELECT day, CAST(c AS BIGINT) AS c,
           |        CAST($fast AS BIGINT) AS fast_num,
           |        CAST($slow AS BIGINT) AS slow_num,
           |        CAST(($fast) * 65535 - ($slow) * 255 AS BIGINT) AS macd_fp
           |      FROM lg WHERE $guard),
           |sg AS (SELECT *, CAST(sign(macd_fp) AS BIGINT) AS sgn,
           |         lag(CAST(sign(macd_fp) AS BIGINT)) OVER (ORDER BY day) AS psgn
           |       FROM m)
           |SELECT day, c, fast_num, slow_num, macd_fp,
           |  CAST(CASE WHEN psgn IS NULL THEN 0
           |       WHEN sgn <> psgn THEN 1 ELSE 0 END AS BIGINT) AS cross
           |FROM sg ORDER BY day""".stripMargin
      }),

    // Functional-dependency / candidate-key audit (Checks.fdAudit): a
    // profiling REPORT over declared rules — key-uniqueness discovery
    // (n_groups == n_rows) and FD checks (every LHS group maps to one RHS
    // value), counted exactly. The schema-inference half of data-quality
    // tooling that dq1's contract check ASSUMES: it tells you which
    // contracts the data actually supports. Each rule is one aggregation
    // keyed on its LHS — no collect, nothing quadratic; the rule list is
    // fixed metadata, not data-derived.
    Q("dq6_fd_audit",
      (s, d) => {
        def t(name: String) = name match {
          case "customer" => Tables.customer(s, d)
          case "lineitem" => Tables.lineitem(s, d)
          case "nation" => Tables.nation(s, d)
          case "orders" => Tables.orders(s, d)
        }
        dq6Rules.map { case (rule, table, lhs, rhs) =>
          Checks.fdAudit(t(table), rule, lhs, rhs)
        }.reduce(_ unionByName _).orderBy("rule")
      },
      Some(dq6Oracle)),

    // Phonetic-blocked entity resolution — er1's sibling with a PHONETIC
    // blocking key instead of the deletion neighborhood: Soundex
    // (Fuzzy.soundexSparkSql, variant pinned there) over the corpus word
    // registry, candidate pairs = within-block only (equi-join on the
    // code — never all-pairs), verified with exact levenshtein. One
    // deterministic deletion-typo per word ≥ 4 chars is planted into the
    // registry at count 0 (the query-log-misspelling premise; corpus
    // vocabulary is the name universe, occurrence counts ride along), so
    // matches exist at any SF: custmer→customer, flter→filter. The er1
    // contract holds — the registry is DISTINCT names, multiplicity stays
    // in the count column.
    Q("er2_soundex_blocking",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("name"))
          .filter(col("name").rlike("^[a-z]{3,}\\z"))
          .groupBy("name").agg(count(lit(1)).as("n"))
        val typos = vocab.filter(length(col("name")) >= 4)
          .select(expr(TextOps.letSql(
            s"cast(${TextOps.md5LongSql("name")} % length(name) as int) + 1", "p")(p =>
              s"concat(substring(name, 1, $p - 1)," +
                s" substring(name, $p + 1, length(name)))")).as("name"),
            lit(0L).as("n"))
        val reg = vocab.unionByName(typos)
          .groupBy("name").agg(sum("n").as("n"))
        // materialize the registry ONCE: both self-join sides read it, and
        // reg's two vocab branches each embed the full corpus explode — an
        // unmaterialized registry re-runs that scan up to 4x in one plan.
        // Query-local checkpoint, freed by the ContextCleaner once the
        // frame is unreachable — reclamation KNOWINGLY rides the harness's
        // untimed inter-run System.gc() (repeated runs hold ≤1 registry
        // each until then; registry is vocab-sized, not corpus-sized)
        val withSx = reg.withColumn("sx", expr(Fuzzy.soundexSparkSql("name")))
          .localCheckpoint(true)
        val a = withSx.select(col("sx"), col("name").as("name1"), col("n").as("n1"))
        val b = withSx.select(col("sx"), col("name").as("name2"), col("n").as("n2"))
        a.join(b, Seq("sx")).filter(col("name1") < col("name2"))
          .withColumn("lev", levenshtein(col("name1"), col("name2")))
          .withColumn("matched", col("lev") <= 2)
          .select(col("sx"), col("name1"), col("name2"), col("lev"),
            col("matched"), col("n1"), col("n2"))
          .orderBy("sx", "name1", "name2")
      },
      Some {
        val md5l = "(('0x' || substr(md5(name), 1, 15))::BIGINT)"
        s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS name FROM documents),
           |vocab AS (SELECT name, COUNT(*) AS n FROM toks
           |          WHERE regexp_matches(name, '^[a-z]{3,}$$') GROUP BY 1),
           |typos AS (SELECT substr(name, 1, p - 1) || substr(name, p + 1, length(name)) AS name,
           |                 CAST(0 AS BIGINT) AS n
           |          FROM (SELECT name, CAST($md5l % length(name) AS INTEGER) + 1 AS p
           |                FROM vocab WHERE length(name) >= 4)),
           |reg AS (SELECT name, CAST(SUM(n) AS BIGINT) AS n FROM
           |        (SELECT * FROM vocab UNION ALL SELECT * FROM typos) GROUP BY name),
           |sx AS (SELECT name, n, ${Fuzzy.soundexDuckSql("name")} AS sx FROM reg)
           |SELECT a.sx, a.name AS name1, b.name AS name2,
           |  CAST(levenshtein(a.name, b.name) AS INTEGER) AS lev,
           |  (levenshtein(a.name, b.name) <= 2) AS matched,
           |  a.n AS n1, b.n AS n2
           |FROM sx a JOIN sx b ON a.sx = b.sx AND a.name < b.name
           |ORDER BY a.sx, name1, name2""".stripMargin
      }),

    // Exact WEIGHTED median (a1 has the plain exact median): per return
    // flag, the smallest price (exact DECIMAL cents) whose cumulative
    // quantity reaches half the flag's total — the lower weighted median,
    // rank-based, no interpolation anywhere (the r10 percentile rule).
    // The cumulative window frame sums INTEGERS (cents-keyed quantity
    // counts), so the frame-order float trap cannot apply; the boundary
    // test is the integer cross-multiplication 2·cum ≥ tot. One groupBy
    // (flag, cents) + per-flag windows over the distinct-price rows.
    Q("a20_weighted_median",
      (s, d) => {
        import org.apache.spark.sql.types.DecimalType
        val base = Tables.lineitem(s, d).select(
          col("l_returnflag"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").as("cents"),
          col("l_quantity").cast("long").as("w"))
        val g = base.groupBy("l_returnflag", "cents").agg(sum("w").as("cw"))
        val cumW = Window.partitionBy("l_returnflag").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totW = Window.partitionBy("l_returnflag")
        g.withColumn("cum", sum("cw").over(cumW))
          .withColumn("tot", sum("cw").over(totW))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy("l_returnflag")
          .agg(max("tot").as("total_qty"), min("cents").as("wmedian_cents"))
          .orderBy("l_returnflag")
      },
      Some(
        """WITH base AS (SELECT l_returnflag,
          |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
          |    CAST(l_quantity AS BIGINT) AS w
          |  FROM lineitem),
          |g AS (SELECT l_returnflag, cents, CAST(SUM(w) AS BIGINT) AS cw
          |      FROM base GROUP BY 1, 2),
          |c AS (SELECT l_returnflag, cents,
          |        SUM(cw) OVER (PARTITION BY l_returnflag ORDER BY cents
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          |        SUM(cw) OVER (PARTITION BY l_returnflag) AS tot
          |      FROM g)
          |SELECT l_returnflag, CAST(MAX(tot) AS BIGINT) AS total_qty,
          |  CAST(MIN(cents) AS BIGINT) AS wmedian_cents
          |FROM c WHERE cum * 2 >= tot
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Join fan-out audit (Checks.fanoutAudit) — the multiplicity half of
    // referential integrity: per star-schema relation, matched dim keys,
    // fact rows riding them, worst and average fan-out (integer ppm). The
    // numbers that predict a join's output size and skew exposure BEFORE
    // running it — dq4 (orphans) and dq6 (FDs) complete the contract
    // triad. One fact aggregation + one dim left join per relation.
    Q("dq7_join_fanout",
      (s, d) => {
        Seq(
          Checks.fanoutAudit(Tables.customer(s, d), "c_custkey",
            Tables.orders(s, d), "o_custkey", "customer -> orders"),
          Checks.fanoutAudit(Tables.nation(s, d), "n_nationkey",
            Tables.customer(s, d), "c_nationkey", "nation -> customer"),
          Checks.fanoutAudit(Tables.orders(s, d), "o_orderkey",
            Tables.lineitem(s, d), "l_orderkey", "orders -> lineitem"),
          Checks.fanoutAudit(Tables.part(s, d), "p_partkey",
            Tables.lineitem(s, d), "l_partkey", "part -> lineitem")
        ).reduce(_ unionByName _).orderBy("relation")
      },
      Some {
        def rel(dim: String, key: String, fact: String, fk: String,
                name: String) =
          s"""SELECT '$name' AS relation,
             |  CAST(COUNT(*) AS BIGINT) AS n_dim,
             |  CAST(COUNT(c) AS BIGINT) AS n_matched_dim,
             |  CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_fact_rows,
             |  CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_fanout,
             |  CAST(CASE WHEN COUNT(c) = 0 THEN 0
             |    ELSE COALESCE(SUM(c), 0) * 1000000 // COUNT(c) END AS BIGINT)
             |    AS avg_fanout_ppm
             |FROM (SELECT d.$key, f.c FROM $dim d LEFT JOIN
             |      (SELECT $fk, COUNT(*) AS c FROM $fact GROUP BY 1) f
             |      ON d.$key = f.$fk)""".stripMargin
        Seq(
          rel("customer", "c_custkey", "orders", "o_custkey",
            "customer -> orders"),
          rel("nation", "n_nationkey", "customer", "c_nationkey",
            "nation -> customer"),
          rel("orders", "o_orderkey", "lineitem", "l_orderkey",
            "orders -> lineitem"),
          rel("part", "p_partkey", "lineitem", "l_partkey",
            "part -> lineitem")
        ).mkString("", "\nUNION ALL\n", "\nORDER BY relation")
      }))

  /** The audited rules: (rule label, table, LHS columns, RHS column or
    * None for a uniqueness/candidate-key check). Shared verbatim by the
    * Spark side and the oracle generator so labels can never drift. */
  private def dq6Rules: Seq[(String, String, Seq[String], Option[String])] = Seq(
    ("customer: c_custkey -> c_nationkey", "customer",
      Seq("c_custkey"), Some("c_nationkey")),
    ("lineitem: (l_orderkey, l_linenumber) unique", "lineitem",
      Seq("l_orderkey", "l_linenumber"), None),
    ("lineitem: l_orderkey -> l_returnflag", "lineitem",
      Seq("l_orderkey"), Some("l_returnflag")),
    ("nation: n_nationkey -> n_regionkey", "nation",
      Seq("n_nationkey"), Some("n_regionkey")),
    ("orders: o_custkey -> o_orderpriority", "orders",
      Seq("o_custkey"), Some("o_orderpriority")),
    ("orders: o_orderkey unique", "orders",
      Seq("o_orderkey"), None))

  private def dq6Oracle: String = {
    val parts = dq6Rules.map { case (rule, table, lhs, rhs) =>
      val inner = rhs match {
        case Some(r) => s"SELECT COUNT(*) AS n, COUNT(DISTINCT $r)" +
          s" + MAX(CASE WHEN $r IS NULL THEN 1 ELSE 0 END) AS nd" +
          s" FROM $table GROUP BY ${lhs.mkString(", ")}"
        case None => s"SELECT COUNT(*) AS n, 1 AS nd" +
          s" FROM $table GROUP BY ${lhs.mkString(", ")}"
      }
      val viol = if (rhs.isDefined) "nd > 1" else "n > 1"
      s"""SELECT '$rule' AS rule, CAST(SUM(n) AS BIGINT) AS n_rows,
         |  COUNT(*) AS n_groups,
         |  CAST(SUM(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |  CAST(SUM(CASE WHEN $viol THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds
         |FROM ($inner)""".stripMargin
    }
    parts.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }
}
