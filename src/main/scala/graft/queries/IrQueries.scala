package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ir

/** Keyword-retrieval catalog entries (operators/Ir.scala): integer-exact
  * BM25 search over an inverted posting index, the persisted-index
  * variant, and positional phrase search. The search twin of the ANN
  * family — see Ir.scala's scaladoc for the scale shape.
  */
object IrQueries {

  /** The fixed query set: literal (query_id, term) rows — mixed document
    * frequencies (dup df≈5% of docs; the rest common terms), one
    * no-hit query exercising the empty path. Shared verbatim by the
    * Spark frame and the oracle VALUES list. */
  private val bm25Queries: Seq[(Long, String)] = Seq(
    0L -> "dup",
    1L -> "hash", 1L -> "join",
    2L -> "dup", 2L -> "merge", 2L -> "batch",
    3L -> "vector", 3L -> "scan",
    4L -> "the", 4L -> "fast", 4L -> "key", 4L -> "query",
    5L -> "zzz_missing")

  /** Phrase set for ir3 — includes a self-overlapping phrase (dup dup) and
    * a 3-word phrase. */
  private val phrases: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("hash", "join"),
    1 -> Seq("slow", "fast", "table"),
    2 -> Seq("dup", "dup"),
    3 -> Seq("the", "fast"))

  private val topK = 10

  /** ir2's persisted artifact: postings + term df + (N, T) stats, memoized
    * per sf dir with eager localCheckpoints (the d13/d15/d16 pattern —
    * setup-warmed in Bench, built on demand in Verify). */
  private final case class IrIndex(post: org.apache.spark.sql.DataFrame,
                                   dfreq: org.apache.spark.sql.DataFrame,
                                   n: Long, t: Long)
  private val irIndexes =
    scala.collection.concurrent.TrieMap.empty[String, IrIndex]
  private def irIndex(s: org.apache.spark.sql.SparkSession, d: String): IrIndex =
    QH.sessionMemo(irIndexes, d, s)(_.post) {
      val post = Ir.postings(Tables.documents(s, d), "doc_id", "text")
        .localCheckpoint(true)
      val dfreq = Ir.docFreq(post).localCheckpoint(true)
      val (n, t) = Ir.corpusStats(Tables.documents(s, d), "doc_id", "text")
      IrIndex(post, dfreq, n, t)
    }

  private def queriesDf(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    bm25Queries.toDF("query_id", "term")
  }

  /** Shared BM25 oracle WITH-body (through CTE `ranked`): the full index
    * build + search replayed in DuckDB — HUGEINT products, `//`
    * floor-division, identical stopword gate and tiebreaks. ir1/ir2 cut it
    * at rank ≤ topK; ir4 reuses it as the sparse leg at rank ≤ legK. */
  private val bm25Ctes: String = {
    val values = bm25Queries.map { case (q, w) => s"($q, '$w')" }.mkString(", ")
    s"""docs AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
       |docl AS (SELECT doc_id, CAST(len(list_filter(tl, x -> x <> '')) AS BIGINT) AS dl
       |         FROM docs),
       |tf AS (SELECT doc_id, t AS term, COUNT(*) AS tf
       |       FROM (SELECT doc_id, unnest(tl) AS t FROM docs)
       |       WHERE t <> '' GROUP BY 1, 2),
       |post AS (SELECT term, tf.doc_id, tf.tf, docl.dl
       |         FROM tf JOIN docl USING (doc_id)),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
       |stats AS (SELECT COUNT(*)::HUGEINT AS n, SUM(dl)::HUGEINT AS t FROM docl),
       |q(query_id, term) AS (VALUES $values),
       |cand AS (SELECT q.query_id, p.doc_id,
       |           SUM(${Ir.termScoreOracleSql("st.n", "st.t")}) AS score_fp
       |         FROM post p
       |         JOIN dfreq USING (term)
       |         JOIN q ON q.term = p.term
       |         CROSS JOIN stats st
       |         WHERE df * 10 < st.n * 9
       |         GROUP BY 1, 2),
       |ranked AS (SELECT query_id, doc_id, score_fp,
       |             row_number() OVER (PARTITION BY query_id
       |               ORDER BY score_fp DESC, doc_id) AS rank
       |           FROM cand)""".stripMargin
  }

  private val bm25Oracle: String =
    s"""WITH $bm25Ctes
       |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       |  doc_id, CAST(score_fp AS BIGINT) AS score_fp
       |FROM ranked WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** ir4 knobs: each leg contributes its top-`legK`; RRF constant 60 (the
    * original paper's value); final cut topK. Dense query ids 0..5 align
    * with the sparse query ids by construction (vec_id ≡ doc_id spaces). */
  private val legK = 20
  private val rrfK = 60

  /** DuckDB cosine twin (same left-fold accumulation order as the native
    * DotProduct expression — per-row doubles are bit-identical, and only
    * their ORDERING feeds the fused ranks). */
  private def dCos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> $x[i] * $y[i]))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** ir4's oracle: sparse leg = the bm25 chain cut at legK; dense leg =
    * brute-force cosine ranks cut at legK; fusion = Σ 10⁶ // (60 + rank)
    * (positive integer division — engine-exact), re-ranked per query. */
  private val hybridOracle: String =
    s"""WITH $bm25Ctes,
       |emb AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |        FROM embeddings),
       |dq AS (SELECT vec_id AS query_id, v AS qvec FROM emb WHERE vec_id < 6),
       |ds AS (SELECT query_id, emb.vec_id AS doc_id, ${dCos("qvec", "emb.v")} AS sim
       |       FROM emb CROSS JOIN dq WHERE emb.vec_id <> query_id),
       |dr AS (SELECT query_id, doc_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rank
       |       FROM ds),
       |legs AS (SELECT CAST(query_id AS BIGINT) AS query_id,
       |           CAST(doc_id AS BIGINT) AS doc_id, CAST(rank AS BIGINT) AS rank
       |         FROM ranked WHERE rank <= $legK
       |         UNION ALL
       |         SELECT CAST(query_id AS BIGINT), CAST(doc_id AS BIGINT),
       |           CAST(rank AS BIGINT)
       |         FROM dr WHERE rank <= $legK),
       |fused AS (SELECT query_id, doc_id,
       |            CAST(SUM(1000000 // ($rrfK + rank)) AS BIGINT) AS rrf_fp,
       |            COUNT(*) AS n_legs
       |          FROM legs GROUP BY 1, 2),
       |fr AS (SELECT query_id, doc_id, rrf_fp, n_legs,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY rrf_fp DESC, doc_id) AS rank
       |       FROM fused)
       |SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, rrf_fp,
       |  CAST(n_legs AS BIGINT) AS n_legs
       |FROM fr WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  private val phraseOracle: String = {
    val legs = phrases.map { case (pid, words) =>
      val joins = words.zipWithIndex.tail.map { case (w, i) =>
        s"JOIN pos t$i ON t$i.doc_id = t0.doc_id AND t$i.pos = t0.pos + $i AND t$i.term = '$w'"
      }.mkString(" ")
      s"""SELECT CAST($pid AS BIGINT) AS phrase_id, t0.doc_id, COUNT(*) AS n_occ
         |FROM pos t0 $joins WHERE t0.term = '${words.head}' GROUP BY 1, 2""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
       |pos AS (SELECT doc_id, t AS term, CAST(p AS BIGINT) AS pos
       |        FROM (SELECT doc_id, unnest(tl) AS t,
       |                generate_subscripts(tl, 1) AS p FROM docs)
       |        WHERE t <> ''),
       |occ AS ($legs),
       |ranked AS (SELECT phrase_id, doc_id, n_occ,
       |             row_number() OVER (PARTITION BY phrase_id
       |               ORDER BY n_occ DESC, doc_id) AS rank
       |           FROM occ)
       |SELECT phrase_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(n_occ AS BIGINT) AS n_occ
       |FROM ranked WHERE rank <= $topK ORDER BY phrase_id, rank""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // Full-pipeline BM25 search: build postings + df + stats, then rank
    // the fixed query set. Integer-exact scoring end to end (see
    // Ir.scala's float-parity note); two-phase per-query top-k.
    Q("ir1_bm25_topk",
      (s, d) => {
        val post = Ir.postings(Tables.documents(s, d), "doc_id", "text")
        val dfreq = Ir.docFreq(post)
        val (n, t) = Ir.corpusStats(Tables.documents(s, d), "doc_id", "text")
        Ir.bm25TopK(post, dfreq, n, t, queriesDf(s), topK)
          .orderBy("query_id", "rank")
      },
      Some(bm25Oracle)),

    // The PERSISTED-INDEX search — the deployment shape: postings, df and
    // stats are a setup-warmed localCheckpoint artifact (the s7/d16b
    // persisted-artifact premise), so the timed work is ONLY the
    // broadcast-filtered probe + scoring + top-k. Same oracle as ir1.
    Q("ir2_bm25_persisted",
      (s, d) => {
        val ix = irIndex(s, d)
        Ir.bm25TopK(ix.post, ix.dfreq, ix.n, ix.t, queriesDf(s), topK)
          .orderBy("query_id", "rank")
      },
      Some(bm25Oracle),
      setup = Some((s, d) => { irIndex(s, d); () })),

    // Positional phrase search: m-way (doc, pos−i) equi-join over the
    // positional postings, each leg map-side filtered to one term. The
    // oracle replays ADJACENCY (not substring-replace counting — replace
    // is non-overlapping so it undercounts self-overlapping phrases like
    // 'dup dup').
    Q("ir3_phrase_topk",
      (s, d) => Ir.phraseTopK(
          Ir.positionalPostings(Tables.documents(s, d), "doc_id", "text"),
          phrases, topK)
        .orderBy("phrase_id", "rank"),
      Some(phraseOracle)),

    // HYBRID retrieval — the RAG-pipeline shape: a sparse BM25 leg (the
    // persisted posting index) and a dense cosine leg (the embedding
    // table, vec_id ≡ doc_id) fused by integer reciprocal-rank fusion
    // (Σ 10⁶ div (60 + rank) — no doubles in the score). Query 5 has no
    // sparse hits, exercising the single-leg path; queries 0–4 fuse both.
    // Each leg is already scale-safe on its own; the fusion only ever
    // sees ≤ legs·legK rows per query (Ir.rrfFuse scaladoc).
    Q("ir4_hybrid_rrf",
      (s, d) => {
        val ix = irIndex(s, d)
        val sparse = Ir.bm25TopK(ix.post, ix.dfreq, ix.n, ix.t,
            queriesDf(s), legK)
          .select("query_id", "doc_id", "rank")
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("v"))
        val q = e.filter(col("vec_id") < 6)
          .select(col("vec_id").as("qid"), col("v").as("qvec"))
        val c = e.select(col("vec_id").as("cid"), col("v").as("cvec"))
        val dense = graft.operators.Similarity.bruteForceTopK(q, c, legK)
          .select(col("qid").as("query_id"), col("cid").as("doc_id"),
            col("rank"))
        Ir.rrfFuse(Seq(sparse, dense), topK, rrfK)
          .orderBy("query_id", "rank")
      },
      Some(hybridOracle),
      setup = Some((s, d) => { irIndex(s, d); () })),

    // Proximity-snippet ranking: per query, the docs whose best 10-token
    // span covers the most DISTINCT query terms, with the span start —
    // the passage-selection step after retrieval, and a proximity signal
    // bag-of-words BM25 cannot see. Postings are query-term-filtered
    // BEFORE any join; the anchor join is bounded per doc by its
    // query-term occurrence count squared. All integer.
    Q("ir5_proximity_snippet",
      (s, d) => Ir.proximityTopK(
          Ir.positionalPostings(Tables.documents(s, d), "doc_id", "text"),
          queriesDf(s), window = 10, k = 5)
        .orderBy("query_id", "rank"),
      Some {
        val values = bm25Queries.map { case (q, w) => s"($q, '$w')" }.mkString(", ")
        s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS tl FROM documents),
           |pos AS (SELECT doc_id, t AS term, CAST(p AS BIGINT) AS pos
           |        FROM (SELECT doc_id, unnest(tl) AS t,
           |                generate_subscripts(tl, 1) AS p FROM docs)
           |        WHERE t <> ''),
           |q(query_id, term) AS (VALUES $values),
           |qt AS (SELECT DISTINCT query_id, term FROM q),
           |occ AS (SELECT qt.query_id, pos.doc_id, pos.term, pos.pos
           |        FROM pos JOIN qt ON pos.term = qt.term),
           |spans AS (SELECT a.query_id, a.doc_id, a.pos AS apos,
           |            COUNT(DISTINCT o.term) AS n_terms
           |          FROM occ a JOIN occ o
           |            ON o.query_id = a.query_id AND o.doc_id = a.doc_id
           |           AND o.pos >= a.pos AND o.pos < a.pos + 10
           |          GROUP BY 1, 2, 3),
           |best AS (SELECT query_id, doc_id, n_terms, apos AS best_pos,
           |           row_number() OVER (PARTITION BY query_id, doc_id
           |             ORDER BY n_terms DESC, apos) AS brn
           |         FROM spans),
           |r AS (SELECT query_id, doc_id, n_terms, best_pos,
           |        row_number() OVER (PARTITION BY query_id
           |          ORDER BY n_terms DESC, doc_id) AS rank
           |      FROM best WHERE brn = 1)
           |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
           |  doc_id, CAST(n_terms AS BIGINT) AS n_terms, best_pos
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
      }),

    // Multi-vector late-interaction retrieval — the ColBERT MaxSim shape
    // (Khattab & Zaharia 2020): each item is a BAG of token vectors and
    // score(q, c) = Σ over query tokens of the max dot against any
    // candidate token. Token vectors here are the 8 contiguous 8-dim
    // sub-vectors of the embedding (a deterministic stand-in for per-token
    // encoder output — the Spark-side plumbing is the real thing),
    // int8-quantized at the pinned power-of-two scale 256 so every dot is
    // the exact integer kernel (QuantizedDot) and the oracle replays it
    // bit-for-bit. Scale shape: the 160-row query token set BROADCASTS,
    // candidate tokens stream through the codegen'd dot without
    // shuffling; the per-(query, cand, qtoken) max and per-(query, cand)
    // sum are map-side-combined aggregations. This is the exact
    // brute-force baseline (s1's role) — at corpus scale the candidate
    // set is first bounded by an ANN prefilter (s3/s4's machinery).
    Q("ir6_maxsim_topk",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import graft.functions.QuantizedVec
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"),
            expr("transform(embedding, x -> cast(x as double))").as("v"))
        val sub = array((0 until 8).map(i =>
          QuantizedVec.quantizeInt8(expr(s"slice(v, ${i * 8 + 1}, 8)"), 256.0)): _*)
        val toks = e.select(col("vec_id"), posexplode(sub).as(Seq("ti", "tq")))
        val qt = toks.filter(col("vec_id") >= 100 && col("vec_id") < 120)
          .select(col("vec_id").as("qid"), col("ti").as("qi"), col("tq").as("qq"))
        val ct = toks.select(col("vec_id").as("cid"), col("tq").as("cq"))
        val perTok = ct.join(broadcast(qt), col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"), col("qi"),
            QuantizedVec.quantizedDot(col("qq"), col("cq")).as("dot"))
          .groupBy("qid", "cid", "qi").agg(max("dot").as("m"))
        val scored = perTok.groupBy("qid", "cid").agg(sum("m").as("score"))
        val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid"))
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("qid"), col("rank").cast("int").as("rank"),
            col("cid"), col("score"))
          .orderBy("qid", "rank")
      },
      Some {
        val quant8 = (v: String) =>
          s"list_transform($v, x -> CAST(GREATEST(-127, LEAST(127, FLOOR(x * 256.0))) AS BIGINT))"
        val dot8 = (a: String, b: String) =>
          s"CAST(list_sum(list_transform(range(1, 9), i -> $a[i] * $b[i])) AS BIGINT)"
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |           FROM embeddings),
           |toks AS (SELECT vec_id, ti,
           |    ${quant8("list_slice(v, ti * 8 + 1, ti * 8 + 8)")} AS tq
           |  FROM e, (SELECT unnest(range(0, 8)) AS ti)),
           |q AS (SELECT vec_id AS qid, ti AS qi, tq AS qq FROM toks
           |      WHERE vec_id >= 100 AND vec_id < 120),
           |c AS (SELECT vec_id AS cid, tq AS cq FROM toks),
           |pt AS (SELECT qid, cid, qi, MAX(${dot8("qq", "cq")}) AS m
           |       FROM c JOIN q ON qid <> cid GROUP BY qid, cid, qi),
           |sc AS (SELECT qid, cid, CAST(SUM(m) AS BIGINT) AS score
           |       FROM pt GROUP BY qid, cid),
           |r AS (SELECT qid, cid, score,
           |        row_number() OVER (PARTITION BY qid
           |          ORDER BY score DESC, cid) AS rank
           |      FROM sc)
           |SELECT qid, CAST(rank AS INTEGER) AS rank, cid, score
           |FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
      }))
}
