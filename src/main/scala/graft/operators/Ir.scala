package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the term-based search modality next
  * to the embedding ANN family (Similarity.scala): an inverted posting
  * index plus integer-exact BM25 ranking and positional phrase search.
  *
  * Reference scope: the reference's search surfaces are driver-side API
  * calls over an external search service (e.g. the dataset search used by
  * `dgv/metrics` consumers); the ENGINE-side capability a migrating user
  * needs is "build the index from the corpus and rank documents for a
  * query set", which is what this module provides Spark-first.
  *
  * Scale shape (100 TB):
  *  - The posting index is keyed on the TERM — a content-derived key space
  *    that grows with the corpus vocabulary (the bucketed-similarity
  *    invariant). Building it is ONE shuffle (groupBy (doc, term)) plus a
  *    term-keyed df aggregate.
  *  - Search broadcasts the QUERY side (queries are small by nature), so
  *    the posting scan is map-side filtered to query terms before any
  *    shuffle; scoring aggregates per (query, doc) with map-side combine.
  *  - Stopword postings are the skew: terms with df ≥ maxDfFrac·N are
  *    excluded from candidate generation by an exact integer rule
  *    (10·df ≥ 9·N by default) — standard IR stopword elimination, and at
  *    scale it is what keeps a single query term from dragging a
  *    corpus-sized posting list through the ranking shuffle.
  *  - Per-query top-k runs TWO-PHASE: a local rank over
  *    (query, shuffle-partition) first, so the final per-query window sees
  *    at most k·P rows instead of every candidate — few-queries-many-
  *    candidates is exactly the agg-then-window skew AQE cannot split.
  *
  * Float parity: scoring is integer end-to-end. The BM25 tf-saturation
  * term is kept as an EXACT RATIONAL (k1 = 6/5, b = 3/4 multiplied
  * through; avgdl = T/N substituted so the denominator is integer), and
  * idf uses the linear surrogate (N − df)·10⁶ div N + 1 — ln() is
  * libm-bound and engine-version-sensitive (the repo invariant), while the
  * surrogate is monotone in df, discriminative at every ratio, and
  * bit-identical on any engine. Products run in DECIMAL(38,0) (HUGEINT on
  * DuckDB) so the arithmetic never overflows at corpus scale; the final
  * floor-division lands back in BIGINT (score ≤ 2.2·10⁶).
  */
object Ir {

  /** Inverted postings: one row per (term, doc) with the term frequency
    * and the document length in tokens. Tokens are whitespace splits
    * (≡ DuckDB `string_split(text, ' ')`), empty tokens dropped.
    * ZERO shuffle: the native codegen'd
    * [[graft.functions.TermCounts]] kernel emits each document's distinct
    * (term, tf, dl) structs in one byte scan, so the posting rows are a
    * pure explode — the (doc, term) groupBy this plan once needed (the
    * build's only corpus-wide shuffle) is gone, and the streaming
    * maintainer can run the SAME code as a stateless per-row transform. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.TermCounts.termCounts(col(textCol))).as("__tc"))
      .select(col("__tc.term").as("term"), col("doc_id"),
        col("__tc.tf").as("tf"), col("__tc.dl").as("dl"))

  /** Per-term document frequency over a postings frame (term-keyed agg —
    * the second, vocabulary-sized shuffle of the index build). */
  def docFreq(post: DataFrame): DataFrame =
    post.groupBy("term").agg(count(lit(1)).as("df"))

  /** Corpus stats (N docs, T total tokens) — two scalars, a sanctioned
    * driver-side aggregate (the bin-edges precedent): they parameterize
    * the scoring expression as literals. Computed from the DOCS frame,
    * not postings, so zero-token documents still count toward N (the
    * oracle's docl CTE semantics). */
  def corpusStats(docs: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    val r = docs
      .select(expr(s"size(filter(split($textCol, ' '), t -> t <> ''))")
        .cast("long").as("dl"))
      .agg(count(lit(1)), sum("dl")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Per-term integer BM25 contribution (k1 = 1.2, b = 0.75):
    * idf_ppm · 22·tf·T div (10·tf·T + 3·T + 9·dl·N), all DECIMAL(38,0)
    * until the floor-division. Algebra: tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
    * with avgdl = T/N multiplied through by 10·T. */
  private def termScoreSql(n: Long, t: Long): String = {
    val (nD, tD) = (s"CAST($n AS DECIMAL(38,0))", s"CAST($t AS DECIMAL(38,0))")
    s"""CAST(((( ($n - df) * 1000000L div $n ) + 1L)
       | * (22 * CAST(tf AS DECIMAL(38,0)) * $tD))
       | div (10 * CAST(tf AS DECIMAL(38,0)) * $tD + 3 * $tD
       |      + 9 * CAST(dl AS DECIMAL(38,0)) * $nD) AS BIGINT)""".stripMargin
  }

  /** DuckDB twin of [[termScoreSql]] — HUGEINT products, `//` floor-div. */
  def termScoreOracleSql(n: String, t: String): String =
    s"""CAST((((($n - df) * 1000000 // $n) + 1)
       | * (22 * tf::HUGEINT * $t))
       | // (10 * tf::HUGEINT * $t + 3 * ($t)::HUGEINT
       |     + 9 * dl::HUGEINT * $n) AS BIGINT)""".stripMargin

  /** Exact integer stopword gate: candidate terms must satisfy
    * 10·df < 9·N (df below 90% of the corpus). */
  private def keepTerm(n: Long): Column = col("df") * 10 < lit(n) * 9

  /** BM25 top-k search of `queries` (query_id, term — one row per query
    * term, duplicates allowed and counted once: query tf is clamped to
    * presence, the common bag-of-words simplification) against a postings
    * frame. Two-phase per-query top-k (see object doc). Deterministic:
    * ties break by doc_id ascending.
    *
    * @return (query_id, rank, doc_id, score_fp) ordered by (query_id, rank)
    */
  def bm25TopK(post: DataFrame, dfreq: DataFrame, n: Long, t: Long,
               queries: DataFrame, k: Int): DataFrame = {
    val qTerms = queries.select(col("query_id"), col("term")).distinct()
    val cand = post
      .join(dfreq.filter(keepTerm(n)), "term")
      .join(broadcast(qTerms), "term")
      .withColumn("__s", expr(termScoreSql(n, t)))
      .groupBy("query_id", "doc_id")
      .agg(sum("__s").as("score_fp"))
    val local = Window.partitionBy(col("query_id"), col("__pp"))
      .orderBy(col("score_fp").desc, col("doc_id"))
    val global = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("doc_id"))
    cand
      .withColumn("__pp", spark_partition_id())
      .withColumn("__lr", row_number().over(local)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score_fp"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of per-query ranked
    * lists — the standard hybrid-retrieval combiner: each leg (a sparse
    * BM25 ranking, a dense ANN ranking, …) contributes 1/(kConst + rank)
    * per document, scaled to the EXACT integer 10⁶ div (kConst + rank) so
    * cross-engine addition order cannot matter (positive integer division
    * truncates identically everywhere — no doubles touch the score).
    *
    * Scale shape: every leg is already a per-query TOP-K frame, so the
    * fusion input is ≤ legs·k·|Q| rows regardless of corpus size — the
    * heavy lifting lives inside each leg (posting probe / bucketed ANN),
    * and the fuse itself is one tiny query-keyed aggregate plus the
    * per-query window over ≤ legs·k rows. Nothing here ever touches the
    * corpus.
    *
    * @param legs frames of (query_id, doc_id, rank) — rank 1-based
    * @return (query_id, rank, doc_id, rrf_fp, n_legs) top-k per query,
    *         ties broken by doc_id ascending
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, kConst: Int = 60): DataFrame = {
    val u = legs.map(_.select(col("query_id").cast("long").as("query_id"),
        col("doc_id").cast("long").as("doc_id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
    val fused = u.groupBy("query_id", "doc_id")
      .agg(sum(expr(s"1000000L div (${kConst}L + rank)")).as("rrf_fp"),
        count(lit(1)).as("n_legs"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_fp").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("rrf_fp"), col("n_legs"))
  }

  /** Positional postings: one row per token occurrence (term, doc_id, pos)
    * with pos 1-based — the phrase-search index. Zero aggregation: the
    * index IS the exploded token stream, partitioned by term at write
    * time in a deployment. */
  def positionalPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), posexplode(TextOps.tokens(col(textCol)))
        .as(Seq("__p0", "term")))
      .filter(col("term") =!= "")
      .select(col("term"), col("doc_id"), (col("__p0") + 1).cast("long").as("pos"))

  /** Proximity-snippet ranking: for each query, the documents whose best
    * `window`-token span covers the most DISTINCT query terms — the
    * snippet/passage selection step after retrieval (and a proximity
    * ranking signal BM25's bag-of-words cannot see). An anchor is any
    * query-term occurrence; its span covers occurrences in
    * [pos, pos + window). Per (query, doc) the best anchor maximizes
    * (n_terms, earliest pos); per query, docs rank (n_terms desc, doc_id).
    *
    * Scale shape: the positional postings are map-side filtered to QUERY
    * terms before anything joins (queries broadcast — small by nature),
    * so the anchor×occurrence join is bounded per document by the square
    * of its query-term occurrence count, never by document length; the
    * aggregation is keyed on (query, doc, anchor) with map-side combine.
    * All integer.
    *
    * @return (query_id, rank, doc_id, n_terms, best_pos) */
  def proximityTopK(pos: DataFrame, queries: DataFrame, window: Int,
                    k: Int): DataFrame = {
    val qTerms = queries.select(col("query_id"), col("term")).distinct()
    val occ = pos.join(broadcast(qTerms), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term"), col("pos"))
    val anchors = occ.select(col("query_id"), col("doc_id"), col("pos").as("apos"))
    val spans = anchors.join(occ, Seq("query_id", "doc_id"))
      .filter(col("pos") >= col("apos") && col("pos") < col("apos") + window)
      .groupBy("query_id", "doc_id", "apos")
      .agg(countDistinct("term").as("n_terms"))
    val best = spans.groupBy("query_id", "doc_id")
      .agg(max(struct(col("n_terms"), (-col("apos")).as("__np"))).as("__b"))
      .select(col("query_id"), col("doc_id"),
        col("__b.n_terms").as("n_terms"), (-col("__b.__np")).as("best_pos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_terms").desc, col("doc_id"))
    best.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_terms"), col("best_pos"))
  }

  /** Exact phrase search: a phrase w₁…wₘ matches at position p when wᵢ
    * occurs at p+i−1 for every i — an m-way equi-join on
    * (doc_id, pos − offset), each leg map-side filtered to one term.
    * Occurrences may overlap (distinct start positions count separately —
    * the honest adjacency semantic, NOT substring-replace counting).
    * Ranking: occurrence count desc, doc_id asc.
    *
    * @param phrases (phrase_id, Seq(words)) — literal phrases, ≥ 1 word
    * @return (phrase_id, rank, doc_id, n_occ) ordered by (phrase_id, rank)
    */
  def phraseTopK(pos: DataFrame, phrases: Seq[(Int, Seq[String])], k: Int): DataFrame = {
    val perPhrase = phrases.map { case (pid, words) =>
      val base = pos.filter(col("term") === words.head)
        .select(col("doc_id"), col("pos").as("start"))
      val matched = words.zipWithIndex.tail.foldLeft(base) { case (acc, (w, i)) =>
        acc.join(
          pos.filter(col("term") === w)
            .select(col("doc_id"), (col("pos") - i).as("start")),
          Seq("doc_id", "start"))
      }
      matched.groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
        .withColumn("phrase_id", lit(pid.toLong))
    }
    val all = perPhrase.reduce(_ unionByName _)
    val w = Window.partitionBy(col("phrase_id"))
      .orderBy(col("n_occ").desc, col("doc_id"))
    all.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("phrase_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("n_occ"))
  }
}
