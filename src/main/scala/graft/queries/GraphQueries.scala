package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph-centrality catalog entries (operators/Graph.scala): TextRank
  * keyword centrality and seeded (personalized) PageRank over the word
  * co-occurrence graph. The oracle replays the SAME integer fixed-point
  * iteration, unrolled as one CTE per round — every per-edge contribution
  * floor-divided identically, so the chain is bit-exact on any engine. */
object GraphQueries {

  private val iters = 8

  private val edgeCtes =
    """toks AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tl
      |          FROM documents),
      |adj AS (SELECT tl[i] AS a, tl[i + 1] AS b
      |        FROM (SELECT tl, unnest(range(1, len(tl))) AS i FROM toks)
      |        WHERE tl[i] <> tl[i + 1]),
      |edges AS (SELECT src, dst, COUNT(*) AS w FROM (
      |            SELECT a AS src, b AS dst FROM adj
      |            UNION ALL
      |            SELECT b AS src, a AS dst FROM adj)
      |          GROUP BY 1, 2),
      |nodes AS (SELECT DISTINCT src AS node FROM edges
      |          UNION SELECT DISTINCT dst AS node FROM edges),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |ow AS (SELECT src, SUM(w) AS wout FROM edges GROUP BY 1)""".stripMargin

  private def iterCte(prev: String, cur: String, baseSql: String): String =
    s"""$cur AS (SELECT n0.node,
       |  $baseSql
       |  + COALESCE(SUM((${Graph.DampNum}::HUGEINT * e.w * rp.rank_fp)
       |                 // (${Graph.DampDen}::HUGEINT * ow.wout)), 0)::BIGINT AS rank_fp
       |FROM nodes n0 CROSS JOIN nn
       |LEFT JOIN edges e ON e.dst = n0.node
       |LEFT JOIN $prev rp ON rp.node = e.src
       |LEFT JOIN ow ON ow.src = e.src
       |GROUP BY n0.node, nn.n)""".stripMargin

  private def prOracle(r0Sql: String, baseSql: String): String = {
    val chain = (1 to iters).map(i => iterCte(s"r${i - 1}", s"r$i", baseSql))
      .mkString(",\n")
    s"""WITH $edgeCtes,
       |r0 AS (SELECT node, $r0Sql AS rank_fp FROM nodes CROSS JOIN nn),
       |$chain
       |SELECT node AS term, rank_fp FROM r$iters
       |ORDER BY rank_fp DESC, term""".stripMargin
  }

  /** Teleport seed for g2 — the corpus' rare marker term (df ≈ 5% of
    * docs), so personalized ranks measure adjacency to a distinctive
    * context rather than reproducing global centrality. */
  private val seedTerm = "dup"

  private val kcoreK = 75
  private val kcoreRounds = 8
  private val hitsIters = 6
  private val ssspRounds = 4

  /** Unrolled HITS chain: one MATERIALIZED CTE per half-step (raw sums,
    * then the exact renormalization `raw·10⁹ // Σraw` in HUGEINT — the
    * Spark side divides in DECIMAL(38,0), bit-identical for positive
    * values). Multiply-referenced CTEs are MATERIALIZED (the kcore
    * unroll lesson). */
  private def hitsOracle: String = {
    val dirEdges =
      """toks AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tl
        |          FROM documents),
        |adj AS (SELECT tl[i] AS a, tl[i + 1] AS b
        |        FROM (SELECT tl, unnest(range(1, len(tl))) AS i FROM toks)
        |        WHERE tl[i] <> tl[i + 1]),
        |edges AS MATERIALIZED (SELECT a AS src, b AS dst, COUNT(*) AS w
        |         FROM adj GROUP BY 1, 2),
        |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges
        |         UNION SELECT DISTINCT dst AS node FROM edges),
        |a0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS a_fp FROM nodes)""".stripMargin
    val rounds = (1 to hitsIters).map { i =>
      s"""h${i}r AS MATERIALIZED (SELECT n.node,
         |    COALESCE(SUM(CAST(e.w AS HUGEINT) * a.a_fp), 0) AS raw
         |  FROM nodes n LEFT JOIN edges e ON e.src = n.node
         |  LEFT JOIN a${i - 1} a ON a.node = e.dst GROUP BY n.node),
         |h$i AS MATERIALIZED (SELECT node,
         |    CAST(raw * 1000000000 // (SELECT SUM(raw) FROM h${i}r) AS BIGINT) AS h_fp
         |  FROM h${i}r),
         |a${i}r AS MATERIALIZED (SELECT n.node,
         |    COALESCE(SUM(CAST(e.w AS HUGEINT) * h.h_fp), 0) AS raw
         |  FROM nodes n LEFT JOIN edges e ON e.dst = n.node
         |  LEFT JOIN h$i h ON h.node = e.src GROUP BY n.node),
         |a$i AS MATERIALIZED (SELECT node,
         |    CAST(raw * 1000000000 // (SELECT SUM(raw) FROM a${i}r) AS BIGINT) AS a_fp
         |  FROM a${i}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $dirEdges,
       |$rounds
       |SELECT a.node AS term, a.a_fp AS auth_fp, h.h_fp AS hub_fp
       |FROM a$hitsIters a JOIN h$hitsIters h USING (node)
       |ORDER BY auth_fp DESC, term""".stripMargin
  }

  /** Unrolled Bellman-Ford: r_i = min-plus relaxation of r_{i-1} over the
    * both-direction weighted edge list. Idempotent past the true
    * shortest-path depth. */
  private def ssspOracle: String = {
    val rounds = (1 to ssspRounds).map { i =>
      s"""r$i AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
         |    SELECT node, dist FROM r${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS node, r.dist + e.w AS dist
         |    FROM r${i - 1} r JOIN ebi e ON e.src = r.node) GROUP BY node)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS MATERIALIZED (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
       |       CAST(1000000 // COUNT(*) AS BIGINT) AS w
       |     FROM items a JOIN items b
       |       ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       |     GROUP BY 1, 2),
       |ebi AS MATERIALIZED (SELECT p1 AS src, p2 AS dst, w FROM e
       |       UNION ALL SELECT p2, p1, w FROM e),
       |r0 AS (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS dist
       |       FROM part WHERE p_partkey <= 3),
       |$rounds
       |SELECT node, CAST(dist AS BIGINT) AS dist FROM r$ssspRounds
       |ORDER BY dist, node""".stripMargin
  }

  /** Persisted co-purchase graph artifact (DISTINCT part pairs sharing an
    * order, p1 < p2), memoized per sf dir with an eager localCheckpoint —
    * the irIndex pattern: g5/g6 are SEARCHES over an existing graph, so
    * their setup warms the artifact and the timed work is the probe; g3/g4
    * keep the inline build (the full-pipeline shape). Correct without
    * setup — Verify builds on demand. */
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  private[queries] def coPurchaseEdges(s: org.apache.spark.sql.SparkSession,
                                       d: String): org.apache.spark.sql.DataFrame =
    QH.sessionMemo(edgeCache, d, s)(identity) {
      val items = Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey").distinct()
      items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          "l_orderkey")
        .filter(col("p1") < col("p2"))
        .select("p1", "p2").distinct()
        .localCheckpoint(true)
    }

  /** g8's persisted artifact — the WEIGHTED co-purchase graph (affinity
    * w = 10⁶ div co-count), memoized per sf dir like [[coPurchaseEdges]]
    * (kept separate: g5/g6's premise is the unweighted pair set). Correct
    * without setup — Verify builds on demand. */
  private val wEdgeCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.DataFrame]
  private[queries] def coPurchaseWeightedEdges(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    QH.sessionMemo(wEdgeCache, d, s)(identity) {
      val items = Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey").distinct()
      items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
          "l_orderkey")
        .filter(col("p1") < col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("__c"))
        .select(col("p1"), col("p2"), expr("1000000L div __c").as("w"))
        .localCheckpoint(true)
    }

  val all: Seq[Q] = Seq(

    // TextRank keyword centrality: PageRank(8 iters, d = 85/100) over the
    // symmetric token-adjacency graph, ranks fixed-point ×10⁹.
    Q("g1_textrank_keywords",
      (s, d) => Graph.pagerank(
          Graph.cooccurrenceEdges(
            Tables.documents(s, d).select("text"), "text"), iters)
        .select(col("node").as("term"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("term")),
      Some(prOracle(
        s"(${Graph.Scale}::BIGINT // n)",
        s"((${Graph.DampDen - Graph.DampNum}::BIGINT * ${Graph.Scale})" +
          s" // (${Graph.DampDen}::BIGINT * nn.n))"))),

    // Personalized PageRank from a seed term: full teleport mass on the
    // seed, ranks = similarity-to-seed over the same graph (the
    // data-selection flavor: centrality relative to a chosen context).
    Q("g2_ppr_seeded",
      (s, d) => Graph.pagerank(
          Graph.cooccurrenceEdges(
            Tables.documents(s, d).select("text"), "text"), iters,
          seed = Some(seedTerm))
        .select(col("node").as("term"), col("rank_fp"))
        .orderBy(col("rank_fp").desc, col("term")),
      Some(prOracle(
        s"(CASE WHEN node = '$seedTerm' THEN ${Graph.Scale} ELSE 0 END)",
        s"(CASE WHEN n0.node = '$seedTerm'" +
          s" THEN ${(Graph.DampDen - Graph.DampNum) * Graph.Scale / Graph.DampDen}" +
          s" ELSE 0 END)"))),

    // Triangle census over the co-purchase graph (parts appearing in ≥ 2
    // shared baskets): degree-ordered compact-forward listing
    // (Graph.triangles — each triangle found once at its unique
    // lowest-degree apex, out-degrees bounded by √m so the wedge join
    // survives power-law hubs), plus wedge count Σ C(deg, 2) and the
    // global closure coefficient 3·triangles/wedges as integer ppm. The
    // triangle SET is algorithm-independent — the oracle replays the
    // simpler id-ordered enumeration and must agree exactly.
    Q("g3_triangle_closure",
      (s, d) => {
        val items = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey").distinct()
        val edges = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
          .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
            "l_orderkey")
          .filter(col("p1") < col("p2"))
          .groupBy("p1", "p2").agg(count(lit(1)).as("__c"))
          .filter(col("__c") >= 2).select("p1", "p2")
          // materialize-once (r15 opt): the edge set feeds deg, the edge
          // count, AND three consumers inside Graph.triangles — without
          // the checkpoint each re-ran the support aggregation over the
          // reused self-join shuffle (the r15 s5 edge-build adjudication
          // tested a build reshape, not this; the post-shuffle re-agg per
          // consumer is what this removes)
          .localCheckpoint(true)
        val deg = edges.select(col("p1").as("n"))
          .unionByName(edges.select(col("p2").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))
        // wedge sum and the ppm product accumulate WIDE (DECIMAL(38,0) ≡
        // the oracle's HUGEINT) — a hub whose degree² × node count tops
        // Long.MaxValue must not wrap on one engine only (the HITS class,
        // r12 ADVICE). The halving happens AFTER the wide sum (deg·(deg−1)
        // is always even, so Σ(term/2) = (Σterm)/2 exactly): a per-term
        // `div` would narrow each term to LONG and the sum would run
        // narrow again.
        val stats = deg.agg(count(lit(1)).as("n_nodes"),
          expr("CAST(SUM(CAST(deg AS DECIMAL(38,0)) * (deg - 1)) div 2" +
            " AS BIGINT)").as("n_wedges"))
        val ecnt = edges.agg(count(lit(1)).as("n_edges"))
        val tcnt = Graph.triangles(edges, "p1", "p2")
          .agg(count(lit(1)).as("n_triangles"))
        stats.crossJoin(ecnt).crossJoin(tcnt)
          .withColumn("closure_ppm",
            expr("CASE WHEN n_wedges = 0 THEN 0L" +
              " ELSE CAST(3 * CAST(n_triangles AS DECIMAL(38,0)) * 1000000" +
              " div CAST(n_wedges AS DECIMAL(38,0)) AS BIGINT) END"))
          .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
            "closure_ppm")
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2
         |      FROM items a JOIN items b
         |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |deg AS (SELECT n, COUNT(*) AS deg FROM (
         |          SELECT p1 AS n FROM e UNION ALL SELECT p2 FROM e)
         |        GROUP BY 1),
         |tri AS (SELECT COUNT(*) AS n_triangles FROM e e1
         |        JOIN e e2 ON e2.p1 = e1.p2
         |        JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
         |st AS (SELECT COUNT(*) AS n_nodes,
         |         CAST(SUM(CAST(deg AS HUGEINT) * (deg - 1)) // 2 AS BIGINT)
         |           AS n_wedges
         |       FROM deg),
         |ec AS (SELECT COUNT(*) AS n_edges FROM e)
         |SELECT n_nodes, n_edges, n_wedges,
         |  CAST(n_triangles AS BIGINT) AS n_triangles,
         |  CAST(CASE WHEN n_wedges = 0 THEN 0
         |    ELSE 3 * CAST(n_triangles AS HUGEINT) * 1000000 // n_wedges
         |    END AS BIGINT)
         |    AS closure_ppm
         |FROM st, ec, tri""".stripMargin)),

    // k-core of the co-purchase graph (ALL distinct co-basket part pairs
    // — the support-≥2 cut used by g3 thins out at larger SF, while this
    // graph's mean degree is SF-invariant ≈ 2·pairs/parts): bounded-round
    // peel to the 75-core. Each round = one degree agg + one membership
    // semi-join; the edge set only shrinks, so an unchanged count
    // certifies the fixpoint and the unrolled oracle (8 rounds ≥ the
    // measured depth 4 at sf0.01/sf0.1, idempotent past the fixpoint)
    // agrees exactly. Output: surviving nodes with in-core degree.
    Q("g4_kcore",
      (s, d) => {
        val items = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey").distinct()
        val edges = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
          .join(items.select(col("l_orderkey"), col("l_partkey").as("p2")),
            "l_orderkey")
          .filter(col("p1") < col("p2"))
          .select("p1", "p2").distinct()
        // NO broadcastWaves here: co-purchase nodes are parts, an
        // SF-LINEAR dimension (TPC-H part = SF × 200k) — a removal wave at
        // 100 TB is billions of rows, not broadcast material. The flag is
        // for provably bounded node sets only (see kcorePeel's scaladoc
        // and PLANS r15 s6).
        Graph.kcorePeel(edges, "p1", "p2", k = kcoreK, maxRounds = kcoreRounds)
          .orderBy("node")
      },
      Some(kcoreOracle)),

    // HITS hubs & authorities (Kleinberg 1999) over the DIRECTED token-
    // adjacency graph (src → dst when dst follows src): 6 integer
    // fixed-point iterations, each half-step renormalized to mass 10⁹ by
    // exact wide division — the oracle replays the chain as one CTE per
    // half-step, every product and floor-division identical. Directed
    // precedence makes hubs (words that LEAD INTO central words) and
    // authorities (words central contexts point AT) genuinely different
    // rankings, unlike PageRank over the symmetric graph (g1).
    Q("g7_hits_keywords",
      (s, d) => Graph.hits(
          Graph.adjacencyEdges(
            Tables.documents(s, d).select("text"), "text"), hitsIters)
        .select(col("node").as("term"), col("auth_fp"), col("hub_fp"))
        .orderBy(col("auth_fp").desc, col("term")),
      Some(hitsOracle)),

    // Multi-source shortest distances (4 synchronous Bellman-Ford
    // relaxations) over the co-purchase graph with affinity weights
    // w = 10⁶ div co-count (stronger ties are shorter): dist(part) =
    // min-plus path weight to the nearest of 3 hub parts — the
    // distance-to-nearest-hub field data-organization pipelines assign
    // shards by. Integer min-plus only; the unrolled oracle agrees
    // exactly at any round count ≥ the true shortest-path depth. Like
    // g5/g6, a SEARCH over an existing graph: setup warms the memoized
    // weighted-edge artifact, the timed work is the relaxation.
    Q("g8_multisource_sssp",
      (s, d) => {
        val seeds = Tables.part(s, d).filter(col("p_partkey") <= 3)
          .select(col("p_partkey").as("node"))
        Graph.multiSourceSssp(coPurchaseWeightedEdges(s, d), "p1", "p2", "w",
            seeds, ssspRounds)
          .orderBy("dist", "node")
      },
      Some(ssspOracle),
      setup = Some((s, d) => { coPurchaseWeightedEdges(s, d); () })),

    // Link prediction over the co-purchase graph, anchored to 20 seed
    // parts (ids ≤ 2000 so the SAME seeds exist at every SF): top-5
    // non-adjacent parts per seed by common-neighbor count, neighborhood
    // Jaccard as integer ppm. Seed-anchoring is the scale story — the
    // all-pairs wedge table is quadratic on this near-uniform-degree
    // graph (deg ≈ 115 at both SFs, probed), while the anchored join is
    // Σ deg(seed)·avgdeg rows, corpus-size-invariant per seed.
    Q("g5_link_prediction",
      (s, d) => {
        val edges = coPurchaseEdges(s, d)
        val seeds = Tables.part(s, d)
          .filter(col("p_partkey") % 100 === 1 && col("p_partkey") <= 2000)
          .select(col("p_partkey").as("q"))
        Graph.relatedBySharedNeighbors(edges, "p1", "p2", seeds, k = 5)
          .orderBy("q", "rank")
      },
      Some("""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         |      FROM items a JOIN items b
         |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |nbr AS (SELECT p1 AS n, p2 AS z FROM e UNION ALL SELECT p2, p1 FROM e),
         |deg AS (SELECT n, COUNT(*) AS deg FROM nbr GROUP BY 1),
         |seeds AS (SELECT p_partkey AS q FROM part
         |          WHERE p_partkey % 100 = 1 AND p_partkey <= 2000),
         |nq AS (SELECT s.q, nbr.z FROM nbr JOIN seeds s ON nbr.n = s.q),
         |cn AS (SELECT q, nbr.n AS cand, COUNT(*) AS cn
         |       FROM nq JOIN nbr ON nq.z = nbr.z AND nbr.n <> nq.q
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |ne AS (SELECT cn.* FROM cn
         |       LEFT JOIN e ON e.p1 = LEAST(q, cand) AND e.p2 = GREATEST(q, cand)
         |       WHERE e.p1 IS NULL),
         |sc AS (SELECT q, cand, cn,
         |         cn * 1000000 // (dq.deg + dc.deg - cn) AS jaccard_ppm
         |       FROM ne JOIN deg dq ON dq.n = ne.q
         |               JOIN deg dc ON dc.n = ne.cand),
         |r AS (SELECT q, cand, cn, jaccard_ppm,
         |        row_number() OVER (PARTITION BY q
         |          ORDER BY cn DESC, jaccard_ppm DESC, cand) AS rank
         |      FROM sc)
         |SELECT q, CAST(rank AS BIGINT) AS rank, cand, CAST(cn AS BIGINT) AS cn,
         |  CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm
         |FROM r WHERE rank <= 5 ORDER BY q, rank""".stripMargin),
      setup = Some((s, d) => { coPurchaseEdges(s, d); () })))

  /** Unrolled peel: d_i = degrees of e_{i-1}, k_i = survivors, e_i = the
    * induced edge set. Idempotent past the fixpoint, so 8 rounds replay
    * Spark's early-exit loop exactly. Every multiply-referenced CTE is
    * MATERIALIZED — inlined, each round would re-expand its predecessor
    * 3× and the unroll would re-read the scan exponentially (observed as
    * a too-many-open-files blowup at round 8). */
  private def kcoreOracle: String = {
    val rounds = (1 to kcoreRounds).map { i =>
      s"""d$i AS MATERIALIZED (SELECT n, COUNT(*) AS deg FROM (
         |         SELECT a AS n FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1}) GROUP BY 1),
         |k$i AS MATERIALIZED (SELECT n FROM d$i WHERE deg >= $kcoreK),
         |e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
         |        JOIN k$i ka ON e.a = ka.n JOIN k$i kb ON e.b = kb.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
       |       FROM items a JOIN items b
       |         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       |$rounds
       |SELECT n AS node, deg AS core_deg FROM (
       |  SELECT n, COUNT(*) AS deg FROM (
       |    SELECT a AS n FROM e$kcoreRounds UNION ALL SELECT b FROM e$kcoreRounds) GROUP BY 1)
       |ORDER BY node""".stripMargin
  }
}
