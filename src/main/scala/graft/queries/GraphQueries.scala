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
          s" ELSE 0 END)"))))
}
