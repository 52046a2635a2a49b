package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Graph.scala: co-occurrence edge builder, integer PageRank vs a BigInt
  * reference loop, seeded teleport, partitioning invariance, and the
  * iterative-operator checkpoint-hygiene contract. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrenceEdges: adjacency counts, symmetric, self-pairs dropped") {
    val docs = Seq("a b a b", "b c c").toDF("text")
    val e = Graph.cooccurrenceEdges(docs, "text").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Long]("w"))
      .toMap
    // "a b a b": a-b, b-a, a-b adjacencies; "b c": one; "c c" self dropped
    assert(e(("a", "b")) === 3L)
    assert(e(("b", "a")) === 3L)
    assert(e(("b", "c")) === 1L)
    assert(e(("c", "b")) === 1L)
    assert(!e.contains(("c", "c")))
  }

  /** BigInt replica of the fixed-point iteration. */
  private def refPr(edges: Map[(String, String), Long], iters: Int,
                    seed: Option[String]): Map[String, Long] = {
    val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSeq.distinct.sorted
    val n = nodes.size
    val wout = edges.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    var r: Map[String, BigInt] = seed match {
      case None => nodes.map(_ -> BigInt(Graph.Scale / n)).toMap
      case Some(s) => nodes.map(x => x -> (if (x == s) BigInt(Graph.Scale) else BigInt(0))).toMap
    }
    val base: String => BigInt = seed match {
      case None =>
        val b = BigInt((Graph.DampDen - Graph.DampNum) * Graph.Scale / (Graph.DampDen * n))
        _ => b
      case Some(s) =>
        val b = BigInt((Graph.DampDen - Graph.DampNum) * Graph.Scale / Graph.DampDen)
        x => if (x == s) b else BigInt(0)
    }
    for (_ <- 1 to iters)
      r = nodes.map { dst =>
        dst -> (base(dst) + edges.collect { case ((s2, d2), w) if d2 == dst =>
          BigInt(Graph.DampNum) * w * r(s2) / (BigInt(Graph.DampDen) * wout(s2))
        }.sum)
      }.toMap
    r.map { case (k, v) => k -> v.toLong }
  }

  private val pathEdges = Seq(
    ("a", "b", 1L), ("b", "a", 1L), ("b", "c", 2L), ("c", "b", 2L))

  test("pagerank matches the BigInt reference on a weighted path graph") {
    val e = pathEdges.toDF("src", "dst", "w")
    val got = Graph.pagerank(e, iters = 5).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    val ref = refPr(pathEdges.map(t => (t._1, t._2) -> t._3).toMap, 5, None)
    assert(got === ref)
    // total mass stays within floor leakage of the scale
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 1000)
  }

  test("seeded pagerank matches reference and concentrates mass near the seed") {
    val e = pathEdges.toDF("src", "dst", "w")
    val got = Graph.pagerank(e, iters = 5, seed = Some("a")).collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("rank_fp")).toMap
    val ref = refPr(pathEdges.map(t => (t._1, t._2) -> t._3).toMap, 5, Some("a"))
    assert(got === ref)
    assert(got("a") > got("c"), "seed side must outrank the far end")
  }

  test("pagerank is invariant under input partitioning") {
    val e = pathEdges.toDF("src", "dst", "w")
    val a = Graph.pagerank(e, 4).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = Graph.pagerank(e.repartition(7), 4).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("pagerank over a checkpointed edge frame leaves the input readable") {
    val e = pathEdges.toDF("src", "dst", "w").localCheckpoint(true)
    val r = Graph.pagerank(e, 4)
    assert(r.count() === 3L)
    // the caller's checkpoint must survive the loop's hygiene frees
    assert(e.count() === 4L)
    assert(e.agg(sum("w")).head().getLong(0) === 6L)
  }

  test("triangles lists each triangle exactly once, matching brute force") {
    // deterministic G(30, p): edge (a, b) present iff a hash bit fires —
    // dense enough for hubs and shared wedges
    val nodes = 0L until 30L
    val edgeSet = (for {
      a <- nodes; b <- nodes if a < b
      if DetHash.md5Long(s"tri:$a:$b") % 5 < 2
    } yield (a, b)).toSeq
    val got = Graph.triangles(edgeSet.toDF("a", "b"), "a", "b").collect()
      .map(r => {
        val t = Seq(r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("z"))
        (t.min, t.sorted.apply(1), t.max)
      }).toSeq
    val es = edgeSet.toSet
    val want = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield (a, b, c)).toSeq
    assert(got.sorted === want.sorted)
    assert(got.size === got.distinct.size, "no triangle may be emitted twice")
    assert(want.nonEmpty, "fixture must actually contain triangles")
  }

  /** Reference peel: drop deg<k nodes until fixpoint, return final degrees. */
  private def refKcore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var cur = edges
    var done = false
    while (!done) {
      val deg = (cur.map(_._1) ++ cur.map(_._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = cur.filter(e => keep(e._1) && keep(e._2))
      if (next.size == cur.size) done = true else cur = next
    }
    (cur.map(_._1) ++ cur.map(_._2)).groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
  }

  private def kcoreFixture: Seq[(Long, Long)] = {
    // deterministic G(24, p) plus a pendant path 100-101-102 that any
    // 2-core must shed in two peel rounds (tests the multi-round cascade)
    val nodes = 0L until 24L
    (for {
      a <- nodes; b <- nodes if a < b
      if DetHash.md5Long(s"core:$a:$b") % 4 == 0
    } yield (a, b)) ++ Seq((0L, 100L), (100L, 101L), (101L, 102L))
  }

  test("kcorePeel matches the brute-force fixpoint peel") {
    for (k <- Seq(2, 3, 4)) {
      val got = Graph.kcorePeel(kcoreFixture.toDF("a", "b"), "a", "b", k, maxRounds = 20)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
      val want = refKcore(kcoreFixture, k)
      assert(got === want, s"k=$k")
    }
    assert(refKcore(kcoreFixture, 3).nonEmpty, "fixture must have a 3-core")
    assert(!refKcore(kcoreFixture, 2).contains(102L), "pendant path must peel away")
  }

  test("kcorePeel broadcastWaves mode equals the shuffle-join mode") {
    // the g4 opt-in (dimension-bounded node set) must be a pure plan-shape
    // change — survivor sets and core degrees identical at every k
    val df = kcoreFixture.toDF("a", "b")
    for (k <- Seq(2, 3, 4)) {
      val off = Graph.kcorePeel(df, "a", "b", k, 20).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
      val on = Graph.kcorePeel(df, "a", "b", k, 20, broadcastWaves = true)
        .collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
      assert(off === on, s"k=$k")
    }
  }

  test("kcorePeel is invariant under input partitioning") {
    val df = kcoreFixture.toDF("a", "b")
    val a = Graph.kcorePeel(df, "a", "b", 3, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Graph.kcorePeel(df.repartition(7), "a", "b", 3, 20).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("kcorePeel over a checkpointed edge frame leaves the input readable") {
    val e = kcoreFixture.toDF("a", "b").localCheckpoint(true)
    val core = Graph.kcorePeel(e, "a", "b", 3, 20)
    assert(core.count() > 0L)
    // the caller's checkpoint must survive the loop's hygiene frees
    assert(e.count() === kcoreFixture.size.toLong)
  }

  test("relatedBySharedNeighbors matches brute-force common-neighbor ranking") {
    // deterministic G(20, p), undirected a < b
    val nodes = 0L until 20L
    val edgeSeq = (for {
      a <- nodes; b <- nodes if a < b
      if DetHash.md5Long(s"lp:$a:$b") % 3 == 0
    } yield (a, b)).toSeq
    val es = edgeSeq.toSet
    val adj = nodes.map(n => n ->
      edgeSeq.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }.toSet).toMap
    val seedSet = Seq(0L, 5L, 17L)
    val got = Graph.relatedBySharedNeighbors(edgeSeq.toDF("a", "b"), "a", "b",
        seedSet.toDF("q"), k = 3, minCn = 2)
      .collect().map(r => (r.getAs[Long]("q"), r.getAs[Long]("rank")) ->
        (r.getAs[Long]("cand"), r.getAs[Long]("cn"), r.getAs[Long]("jaccard_ppm")))
      .toMap
    val want = seedSet.flatMap { q =>
      val cands = nodes.filter(c => c != q && !es((q min c, q max c)))
        .map { c =>
          val cn = (adj(q) & adj(c)).size.toLong
          val j = if (cn == 0) 0L else cn * 1000000L / (adj(q).size + adj(c).size - cn)
          (c, cn, j)
        }
        .filter(_._2 >= 2)
        .sortBy { case (c, cn, j) => (-cn, -j, c) }
        .take(3)
      cands.zipWithIndex.map { case (t, i) => (q, (i + 1).toLong) -> t }
    }.toMap
    assert(got === want)
    assert(want.nonEmpty, "fixture must produce predictions")
    // no predicted pair may already be an edge
    got.foreach { case ((q, _), (c, _, _)) => assert(!es((q min c, q max c))) }
  }

  test("adjacencyEdges: directed counts, self-pairs dropped") {
    val docs = Seq("a b a b", "b c c").toDF("text")
    val e = Graph.adjacencyEdges(docs, "text").collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Long]("w"))
      .toMap
    // "a b a b": a->b twice, b->a once; "b c": b->c once; "c c" dropped
    assert(e === Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  /** BigInt replica of the HITS fixed-point chain. */
  private def refHits(edges: Map[(String, String), Long],
                      iters: Int): Map[String, (Long, Long)] = {
    val S = BigInt(Graph.Scale)
    val nodes = (edges.keys.map(_._1) ++ edges.keys.map(_._2)).toSeq.distinct.sorted
    var a = nodes.map(_ -> S).toMap
    var h = Map.empty[String, BigInt]
    def normalize(raw: Map[String, BigInt]): Map[String, BigInt] = {
      val tot = raw.values.sum
      nodes.map(n => n -> raw.getOrElse(n, BigInt(0)) * S / tot).toMap
    }
    for (_ <- 1 to iters) {
      h = normalize(edges.toSeq.groupBy(_._1._1).map { case (src, es) =>
        src -> es.map { case ((_, dst), w) => BigInt(w) * a(dst) }.sum
      })
      a = normalize(edges.toSeq.groupBy(_._1._2).map { case (dst, es) =>
        dst -> es.map { case ((src, _), w) => BigInt(w) * h(src) }.sum
      })
    }
    nodes.map(n => n -> (a(n).toLong, h(n).toLong)).toMap
  }

  test("hits matches the BigInt reference chain") {
    val docs = Seq("a b c a b", "b c d", "d a", "c c b a").toDF("text")
    val edges = Graph.adjacencyEdges(docs, "text")
    val em = edges.collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) -> r.getAs[Long]("w"))
      .toMap
    val got = Graph.hits(edges, iters = 4).collect()
      .map(r => r.getAs[String]("node") ->
        (r.getAs[Long]("auth_fp"), r.getAs[Long]("hub_fp"))).toMap
    assert(got === refHits(em, 4))
    // hubs and authorities must actually differ on a directed graph
    assert(got.exists { case (_, (afp, hfp)) => afp != hfp })
  }

  test("hits over a checkpointed edge frame leaves the input readable") {
    val docs = Seq("a b c", "b c a").toDF("text")
    val e = Graph.adjacencyEdges(docs, "text").localCheckpoint(true)
    val out = Graph.hits(e, iters = 2)
    assert(out.count() > 0L)
    assert(e.count() > 0L)
  }

  test("multiSourceSssp matches brute-force bounded Bellman-Ford") {
    // weighted path graph with a shortcut: distances differ per round count
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 10L), (3L, 4L, 10L),
      (1L, 4L, 50L), (4L, 5L, 10L), (6L, 7L, 5L))
    def ref(rounds: Int, seeds: Set[Long]): Map[Long, Long] = {
      var dist = seeds.map(_ -> 0L).toMap
      for (_ <- 1 to rounds) {
        val relaxed = edges.flatMap { case (x, y, w) =>
          Seq(dist.get(x).map(dx => y -> (dx + w)),
            dist.get(y).map(dy => x -> (dy + w))).flatten
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      dist
    }
    val seeds = Seq(1L, 6L).toDF("node")
    for (rounds <- Seq(1, 2, 4)) {
      val got = Graph.multiSourceSssp(edges.toDF("a", "b", "w"), "a", "b", "w",
          seeds, rounds)
        .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
      assert(got === ref(rounds, Set(1L, 6L)), s"rounds=$rounds")
    }
    // the 3-hop path (30) must beat the 1-hop shortcut (50) once deep enough
    assert(ref(4, Set(1L, 6L))(4L) === 30L)
  }

  test("multiSourceSssp leaves checkpointed inputs readable") {
    val e = Seq((1L, 2L, 3L), (2L, 3L, 4L)).toDF("a", "b", "w").localCheckpoint(true)
    val s = Seq(1L).toDF("node").localCheckpoint(true)
    val out = Graph.multiSourceSssp(e, "a", "b", "w", s, 2)
    assert(out.count() === 3L)
    assert(e.count() === 2L)
    assert(s.count() === 1L)
  }
}
