package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Graph analytics over corpus-derived graphs — integer-exact PageRank and
  * the TextRank co-occurrence graph builder (keyword centrality: PageRank
  * over the word-adjacency graph, Mihalcea & Tarau 2004), plus seeded
  * (personalized) teleportation for similarity-to-seed ranking.
  *
  * Scale shape (100 TB): nodes/edges are keyed on corpus-derived values
  * (vocabulary terms here — the content-derived key-space invariant), so
  * every iteration is one edge⋈rank join partitioned by the edge key plus
  * one map-side-combined dst aggregation; nothing global, nothing
  * broadcast except the two driver scalars (node count, scale). Plan depth
  * stays constant in the iteration count: each round's vocabulary-sized
  * rank frame is localCheckpoint'ed and the superseded round's blocks are
  * freed through [[Bridge.freeCheckpointExcept]] with the INPUT's ids
  * protected (the r10 composition rule — CheckpointHygieneSpec).
  *
  * Float parity: ranks are fixed-point BIGINT (scale 10⁹). Every
  * per-edge contribution is individually floor-divided —
  * `(85·w·r_src) div (100·W_src)` in DECIMAL(38,0)/HUGEINT — and summed
  * as integers, so addition order cannot matter and no libm call exists.
  * The floor leaks < 1 ulp of mass per in-edge per round; that loss is
  * partof the operator's DEFINITION (identical on both engines), not an
  * approximation the oracle could disagree on.
  */
object Graph {

  /** Rank scale: ranks sum to ~10⁹ (exactly 10⁹ minus deterministic
    * floor leakage). */
  val Scale = 1000000000L

  /** Damping numerator/denominator: d = 85/100. */
  val DampNum = 85L
  val DampDen = 100L

  /** Symmetric word co-occurrence edges (window 2 — token adjacency):
    * (src, dst, w) with w = adjacency count, self-pairs dropped, both
    * directions emitted. ONE shuffle (the pair groupBy). */
  def cooccurrenceEdges(docs: DataFrame, textCol: String): DataFrame = {
    val adj = docs
      .select(expr(s"filter(split($textCol, ' '), t -> t <> '')").as("__toks"))
      .select(posexplode(col("__toks")).as(Seq("__i", "a")), col("__toks"))
      .filter(col("__i") < size(col("__toks")) - 1)
      .select(col("a"), expr("__toks[__i + 1]").as("b"))
      .filter(col("a") =!= col("b"))
    adj.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(adj.select(col("b").as("src"), col("a").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
  }

  /** Integer-exact PageRank over weighted directed edges (src, dst, w).
    * @param seed teleport target: None = uniform base (15·S div (100·n)
    *             to every node); Some(term) = the full teleport mass
    *             15·S div 100 to that node only (personalized PageRank —
    *             ranks become similarity-to-seed).
    * @return (node, rank_fp) — every node reachable in the edge list. */
  def pagerank(edges0: DataFrame, iters: Int, seed: Option[String] = None): DataFrame = {
    // The edge frame is read 2·iters+3 times below; an UNMATERIALIZED edge
    // subtree (g1/g2 build theirs from the raw corpus) would re-run its
    // whole build every iteration — each checkpoint action replans, so
    // nothing is reused across rounds. Materialize once; a caller's bare
    // checkpoint artifact (g5/g6's memoized co-purchase frame) passes
    // through untouched and is never freed here (GraphSpec pins that).
    // nodes/outW are loop-invariant dimension frames — same treatment.
    val protectIds = Bridge.checkpointIds(edges0)
    // Resident frames carry ADVERTISED layouts (r15 opt): edges and outW
    // are joined by src and the rank frame by node EVERY iteration; plain
    // checkpoints land UnknownPartitioning under AQE, so each iteration
    // re-exchanged all three (the edge frame being the O(E) write — the
    // r15 s6 shuffle-storage audit). Advertising HashPartitioning (+ a
    // per-partition sort on the edge frame, so a sort-merge round never
    // re-sorts the resident side) leaves ONE fundamental exchange per
    // iteration: the dst-keyed contribution aggregation. A bare input
    // artifact already advertising src passes through; anything else is
    // laid out once here (one O(E) shuffle buys 2·iters of them).
    val edges =
      if (Bridge.isBareCheckpoint(edges0) &&
          Bridge.advertisedHashCols(edges0).contains(Seq("src")))
        edges0
      else Bridge.localCheckpointPartitioned(
        edges0.select("src", "dst", "w"), Seq("src"), sorted = true)
    // every loop frame shares the edge frame's adaptive bucket count so
    // all per-iteration joins stay co-partitioned
    val nParts = Bridge.advertisedNumPartitions(edges).getOrElse(
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val nodes = Bridge.localCheckpointPartitioned(
      edges.select(col("src").as("node")).distinct()
        .unionByName(edges.select(col("dst").as("node")).distinct())
        .distinct(),
      Seq("node"), numParts = nParts)
    val nNodes = nodes.count()
    val outW = Bridge.localCheckpointPartitioned(
      edges.groupBy("src").agg(sum("w").as("wout")), Seq("src"),
      sorted = true, numParts = nParts)
    // base teleport shares, computed ONCE in exact Long arithmetic (the
    // oracle's // over positive longs agrees with Scala / here)
    def baseCol = seed match {
      case None => lit((DampDen - DampNum) * Scale / (DampDen * nNodes))
      case Some(s) =>
        when(col("node") === s, lit((DampDen - DampNum) * Scale / DampDen)).otherwise(lit(0L))
    }
    // own loop-invariant materializations are protected through the loop
    // and freed once the (itself-checkpointed) result no longer needs them
    val keep = protectIds ++ Bridge.checkpointIds(edges) ++
      Bridge.checkpointIds(nodes) ++ Bridge.checkpointIds(outW)
    var r = nodes.withColumn("rank_fp",
      seed match {
        case None => lit(Scale / nNodes)
        case Some(s) => when(col("node") === s, lit(Scale)).otherwise(lit(0L))
      })
    // per-round layout only where it buys an exchange-free round (the
    // Bridge.localCheckpointRound tiny-graph rule)
    def roundCp(df: DataFrame): DataFrame =
      Bridge.localCheckpointRound(df, Seq("node"), nParts)
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(outW, "src")
        .withColumn("__c", expr(
          s"CAST(($DampNum * CAST(w AS DECIMAL(38,0)) * rank_fp)" +
            s" div ($DampDen * CAST(wout AS DECIMAL(38,0))) AS BIGINT)"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      // node-layout checkpoint: next round's rename to src is alias-aware,
      // so the rank frame re-enters the edge join without an exchange
      val next = roundCp(nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .withColumn("rank_fp", baseCol + coalesce(col("__in"), lit(0L)))
        .select("node", "rank_fp"))
      Bridge.freeCheckpointExcept(r, keep)
      r = next
    }
    if (iters > 0) { // with 0 iters, r still READS nodes — leave resident
      if (!(edges eq edges0)) Bridge.freeCheckpoint(edges)
      Bridge.freeCheckpoint(nodes)
      Bridge.freeCheckpoint(outW)
    }
    r
  }

  /** DIRECTED word-adjacency edges (a → b when b immediately follows a):
    * (src, dst, w) with w = adjacency count, self-pairs dropped. The
    * directed twin of [[cooccurrenceEdges]] — precedence matters for
    * hub/authority structure. ONE shuffle (the pair groupBy). */
  def adjacencyEdges(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(expr(s"filter(split($textCol, ' '), t -> t <> '')").as("__toks"))
      .select(posexplode(col("__toks")).as(Seq("__i", "a")), col("__toks"))
      .filter(col("__i") < size(col("__toks")) - 1)
      .select(col("a").as("src"), expr("__toks[__i + 1]").as("dst"))
      .filter(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))

  /** Integer-exact HITS (Kleinberg 1999) over weighted directed edges
    * (src, dst, w): hub(n) = Σ_{n→m} w·auth(m), auth(n) = Σ_{m→n} w·hub(m),
    * each half-step renormalized to total mass [[Scale]] by exact
    * fixed-point division — `raw·Scale div Σraw` in DECIMAL(38,0) ≡
    * HUGEINT `//`. The raw sums themselves also accumulate in
    * DECIMAL(38,0) (matching the oracle's HUGEINT), so a hub whose
    * weighted in-degree × the ~10⁹ fixed-point mass exceeds
    * Long.MaxValue can never silently wrap on one engine only —
    * the whole chain is bit-exact on any engine and the
    * oracle replays it as one unrolled CTE per half-step.
    *
    * Scale shape: SPARSE iterations. A node with zero raw mass scores 0,
    * contributes 0 to the next half-step's sums AND to the normalization
    * total, so the loop carries only nonzero-mass nodes — dropping the
    * oracle's all-nodes LEFT JOIN from every half-step is EXACT (the
    * all-nodes frame rejoins once at the end with 0-fills). Each
    * half-step checkpoints the RAW sums (one edge⋈score join + map-side-
    * combined aggregation per action); the renormalization is a lazy
    * projection against that checkpoint, so the broadcast total costs a
    * tiny scan, never a recompute of the join (it halved the measured
    * per-step cost vs checkpointing the normalized frame — r13).
    * Superseded rounds freed with the input's ids protected. Returns
    * (node, auth_fp, hub_fp) for ALL nodes, as one materialized frame. */
  def hits(edges0: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"hits needs at least one iteration, got $iters")
    val protectIds = Bridge.checkpointIds(edges0)
    val edges =
      if (Bridge.isBareCheckpoint(edges0)) edges0 else edges0.localCheckpoint(true)
    // TWO advertised resident copies (r15 opt): the hub half-step joins
    // edges by dst, the authority half-step by src — one layout cannot
    // serve both, and the alternative is re-exchanging (re-writing to
    // shuffle storage) the full edge frame twice per iteration (the r15
    // s6 audit). 2·|E| resident blocks buy zero per-round O(E) shuffle:
    // each half-step's only exchange is its node-keyed aggregation.
    // the staged bare checkpoint's registered bytes ARE this frame's size
    // (same rows, same 3 columns) — no sizing pass needed
    val ebiDst = Bridge.localCheckpointPartitioned(
      edges.select("src", "dst", "w"), Seq("dst"), sorted = true,
      bytesHint = Bridge.checkpointStorageBytes(edges).getOrElse(-1L))
    val nParts = Bridge.advertisedNumPartitions(ebiDst).getOrElse(
      edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val ebiSrc = Bridge.localCheckpointPartitioned(
      edges.select("src", "dst", "w"), Seq("src"), sorted = true,
      numParts = nParts)
    val nodes = Bridge.localCheckpointPartitioned(
      edges.select(col("src").as("node")).distinct()
        .unionByName(edges.select(col("dst").as("node")).distinct())
        .distinct(),
      Seq("node"), numParts = nParts)
    val keep = protectIds ++ Bridge.checkpointIds(edges) ++
      Bridge.checkpointIds(ebiDst) ++ Bridge.checkpointIds(ebiSrc) ++
      Bridge.checkpointIds(nodes)
    // the staging checkpoint fed ebiDst/ebiSrc/nodes (all eager) — free it
    // now so resident storage holds 2·|E|, not 3·|E|
    if (!(edges eq edges0)) Bridge.freeCheckpoint(edges)
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(sum("__raw").as("__tot"))
      raw.crossJoin(broadcast(tot))
        .select(col("node"), expr(
          s"CAST(CAST(__raw AS DECIMAL(38,0)) * $Scale" +
            " div __tot AS BIGINT)").as(outCol))
    }
    var auth = nodes.withColumn("a_fp", lit(Scale))
    var hubRaw: DataFrame = null
    var authRaw: DataFrame = null
    // per-half-step layout under the Bridge.localCheckpointRound tiny-graph
    // rule (same as pagerank's rounds)
    def roundCp(df: DataFrame): DataFrame =
      Bridge.localCheckpointRound(df, Seq("node"), nParts)
    for (_ <- 1 to iters) {
      // node-layout checkpoints: the score frame re-enters the next
      // half-step's edge join through an alias-aware rename — no exchange
      val hraw = roundCp(ebiDst
        .join(auth.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(sum(col("w").cast("decimal(38,0)") * col("a_fp")).as("__raw")))
      if (hubRaw != null) Bridge.freeCheckpointExcept(hubRaw, keep)
      hubRaw = hraw
      val araw = roundCp(ebiSrc
        .join(normalized(hubRaw, "h_fp").withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("w").cast("decimal(38,0)") * col("h_fp")).as("__raw")))
      if (authRaw != null) Bridge.freeCheckpointExcept(authRaw, keep)
      authRaw = araw
      auth = normalized(authRaw, "a_fp")
    }
    // one materialization so edges/nodes/raw frames can be freed below
    val out = nodes
      .join(auth, Seq("node"), "left")
      .join(normalized(hubRaw, "h_fp"), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("a_fp"), lit(0L)).as("auth_fp"),
        coalesce(col("h_fp"), lit(0L)).as("hub_fp"))
      .localCheckpoint()
    Bridge.freeCheckpoint(ebiDst)
    Bridge.freeCheckpoint(ebiSrc)
    Bridge.freeCheckpoint(nodes)
    Bridge.freeCheckpointExcept(hubRaw, keep)
    Bridge.freeCheckpointExcept(authRaw, keep)
    out
  }

  /** Multi-source shortest distances by `rounds` synchronous Bellman-Ford
    * relaxations over weighted undirected edges (`aCol`, `bCol`, `wCol` —
    * positive integer weights): dist(n) = min over ≤`rounds`-edge paths
    * from any seed of the path weight sum. The distance-to-nearest-hub
    * field of data-organization pipelines. Integer min-plus only — parity
    * is trivial, and the oracle replays the unrolled relaxation exactly
    * (idempotent past the graph's true shortest-path depth).
    *
    * Scale shape: the both-direction incidence frame is partitioned by
    * source node and checkpointed ONCE (the only O(E) shuffle); each round
    * joins it with the current distance frontier (node-dimension) and
    * min-combines — map-side-combined aggregation, per-round checkpoints,
    * superseded rounds freed with the input's ids protected. */
  def multiSourceSssp(edges: DataFrame, aCol: String, bCol: String,
                      wCol: String, seeds: DataFrame,
                      rounds: Int): DataFrame = {
    val protectIds = Bridge.checkpointIds(edges) ++ Bridge.checkpointIds(seeds)
    // ADVERTISED src layout (r15 opt): the old repartition+checkpoint laid
    // the frame out but the planner could not SEE it (UnknownPartitioning
    // under AQE), so every round's frontier join re-exchanged — re-wrote
    // to shuffle storage — the full incidence frame anyway. Advertising
    // makes the one O(E) shuffle real: per round only the node-dimension
    // frontier moves (its exchange + the min-combine aggregation).
    // a bare-checkpoint input (g8's memoized weighted-edge artifact) has
    // registered storage bytes — the both-direction frame is 2x that, so
    // the helper needs no sizing pass of its own. UNSORTED layout + a
    // SHUFFLE_HASH frontier (the kcore wave pattern, r16 opt): the rounds
    // then hash the node-dimension frontier and stream the resident frame
    // in place with no sort on either side — the r15 sorted layout paid an
    // O(E log E) sort once so sort-merge rounds would not re-sort, but
    // with hashed rounds nobody sorts at all.
    val ebi = Bridge.localCheckpointPartitioned(edges
      .select(col(aCol).as("src"), col(bCol).as("dst"), col(wCol).as("w"))
      .unionByName(edges
        .select(col(bCol).as("src"), col(aCol).as("dst"), col(wCol).as("w"))),
      Seq("src"),
      bytesHint = Bridge.checkpointStorageBytes(edges).map(2L * _).getOrElse(-1L))
    val keep = protectIds ++ Bridge.checkpointIds(ebi)
    var dist = seeds.select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val relax = ebi
        .join(dist.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionByName(relax)
        .groupBy("node").agg(min("dist").as("dist"))
        .localCheckpoint()
      Bridge.freeCheckpointExcept(dist, keep)
      dist = next
    }
    Bridge.freeCheckpointExcept(ebi, protectIds)
    dist
  }

  /** Exact triangle listing by degree-ordered compact-forward: each
    * undirected edge is oriented from its lower-(degree, id) endpoint, so
    * every triangle is emitted exactly ONCE — at its unique apex with two
    * out-edges — and out-degrees are bounded by O(√m) (a hub's edges
    * point INTO it), the standard skew control that keeps the wedge join
    * from exploding on power-law graphs. The degree frame is a
    * node-dimension table (|V| rows ≪ |E| on dense graphs) joined back by
    * key — nothing broadcast by construction, AQE may choose to.
    *
    * Input: DISTINCT undirected edges with `aCol < bCol`. Output: one row
    * per triangle (x = apex, y < z by id). The triangle SET is
    * algorithm-independent, so an oracle may replay it with the simpler
    * id-ordered enumeration and agree exactly. */
  def triangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val deg = e.select(col("a").as("n")).unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("n").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("__db")), "b")
    val fwd = col("__da") < col("__db") ||
      (col("__da") === col("__db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("src"),
      when(fwd, col("b")).otherwise(col("a")).as("dst"))
    oriented.select(col("src"), col("dst").as("y"))
      .join(oriented.select(col("src"), col("dst").as("z")), "src")
      .filter(col("y") < col("z"))
      .join(e, col("y") === col("a") && col("z") === col("b"))
      .select(col("src").as("x"), col("y"), col("z"))
  }

  /** Bounded-round k-core peel over DISTINCT undirected edges
    * (`aCol < bCol`): repeatedly drop every node whose induced degree is
    * < k, until a fixpoint or `maxRounds`. Returns the surviving nodes
    * with their induced degree (`node`, `core_deg`).
    *
    * Peeling is DEGREE-DECREMENT, not edge re-induction: the both-direction
    * incidence frame is hash-partitioned by node and checkpointed ONCE
    * (the only O(E) shuffle), and each synchronous round then (1) reads
    * the node-dimension degree table for this wave's removals and (2)
    * decrements the survivors' degrees by their edges into the removed set
    * — deg_{i+1}(n) = deg_i(n) − |Γ(n) ∩ removed_i|, which equals the
    * re-induced degree exactly, wave by wave (r12 rewrite: the old
    * re-induction shuffled the full edge set three times per round;
    * measured 10.6 → ~4 s at sf0.1). Per-round moved data is the removed
    * set plus its incident edges — both shrink toward the fixpoint — while
    * the resident incidence frame is only scanned, never reshuffled. An
    * empty removal wave certifies the fixpoint, and a fixpoint is
    * idempotent — an oracle may replay the peel unrolled to any round
    * count ≥ the fixpoint depth and agree exactly. Every round's degree
    * frame is localCheckpoint'ed (constant plan depth in the round count)
    * and the superseded round's blocks are freed with the INPUT's ids
    * protected ([[Bridge.freeCheckpointExcept]] — the r10 composition
    * rule). */
  def kcorePeel(edges: DataFrame, aCol: String, bCol: String, k: Int,
                maxRounds: Int, broadcastWaves: Boolean = false): DataFrame = {
    val protectIds = Bridge.checkpointIds(edges)
    // input staging: the both-direction union consumes `edges` TWICE — an
    // unmaterialized build subtree (g4's self-join + distinct) would run
    // twice inside the incidence materialization
    val e0 = if (Bridge.isBareCheckpoint(edges)) edges
             else edges.localCheckpoint(true)
    // ADVERTISED layout (r15 opt): the resident incidence frame is joined
    // by n every round; a plain repartition+localCheckpoint loses its
    // partitioning under AQE, so every round's join re-exchanged — i.e.
    // re-WROTE to shuffle storage — the full 2·|E| frame (the r15 s6 plan
    // audit). With HashPartitioning(n) advertised on the checkpoint leaf,
    // the planner satisfies the join distribution in place: per round only
    // the shrinking removal wave moves.
    // e0 is a bare checkpoint either way, so the both-direction frame's
    // size class is KNOWN (2x the input's registered bytes) — pass it and
    // skip the helper's sizing materialization (VERDICT r15 #1: the
    // staging path cost every iterative operator a second full pass)
    val nbr = Bridge.localCheckpointPartitioned(e0
      .select(col(aCol).as("n"), col(bCol).as("z"))
      .unionByName(e0.select(col(bCol).as("n"), col(aCol).as("z"))),
      Seq("n"),
      bytesHint = Bridge.checkpointStorageBytes(e0).map(2L * _).getOrElse(-1L))
    if (!(e0 eq edges)) Bridge.freeCheckpoint(e0) // consumed only by nbr
    val keep = protectIds ++ Bridge.checkpointIds(nbr)
    // fixpoint probe rides the checkpoint action (r16 opt): each round's
    // ONE job also counts next round's removal wave via `observe`, so the
    // old per-round `removed.count()` probe job is gone — at local[32] the
    // per-round scheduling overhead was the measured cost (VERDICT r15 #1:
    // g4 ran FASTER on 8 cores), and at cluster scale it halves the
    // per-round job count outright. Loop behavior is identical: peel only
    // while the wave is nonempty, bounded by maxRounds.
    def waveObs(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs, count(when(col("deg") < k, 1)).as("__wave")), obs)
    }
    val (deg0, obs0) = waveObs(nbr.groupBy("n").agg(count(lit(1)).as("deg")))
    var deg = deg0.localCheckpoint(true)
    var wave = obs0.get("__wave").asInstanceOf[Long]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val removed = deg.filter(col("deg") < k).select("n")
      if (wave == 0L) {
        done = true
      } else {
        // broadcastWaves: when the graph's node set is PROVABLY BOUNDED
        // (a rule/config-derived dictionary graph, a fixed taxonomy —
        // never an SF-scaling dimension like parts), the removal wave
        // broadcasts EXPLICITLY. Without the hint AQE does convert this
        // join to broadcast at runtime — but only after the planned
        // exchange's map stage has MATERIALIZED, so the resident incidence
        // frame is still written to shuffle storage every round (plan
        // audit, PLANS r15 s6: Exchange → ShuffleQueryStage →
        // AQEShuffleRead-local under the BroadcastHashJoin). Invisible at
        // local[32] (same warm medians — an in-memory write), a real
        // per-round cost once shuffle writes hit disk/network at cluster
        // scale. Default false: a general graph's wave is
        // node-dimension-sized and must stay a shuffle join.
        // default wave: SHUFFLE_HASH, not sort-merge — the advertised nbr
        // side streams in place either way, but SMJ would SORT the full
        // resident frame every round (O(E) CPU per round); hashing the
        // node-dimension wave costs |wave| instead
        val waveDf =
          if (broadcastWaves) broadcast(removed)
          else removed.hint("shuffle_hash")
        val dec = nbr.join(waveDf, "n")
          .groupBy(col("z").as("n")).agg(count(lit(1)).as("__d"))
        val (nextObs, obs) = waveObs(deg.filter(col("deg") >= k)
          .join(dec, Seq("n"), "left")
          .select(col("n"),
            (col("deg") - coalesce(col("__d"), lit(0L))).as("deg")))
        val next = nextObs.localCheckpoint()
        Bridge.freeCheckpointExcept(deg, keep)
        deg = next
        wave = obs.get("__wave").asInstanceOf[Long]
      }
      round += 1
    }
    Bridge.freeCheckpointExcept(nbr, protectIds)
    // deg-0 survivors (possible only on a truncated, pre-fixpoint exit)
    // are isolated — they appear in no induced edge, so they are not part
    // of the peeled graph
    deg.filter(col("deg") >= 1L)
      .select(col("n").as("node"), col("deg").as("core_deg"))
  }

  /** Link prediction by shared neighbors, ANCHORED TO A SEED SET — the
    * "customers who bought X also bought Y-adjacent" recommender shape:
    * for each seed q, rank the non-adjacent nodes by common-neighbor
    * count (Liben-Nowell & Kleinberg 2003), tie-broken by neighborhood
    * Jaccard |Γq∩Γc| / |Γq∪Γc| as integer ppm.
    *
    * Why seed-anchored: an ALL-PAIRS common-neighbor table is the wedge
    * multiset Σ_z C(deg z, 2) — on this corpus's near-uniform-degree
    * co-purchase graph (measured deg ≈ 115 at BOTH sf0.01 and sf0.1,
    * PLANS r11 s7) that is quadratic in |V| with no power-law tail to
    * prune (the g3 degree-orientation trick bounds triangle listing, not
    * wedge COUNTING, whose output itself is the quadratic). Anchoring
    * bounds the join to Σ_{q∈seeds} deg(q)·avgdeg rows — per-seed cost is
    * corpus-size-INVARIANT when degree is, and the seed frame broadcasts.
    * All-pairs at scale routes to the capped/approximate variants
    * (minhash over neighbor sets — d2's machinery on Γ(v) as the token
    * set) rather than this exact operator.
    *
    * Float parity: counts and ppm floor-divisions only — no doubles.
    *
    * @param edges DISTINCT undirected edges, `aCol < bCol`
    * @param seeds one column `q` — the anchor nodes (small, broadcast)
    * @return (q, rank, cand, cn, jaccard_ppm), top-k per seed, ties
    *         (cn desc, jaccard_ppm desc, cand asc) */
  def relatedBySharedNeighbors(edges: DataFrame, aCol: String, bCol: String,
                               seeds: DataFrame, k: Int,
                               minCn: Int = 2): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val nbr = e.select(col("a").as("n"), col("b").as("z"))
      .unionByName(e.select(col("b").as("n"), col("a").as("z")))
    val deg = nbr.groupBy("n").agg(count(lit(1)).as("deg"))
    val nq = nbr.join(broadcast(seeds.select(col("q"))), col("n") === col("q"))
      .select(col("q"), col("z"))
    val cn = nq.join(nbr.select(col("n").as("cand"), col("z")), "z")
      .filter(col("cand") =!= col("q"))
      .groupBy("q", "cand").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCn)
    val nonEdge = cn
      .withColumn("__p1", least(col("q"), col("cand")))
      .withColumn("__p2", greatest(col("q"), col("cand")))
      .join(e.select(col("a").as("__p1"), col("b").as("__p2")),
        Seq("__p1", "__p2"), "left_anti")
    val scored = nonEdge
      .join(deg.select(col("n").as("q"), col("deg").as("__dq")), "q")
      .join(deg.select(col("n").as("cand"), col("deg").as("__dc")), "cand")
      .withColumn("jaccard_ppm",
        expr("cn * 1000000 div (__dq + __dc - cn)"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("q")
      .orderBy(col("cn").desc, col("jaccard_ppm").desc, col("cand"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q"), col("rank").cast("long").as("rank"), col("cand"),
        col("cn"), col("jaccard_ppm"))
  }
}
