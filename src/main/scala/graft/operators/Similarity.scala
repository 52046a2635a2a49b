package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.DotProduct.{cosine, dot}
import graft.functions.{BinarySig, PqVec, QuantizedVec}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k: broadcast the (small) query set and stream
  *    the corpus once — the exact baseline, linear in corpus size;
  *  - random-hyperplane LSH bucketing: the scale path — corpus shuffles
  *    once on a small integer bucket id; candidate generation is an
  *    equi-join on the bucket, never a cartesian product.
  *
  * Hyperplanes are derived deterministically from md5, so results are
  * reproducible and oracle-replayable.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. Scoring uses the
    * native codegen'd [[graft.functions.DotProduct]] (left-fold accumulation
    * matching DuckDB's list_sum order — bit-identical across engines).
    * @param queries (qid, qvec: array<double>) — small, broadcast
    * @param corpus  (cid, cvec: array<double>) — streamed once */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        floor(col("sim") * lit(100000.0)).cast("long").as("sim_fp"))
  }

  /** Embedding-space decontamination: flag every corpus vector whose
    * cosine to ANY benchmark vector reaches `tauFp` (fixed-point
    * ⌊cos·10⁶⌋ — the no-raw-double-output invariant; per-pair doubles are
    * bit-identical via the native left-fold [[graft.functions.DotProduct]],
    * so the floor is engine-exact). The semantic sibling of the d7/d9
    * n-gram decontamination: eval sets leak into crawls as paraphrases
    * and re-encodes that share no exact grams.
    *
    * Scale shape: a benchmark suite is small by nature, so it BROADCASTS
    * and the corpus streams once — no corpus shuffle, no LSH needed; the
    * per-row cost is |bench| codegen'd dot products and the only exchange
    * carries one (cid, sim) row per corpus×bench pair into a map-side-
    * combined max. A benchmark too large to broadcast routes to the
    * bucketed path instead ([[cosineDedupRemoved]]'s corpus-sized planes).
    *
    * @param corpus (cid, cvec: array<double>)
    * @param bench  (bid, bvec: array<double>) — small, broadcast */
  def embeddingDecontaminate(corpus: DataFrame, bench: DataFrame,
                             tauFp: Long): DataFrame =
    corpus.crossJoin(broadcast(bench))
      .withColumn("__sim_fp",
        floor(cosine(col("cvec"), col("bvec")) * lit(1000000.0)).cast("long"))
      .groupBy(col("cid"))
      .agg(max(col("__sim_fp")).as("max_sim_fp"),
        count(when(col("__sim_fp") >= tauFp, 1)).as("n_contacts"))
      .withColumn("contaminated", col("max_sim_fp") >= tauFp)

  /** Deterministic random-hyperplane bucket id (nPlanes sign bits) for one
    * LSH table. The planes are driver-derived md5 literals (DetHash.planes),
    * inlined into the expression — per-row cost is nPlanes dot products, no
    * hashing. `table` offsets into the global plane family so each table
    * gets independent planes. */
  def lshBucketExpr(vecCol: String, nPlanes: Int, dim: Int,
                    table: Int = 0): org.apache.spark.sql.Column = {
    val all = DetHash.planes((table + 1) * nPlanes, dim)
    // Literal plane arrays + the native DotProduct expression per plane:
    // identical FP result to an ascending-index fold, tight codegen'd loop.
    all.slice(table * nPlanes, (table + 1) * nPlanes).zipWithIndex.map {
      case (plane, p) =>
        when(dot(col(vecCol), typedLit(plane)) > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** All nTables bucket ids as one array column — the FUSED native kernel
    * ([[graft.functions.LshBuckets]]): one data-driven triple loop instead
    * of nTables·nPlanes stacked when(dot)-chains, which fall off HotSpot's
    * JIT budget past ~30 inlined plane loops (measured 52 s → <1 s on the
    * 100 k × 11-plane × 8-table bucketing pass — the kernel's scaladoc).
    * Bit-identical to [[lshBucketsExprHof]] (LshBucketsSpec pins it). */
  def lshBucketsExpr(vecCol: String, nPlanes: Int, dim: Int,
                     nTables: Int): org.apache.spark.sql.Column =
    graft.functions.LshBuckets.buckets(col(vecCol), nPlanes, dim, nTables)

  /** The compositional twin of [[lshBucketsExpr]] (per-table when-chains
    * over [[lshBucketExpr]]) — kept as the spec reference and the shape
    * the SQL oracles replay; NOT for hot paths at high plane counts. */
  private[graft] def lshBucketsExprHof(vecCol: String, nPlanes: Int, dim: Int,
                                       nTables: Int): org.apache.spark.sql.Column =
    array((0 until nTables).map(t => lshBucketExpr(vecCol, nPlanes, dim, t)): _*)

  /** IVF-style approximate top-k: corpus vectors are assigned to their
    * nearest centroid cell (coarse quantization, one broadcast pass);
    * queries probe only the nProbe nearest cells. The search join is keyed
    * on the cell id — at scale the corpus shuffles once on cell and each
    * query touches nProbe/nCells of the data. Centroids here are caller-
    * supplied (deterministic seeds in tests; production would k-means).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
              k: Int, nProbe: Int = 2): DataFrame = {
    val cAssign = nearestCells(centroids)(corpus, "cvec", "cid", 1)
    val qProbe = nearestCells(centroids)(queries, "qvec", "qid", nProbe)
    val scored = cAssign.join(broadcast(qProbe), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        floor(col("sim") * lit(100000.0)).cast("long").as("sim_fp"))
  }

  /** Attribute-filtered IVF search — the filtered-ANN production shape
    * (per-query metadata constraint, e.g. same-language retrieval): the
    * identical cell-keyed probe join as [[ivfTopK]] with the attribute as
    * an extra equi-constraint inside the join, so the top-k stays full
    * WITHIN the query's attribute slice (post-filtering an unfiltered
    * top-k starves recall — the documented filtered-ANN failure mode).
    * The join key space is cells × attribute values — still growing with
    * the corpus. Both frames must carry `attrCol`. */
  def ivfTopKFiltered(queries: DataFrame, corpus: DataFrame,
                      centroids: DataFrame, attrCol: String, k: Int,
                      nProbe: Int = 2): DataFrame = {
    val cAssign = nearestCells(centroids)(
      corpus.withColumnRenamed(attrCol, "__cattr"), "cvec", "cid", 1, Seq("__cattr"))
    val qProbe = nearestCells(centroids)(
      queries.withColumnRenamed(attrCol, "__qattr"), "qvec", "qid", nProbe, Seq("__qattr"))
    val scored = cAssign.join(broadcast(qProbe), Seq("cell"))
      .filter(col("qid") =!= col("cid") && col("__cattr") === col("__qattr"))
      .dropDuplicates("qid", "cid")
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        floor(col("sim") * lit(100000.0)).cast("long").as("sim_fp"))
  }

  /** n nearest centroid cells per vector (cosine, ties by cent_id) — the
    * coarse-quantization step shared by [[ivfTopK]] and [[int8IvfTopK]].
    * Centroids are a k-row broadcast; the argmin is a window over k
    * candidate rows per vector. `keep` carries extra columns (e.g. the
    * filtered-search attribute) through the assignment. */
  private def nearestCells(centroids: DataFrame)(
      df: DataFrame, vecCol: String, idCol: String, n: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("__csim", cosine(col(vecCol), col("centvec")))
    val w = Window.partitionBy(idCol).orderBy(desc("__csim"), asc("cent_id"))
    scored.withColumn("__crn", row_number().over(w)).filter(col("__crn") <= n)
      .select(col(idCol) +: col(vecCol) +: keep.map(col) :+ col("cent_id").as("cell"): _*)
  }

  /** Hyperplane count sized to the corpus — THE knob that keeps LSH
    * dedup linear. With `p` planes a table has 2^p buckets, so expected
    * occupancy is n/2^p and within-bucket candidate pairs grow as
    * n²/2^p per table: hold occupancy CONSTANT (planes ~ log2(n/target))
    * and candidates grow linearly with n; hold PLANES constant and they
    * grow quadratically. Measured (PLANS.md round 6): the fixed-4-plane
    * d5 pipeline went 2.4 s → 154 s on a 10× corpus (exponent 1.8);
    * re-sized planes restore ~linear. More planes lower per-table recall
    * (p_agree^planes), so production compensates with more OR-amplified
    * tables: recall = 1-(1-p^planes)^tables. */
  def lshPlanesFor(corpusSize: Long, targetOccupancy: Int = 64): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    val buckets = math.max(1.0, corpusSize.toDouble / targetOccupancy)
    math.max(1, math.min(48, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** Plane count for a concrete corpus frame: one count() job, then
    * [[lshPlanesFor]]. The count is the price of a scale-safe default —
    * cheap on parquet-backed frames (footer metadata), one streaming pass
    * on computed ones — and it is what keeps the default API linear at any
    * corpus size. Oracle-replaying callers that must inline the plane
    * literals into generated SQL compute this once and pass it to the
    * `…Pinned` variants. */
  def lshPlanesForCorpus(vectors: DataFrame, targetOccupancy: Int = 64): Int =
    lshPlanesFor(vectors.count(), targetOccupancy)

  /** Embedding-cosine near-duplicate removal — the DEFAULT, scale-safe
    * entry point: multi-table LSH candidate pairs, cosine-verified at
    * `threshold`, then drop the larger id of every verified pair (min-id
    * retention). No all-pairs comparison. The hyperplane count is sized
    * FROM THE CORPUS ([[lshPlanesForCorpus]]) so bucket occupancy — and
    * with it candidate-pair volume — stays constant as the corpus grows;
    * hand-picking a fixed plane count is the measured-quadratic shape
    * (exponent 1.8 at 10×, PLANS.md r6) and now requires the explicitly
    * named [[cosineDedupRemovedPinned]]. */
  def cosineDedupRemoved(vectors: DataFrame, threshold: Double,
                         dim: Int, nTables: Int): DataFrame =
    cosineDedupRemovedPinned(vectors, threshold,
      lshPlanesForCorpus(vectors), dim, nTables)

  /** Fixed-plane variant of [[cosineDedupRemoved]] — for callers that must
    * PIN the plane count externally: oracle-replayed queries (the generated
    * SQL inlines the plane literals, so the count has to be known at
    * SQL-build time) and probe tooling that sweeps plane counts. At scale
    * the pinned count MUST come from [[lshPlanesFor]]; a corpus-independent
    * constant makes candidate pairs grow quadratically. */
  def cosineDedupRemovedPinned(vectors: DataFrame, threshold: Double,
                               nPlanes: Int, dim: Int, nTables: Int): DataFrame = {
    val q = vectors.select(col("vid").as("qid"), col("v").as("qvec"))
    val c = vectors.select(col("vid").as("cid"), col("v").as("cvec"))
    // Self-dedup: BOTH sides are the full corpus, so the bucket equi-join
    // must be a shuffle join — broadcasting would ship the whole dataset.
    lshTopKCandidates(q, c, nPlanes, dim, nTables, broadcastQueries = false)
      .filter(col("qid") < col("cid"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
      .filter(col("sim") >= threshold)
      .select(col("cid").as("removed_id")).distinct()
  }

  /** Shared candidate generation for the multi-table LSH paths. The query
    * side is broadcast only when it is genuinely small (search); self-join
    * dedup passes broadcastQueries = false and shuffles on (tbl, bucket).
    *
    * The bucket join shuffles ONLY (id, tbl, bucket) — never the vector
    * payloads, which would multiply corpus volume by 2*nTables (the same
    * rule the MinHash band join follows, `Dedup.minhashLshPairs`). Vectors
    * re-attach to the deduplicated candidate pairs via two id equi-joins. */
  private[operators] def lshTopKCandidates(queries: DataFrame, corpus: DataFrame,
      nPlanes: Int, dim: Int, nTables: Int,
      broadcastQueries: Boolean = true,
      corpusIndex: Option[DataFrame] = None): DataFrame = {
    def explodeTables(df: DataFrame, idCol: String, vecCol: String) =
      df.withColumn("__bs", lshBucketsExpr(vecCol, nPlanes, dim, nTables))
        .select(col(idCol), posexplode(col("__bs")).as(Seq("tbl", "bucket")))
    val qb0 = explodeTables(queries, "qid", "qvec")
    val qb = if (broadcastQueries) broadcast(qb0) else qb0
    // a PREBUILT (cid, tbl, bucket) index — e.g. the stream-maintained
    // StreamingVectorIndex artifact — replaces the corpus bucketing pass
    val cb = corpusIndex.getOrElse(explodeTables(corpus, "cid", "cvec"))
    val candIds = cb.join(qb, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").dropDuplicates("qid", "cid")
    val qSide = if (broadcastQueries) broadcast(queries) else queries
    candIds.join(qSide, Seq("qid")).join(corpus, Seq("cid"))
      .select("qid", "qvec", "cid", "cvec")
  }

  /** Deterministic distributed k-means (Lloyd's, fixed iteration count) —
    * the centroid-training step [[ivfTopK]] leaves to the caller, and the
    * corpus-organization primitive (cluster-then-sample, cluster-balanced
    * mixtures) of training-data pipelines.
    *
    * Every stochastic choice is pinned so an external SQL engine can replay
    * the run bit-for-bit:
    *  - seeds = the k vectors with the smallest (md5(id), id) — a
    *    distributed top-k (TakeOrdered), never a global sort;
    *  - assignment = argmin of d² = x·x + c·c − 2·x·c with ties broken by
    *    cluster id; all three dots are the native codegen'd [[DotProduct]]
    *    (ascending left-fold — bit-identical to list_sum oracles);
    *  - centroid update sums FIXED-POINT values: floor(x·2²⁰) is exact for
    *    any double (power-of-two scaling), the per-dimension sums are
    *    DECIMAL (exact, associative — partition order cannot change them),
    *    and the final divide runs in double the same way on any engine.
    *    Summing raw doubles here would tie the result to partition order;
    *    quantizing at 2⁻²⁰ trades ~1e-6 centroid precision for exactness.
    *
    * Scale shape per iteration: one broadcast of k centroid rows, one
    * argmin hash-aggregation keyed by the vector id (min_by — map-side
    * partial agg collapses the k candidate rows per vector before any
    * exchange), one (cid, pos) aggregation — also map-side combined,
    * k·dim groups. Nothing global. The k-row centroid frame is
    * localCheckpoint'ed each iteration so plan depth (and re-scans of the
    * vector set) stay constant in `iters` instead of growing linearly.
    *
    * @return (cid, n, c): final cluster id, member count, centroid.
    */
  def kmeansLloyd(vectors: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = vectors
      .select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .withColumn("__xx", dot(col("__v"), col("__v")))
    val seeds = e
      .withColumn("__h", expr(TextOps.md5LongSql("cast(__vid as string)")))
      .orderBy(col("__h"), col("__vid")).limit(k)
    // rank→cid over k rows (tiny frame; the single-partition window is k-sized)
    val w0 = Window.orderBy(col("__h"), col("__vid"))
    var centroids = seeds
      .withColumn("cid", (row_number().over(w0) - 1).cast("int"))
      .select(col("cid"), col("__v").as("__c"))
      .withColumn("__cc", dot(col("__c"), col("__c")))
      .withColumn("n", lit(0L))
    // Checkpoint blocks the CALLER owns (the input may itself be a
    // checkpointed frame — assignClustersApprox runs this over the outer
    // run's checkpointed centroids). Round 0's plan derives from the input,
    // so the hygiene free below must exclude these ids or iteration 1 frees
    // the caller's blocks and every downstream read dies with
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND (VERDICT r10 #1).
    val protectIds = Bridge.checkpointIds(vectors)
    for (_ <- 1 to iters) {
      val assigned = assignStep(e, centroids)
      val next = assigned
        .select(col("cid"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .withColumn("__q", floor(col("__x") * lit(1048576.0)).cast(DecimalType(38, 0)))
        .groupBy("cid", "__pos")
        .agg(sum("__q").as("__s"), count(lit(1)).as("__n"))
        .withColumn("__cv", col("__s").cast("double") / col("__n") / lit(1048576.0))
        .groupBy("cid")
        .agg(min("__n").as("n"),
          transform(array_sort(collect_list(struct(col("__pos"), col("__cv")))),
            s => s.getField("__cv")).as("__c"))
        .withColumn("__cc", dot(col("__c"), col("__c")))
        // k tiny rows: materialize and cut the lineage so iteration i+1's
        // plan does not embed (and re-execute) iteration i's full subtree
        .localCheckpoint()
      // the superseded round's blocks are freed EXPLICITLY (the iterative-
      // operator hygiene contract, CheckpointHygieneSpec) — waiting for GC
      // would leave iters-1 stray k-row block sets per run. Only blocks
      // this loop itself checkpointed are freed: the caller's (protectIds)
      // survive.
      Bridge.freeCheckpointExcept(centroids, protectIds)
      centroids = next
    }
    centroids.select(col("cid"), col("n"), col("__c").as("c"))
  }

  /** One Lloyd assignment pass: nearest centroid per vector, ties broken by
    * cluster id. `e` carries (__vid, __v, __xx); centroids carry
    * (cid, __c, __cc). Shared by the training loop and [[assignClusters]].
    *
    * The argmin is a min_by hash-aggregation on the vector id, NOT a
    * window: partial aggregation collapses the k candidate rows per vector
    * map-side, so the exchange carries ~N rows instead of sorting k·N.
    * Ordering by struct(__d2, cid) reproduces the (distance, cluster-id)
    * tie rule exactly — the struct comparison is lexicographic and unique
    * per (vector, cluster). */
  private def assignStep(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids.select("cid", "__c", "__cc")))
      .withColumn("__d2",
        col("__xx") + col("__cc") - lit(2.0) * dot(col("__v"), col("__c")))
      .groupBy("__vid")
      .agg(min_by(struct(col("cid"), col("__v")),
        struct(col("__d2"), col("cid"))).as("__best"))
      .select(col("__vid"), col("__best.__v").as("__v"), col("__best.cid").as("cid"))

  /** [[assignStep]] when only the WINNING ID is needed (inference-side
    * assignment): the argmin aggregation buffer carries just the cluster
    * id, not the vector — the training loop's variant ships the full
    * vector through min_by because the centroid recompute reads it, but
    * an (id, cid) consumer paid dim×8 bytes per row of aggregation buffer
    * and exchange for nothing (r16 opt). Same distance decomposition,
    * same (d², cid) tie rule — results identical. */
  private def assignStepIds(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids.select("cid", "__c", "__cc")))
      .withColumn("__d2",
        col("__xx") + col("__cc") - lit(2.0) * dot(col("__v"), col("__c")))
      .groupBy("__vid")
      .agg(min_by(col("cid"), struct(col("__d2"), col("cid"))).as("cid"))

  /** Assign every vector to its nearest centroid from a [[kmeansLloyd]]
    * result — the inference half of k-means (same distance decomposition
    * and tie rule as training, so an external oracle replays it).
    * @return (idCol, cid) */
  def assignClusters(vectors: DataFrame, centroids: DataFrame,
                     idCol: String, vecCol: String): DataFrame = {
    val e = vectors
      .select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .withColumn("__xx", dot(col("__v"), col("__v")))
    val c = centroids.select(col("cid"), col("c").as("__c"))
      .withColumn("__cc", dot(col("__c"), col("__c")))
    assignStepIds(e, c).select(col("__vid").as(idCol), col("cid"))
  }

  /** Cluster count for the [[semDedupRemoved]] family, sized from the
    * corpus: k = ceil(n / targetClusterSize). With a fixed TARGET CLUSTER
    * SIZE the within-cluster pair volume is n·targetClusterSize/2 — LINEAR
    * in the corpus. A corpus-independent k is the hidden quadratic (cluster
    * population grows with n, pairs with its square) — the same failure
    * mode as a fixed LSH plane count (PLANS.md r6). */
  def semDedupKFor(n: Long, targetClusterSize: Int = 512): Int =
    math.max(2, math.ceil(n.toDouble / targetClusterSize.toDouble).toInt)

  /** Semantic dedup in the cluster-scoped style (SemDeDup, Abbas et al.
    * 2023, arXiv:2303.09540): partition the embedding space with
    * [[kmeansLloyd]], compare EXACT pairwise cosine only WITHIN a cluster,
    * and drop the larger id of every pair at or above `threshold` (min-id
    * retention, as [[cosineDedupRemoved]]). Complements the LSH family:
    * learned data-density cells instead of random hyperplanes, so near-dups
    * that straddle no hyperplane bucket still meet — the recall loss moves
    * to cluster boundaries, which the paper accepts by construction.
    *
    * DEFAULT entry point is scale-safe: k is sized FROM THE CORPUS
    * ([[semDedupKFor]]) so pair volume stays linear as it grows. The
    * candidate join shuffles ONLY (id, cid) — never vector payloads, which
    * re-attach to the surviving pairs via two id equi-joins (the same
    * payload rule as `lshTopKCandidates` and the MinHash band join).
    *
    * @return (removed_id, cid, dup_of, max_sim_fp): dropped vector, its
    *         cluster, the smallest above-threshold partner, best cosine as
    *         ⌊sim·10⁶⌋ fixed point (engine-version-proof output rule). */
  def semDedupRemoved(vectors: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, iters: Int = 2): DataFrame =
    semDedupRemovedPinned(vectors, idCol, vecCol, threshold,
      semDedupKFor(vectors.count()), iters)

  /** Pinned-k variant of [[semDedupRemoved]] — for oracle SQL generation
    * (the replayed WITH-chain inlines k at build time) and probe sweeps.
    * At scale the pinned value MUST come from [[semDedupKFor]]. */
  def semDedupRemovedPinned(vectors: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, k: Int, iters: Int): DataFrame = {
    val v = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val cents = kmeansLloyd(v, "__vid", "__v", k, iters)
    semDedupFromAssignment(v, assignClusters(v, cents, "__vid", "__v"), threshold)
  }

  /** The pair half of the SemDeDup family, shared by the flat and two-level
    * assignment paths: within-cluster candidate pairs over (id, cid) only,
    * payload re-attach by id, cosine verify, min-id retention. The
    * assignment frame is materialized once (2 longs/row) so the self-join's
    * two sides don't each re-run the assignment pass. */
  private def semDedupFromAssignment(v: DataFrame, assignment: DataFrame,
                                     threshold: Double): DataFrame = {
    val assigned = assignment.localCheckpoint()
    val pairs = assigned.select(col("cid"), col("__vid").as("__ida"))
      .join(assigned.select(col("cid"), col("__vid").as("__idb")), Seq("cid"))
      .filter(col("__ida") < col("__idb"))
    pairs
      .join(v.select(col("__vid").as("__ida"), col("__v").as("__va")), Seq("__ida"))
      .join(v.select(col("__vid").as("__idb"), col("__v").as("__vb")), Seq("__idb"))
      .withColumn("__sim", cosine(col("__va"), col("__vb")))
      .filter(col("__sim") >= threshold)
      .groupBy(col("__idb"))
      .agg(min("cid").as("cid"), min("__ida").as("dup_of"),
        max("__sim").as("__best"))
      .select(col("__idb").as("removed_id"), col("cid"), col("dup_of"),
        floor(col("__best") * lit(1000000.0)).cast("long").as("max_sim_fp"))
  }

  /** Build the persisted artifacts the incremental semantic-dedup path
    * probes: frozen centroids plus the cluster-keyed vector index
    * (vid, cid, v). One Lloyd run + one assignment over the corpus — done
    * ONCE; [[incrementalSemDedup]] then folds batches in without ever
    * touching the corpus again. */
  def semClusterIndex(vectors: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): (DataFrame, DataFrame) = {
    val v = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val cents = kmeansLloyd(v, "__vid", "__v", k, iters)
    val index = assignClusters(v, cents, "__vid", "__v")
      .join(v, Seq("__vid"))
      .select(col("__vid").as("vid"), col("cid"), col("__v").as("v"))
    (cents, index)
  }

  /** Incremental semantic dedup — the daily-ingest shape for the SemDeDup
    * family, completing the incremental column (exact d12, near-dup d11,
    * components d13): the corpus was clustered ONCE into a persisted
    * [[semClusterIndex]]; a new batch assigns against the FROZEN centroids
    * (broadcast k rows — no Lloyd, no corpus re-scan), cosine-verifies
    * against its clusters' indexed members and within itself, and drops
    * batch ids only (append-only retention — the indexed corpus never
    * loses rows). Centroid drift is periodic-rebuild territory, not
    * per-batch — the standard frozen-codebook trade.
    *
    * Scale shape: the cross leg is ONE scan of the cluster-keyed index
    * with the batch BROADCAST onto it — the index is never shuffled, and
    * the cosine verify runs inline in the scan stage so only above-
    * threshold survivors reach the final batch-keyed aggregation. The
    * within-batch leg is batch-sized. Batch and corpus id spaces must be
    * disjoint (ingest contract).
    *
    * @param index (vid, cid, v) from [[semClusterIndex]] (or its streamed
    *              equivalent) — read from its store, not rebuilt
    * @return (removed_id, cid, dup_of, max_sim_fp) over BATCH ids only */
  def incrementalSemDedup(newBatch: DataFrame, centroids: DataFrame,
                          index: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val nb = newBatch.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val assigned = assignClusters(nb, centroids, "__vid", "__v")
      .join(nb, Seq("__vid"))
      .localCheckpoint()
    val cross = index
      .select(col("cid"), col("vid").as("__ida"), col("v").as("__va"))
      .join(broadcast(assigned.select(col("cid"), col("__vid").as("__idb"),
        col("__v").as("__vb"))), Seq("cid"))
      .withColumn("__sim", cosine(col("__va"), col("__vb")))
      .filter(col("__sim") >= threshold)
      .select(col("cid"), col("__ida"), col("__idb"), col("__sim"))
    val within = assigned
      .select(col("cid"), col("__vid").as("__ida"), col("__v").as("__va"))
      .join(broadcast(assigned.select(col("cid"), col("__vid").as("__idb"),
        col("__v").as("__vb"))), Seq("cid"))
      .filter(col("__ida") < col("__idb"))
      .withColumn("__sim", cosine(col("__va"), col("__vb")))
      .filter(col("__sim") >= threshold)
      .select(col("cid"), col("__ida"), col("__idb"), col("__sim"))
    cross.unionByName(within)
      .groupBy("__idb")
      .agg(min("cid").as("cid"), min("__ida").as("dup_of"),
        max("__sim").as("__best"))
      .select(col("__idb").as("removed_id"), col("cid"), col("dup_of"),
        floor(col("__best") * lit(1000000.0)).cast("long").as("max_sim_fp"))
  }

  /** Two-level (supercell) centroid assignment — the sub-quadratic scale
    * path for corpus-derived k. Flat assignment is O(n·k·d): with
    * [[semDedupKFor]]'s k ∝ n that is QUADRATIC in the corpus, and the
    * k-row centroid broadcast eventually outgrows executors. Here the k
    * centroids are themselves clustered into nSuper supercells (a k-row
    * problem — trivial), each vector greedily picks its nearest supercell
    * (n·nSuper dots) and then argmins EXACTLY over that supercell's
    * centroids (n·k/nSuper expected dots): nSuper ≈ √k makes assignment
    * O(n·√k·d) total, and only the √k-row supercell table plus the
    * supercell-tagged centroid table are ever broadcast.
    *
    * APPROXIMATE by construction (the true nearest centroid can live in a
    * non-nearest supercell — the standard IVF trade, same as `s4_ivf_topk`
    * probing 2 cells) but fully DETERMINISTIC: every step is the same
    * argmin-with-(d², cid)-ties machinery as [[assignClusters]], so an
    * external oracle replays it bit-for-bit. A vector whose supercell ends
    * up centroid-less after the final refit (rare) drops out of the
    * assignment — callers doing dedup treat unassigned as "kept".
    *
    * @return (idCol, cid) for every vector whose supercell is non-empty. */
  def assignClustersApprox(vectors: DataFrame, centroids: DataFrame,
                           idCol: String, vecCol: String, nSuper: Int,
                           superIters: Int = 2): DataFrame = {
    val cents = centroids.select(col("cid").as("kid"), col("c").as("kv"))
    val supers = kmeansLloyd(cents, "kid", "kv", nSuper, superIters)
    val c2s = assignClusters(cents, supers, "kid", "kv")
      .select(col("kid").as("cid"), col("cid").as("__scid"))
    val v2s = assignClusters(
        vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v")),
        supers, "__vid", "__v")
      .select(col("__vid"), col("cid").as("__scid"))
    val e = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
      .join(v2s, Seq("__vid"))
      .withColumn("__xx", dot(col("__v"), col("__v")))
    val kc = centroids.select(col("cid"), col("c").as("__c"))
      .join(c2s, Seq("cid"))
      .withColumn("__cc", dot(col("__c"), col("__c")))
    // equi-join on the supercell id: the fan-out to the supercell's
    // centroids happens map-side against the broadcast table, and min_by's
    // partial aggregation collapses it back to n rows before any exchange
    e.join(broadcast(kc), Seq("__scid"))
      .withColumn("__d2",
        col("__xx") + col("__cc") - lit(2.0) * dot(col("__v"), col("__c")))
      .groupBy("__vid")
      .agg(min_by(col("cid"), struct(col("__d2"), col("cid"))).as("cid"))
      .select(col("__vid").as(idCol), col("cid"))
  }

  /** [[semDedupRemoved]] with two-level assignment — the entry point that
    * stays sub-quadratic when k is corpus-derived. Same pair machinery and
    * retention rule; the approximation is confined to WHICH cluster a
    * vector lands in. */
  def semDedupRemovedScaled(vectors: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, iters: Int = 2): DataFrame = {
    val k = semDedupKFor(vectors.count())
    semDedupRemovedScaledPinned(vectors, idCol, vecCol, threshold, k,
      math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt), iters)
  }

  /** Pinned variant of [[semDedupRemovedScaled]] (oracle SQL generation /
    * probe sweeps): k, nSuper, and the supercell refit depth are fixed so
    * the replayed WITH-chain can inline them. */
  def semDedupRemovedScaledPinned(vectors: DataFrame, idCol: String,
                                  vecCol: String, threshold: Double, k: Int,
                                  nSuper: Int, iters: Int,
                                  superIters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val cents = kmeansLloyd(v, "__vid", "__v", k, iters)
    semDedupFromAssignment(v,
      assignClustersApprox(v, cents, "__vid", "__v", nSuper, superIters),
      threshold)
  }

  /** Multi-table LSH approximate top-k — the DEFAULT, scale-safe entry
    * point: planes are sized from the CORPUS ([[lshPlanesForCorpus]]) so
    * bucket occupancy stays constant as it grows. Recall is
    * 1-(1-p^nPlanes)^nTables for per-plane agreement p — more tables
    * compensate for the deeper buckets a bigger corpus gets. Fixed plane
    * counts (oracle replay, recall sweeps) take [[lshTopKPinned]]. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, nTables: Int = 8): DataFrame =
    lshTopKPinned(queries, corpus, k, lshPlanesForCorpus(corpus), dim, nTables)

  /** Fixed-plane variant of [[lshTopK]] (OR-amplification): a candidate is
    * any corpus vector sharing the query's bucket in AT LEAST ONE of the
    * nTables hash tables. The shuffle key is (table, bucket); per-pair dedup
    * happens before scoring so each candidate is scored once. Pin the plane
    * count only when it must be known outside the engine (generated oracle
    * SQL, probe sweeps) — and size it with [[lshPlanesFor]] at scale. */
  def lshTopKPinned(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
                    dim: Int, nTables: Int = 8): DataFrame =
    lshTopKScore(lshTopKCandidates(queries, corpus, nPlanes, dim, nTables), k)

  /** [[lshTopKPinned]] probing a PREBUILT corpus bucket index
    * (cid, tbl, bucket) — the consumer of the stream-maintained
    * [[graft.streaming.StreamingVectorIndex]] artifact: the corpus
    * bucketing pass is skipped entirely, only the query side is hashed.
    * The index must have been built at the SAME (nPlanes, nTables). */
  def lshTopKIndexed(queries: DataFrame, corpus: DataFrame, index: DataFrame,
                     k: Int, nPlanes: Int, dim: Int,
                     nTables: Int = 8): DataFrame =
    lshTopKScore(lshTopKCandidates(queries, corpus, nPlanes, dim, nTables,
      corpusIndex = Some(index.select("cid", "tbl", "bucket"))), k)

  /** MULTI-PROBE variant of [[lshTopKPinned]] (Lv et al. 2007, VLDB): each
    * query probes its own bucket PLUS every Hamming-1 neighbor (one
    * hyperplane sign flipped) in every table — the buckets a near-neighbor
    * most likely fell into when it landed just across one plane.
    *
    * Why it matters at scale: recall can be bought two ways — more tables
    * (OR-amplification) or more probes. Tables multiply the INDEX (the
    * corpus-sized artifact: nTables·|corpus| bucket rows, built, stored,
    * stream-maintained); probes multiply only the QUERY side, which is
    * small by nature and broadcast. At 100 TB the index is the cost that
    * hurts, so (nPlanes+1) probes on HALF the tables beats doubling the
    * tables: same candidate-generation join, same shuffle key
    * (tbl, bucket), index half the size. The corpus side is untouched —
    * a prebuilt [[graft.streaming.StreamingVectorIndex]] artifact works
    * unchanged via `corpusIndex`.
    *
    * Like the single-probe path, only (id, tbl, bucket) rows ever enter
    * the join; vectors re-attach to deduplicated candidate pairs by id. */
  def multiProbeTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     dim: Int, nTables: Int = 4): DataFrame =
    multiProbeTopKPinned(queries, corpus, k, lshPlanesForCorpus(corpus), dim,
      nTables)

  /** Fixed-plane variant of [[multiProbeTopK]] — same rule as
    * [[lshTopKPinned]]: pin the plane count only when it must be known
    * outside the engine (generated oracle SQL, probe sweeps); everything
    * else sizes planes from the corpus so bucket occupancy holds as it
    * grows. */
  def multiProbeTopKPinned(queries: DataFrame, corpus: DataFrame, k: Int,
                           nPlanes: Int, dim: Int, nTables: Int,
                           corpusIndex: Option[DataFrame] = None): DataFrame = {
    val cb = corpusIndex.map(_.select("cid", "tbl", "bucket")).getOrElse(
      corpus.withColumn("__bs", lshBucketsExpr("cvec", nPlanes, dim, nTables))
        .select(col("cid"), posexplode(col("__bs")).as(Seq("tbl", "bucket"))))
    val qb = queries
      .withColumn("__bs", lshBucketsExpr("qvec", nPlanes, dim, nTables))
      .select(col("qid"), posexplode(col("__bs")).as(Seq("tbl", "__b0")))
      .select(col("qid"), col("tbl"), explode(array(
        col("__b0") +: (0 until nPlanes).map(p =>
          col("__b0").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val candIds = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").dropDuplicates("qid", "cid")
    val scored = candIds.join(broadcast(queries), Seq("qid"))
      .join(corpus, Seq("cid"))
      .select("qid", "qvec", "cid", "cvec")
    lshTopKScore(scored, k)
  }

  private def lshTopKScore(cand: DataFrame, k: Int): DataFrame = {
    val scored = cand.withColumn("sim", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        floor(col("sim") * lit(100000.0)).cast("long").as("sim_fp"))
  }

  // ——— Int8 scalar quantization (SQ8) — the bandwidth-bound scale path ———

  /** Power-of-two int8 scale for a concrete corpus: one max(|x|) pass,
    * then the largest 2^k that keeps every value inside [-127, 127]
    * (QuantizedVec.int8ScaleFor — no element ever clamps). The corpus-
    * derived default mirrors [[lshPlanesForCorpus]]: callers that must pin
    * the scale outside the engine (generated oracle SQL) compute it once
    * and pass the literal. */
  def int8ScaleForCorpus(vectors: DataFrame, vecCol: String): Double = {
    val maxAbs = vectors
      .select(max(array_max(transform(col(vecCol), x => abs(x)))).as("m"))
      .head().getDouble(0)
    QuantizedVec.int8ScaleFor(maxAbs)
  }

  /** Exact-over-quantized top-k: both sides int8-quantized once, scored by
    * the integer [[QuantizedVec.quantizedDot]]. Same linear shape as
    * [[bruteForceTopK]], but the corpus the scan streams is 1 byte per
    * dimension instead of 8 — at 100 TB the scan is memory-bandwidth
    * bound, so the payload shrink is the throughput lever (PLANS.md r10
    * probe), and the integer score is partition-order-proof by
    * construction. Ranking: (qscore DESC, cid). */
  def int8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
               scale: Double): DataFrame = {
    val q = queries.select(col("qid"),
      QuantizedVec.quantizeInt8(col("qvec"), scale).as("__qq"))
    val c = corpus.select(col("cid"),
      QuantizedVec.quantizeInt8(col("cvec"), scale).as("__cq"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .withColumn("qscore", QuantizedVec.quantizedDot(col("__qq"), col("__cq")))
    val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("qscore"))
  }

  // ——— 1-bit sign quantization — the cheapest exhaustive first pass ———

  /** Binary-signature top-k: every vector reduced to its sign bitmap
    * ([[BinarySig.signPack]] — dim bits ≈ dim/8 bytes), the whole corpus
    * scanned with XOR+popcount Hamming distance, the best `rerankR` per
    * query re-ranked by EXACT cosine on the gathered full vectors.
    *
    * The scale story is the bandwidth ladder's last rung: the exhaustive
    * pass streams 8 bytes/vector at dim 64 (vs 512 fp64 / 64 int8), so the
    * candidate scan is ~64× lighter than the float brute force; only
    * rerankR·|queries| full vectors are ever gathered (one semi-join back
    * to the corpus — the at-scale "fetch" step, never a full-width scan).
    * Both stages are deterministic: Hamming ties break on cid, the rerank
    * uses the left-fold [[graft.functions.DotProduct]] cosine.
    *
    * @param queries (qid, qvec: array<double>) — small, broadcast
    * @param corpus  (cid, cvec: array<double>) — signature-scanned once
    * @return (qid, rank, cid, ham, sim_fp) — rank by (cosine DESC, cid),
    *         sim_fp = floor(sim·10⁵) (fixed-point output invariant) */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  rerankR: Int): DataFrame =
    hammingSearch(queries, corpus,
      corpus.select(col("cid"), BinarySig.signPack(col("cvec")).as("__cs")),
      k, rerankR)

  /** [[hammingTopK]] probing a PREBUILT signature index (cid, sig) — the
    * shape [[graft.streaming.StreamingBinarySigIndex]] maintains: the
    * exhaustive pass scans the 8-byte-signature index a stream has been
    * appending to, and only the rerank gathers vectors from the corpus. */
  def hammingTopKIndexed(queries: DataFrame, corpus: DataFrame,
                         sigIndex: DataFrame, k: Int, rerankR: Int): DataFrame =
    hammingSearch(queries, corpus,
      sigIndex.select(col("cid"), col("sig").as("__cs")), k, rerankR)

  private def hammingSearch(queries: DataFrame, corpus: DataFrame,
                            cs: DataFrame, k: Int, rerankR: Int): DataFrame = {
    require(rerankR >= k, s"rerankR $rerankR must be >= k $k")
    val qs = queries.select(col("qid"), BinarySig.signPack(col("qvec")).as("__qs"))
    val wh = Window.partitionBy("qid").orderBy(asc("ham"), asc("cid"))
    val cand = cs.crossJoin(broadcast(qs))
      .filter(col("qid") =!= col("cid"))
      .withColumn("ham", BinarySig.hamming(col("__qs"), col("__cs")))
      .withColumn("__rn", row_number().over(wh)).filter(col("__rn") <= rerankR)
      .select("qid", "cid", "ham")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("cid"))
    cand
      .join(broadcast(queries), Seq("qid"))
      .join(corpus, Seq("cid"))
      .withColumn("sim", cosine(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("ham"),
        floor(col("sim") * lit(100000.0)).cast("long").as("sim_fp"))
  }

  // ——— Product quantization (PQ / IVF-PQ) — the code-book scale path ———

  /** Train the PQ codebooks: the vector is cut into nSub contiguous
    * sub-blocks of dim/nSub dimensions, and each block gets an INDEPENDENT
    * deterministic [[kmeansLloyd]] codebook of kCodes centroids. nSub runs
    * over n-row sub-vector frames — each is one broadcast-and-aggregate
    * Lloyd pass, nothing global. Fully replayable (every Lloyd choice is
    * pinned — see [[kmeansLloyd]]), so an external oracle re-derives every
    * codebook bit-for-bit from the same data.
    * @return (m, code, c) — MATERIALIZED (one localCheckpoint of at most
    *         nSub·kCodes rows; the per-block Lloyd blocks are freed), so
    *         callers fan out over it without re-running any Lloyd pass. */
  def pqCodebook(vectors: DataFrame, idCol: String, vecCol: String,
                 dim: Int, nSub: Int, kCodes: Int, iters: Int): DataFrame = {
    require(nSub > 0 && dim % nSub == 0, s"nSub $nSub must divide dim $dim")
    require(kCodes > 0 && kCodes <= 256, s"kCodes must fit one byte, got $kCodes")
    val subDim = dim / nSub
    val blocks = (0 until nSub).map { m =>
      val sub = vectors.select(col(idCol).as("__pvid"),
        slice(col(vecCol), m * subDim + 1, subDim).as("__pv"))
      kmeansLloyd(sub, "__pvid", "__pv", kCodes, iters)
        .select(lit(m).as("m"), col("cid").as("code"), col("c"))
    }
    val cb = blocks.reduce(_ unionByName _).localCheckpoint()
    // free ONLY the per-block Lloyd checkpoints: a caller passing a
    // checkpointed corpus keeps its blocks (same protect rule as
    // kmeansLloyd — a block's plan reaches `vectors` when iters == 0)
    val protectIds = Bridge.checkpointIds(vectors)
    blocks.foreach(b => Bridge.freeCheckpointExcept(b, protectIds))
    cb
  }

  /** Encode every vector as nSub one-byte codes (argmin centroid per
    * sub-block, ties by code id — the same (d², id) rule as
    * [[assignClusters]], so the oracle replays it). The argmin is a min_by
    * hash-aggregation — map-side partial agg collapses the kCodes candidate
    * rows per (vector, block) before any exchange — and the codes pack into
    * a BINARY of nSub bytes: the only per-vector payload the search scan
    * ever reads (dim·8 bytes → nSub — a 128× shrink at dim 64 / nSub 4).
    * @return (idCol, codes: binary). */
  def pqEncode(vectors: DataFrame, codebook: DataFrame, idCol: String,
               vecCol: String, dim: Int, nSub: Int): DataFrame = {
    val subDim = dim / nSub
    val subs = vectors.select(col(idCol).as("__pvid"),
        posexplode(array((0 until nSub).map(m =>
          slice(col(vecCol), m * subDim + 1, subDim)): _*)).as(Seq("m", "__sv")))
      .withColumn("__xx", dot(col("__sv"), col("__sv")))
    val cb = codebook.select(col("m"), col("code"), col("c").as("__c"))
      .withColumn("__cc", dot(col("__c"), col("__c")))
    subs.join(broadcast(cb), Seq("m"))
      .withColumn("__d2",
        col("__xx") + col("__cc") - lit(2.0) * dot(col("__sv"), col("__c")))
      .groupBy("__pvid", "m")
      .agg(min_by(col("code"), struct(col("__d2"), col("code"))).as("code"))
      .groupBy("__pvid")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        s => s.getField("code")).as("__codes"))
      .select(col("__pvid").as(idCol), PqVec.packCodes(col("__codes")).as("codes"))
  }

  /** Per-query ADC lookup table of per-block SQUARED DISTANCES:
    * lut[m·kCodes + code] = ‖q_sub(m) − c(m,code)‖², decomposed as
    * q·q + c·c − 2·q·c over the native left-fold
    * [[graft.functions.DotProduct]] so DuckDB's list_sum twin reproduces
    * every entry. L2 is the textbook PQ metric (Jégou et al. 2011) and the
    * one with a hard guarantee: a vector's own code assignment minimizes
    * every block term independently, so an exact copy always scores
    * best-or-tied. nSub·kCodes doubles per query, assembled in
    * unique-index order so the array layout is deterministic.
    * @return (idCol, lut: array<double>). */
  def pqLut(queries: DataFrame, codebook: DataFrame, idCol: String,
            vecCol: String, dim: Int, nSub: Int, kCodes: Int): DataFrame = {
    val subDim = dim / nSub
    val cb = codebook.select(col("m"), col("code"), col("c").as("__c"))
    queries.crossJoin(broadcast(cb))
      .withColumn("__sv",
        slice(col(vecCol), col("m") * lit(subDim) + lit(1), lit(subDim)))
      .withColumn("__p",
        dot(col("__sv"), col("__sv")) + dot(col("__c"), col("__c"))
          - lit(2.0) * dot(col("__sv"), col("__c")))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(
        (col("m") * lit(kCodes) + col("code")).as("i"), col("__p").as("p")))).as("__lm"))
      // DENSE layout over all nSub·kCodes slots: a Lloyd run can lose a
      // cluster, and a compacted array would shift every later slot out
      // from under lut[m·kCodes + code]. Dead slots get 0.0 — encode
      // argmins over the same codebook, so no code can ever address one.
      .select(col(idCol), transform(sequence(lit(0), lit(nSub * kCodes - 1)),
        i => coalesce(element_at(col("__lm"), i), lit(0.0))).as("lut"))
  }

  /** Flat PQ top-k (inner-product ADC): codebooks trained on the corpus,
    * corpus encoded ONCE to nSub-byte codes (the persisted-index artifact a
    * deployment would store), each query scored against every code via its
    * broadcast LUT. Same linear scan shape as [[bruteForceTopK]] /
    * [[int8TopK]], but the scan streams nSub bytes per candidate instead of
    * dim·8 — at 100 TB the brute scan becomes cache-resident. Approximate
    * (scores are against the quantized corpus), deterministic, and
    * oracle-replayable end to end. Ranking: (qscore DESC, cid). */
  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
             nSub: Int, kCodes: Int, iters: Int): DataFrame = {
    val cb = pqCodebook(corpus, "cid", "cvec", dim, nSub, kCodes, iters)
    val codes = pqEncode(corpus, cb, "cid", "cvec", dim, nSub)
    pqTopKIndexed(queries, cb, codes, k, dim, nSub, kCodes)
  }

  /** Flat PQ search against PREBUILT artifacts — the production search
    * path: codebook + encoded codes come from a persisted store
    * ([[pqCodebook]] / [[pqEncode]] run once at index-build time), so a
    * search pays only its own LUT (nSub·kCodes doubles, broadcast) and the
    * code scan. Bit-identical to [[pqTopK]] over the same corpus (PqSpec
    * pins it). */
  def pqTopKIndexed(queries: DataFrame, codebook: DataFrame, codes: DataFrame,
                    k: Int, dim: Int, nSub: Int, kCodes: Int): DataFrame = {
    val luts = pqLut(queries, codebook, "qid", "qvec", dim, nSub, kCodes)
    pqScore(codes.crossJoin(broadcast(luts))
      .filter(col("qid") =!= col("cid")), k, kCodes)
  }

  /** Cell-keyed PQ code store — the persisted IVFPQ index payload: every
    * corpus vector's nearest coarse cell plus its nSub-byte codes. Built
    * once at index time; [[ivfPqTopKIndexed]] probes it per search. */
  def ivfPqIndex(corpus: DataFrame, centroids: DataFrame,
                 codes: DataFrame): DataFrame =
    nearestCells(centroids)(corpus, "cvec", "cid", 1)
      .select("cell", "cid").join(codes, Seq("cid"))

  /** IVF-PQ search against PREBUILT artifacts ([[ivfPqIndex]] +
    * [[pqCodebook]]): per search only the query-side cell probe, LUT
    * build, and the cell-keyed candidate join run. Bit-identical to
    * [[ivfPqTopK]] over the same corpus (PqSpec pins it). */
  def ivfPqTopKIndexed(queries: DataFrame, codebook: DataFrame,
                       cellCodes: DataFrame, centroids: DataFrame,
                       k: Int, nProbe: Int, dim: Int, nSub: Int,
                       kCodes: Int): DataFrame = {
    val luts = pqLut(queries, codebook, "qid", "qvec", dim, nSub, kCodes)
    val qProbe = nearestCells(centroids)(queries, "qvec", "qid", nProbe)
      .select("cell", "qid").join(broadcast(luts), Seq("qid"))
    pqScore(cellCodes.join(broadcast(qProbe), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid"), k, kCodes)
  }

  /** IVF-PQ — coarse cells bound WHAT the search join scans (float cell
    * assignment exactly as [[ivfTopK]]), PQ codes bound the BYTES it
    * carries: the FAISS IVFPQ production shape (here without the residual
    * refinement — codes quantize the raw vectors, which keeps one global
    * codebook and an exactly replayable oracle). The cell-keyed candidate
    * join ships (cell, cid, nSub bytes) only. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                k: Int, nProbe: Int, dim: Int, nSub: Int, kCodes: Int,
                iters: Int): DataFrame = {
    val cb = pqCodebook(corpus, "cid", "cvec", dim, nSub, kCodes, iters)
    val codes = pqEncode(corpus, cb, "cid", "cvec", dim, nSub)
    ivfPqTopKIndexed(queries, cb, ivfPqIndex(corpus, centroids, codes),
      centroids, k, nProbe, dim, nSub, kCodes)
  }

  /** Two-stage search — the production ANN refinement shape (Jégou et al.
    * 2011 §V-C's re-ranked IVFADC): stage 1 probes the PREBUILT IVF-PQ
    * index for `rerankK` approximate candidates per query (4-byte ADC,
    * cell-bounded scan), stage 2 re-ranks ONLY those candidates by the
    * exact cosine over the raw full-precision vectors. At corpus scale the
    * candidate set is tiny (|queries|·rerankK rows), so it BROADCASTS to
    * the corpus scan and the raw vectors are fetched without shuffling the
    * corpus — quantization bounds what stage 1 scans, the exact pass pays
    * only rerankK vector reads per query. Deterministic end-to-end: ADC
    * ranks break ties by cid and the rerank cosine is the native left-fold
    * [[graft.functions.DotProduct]] the oracle replays; output contract
    * matches [[lshTopK]] (qid, rank, cid, sim_fp). */
  def ivfPqRerankTopK(queries: DataFrame, codebook: DataFrame,
                      cellCodes: DataFrame, centroids: DataFrame,
                      corpus: DataFrame, k: Int, rerankK: Int, nProbe: Int,
                      dim: Int, nSub: Int, kCodes: Int): DataFrame = {
    val cand = ivfPqTopKIndexed(queries, codebook, cellCodes, centroids,
      rerankK, nProbe, dim, nSub, kCodes).select("qid", "cid")
    val fetched = corpus.join(broadcast(cand), Seq("cid"))
      .join(broadcast(queries), Seq("qid"))
    lshTopKScore(fetched, k)
  }

  /** ADC rank + top-k: qdist is the approximate squared L2 distance, so
    * ranking is ASCENDING (nearest first), ties by cid. The emitted
    * distance is fixed-point (⌊qdist·10⁵⌋ as BIGINT): the raw ADC double
    * is bit-identical on both engines (same left-fold sum), and floor at a
    * power of ten of a bit-identical double is engine-stable — round() of
    * a double is not (java.math HALF_UP vs C-library rounding drifted on
    * the r10 driver, VERDICT #2 / ADVICE). */
  private def pqScore(cand: DataFrame, k: Int, kCodes: Int): DataFrame = {
    val scored = cand.withColumn("qdist",
      PqVec.adcScore(col("lut"), col("codes"), kCodes))
    val w = Window.partitionBy("qid").orderBy(asc("qdist"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"),
        floor(col("qdist") * lit(100000.0)).cast("long").as("qdist_fp"))
  }

  /** IVF-SQ8 — the production ANN shape at corpus scale (coarse cells
    * bound WHAT is scanned; int8 bounds the BYTES scanned): cell
    * assignment runs in float exactly as [[ivfTopK]], but the cell-keyed
    * search join carries 1-byte-per-dim quantized payloads and scores with
    * the exact integer dot. The quantized corpus frame (cell, cid, bytes)
    * is what a 100 TB deployment would persist as its search index. */
  def int8IvfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
                  k: Int, nProbe: Int, scale: Double): DataFrame = {
    val cAssign = nearestCells(centroids)(corpus, "cvec", "cid", 1)
      .withColumn("__cq", QuantizedVec.quantizeInt8(col("cvec"), scale))
      .select("cell", "cid", "__cq")
    val qProbe = nearestCells(centroids)(queries, "qvec", "qid", nProbe)
      .withColumn("__qq", QuantizedVec.quantizeInt8(col("qvec"), scale))
      .select("cell", "qid", "__qq")
    val scored = cAssign.join(broadcast(qProbe), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .withColumn("qscore", QuantizedVec.quantizedDot(col("__qq"), col("__cq")))
    val w = Window.partitionBy("qid").orderBy(desc("qscore"), asc("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("cid"), col("qscore"))
  }
}
