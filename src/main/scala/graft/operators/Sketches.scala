package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches — integer-exact HyperLogLog and KMV
  * (k-minimum-values), the mergeable distinct-count machinery a 100 TB
  * pipeline uses where exact `COUNT(DISTINCT)` would shuffle every value:
  * the sketch register is a few KB per group, map-side combinable (max per
  * bucket / min-k per group are associative), and unions across shards,
  * days, or sources without rescanning.
  *
  * Float parity: the classic estimators divide through doubles
  * (`alpha·m²/Σ2^(−Mⱼ)`, `(k−1)/h_k`); here every estimate is an exact
  * integer expression over the register —
  *  - HLL: `E = alpha_ppm·m²·2^R div (Z·10⁶)` where
  *    `Z = Σ 2^(R−Mⱼ)` (empty buckets contribute `2^R`) is an exact
  *    integer, R = 53 (the 60-bit md5 hash minus 8 bucket bits leaves a
  *    52-bit field; rho = 53 − bitlen(rem) ∈ [1, 53], so the first-bit
  *    geometric starts at 1 with probability ½ — the estimator's 2^R
  *    numerator must match this field width or it is off by a power of
  *    two). `alpha_ppm = 718272` is the m = 256
  *    bias constant `0.7213/(1+1.079/m)` quantized once, as a DEFINED
  *    constant of the operator (not an engine-library value). Powers of
  *    two are integer `shiftleft`, never libm `pow`.
  *  - KMV: union size `(k−1)·2⁶⁰ div u_k` (u_k = k-th smallest hash of
  *    the union), intersection via the Jaccard scale-up
  *    `n_common·(k−1)·2⁶⁰ div (k·u_k)` — products in DECIMAL(38,0) /
  *    HUGEINT, floor-division back to BIGINT.
  * The raw HLL estimator is emitted WITHOUT the small-range linear-
  * counting correction (`m·ln(m/V)` is libm-bound — the float-parity
  * invariant); the zero-bucket count V is emitted alongside so a consumer
  * owning a libm can apply it. Hash = the repo-wide 60-bit md5 primitive
  * ([[DetHash.md5Long]] ≡ `TextOps.md5LongSql`).
  */
object Sketches {

  /** HLL parameters: m = 2^B buckets; rho ∈ [1, R]. */
  val B = 8
  val M: Int = 1 << B          // 256 buckets
  val R = 53                   // max rho: 52-bit remainder field + 1
  val AlphaPpm = 718272L       // 0.7213/(1 + 1.079/256), ppm, defined constant

  /** Per-(group, bucket) HLL register: Mⱼ = max rho over the group's
    * hashed values. `valueSql` must be a STRING expression (the hash
    * input). One groupBy shuffle on (group, bucket) with map-side-combined
    * max — the scale shape. */
  def hllRegister(df: DataFrame, groupCol: String, valueSql: String): DataFrame =
    hllRegisterBy(df, Seq(groupCol), valueSql)

  /** [[hllRegister]] over a COMPOSITE group — the sketch-cube primitive:
    * register once at the finest cell (e.g. (group, day)), answer any
    * coarser slice later by max-merging cells, never rescanning. */
  def hllRegisterBy(df: DataFrame, groupCols: Seq[String], valueSql: String): DataFrame =
    df
      .withColumn("__h", expr(TextOps.md5LongSql(valueSql)))
      .withColumn("__bucket", expr(s"__h % $M"))
      .withColumn("__rem", expr(s"__h div $M"))
      .withColumn("__rho",
        when(col("__rem") === 0, lit(R))
          .otherwise(lit(R) - length(bin(col("__rem")))))
      .groupBy(groupCols.map(col) :+ col("__bucket"): _*)
      .agg(max("__rho").as("mj"))
      .withColumnRenamed("__bucket", "bucket")

  /** Integer-exact raw HLL estimate per group from a register frame:
    * (group, est, n_buckets, v_zero). Z and the numerator run in
    * DECIMAL(38,0) (≈10²⁷ peak — HUGEINT on DuckDB). */
  def hllEstimate(reg: DataFrame, groupCol: String): DataFrame =
    hllEstimateBy(reg, Seq(groupCol))

  /** [[hllEstimate]] over a COMPOSITE group — estimates straight off
    * cube-cell or window-merged registers keyed by several columns. */
  def hllEstimateBy(reg: DataFrame, groupCols: Seq[String]): DataFrame =
    reg
      .withColumn("__term",
        expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $R - mj) AS DECIMAL(38,0))"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum("__term").as("__zpresent"),
        count(lit(1)).as("n_buckets"))
      .withColumn("__z",
        expr(s"__zpresent + CAST($M - n_buckets AS DECIMAL(38,0))" +
          s" * CAST(${1L << R} AS DECIMAL(38,0))"))
      .withColumn("est", expr(
        s"CAST(CAST($AlphaPpm AS DECIMAL(38,0)) * ${M.toLong * M}" +
          s" * CAST(${1L << R} AS DECIMAL(38,0)) div (__z * 1000000) AS BIGINT)"))
      .withColumn("v_zero", (lit(M) - col("n_buckets")).cast("long"))
      .select(groupCols.map(col) ++ Seq(col("est"),
        col("n_buckets").cast("long").as("n_buckets"), col("v_zero")): _*)

  /** Count-Min parameters: d hash rows × w counters (4 KB of longs). */
  val CmD = 4
  val CmW = 1024

  /** Count-Min register over a weighted item stream (itemCol, weightCol):
    * cell (row i, bucket hᵢ(item)) accumulates the weight. d·|items| rows
    * fan out map-side, then ONE (row, bucket) aggregation — d·w counters
    * out regardless of input volume; registers merge by cell sum. Row
    * hashes are the repo md5 primitive seeded by the row index
    * (`md5('i:' || item)`). */
  def cmRegister(items: DataFrame, itemCol: String, weightCol: String): DataFrame =
    items
      .select(col(itemCol).as("__it"), col(weightCol).as("__w"),
        explode(expr(s"sequence(0, ${CmD - 1})")).as("row"))
      .withColumn("bucket",
        expr(TextOps.md5LongSql(s"concat(row, ':', __it)") + s" % $CmW"))
      .groupBy("row", "bucket")
      .agg(sum("__w").as("cnt"))

  /** Count-Min point estimates for a candidate item set: est(item) =
    * minᵢ cell(i, hᵢ(item)) — an OVERestimate by construction (collisions
    * only add), integer-exact. Candidates broadcast (they are top-k
    * candidates by nature); d lookups per item. */
  def cmEstimate(reg: DataFrame, candidates: DataFrame, itemCol: String): DataFrame = {
    val probes = candidates
      .select(col(itemCol).as("__it"), explode(expr(s"sequence(0, ${CmD - 1})")).as("row"))
      .withColumn("bucket",
        expr(TextOps.md5LongSql(s"concat(row, ':', __it)") + s" % $CmW"))
    broadcast(probes).join(reg, Seq("row", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("__it")
      .agg(min("cnt").as("est"))
      .select(col("__it").as(itemCol), col("est"))
  }

  /** KMV sketch: the k smallest 60-bit hashes of `valueSql` per group —
    * duplicates collapse first (distinct), then a per-group bottom-k.
    * Registers are tiny (k longs/group) and merge by re-minning. */
  def kmvSketch(df: DataFrame, groupCol: String, valueSql: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
    df
      .select(col(groupCol), expr(TextOps.md5LongSql(valueSql)).as("h"))
      .distinct()
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(groupCol), col("h"))
  }

  /** Pairwise distinct-set overlap estimates from KMV sketches: for every
    * unordered group pair, the union sketch's k-th minimum gives
    * est_union = (k−1)·2⁶⁰ div u_k, and the common-hash count inside the
    * union's bottom-k scales it to the intersection estimate. A union with
    * fewer than k distinct hashes is EXACT (u_k is not a k-th order
    * statistic then): est_union = n_k, est_inter = n_common.
    * @return (ga, gb, n_common, est_union, est_inter) — all BIGINT. */
  def kmvOverlap(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    // materialize-once (r15 opt): the sketch is read SIX times below (both
    // pair sides, both union legs, both common-hash probes) — an
    // unmaterialized sketch (sk2 feeds the full distinct+window spine over
    // the events scan) re-ran its derivation per consumer. ≤ k rows per
    // group, trivially resident.
    val sk0 =
      if (org.apache.spark.sql.graft.Bridge.isBareCheckpoint(sketch)) sketch
      else sketch.localCheckpoint(true)
    val a = sk0.select(col(groupCol).as("ga"), col("h"))
    val b = sk0.select(col(groupCol).as("gb"), col("h"))
    val pairs = a.select("ga").distinct()
      .join(b.select("gb").distinct(), col("ga") < col("gb"))
    val unioned = pairs.join(a, "ga")
      .select("ga", "gb", "h")
      .unionByName(pairs.join(b, "gb").select("ga", "gb", "h"))
      .distinct()
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val bottomK = unioned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("ga", "gb", "h")
    val uk = bottomK.groupBy("ga", "gb")
      .agg(max("h").as("u_k"), count(lit(1)).as("n_k"))
    val common = bottomK
      .join(a, Seq("ga", "h"))
      .join(b, Seq("gb", "h"))
      .groupBy("ga", "gb").agg(count(lit(1)).as("n_common"))
    uk.join(common, Seq("ga", "gb"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("est_union",
        when(col("n_k") < k, col("n_k"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS DECIMAL(38,0)) * CAST(${1L << 60} AS DECIMAL(38,0))" +
              s" div u_k AS BIGINT)")))
      .withColumn("est_inter",
        when(col("n_k") < k, col("n_common"))
          .otherwise(expr(
            s"CAST(CAST(n_common AS DECIMAL(38,0)) * ${k - 1}" +
              s" * CAST(${1L << 60} AS DECIMAL(38,0))" +
              s" div (CAST($k AS DECIMAL(38,0)) * u_k) AS BIGINT)")))
      .select(col("ga"), col("gb"), col("n_common"), col("est_union"), col("est_inter"))
  }

  /** Dyadic range-sum register parameters: value domain [0, 2^DyB). */
  val DyB = 16

  /** Dyadic node key packing: level and in-level bucket into one BIGINT
    * (bucket < 2^16 always, so a 2^17 stride is collision-free). */
  def dyadicKey(level: Int, bucket: Long): Long = level.toLong * 131072L + bucket

  /** Dyadic range-sum register over an integer column in [0, 2^16): one
    * count per (group, level, bucket) with bucket = v >> level for levels
    * 0..16 — the segment-tree-as-a-table. EXACT (not approximate) and
    * mergeable by cell SUM, with per-group size bounded by the value
    * DOMAIN (Σ 2^(16−l) ≤ 2^17 cells), never by row count: build it once
    * per shard/day, merge registers, and answer any [a,b] count with
    * ≤ 2·16 cell lookups ([[dyadicCover]]) instead of rescanning — the
    * zone-map/data-cube shape of the sketch family. The 17× explode
    * happens map-side and collapses in the same (group, key) aggregation
    * that builds the register.
    *
    * CONTRACT: the input MUST already lie in [0, 2^16) — clamp at
    * ingestion (`least(greatest(v, 0), 65535)`, with the identical
    * LEAST/GREATEST in any oracle SQL). An out-of-domain value is NOT
    * dropped: it lands outside the root cell (so the register total
    * silently under-reads any raw COUNT(*) — the r15 s7 sf0.1 catch on
    * sk6: 2 events at value ≥ 512 diverged the quantile ranks), and past
    * 2^17 its level-0 key collides with level-1 cells outright. */
  def dyadicRegister(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df
      .select(groupCols.map(col) :+
        explode(expr(s"transform(sequence(0, $DyB), " +
          s"l -> CAST(l AS BIGINT) * 131072 + shiftright($valueCol, l))"))
          .as("key"): _*)
      .groupBy(groupCols.map(col) :+ col("key"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Canonical dyadic cover of the inclusive integer range [a, b]: the
    * minimal node set (≤ 2 per level) whose disjoint union is the range —
    * a pure function of the bounds, computable at planning time (the
    * register is only ever FILTERED on these keys, never scanned). */
  def dyadicCover(a: Long, b: Long): Seq[(Int, Long)] = {
    require(0 <= a && a <= b && b < (1L << DyB))
    var lo = a; var hi = b + 1; var l = 0
    val res = scala.collection.mutable.ListBuffer.empty[(Int, Long)]
    while (lo < hi) {
      if ((lo & 1L) == 1L) { res += ((l, lo)); lo += 1 }
      if ((hi & 1L) == 1L) { hi -= 1; res += ((l, hi)) }
      lo >>= 1; hi >>= 1; l += 1
    }
    res.toList
  }

  /** Range count per group from a dyadic register: sum of exactly the
    * cover's cells. Groups with no value in range keep a 0 row via the
    * caller joining back — here absent groups are simply absent. */
  def dyadicRangeCount(reg: DataFrame, groupCols: Seq[String],
                       a: Long, b: Long): DataFrame = {
    val keys = dyadicCover(a, b).map { case (l, bk) => dyadicKey(l, bk) }
    reg.filter(col("key").isin(keys: _*))
      .groupBy(groupCols.map(col): _*)
      .agg(sum("cnt").as("range_cnt"))
  }

  /** EXACT per-group rank selection (k-th smallest value) from a dyadic
    * register — the quantile query a persisted/merged register answers
    * without ever re-touching raw data. Classic segment-tree descent: at
    * each level look up the LEFT child's count and go left (rank
    * unchanged) or right (rank reduced by the left count). Each (group,
    * rank) probe touches exactly one cell per level — DyB lookups total —
    * so answering any number of quantiles over merged shard registers is
    * independent of row count AND of domain width (the level-0 histogram
    * cumwalk alternative scans min(n, 2^DyB) cells per group under a
    * per-group sort window — fine at DyB = 16, quadratic pain if the
    * domain widens).
    *
    * The one-shuffle map build is O(register); the descent itself runs
    * inside a single whole-stage pass (join + projections, no exchange
    * between levels) and `__m` is dropped before the output, so the map
    * never rides a downstream shuffle. A rank row does reference its
    * group's whole map cell at the join, so keep `ranks` per-group counts
    * sane (quantile lists, not one row per datum).
    *
    * @param reg     [[dyadicRegister]] frame (or a cell-SUM merge of
    *                several), read ONCE into per-group map cells.
    * @param ranks   one row per wanted selection: groupCols + `rankCol` —
    *                every input row survives (LEFT join: a group with no
    *                register cells descends to a meaningless leaf, it does
    *                not vanish).
    * @param rankCol 1-based rank in [1, group total]; out-of-range ranks
    *                return meaningless leaves (callers derive ranks from
    *                the register's own root count).
    * @return ranks + `value` (the k-th smallest level-0 value). */
  def dyadicRankSelect(reg: DataFrame, groupCols: Seq[String],
                       ranks: DataFrame, rankCol: String): DataFrame = {
    // the descent writes these via withColumn, which silently REPLACES a
    // same-named caller column ('value' is a natural events column name) —
    // refuse instead of corrupting the ranks frame (r14 ADVICE)
    val reserved = Set("value", "__b", "__r", "__lc", "__m")
    val clash = ranks.columns.filter(reserved)
    require(clash.isEmpty,
      s"dyadicRankSelect: ranks must not carry reserved column(s) ${clash.mkString(", ")}" +
        " — alias them away before selecting (the descent would overwrite them)")
    // each group's register pivots into ONE map cell (domain-bounded:
    // Σ 2^(DyB−l) ≤ 2^17 entries) in a single shuffle; the descent is then
    // 16 map lookups per (group, rank) inside one task — the chained-join
    // alternative (one join per level) costs 16 sequential stages of pure
    // scheduler overhead for the same cell reads (measured 3.8 → 1.4 s on
    // the sk6 gate). Each level's lookup is LET-BOUND via withColumn:
    // __lc/__b/__r are multiply referenced and non-cheap, so
    // CollapseProject keeps the per-level projection boundaries (the repo
    // letSql invariant) and the expression tree stays linear in DyB.
    val m = reg
      .groupBy(groupCols.map(col): _*)
      .agg(map_from_entries(collect_list(struct(col("key"), col("cnt"))))
        .as("__m"))
    var cur = ranks.join(m, groupCols, "left")
      .withColumn("__b", lit(0L))
      .withColumn("__r", col(rankCol).cast("long"))
    for (l <- DyB to 1 by -1) {
      // left child of node __b at level l is bucket 2·__b at level l−1
      val lc = coalesce(
        element_at(col("__m"), lit((l - 1).toLong * 131072L) + col("__b") * 2),
        lit(0L))
      cur = cur
        .withColumn("__lc", lc)
        .withColumn("__b",
          when(col("__r") <= col("__lc"), col("__b") * 2)
            .otherwise(col("__b") * 2 + 1))
        .withColumn("__r",
          when(col("__r") <= col("__lc"), col("__r"))
            .otherwise(col("__r") - col("__lc")))
    }
    cur.withColumn("value", col("__b")).drop("__b", "__r", "__lc", "__m")
  }
}
