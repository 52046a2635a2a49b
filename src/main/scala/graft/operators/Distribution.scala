package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StringType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** The reference's price-distribution stage
  * (`dvf/explore/task_functions.py:839-896`, SURVEY §7.4.1): per group,
  * quantile bin edges computed on the DISTINCT value set (not the
  * multiset), edges rounded to a step with collision repair (a rounded
  * edge that does not exceed its predecessor is pushed one step up), then
  * a histogram over the repaired (non-uniform) bins. Groups under the
  * support threshold get a null distribution
  * (`dvf/explore/task_functions.py:1009,1069`).
  *
  * Everything is column expressions — the repair fold and the bucket
  * search run as higher-order functions on an (nBins+1)-element array per
  * GROUP (not per row), so the cost sits in the aggregation, where it
  * belongs.
  */
object Distribution {

  /** Driver-side twin of the repair fold (for tests/documentation). */
  def repairBins(bins: Seq[Double], step: Double): Seq[Double] =
    bins.foldLeft(Vector.empty[Double]) { (acc, b) =>
      val r = math.rint(b / step) * step
      acc :+ (if (acc.nonEmpty && r <= acc.last) acc.last + step else r)
    }

  /** String form of a key column for the routed-path join: float keys are
    * +0.0-normalized first (turning -0.0 into 0.0) so raw rows match the
    * aggregate side, where Catalyst's float normalization already
    * canonicalized the grouping value. */
  private def strKey(df: DataFrame, c: String): Column = {
    val dt = df.schema(c).dataType
    val isFloat = dt match {
      case DoubleType | FloatType => true
      case _ => false
    }
    // Cast back to the column's own type after the +0.0 normalization:
    // FloatType would otherwise widen to double and render a different
    // string ("1.100000023841858") than the aggregate side's direct
    // float cast ("1.1"), silently dropping every routed float key.
    (if (isFloat) (col(c) + lit(0.0)).cast(dt) else col(c)).cast("string")
  }

  /** SQL fold over a bin-edge array column: round each edge to `step`,
    * pushing collisions up one step. */
  private def repairSql(binsCol: String, step: Double): Column = expr(
    s"""aggregate($binsCol, cast(array() as array<double>),
       |  (acc, b) -> concat(acc, array(
       |    if(size(acc) > 0 AND rint(b / ${step}d) * ${step}d <= element_at(acc, -1),
       |       element_at(acc, -1) + ${step}d,
       |       rint(b / ${step}d) * ${step}d))))""".stripMargin)

  /** Per-key distribution: repaired bin edges + per-bin counts; keys with
    * fewer than `minSupport` rows keep a null distribution.
    *
    * Scale note — the quantile envelope is chosen AUTOMATICALLY and
    * PER KEY: exact `percentile` holds one buffer of the group's DISTINCT
    * values, which is right for the reference workload (communes/EPCI/
    * départements — many groups, each bounded) but melts on huge groups.
    * Rather than leave that to caller discipline, the operator probes
    * per-key distinct-value counts EXACTLY, off the distinct (key, value)
    * set it must compute for the quantile edges anyway (materialized once
    * — narrow rows; the probe is a cheap aggregation of that checkpoint,
    * where the r15 HyperLogLog probe paid a third full scan of the raw
    * frame). The checkpoint is NDV-sized resident storage for the
    * frame's lifetime (reclaimed by GC + ContextCleaner like the other
    * operator-level checkpoints) — the measured trade against the extra
    * raw scan (r16 opt; F18bProbe). Keys above the envelope route through
    * [[distributedQuantiles]]'s two-pass selection; everything else keeps
    * the buffered plan. The
    * huge-key set is tiny by definition, so it broadcasts, and the
    * selection core's driver-side counts stay bounded by it even on the
    * mixed millions-of-small-groups-plus-one-huge-group shape. The two
    * engines are bit-identical (DistributedQuantilesSpec), so routing
    * never changes results — only the memory envelope. Routed keys join
    * via their string cast (injective per column type; float keys are
    * +0.0-normalized first so -0.0 matches the aggregate side; NaN keys
    * collapse as groupBy already does); all-null-value keys always stay
    * buffered (their NDV is 0), keeping their null distribution.
    *
    * @param maxBufferedNdv largest per-group distinct-value count the
    *        buffered percentile may hold (default 1M ≈ tens of MB per
    *        aggregation buffer); above it a key routes to distributed
    *        selection. `Long.MaxValue` pins all-buffered and skips the
    *        probe; `<= 0` pins ALL keys distributed (test/debug escape —
    *        only force it on frames with few keys).
    */
  def priceDistribution(df: DataFrame, keyCols: Seq[String], valueCol: String,
                        nBins: Int = 10, step: Double = 100.0,
                        minSupport: Long = 100L,
                        maxBufferedNdv: Long = 1000000L): DataFrame = {
    // The distinct value set feeds the quantile edges in EVERY routing
    // outcome, so it is materialized once (narrow: keys + one value) and
    // the NDV probe reads IT instead of paying its own full scan of the
    // raw frame (r16 opt: the HLL probe was a third raw scan + shuffle;
    // the plan now scans df twice — distinct build and histogram — and
    // the probe is a cheap exact aggregation of the checkpoint). Exact
    // counts also make the routing decision precise; routing never
    // changes results (the two quantile paths are bit-identical —
    // DistributedQuantilesSpec), only the memory envelope.
    val dv0 = df.select((keyCols :+ valueCol).map(col): _*).distinct()
    val dv =
      if (maxBufferedNdv == Long.MaxValue) dv0 // single consumer: stay lazy
      else dv0.localCheckpoint(true)
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val arr = probs.mkString("array(", ", ", ")")
    def bufferedEdges(part: DataFrame): DataFrame = part
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile($valueCol, $arr)").as("raw_edges"))
      .withColumn("edges", repairSql("raw_edges", step)).drop("raw_edges")
    val hugeKeys: Option[DataFrame] =
      if (maxBufferedNdv == Long.MaxValue) None
      else if (maxBufferedNdv <= 0L)
        Some(dv.select(keyCols.map(col): _*).distinct().localCheckpoint(true))
      else {
        // count(valueCol) over the distinct set = the key's exact NDV,
        // skipping the all-null row so those keys keep their NDV-0
        // stay-buffered semantics
        val hk = dv.groupBy(keyCols.map(col): _*)
          .agg(count(col(valueCol)).as("__ndv"))
          .filter(col("__ndv") > maxBufferedNdv)
          .select(keyCols.map(col): _*).localCheckpoint(true)
        if (hk.isEmpty) None else Some(hk)
      }
    val joined = hugeKeys match {
      case None => df.join(bufferedEdges(dv), keyCols)
      case Some(hk) =>
        val strKeys = keyCols.map(c => s"__k_$c")
        val edgesD = distributedQuantileRows(
            dv.join(broadcast(hk), keyCols, "left_semi"),
            keyCols, valueCol, probs)
          .withColumn("edges", repairSql("qs", step))
          .select(keyCols.zip(strKeys).map { case (c, s) => col(c).as(s) } :+
            col("edges"): _*)
        val cond = keyCols.zip(strKeys)
          .map { case (c, s) => strKey(df, c) === col(s) }
          .reduce(_ && _)
        val joinedHuge = df.join(broadcast(hk), keyCols, "left_semi")
          .join(edgesD, cond).drop(strKeys: _*)
        val joinedSmall = df.join(broadcast(hk), keyCols, "left_anti")
          .join(bufferedEdges(dv.join(broadcast(hk), keyCols, "left_anti")),
            keyCols)
        joinedSmall.unionByName(joinedHuge)
    }
    // bucket(v) = #edges (excluding the last) that are <= v, clamped to >= 1
    // — native codegen'd scan, not the CodegenFallback HOF form
    val bucket = graft.functions.BucketIndex.bucketIndex(
      col("edges"), col(valueCol), nBins)
    // Support (count per key) rides the SAME aggregation as the per-bin
    // conditional sums: every df row joins back to exactly one edges row
    // (edges is df's own key set), so count(1) here equals a separate
    // groupBy-count — one scan, one shuffle, and one join cheaper than
    // computing support on its own scan.
    val counts = joined
      .withColumn("bucket", bucket)
      .groupBy((keyCols.map(col) :+ col("edges")): _*)
      .agg(count(lit(1)).as("n"),
        (1 to nBins).map(i =>
          sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"c_$i")): _*)
    counts
      .select((keyCols.map(col) :+ col("n") :+
        when(col("n") >= minSupport, col("edges")).as("edges")) ++
        (1 to nBins).map(i => when(col("n") >= minSupport,
          col(s"c_$i")).as(s"bin_$i")): _*)
  }

  /** Sketch-based table profile — the 100 TB complement of the exact
    * single-pass profile (prof1): HyperLogLog++ distinct counts
    * (`approx_count_distinct`, mergeable fixed-size registers) and
    * KLL-family quantiles (`approx_percentile`, bounded sketch buffers)
    * for every requested numeric column, in ONE aggregation. Exact
    * count-distinct holds the value set per column; exact percentile
    * buffers the multiset — both grow with the data, while this profile's
    * task memory is fixed regardless of corpus size. No oracle (the sketch
    * estimates are engine-specific); the spec pins the error envelope
    * against the exact answers instead.
    *
    * @return one row: per column c, `c_ndv` (approx) and `c_p50` (approx
    *         median), plus the exact `n_rows`.
    */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05,
                    accuracy: Int = 10000): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      approx_count_distinct(col(c), rsd).as(s"${c}_ndv"),
      expr(s"approx_percentile($c, 0.5, $accuracy)").cast("double").as(s"${c}_p50"))
    }
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Exact quantiles with O(1) task memory — the FEW-HUGE-GROUPS
    * complement to `percentile` (whose aggregation buffer holds one group's
    * whole value multiset; see the scale note on [[priceDistribution]]).
    *
    * Two-pass distributed selection:
    *   1. range-partition + sort rows by (key, value) — values of one group
    *     span many partitions, each sorted externally (spill-safe);
    *   2. per-partition per-key run-length counts → driver (P×K rows — tiny
    *     when K is few, which is this operator's envelope);
    *   3. driver turns counts into per-partition rank offsets and the
    *     0-based target ranks floor/ceil of p·(n-1) for each prob;
    *   4. second pass streams each partition once, emitting ONLY rows whose
    *     rank is a target (≤ 2·|probs|·K rows total);
    *   5. interpolation uses Spark's exact `percentile` weight form
    *     ((hi−pos)·v_lo + (pos−lo)·v_hi) so results are bit-identical to the
    *     buffered aggregate.
    *
    * The two collects are aggregate-sized by construction — this is the
    * textbook distributed-selection shape, not a driver loop over data.
    * Null values are ignored (percentile semantics); a null key forms its
    * own group. Keys are compared as strings (cast internally).
    *
    * @return one row per key: (keyCol: string, n: long, qs: array<double>)
    */
  def distributedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
                           probs: Seq[Double]): DataFrame =
    distributedQuantileRows(df, Seq(keyCol), valueCol, probs)

  /** Multi-key core of [[distributedQuantiles]] (same algorithm, same
    * bit-parity guarantee); key columns come back string-cast under their
    * original names. Shared by the auto-routed [[priceDistribution]]. */
  private[operators] def distributedQuantileRows(
      df: DataFrame, keyCols: Seq[String], valueCol: String,
      probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be within [0, 1], got $probs")
    val spark = df.sparkSession
    val nk = keyCols.size
    val base = df.filter(col(valueCol).isNotNull)
      .select(keyCols.map(c => col(c).cast("string").as(c)) :+
        col(valueCol).cast("double").as("__v"): _*)
    val ordCols = keyCols.map(col) :+ col("__v")
    val sorted = base
      .repartitionByRange(ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .rdd.persist(StorageLevel.MEMORY_AND_DISK)
    def keyOf(r: Row): List[String] = List.tabulate(nk)(r.getString)
    try {
      // pass 1: per-partition per-key counts, in partition order
      val counts: Array[(Int, List[String], Long)] = sorted
        .mapPartitionsWithIndex { (pid, it) =>
          val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, List[String], Long)]
          var cur: List[String] = null
          var n = 0L
          it.foreach { r =>
            val k = keyOf(r)
            if (cur != null && cur == k) n += 1
            else {
              if (cur != null) runs += ((pid, cur, n))
              cur = k; n = 1L
            }
          }
          if (cur != null) runs += ((pid, cur, n))
          runs.iterator
        }.collect()
      // driver: totals, target ranks (0-based), per-(pid,key) start offsets
      val totals: Map[List[String], Long] =
        counts.groupBy(_._2).map { case (k, rs) => k -> rs.map(_._3).sum }
      val targets: Map[List[String], Set[Long]] = totals.map { case (k, n) =>
        k -> probs.flatMap { p =>
          val pos = p * (n - 1)
          Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
        }.toSet
      }
      val offsets: Map[(Int, List[String]), Long] = {
        val running = scala.collection.mutable.HashMap.empty[List[String], Long]
        counts.sortBy(_._1).map { case (pid, k, n) =>
          val off = running.getOrElse(k, 0L)
          running(k) = off + n
          (pid, k) -> off
        }.toMap
      }
      val bcOff = spark.sparkContext.broadcast(offsets)
      val bcTgt = spark.sparkContext.broadcast(targets)
      // pass 2: emit only rows at target ranks
      val picked: Array[(List[String], Long, Double)] = sorted
        .mapPartitionsWithIndex { (pid, it) =>
          val off = bcOff.value
          val tgt = bcTgt.value
          var cur: List[String] = null
          var idx = 0L
          it.flatMap { r =>
            val k = keyOf(r)
            if (cur == null || cur != k) {
              cur = k
              idx = off.getOrElse((pid, k), 0L)
            }
            val out =
              if (tgt.getOrElse(k, Set.empty[Long]).contains(idx))
                Iterator.single((k, idx, r.getDouble(nk)))
              else Iterator.empty
            idx += 1
            out
          }
        }.collect()
      val byKey = picked.groupBy(_._1).map { case (k, rows) =>
        k -> rows.map(r => r._2 -> r._3).toMap
      }
      val rows = totals.toSeq.map { case (k, n) =>
        val vals = byKey(k)
        val qs = probs.map { p =>
          val pos = p * (n - 1)
          val lo = math.floor(pos).toLong
          val hi = math.ceil(pos).toLong
          // percentile's tie shortcut: equal neighbors return the value
          // directly (interpolating equal values costs an ulp — observed)
          if (lo == hi || vals(lo) == vals(hi)) vals(lo)
          else (hi - pos) * vals(lo) + (pos - lo) * vals(hi)
        }
        Row.fromSeq(k ++ Seq(n, qs))
      }
      val schema = StructType(
        keyCols.map(StructField(_, StringType, nullable = true)) :+
        StructField("n", LongType, nullable = false) :+
        StructField("qs", ArrayType(DoubleType), nullable = true))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    } finally sorted.unpersist(false)
  }
}
