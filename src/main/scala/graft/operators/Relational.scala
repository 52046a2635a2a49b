package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators re-expressing the reference's recurring
  * pandas/SQL patterns as composable, shuffle-aware Spark transformations.
  *
  * Each operator cites the reference behavior it mirrors (file:line under
  * /root/reference). All of them are pure `DataFrame => DataFrame` logic —
  * no collects, no driver-side loops — so plans stay distributed and
  * Catalyst-optimizable at any scale.
  */
object Relational {

  /** Keep exactly one row per key, by explicit priority order — the
    * reference's sort-then-drop_duplicates idiom
    * (`dvf/explore/task_functions.py:391-412`,
    * `schema/utils/consolidation.py:1027-1041`). One shuffle on `keys`.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-group top-K by explicit order (`dgv/monitoring/tops` top-50 lists).
    * Emits a `rank` column. Single shuffle on the partition keys; no global
    * sort, so it scales with the number of groups, not rows.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Semi-join on group cardinality == 1: the reference's "monobien" filter
    * (`dvf/explore/task_functions.py:507-511`) — keep rows whose key appears
    * exactly once in `df`. Partial aggregation makes the count map-side
    * combinable; the semi-join avoids materializing the counted columns.
    */
  def keepKeysWithCount(df: DataFrame, key: String, n: Long): DataFrame = {
    val once = df.groupBy(key).count().filter(col("count") === n).select(key)
    df.join(once, Seq(key), "left_semi")
  }

  /** Left join + presence flag — the reference's anti-flag idiom
    * (`insee/deces/task_functions.py:179-186`): flag rows of `df` whose key
    * exists in `flags`, without dropping any rows.
    */
  def antiFlagJoin(df: DataFrame, flags: DataFrame, keys: Seq[String], flagName: String): DataFrame = {
    val marked = flags.select(keys.map(col): _*).distinct().withColumn("__hit", lit(true))
    df.join(marked, keys, "left")
      .withColumn(flagName, coalesce(col("__hit"), lit(false))).drop("__hit")
  }

  /** Conditional-count pivot (`dgv/metrics/task_functions.py:226-262`): one
    * output column `prefix_<segment>` counting rows of each segment per
    * group. Expressed as sum(when(...)) so the whole thing is one partial-
    * aggregable shuffle instead of a pivot's extra distinct pass.
    */
  def conditionalCountPivot(df: DataFrame, keys: Seq[String], segCol: String,
                            segments: Seq[String], prefix: String): DataFrame = {
    val aggs = segments.map(s =>
      sum(when(col(segCol) === s, 1L).otherwise(0L)).as(s"${prefix}_$s"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** CDC row-set diff (`meteo/pg_processing/task_functions.py:448-535`):
    * multiplicity-aware additions/deletions between two snapshots. The
    * reference's 90 lines of manual prefix batching collapse to exceptAll,
    * which shuffles each side once on the full row hash.
    */
  def cdcDiff(newDf: DataFrame, oldDf: DataFrame): (DataFrame, DataFrame) =
    (newDf.exceptAll(oldDf), oldDf.exceptAll(newDf))

  /** Sessionization (`dvf/geoloc/task_functions.py:257-268`): assign a
    * per-key run id that increments whenever the gap to the previous row
    * (by `tsCol`, a monotonically comparable numeric) exceeds `gap`.
    * One shuffle on `key`; the windows are per-key, never global.
    */
  def sessionize(df: DataFrame, key: String, tsCol: String, tieBreak: String,
                 gap: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(tsCol), col(tieBreak))
    val newSession = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L
    ).otherwise(when(lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L))
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** [[sessionize]] for the 100× case where ONE key's history exceeds a
    * single task: identical semantics (same `session_id` per row), but no
    * per-key window anywhere — a key's rows may span MANY partitions.
    *
    *   1. range-partition + sort by (key, ts, tieBreak): globally ordered,
    *      spill-safe, each key contiguous ACROSS partitions;
    *   2. collect each partition's LAST (key, ts) — P rows, broadcast —
    *      and chain them through empty partitions so every partition knows
    *      the row preceding its first;
    *   3. one scan emits per-row session-START flags and a per-partition
    *      LOCAL per-key prefix count (carry-in from the broadcast makes
    *      boundary rows exact);
    *   4. the global id = local prefix + the key's start-count in earlier
    *      partitions — a (pid, key) aggregate joined back, with the offset
    *      window running over the (pid, key) SUMMARY frame (≤ P rows per
    *      key), never the data.
    *
    * Cost: one range exchange + one summary aggregate + one equi-join —
    * all distributed; driver traffic is P rows. `tsCol` must be integral
    * (cast to long internally), as in the reference's epoch-micros usage.
    */
  def sessionizeScalable(df: DataFrame, key: String, tsCol: String,
                         tieBreak: String, gap: Long): DataFrame = {
    val (out, cleanup) = sessionizeScalableBuild(df, key, tsCol, tieBreak, gap)
    // eager checkpoint while the intermediates are still persisted: the
    // offset join reads its own build twice, and an unpersisted recompute
    // would re-sample the range partitioner between the two reads
    try out.localCheckpoint(true) finally cleanup()
  }

  /** [[sessionizeScalable]] before its materializing checkpoint, for plan
    * audits; caller must invoke the cleanup thunk after the last action. */
  private[graft] def sessionizeScalableBuild(
      df: DataFrame, key: String, tsCol: String, tieBreak: String,
      gap: Long): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.storage.StorageLevel
    val spark = df.sparkSession
    val n = df.schema.size
    val ki = df.schema.fieldIndex(key)
    val ordCols = Seq(col(key), col(tsCol).cast("long"), col(tieBreak))
    val sorted = df
      .withColumn("__ts", col(tsCol).cast("long"))
      .repartitionByRange(ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .rdd.persist(StorageLevel.MEMORY_AND_DISK)
    // key equality matching what Window.partitionBy groups together:
    // binary keys by VALUE (Array[Byte].equals is reference identity),
    // NaN equal to itself, -0.0 == 0.0 (primitive compare)
    def keyEq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
      case (x: Float, y: Float) => (x.isNaN && y.isNaN) || x == y
      case _ => a == b
    }
    // pass 1: each partition's last (key, ts); chained through empties so
    // carry(p) = the row immediately before partition p's first row. ts is
    // boxed: null timestamps are legal (they sort first within the key,
    // like the window's nulls-first order) and each starts a session,
    // matching sessionize's lag(null) branch.
    val lasts: Array[(Int, Any, java.lang.Long)] = sorted
      .mapPartitionsWithIndex { (pid, it) =>
        var last: Row = null
        it.foreach(r => last = r)
        if (last == null) Iterator.empty
        else Iterator.single((pid, last.get(ki),
          if (last.isNullAt(n)) null: java.lang.Long
          else Long.box(last.getLong(n))))
      }.collect()
    val byPid = lasts.map(l => l._1 -> ((l._2, l._3))).toMap
    val nPart = sorted.getNumPartitions
    val carry: Map[Int, (Any, java.lang.Long)] = {
      var prev: Option[(Any, java.lang.Long)] = None
      (0 until nPart).map { p =>
        val c = p -> prev
        prev = byPid.get(p).orElse(prev)
        c
      }.collect { case (p, Some(v)) => p -> v }.toMap
    }
    val bcCarry = spark.sparkContext.broadcast(carry)
    // pass 2: start flags + local per-key prefix counts
    val flagged = sorted.mapPartitionsWithIndex { (pid, it) =>
      var prevKey: Any = null
      var prevTs: java.lang.Long = null
      var hasPrev = false
      bcCarry.value.get(pid).foreach { case (k, t) =>
        prevKey = k; prevTs = t; hasPrev = true
      }
      var local = 0L
      it.map { r =>
        val k = r.get(ki)
        val ts: java.lang.Long =
          if (r.isNullAt(n)) null else Long.box(r.getLong(n))
        val sameKey = hasPrev && keyEq(k, prevKey)
        // start = first of key | prev ts null (sessionize's lag-null
        // branch) | gap exceeded (null-safe false, as in the window form)
        val start = !sameKey || prevTs == null ||
          (ts != null && ts.longValue - prevTs.longValue > gap)
        if (!sameKey) local = 0L
        if (start) local += 1
        prevKey = k; prevTs = ts; hasPrev = true
        Row.fromSeq(r.toSeq.take(n) :+ Long.box(pid.toLong) :+
          Long.box(if (start) 1L else 0L) :+ Long.box(local))
      }
    }
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("__pid", LongType, nullable = false),
      StructField("__start", LongType, nullable = false),
      StructField("__local", LongType, nullable = false)))
    val fd = spark.createDataFrame(flagged, schema)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (pid, key) summary: starts per key per partition; offset = starts
    // in EARLIER partitions — the window runs over summary rows only
    val sums = fd.groupBy(col("__pid"), col(key))
      .agg(sum(col("__start")).as("__nf"))
    val wOff = Window.partitionBy(col(key)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = sums
      .withColumn("__off", sum(col("__nf")).over(wOff) - col("__nf"))
      .select(col("__pid"), col(key), col("__off"))
    val out = fd.join(offs, Seq("__pid", key))
      .withColumn("session_id", col("__local") + col("__off"))
      .drop("__pid", "__start", "__local", "__off")
    (out, () => { fd.unpersist(false); sorted.unpersist(false); () })
  }

  /** As-of (temporal) join, the Spark-native replacement for the reference's
    * range-batched parcel join with retries
    * (`dvf/geoloc/task_functions.py:272-306`). For every left row, attach
    * the latest right row with `right.ts <= left.ts` for the same key.
    *
    * Implementation: union the two sides tagged, then a single per-key
    * window carries the last right ROW forward as a struct
    * (`last(struct(...), ignoreNulls)`), so ts and every payload column come
    * from the same matched row — whole-row match semantics, like SQL ASOF.
    * Cost: ONE shuffle on `key` — no range-join explosion, no per-interval
    * loop; scales linearly in rows per key, which is what survives 100 TB.
    * Right rows sort before left rows at equal timestamps, making the
    * match inclusive (>=).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payloadCols: Seq[String]): DataFrame =
    asOfJoin(left, right, key, tsCol, payloadCols, forwardRetry = false)

  /** As-of join with the reference's miss-retry semantics
    * (`dvf/geoloc/task_functions.py:290-305`): rows with no backward match
    * (left.ts earlier than every right row for the key) are retried against
    * the FIRST LATER right row — the reference's "remainders re-enriched at
    * each upcoming snapshot batch", collapsed into one forward window pass
    * over the same single shuffle.
    *
    * With `forwardRetry = true` the result also carries `asof_dir`:
    * 'backward' | 'forward' | null (no right row for the key at all).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               payloadCols: Seq[String], forwardRetry: Boolean): DataFrame = {
    require(!payloadCols.contains("__ts"),
      "asOfJoin: payload column name '__ts' collides with the internal match-struct field")
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(key) +: col(tsCol) +:
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__side", lit(0))
    // Right rows get __side=0 so they sort before left rows at equal ts,
    // making the match inclusive (left.ts >= right.ts). Payload columns are
    // appended to the ordering so ties between right rows at the same
    // (key, ts) resolve deterministically.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val order = col(tsCol) +: col("__side") +: payloadCols.map(c => col(s"__p_$c"))
    val w = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward frame shares the shuffle+sort of `w` (same partitioning and
    // ordering) — the retry costs one extra window function, zero shuffles.
    // At equal ts right rows sort BEFORE left, so the forward frame sees
    // strictly-later rights only; equal-ts matches already resolve backward.
    val wf = Window.partitionBy(key).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // The matched right row travels as ONE struct, so every asof_* column
    // (and asof_ts) comes from the SAME right row — per-column ignoreNulls
    // fills could otherwise blend payloads of different rows when a payload
    // value is null (DuckDB ASOF matches whole rows; so do we).
    val rightRow = when(col("__side") === 0,
      struct(col(tsCol).as("__ts") +: payloadCols.map(c => col(s"__p_$c").as(c)): _*))
    val backRow = last(rightRow, ignoreNulls = true).over(w)
    val fwdRow = first(rightRow, ignoreNulls = true).over(wf)
    val matched = if (forwardRetry) coalesce(backRow, fwdRow) else backRow
    val withCols = payloadCols.foldLeft(unioned) { case (d, c) =>
      d.withColumn(s"asof_$c", matched.getField(c))
    }.withColumn("asof_ts", matched.getField("__ts"))
    val filled =
      if (!forwardRetry) withCols
      else withCols.withColumn("asof_dir",
        when(backRow.isNotNull, lit("backward"))
          .when(fwdRow.isNotNull, lit("forward")))
    filled.filter(col("__side") === 1)
      .drop("__side" +: payloadCols.map("__p_" + _): _*)
  }

  /** Skew-salted equi-join: spread a hot join key over `nSalts` sub-keys.
    * The fact side derives a DETERMINISTIC salt from `factSalt` (e.g.
    * `doc_id % n` — never rand(), which breaks retries and oracles); the
    * dim side replicates each row across all salts. The shuffle key becomes
    * (key, salt), so a key holding half the table spreads over nSalts
    * reducers instead of hot-spotting one — the manual complement to AQE
    * skew-join for deterministic plans.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factSalt: Column, nSalts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(factSalt, lit(nSalts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Banded lookback range join: pair each `probe` row with every `build`
    * row sharing `key` whose `buildTs` lies in [probeTs − window, probeTs]
    * (epoch-µs longs). Both sides are bucketed by `ts div window`; a probe
    * row probes its own bucket and the previous one — a qualifying build
    * row lives in exactly one of the two, so no pair dedup. Per-key fanout
    * is probes_band × builds_band, never the global |P_k| × |B_k| a bare
    * key join pays before its range filter: FnSkewProbe (bot user over
    * sf0.1 organic events) measured the bare join at 8.5 s / one 2.5e9-pair
    * task at a 2×100k bot — quadratic beyond — where this shape holds
    * 3.9 s with identical output. (The Window RANGE-frame alternative
    * re-aggregates sliding frames per row — 33 s already at 2×20k.)
    */
  def bandedLookbackJoin(probe: DataFrame, build: DataFrame, key: String,
                         probeTs: String, buildTs: String,
                         window: Long): DataFrame = {
    require(window > 0, "window must be positive")
    val b = build.withColumn("__band", expr(s"$buildTs div ${window}L"))
    probe
      .withColumn("__band",
        explode(array(expr(s"$probeTs div ${window}L"),
          expr(s"$probeTs div ${window}L - 1"))))
      .join(b, Seq(key, "__band"))
      .filter(col(buildTs).between(col(probeTs) - lit(window), col(probeTs)))
      .drop("__band")
  }

  /** CDC apply with the reference's full-replace policy
    * (`meteo/pg_processing/task_functions.py:559-575`): compute the
    * (added, removed) diff; if the deletion count exceeds `threshold`,
    * replace the whole period with the new snapshot, otherwise apply the
    * incremental diff. Returns (result, fullReplace). The count is one
    * cheap aggregation over the (already shuffled) diff.
    */
  def applyCdcPolicy(newDf: DataFrame, oldDf: DataFrame,
                     threshold: Long): (DataFrame, Boolean) = {
    val (added, removed) = cdcDiff(newDf, oldDf)
    if (removed.count() > threshold) (newDf, true)
    else (oldDf.exceptAll(removed).unionByName(added), false)
  }

  /** Multi-scale aggregation (`dvf/explore/task_functions.py:452-543`): the
    * same metrics at several geographic grains at once. Spark-first shape:
    * one ROLLUP (grouping sets) pass — a single shuffle producing every
    * grain, instead of the reference's one-loop-per-level.
    */
  def rollupAgg(df: DataFrame, levels: Seq[String], aggs: Seq[Column]): DataFrame =
    df.rollup(levels.map(col): _*).agg(aggs.head, aggs.tail: _*)
}
