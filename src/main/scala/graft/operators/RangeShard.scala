package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deterministic range sharding without a global sort — the "export the
  * corpus in key order" layout primitive (training-shard writes, ordered
  * parquet exports). Spark's own `repartitionByRange`/`orderBy` draws its
  * partition boundaries from a RANDOM reservoir sample, so two runs of
  * the same job can land rows in different files; this operator instead
  * computes EXACT boundary keys by distributed selection (the f18c
  * two-pass shape: per-partition counts, then emit only the rows at the
  * target global ranks — both collects are Θ(shards), not data) and
  * assigns shards with a codegen-friendly branch chain over the
  * broadcast cut list. Shard of the row at 0-based global rank r is
  * exactly ⌊r·B/n⌋ — the closed form any engine can replay.
  *
  * Scale shape: two light passes over the key column (one shuffle by
  * range for the selection) + one narrow map for assignment; no global
  * sort, no window, no driver loop over data. At 100 TB the cut list is
  * B−1 longs regardless of corpus size.
  */
object RangeShard {

  /** Exact shard-boundary keys for `keyCol` (non-null BIGINT, UNIQUE —
    * callers build a tie-broken key like value·10⁸ + id): returns
    * (n, cuts c₁..c_{B−1}) where c_k = the key at 0-based sorted rank
    * ⌈k·n/B⌉, i.e. the first key of shard k. Assignment below counts
    * cuts ≤ key, which equals ⌊rank·B/n⌋ because keys are unique. */
  def cuts(df: DataFrame, keyCol: String, nShards: Int): (Long, Array[Long]) = {
    require(nShards > 1, s"nShards must be > 1, got $nShards")
    val spark = df.sparkSession
    val sorted = df.select(col(keyCol).cast("long").as("__k"))
      .repartitionByRange(nShards * 2, col("__k"))
      .sortWithinPartitions("__k")
      .rdd.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-partition counts → global offsets (Θ(partitions))
      val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.size.toLong)
      }.collect().sortBy(_._1)
      val n = counts.map(_._2).sum
      require(n >= nShards, s"need at least $nShards rows, got $n")
      val offsets = counts.scanLeft(0 -> 0L) { case ((_, acc), (pid, c)) =>
        pid -> (acc + c)
      }.tail.map { case (pid, end) => pid -> end }.toMap
      val starts = counts.map { case (pid, c) => pid -> (offsets(pid) - c) }.toMap
      // 0-based target ranks: first row of each shard k = ⌈k·n/B⌉
      val targets = (1 until nShards)
        .map(k => (k.toLong * n + nShards - 1) / nShards).toSet
      val bcStart = spark.sparkContext.broadcast(starts)
      val bcTgt = spark.sparkContext.broadcast(targets)
      // pass 2: emit only the rows at target global ranks (Θ(shards))
      val picked = sorted.mapPartitionsWithIndex { (pid, it) =>
        var idx = bcStart.value(pid)
        val tgt = bcTgt.value
        it.flatMap { r =>
          val out = if (tgt.contains(idx)) Iterator.single(idx -> r.getLong(0))
                    else Iterator.empty
          idx += 1
          out
        }
      }.collect().toMap
      (n, targets.toArray.sorted.map(picked))
    } finally { sorted.unpersist(); () }
  }

  /** Shard assignment column: count of cuts ≤ key, built as a chain of
    * B−1 `when` branches over the literal cut list — fully codegen'd,
    * no HOF lambda per row, no shuffle. */
  def shardCol(keyCol: Column, cutKeys: Array[Long]): Column = {
    val chain = cutKeys.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (c, i)) =>
        val cond = keyCol < lit(c)
        Some(acc.fold(when(cond, lit(i)))(_.when(cond, lit(i))))
    }
    chain.fold(lit(0))(_.otherwise(lit(cutKeys.length))).cast("int")
  }

  /** Assign + land the frame hive-partitioned by `shard` with bounded
    * file counts (delegates to [[graft.sources.Writers.corpusLayout]]).
    * Returns the cut keys for the caller's manifest. */
  def layout(df: DataFrame, keyCol: String, path: String,
             nShards: Int): Array[Long] = {
    val (_, cutKeys) = cuts(df, keyCol, nShards)
    val assigned = df.withColumn("shard", shardCol(col(keyCol), cutKeys))
    graft.sources.Writers.corpusLayout(assigned, path, Seq("shard"))
    cutKeys
  }
}
