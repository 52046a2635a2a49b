package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sink-side operators (SURVEY §2.1 S14–S20): CSV/parquet writers plus the
  * reference's idempotence patterns (dynamic partition overwrite, upsert as
  * read-merge-write). All writers keep the DataFrame partitioned — no
  * coalesce(1) in the engine path.
  */
object Writers {

  /** S14/S15: CSV sink with header control and optional gzip
    * (`utils/conversions.py:39-62`). */
  def csv(df: DataFrame, path: String, header: Boolean = true,
          gzip: Boolean = false, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("header", header.toString)
    (if (gzip) w.option("compression", "gzip") else w).csv(path)
  }

  /** Bucketed managed table: pre-hash-partition the data ON DISK so that
    * every later equi-join or aggregation on `bucketCol` reads already
    * co-located data and skips its shuffle entirely — the standing answer
    * to a fact-fact join that would otherwise re-shuffle 100 TB on every
    * run. Join sides must agree on bucket column and count; `sortCols`
    * additionally pre-sorts each bucket file so sort-merge joins can skip
    * their sort when files-per-bucket is 1. PlanSpec pins the no-Exchange
    * join plan.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** S16: zstd parquet sink (`utils/conversions.py:8-36`). */
  def parquetZstd(df: DataFrame, path: String,
                  partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  private val exitDeletions = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  private lazy val exitHook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => exitDeletions.keySet().forEach { p =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(p))
    }))

  /** Register a scratch directory tree for deletion at JVM exit (each path
    * once, one shared shutdown hook) — for per-process tmp layouts that
    * would otherwise accumulate run over run. */
  def deleteTreeOnExit(path: String): Unit = {
    exitHook
    exitDeletions.put(path, true)
    ()
  }

  /** 100 TB corpus layout: hive-partitioned zstd parquet with BOUNDED file
    * counts. A naive `partitionBy` write lets every upstream task open a
    * writer for every partition value it sees — tasks × partitions files,
    * the classic small-files explosion at scale. Repartitioning on
    * (partition cols, spread) first routes each output directory to exactly
    * `filesPerPartition` tasks, so the landed layout is
    * nPartitionValues × filesPerPartition files regardless of upstream
    * parallelism. Partition-keyed readers then prune whole directories at
    * PLANNING time (PartitionFilters, before any file is opened) — PlanSpec
    * pins both the file-count bound and the pruned scan. */
  def corpusLayout(df: DataFrame, path: String, partitionCols: Seq[String],
                   filesPerPartition: Int = 1): Unit = {
    require(partitionCols.nonEmpty, "corpusLayout needs partition columns")
    val spread = pmod(hash(df.columns.map(col): _*), lit(filesPerPartition))
    df.repartition((partitionCols.map(col) :+ spread): _*)
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** S20/St3: delete-date-then-reload (`dgv/metrics/task.py:199-221`) as
    * dynamic partition overwrite — only the partitions present in `df` are
    * replaced; the rest of the table is untouched. Idempotent day re-runs. */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    // Per-write option, NOT a session-conf toggle: concurrent writers in the
    // same session (two streaming queries' foreachBatch, or a parallel batch
    // job) must never race each other into static-overwrite semantics.
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)

  /** S19/St5: upsert sink as read-merge-write
    * (`dgv/tabular_metrics/task_functions.py:145-172`: INSERT ... ON
    * CONFLICT DO UPDATE SET count = old + new). Full outer join on the key,
    * summed counters, write to a fresh dir then swap — the caller owns the
    * atomic-rename step. Returns the merged frame. */
  def upsertCounts(existing: DataFrame, delta: DataFrame,
                   keys: Seq[String], countCol: String): DataFrame = {
    val e = existing.withColumnRenamed(countCol, "__old")
    val n = delta.withColumnRenamed(countCol, "__new")
    e.join(n, keys, "full")
      .withColumn(countCol, coalesce(col("__old"), lit(0L)) + coalesce(col("__new"), lit(0L)))
      .drop("__old", "__new")
  }

  /** Byte-compatible CSV export contract
    * (`dvf/explore/task_functions.py:764-803`): fixed column order, pandas
    * `float_format="%.0f"` rendering, ONE header line, then each subsequent
    * year appended header-less — a single consumer-facing CSV file.
    *
    * Float rendering matches C printf `%.0f`: round HALF-EVEN to integer
    * (Spark `bround`), nulls become empty fields (pandas `na_rep=''`).
    * Known divergence: (-0.5, 0) renders "0", not C's "-0".
    *
    * Each year's frame is formatted and sorted DISTRIBUTED, then written as
    * single-partition CSV (the contract is one ordered file — inherently a
    * one-stream sink) and stream-appended to `dest` on the driver.
    */
  def csvExportContract(years: Seq[DataFrame], dest: String,
                        columnOrder: Seq[String], sortCols: Seq[String]): Unit = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, StringType}
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(dest, false))
    try years.zipWithIndex.foreach { case (df, i) =>
      val cols = columnOrder.map { c =>
        df.schema(c).dataType match {
          case DoubleType | FloatType =>
            bround(col(c)).cast(DecimalType(38, 0)).cast(StringType).as(c)
          case _ => col(c)
        }
      }
      val tmp = java.nio.file.Files.createTempDirectory("csvexp")
      try {
        df.select(cols: _*).orderBy(sortCols.map(col): _*).coalesce(1)
          .write.mode(SaveMode.Overwrite)
          .option("header", (i == 0).toString).option("emptyValue", "")
          .csv(tmp.toString)
        val listing = java.nio.file.Files.list(tmp)
        try {
          val part = listing
            .filter(p => p.getFileName.toString.startsWith("part-"))
            .findFirst()
          if (!part.isPresent)
            throw new IllegalStateException(
              s"csvExportContract: no part file written for frame $i under $tmp")
          java.nio.file.Files.copy(part.get(), out)
        } finally listing.close()
        out.flush()
      } finally {
        // temp CSVs are full data copies — never leave them behind
        val paths = java.nio.file.Files.walk(tmp)
        try paths.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally paths.close()
      }
    } finally out.close()
  }

  /** St2: processed-file registry (`dgv/tabular_metrics/task_functions.py:
    * 177-229`): filter a batch of candidate file names down to the
    * never-seen ones, given the registry table. */
  def newFilesOnly(candidates: DataFrame, registry: DataFrame,
                   fileCol: String): DataFrame =
    candidates.join(registry.select(fileCol).distinct(), Seq(fileCol), "left_anti")

  /** St6: source-recency watermark (`meteo/pg_processing/task_functions.py:
    * 263-276`, `insee/deces/task_functions.py:32-37`): keep only sources
    * whose modification stamp is strictly newer than the last-ingested
    * stamp recorded per key; unseen keys pass through. */
  def freshSourcesOnly(sources: DataFrame, state: DataFrame,
                       keyCol: String, tsCol: String): DataFrame = {
    val last = state.groupBy(keyCol).agg(max(col(tsCol)).as("__last_ts"))
    sources.join(last, Seq(keyCol), "left")
      .filter(col("__last_ts").isNull || col(tsCol) > col("__last_ts"))
      .drop("__last_ts")
  }
}
