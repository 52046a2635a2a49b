package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.functions.Hilbert.hilbert

/** S17: Hilbert-clustered (Geo)Parquet sink — the Spark-native counterpart
  * of the reference's DuckDB GeoParquet conversion
  * (`utils/conversions.py:65-142`: global-extent Hilbert sort, zstd,
  * bounded row groups, per-row bbox).
  *
  * Shape: one cheap extent aggregation (a single min/max pass), then
  * `repartitionByRange` on the Hilbert index (files become spatial tiles)
  * + `sortWithinPartitions` (row groups become sub-tiles). Parquet min/max
  * column stats on (lon, lat, hilbert) then give readers spatial pruning —
  * the distributed stand-in for a spatial index.
  */
object GeoWriter {

  /** Adds `hilbert` (cell index on a 2^order grid over the frame's extent)
    * and a `bbox` struct per row. */
  def withHilbert(df: DataFrame, lonCol: String, latCol: String, order: Int): DataFrame = {
    val ext = df.agg(min(lonCol), max(lonCol), min(latCol), max(latCol)).head()
    if (ext.isNullAt(0)) // empty or all-null coordinates: degenerate extent
      return df.withColumn("hilbert", lit(0L))
        .withColumn("bbox", struct(col(lonCol).as("xmin"), col(lonCol).as("xmax"),
          col(latCol).as("ymin"), col(latCol).as("ymax")))
    val (minx, maxx, miny, maxy) =
      (ext.getDouble(0), ext.getDouble(1), ext.getDouble(2), ext.getDouble(3))
    val n = (1L << order) - 1
    def cell(c: String, lo: Double, hi: Double) =
      if (hi > lo) least(floor((col(c) - lit(lo)) / lit(hi - lo) * n), lit(n)).cast("long")
      else lit(0L)
    df.withColumn("hilbert",
        hilbert(cell(lonCol, minx, maxx), cell(latCol, miny, maxy), order))
      .withColumn("bbox", struct(col(lonCol).as("xmin"), col(lonCol).as("xmax"),
        col(latCol).as("ymin"), col(latCol).as("ymax")))
  }

  /** Write `df` Hilbert-clustered: spatial range partitioning + in-file
    * ordering + zstd + bounded row groups. Parquet bounds row groups by
    * BYTES (`parquet.block.size`), so the tile granularity knob is
    * `blockBytes`; the page row limit additionally tightens page-level
    * stats (the reference's 20k-row groups, `utils/conversions.py:123-129`). */
  def hilbertClustered(df: DataFrame, lonCol: String, latCol: String,
                       path: String, order: Int = 10, pageRows: Int = 20000,
                       blockBytes: Long = 8L * 1024 * 1024): Unit =
    withHilbert(df, lonCol, latCol, order)
      .repartitionByRange(col("hilbert"))
      .sortWithinPartitions("hilbert")
      .write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("parquet.block.size", blockBytes.toString)
      .option("parquet.page.row.count.limit", pageRows.toString)
      .parquet(path)
}
