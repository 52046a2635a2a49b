package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All tables are plain parquet scans — Catalyst handles column pruning and
  * predicate pushdown, so callers should filter/select directly on these.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` has shipped with two `ts` physical layouts: parquet
    * TIMESTAMP(NANOS) (readable only as raw longs via `nanosAsLong` — also
    * the scaled-dir INT64 layout ScaleGen writes) and plain microsecond
    * TIMESTAMP/TIMESTAMP_NTZ. Dispatch on the loaded type and normalize to
    * the same three derived columns either way: `ts_us_long` (exact epoch
    * MICROseconds — the unit all shared timestamp arithmetic uses),
    * `ts_us` (proper timestamp at micro precision), `ts_ns` (epoch nanos).
    * All conversions are integer `div`/`*` — no double round-trip. The
    * NTZ→timestamp cast is exact because every session pins UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_us_long", expr("ts_ns div 1000"))
          .withColumn("ts_us", expr("timestamp_micros(ts_us_long)"))
      case _ =>
        raw.withColumn("ts_us", col("ts").cast("timestamp"))
          .withColumn("ts_us_long", unix_micros(col("ts_us")))
          .withColumn("ts_ns", col("ts_us_long") * lit(1000L))
          .drop("ts")
    }
  }
}
