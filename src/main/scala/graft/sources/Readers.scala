package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Scan-side operators (SURVEY §2.1 S1–S9): the reference's ingest surface
  * re-expressed as schema-first Spark reads. Gzip/chunking/manual prefix
  * partitioning all disappear — Spark's partitioned readers already do it.
  */
object Readers {

  /** S1/S3: typed CSV scan with the reference's option surface
    * (`dvf/explore/task_functions.py:172-177`: dtype map, sep, encoding,
    * na values; gzip handled transparently by extension). */
  def csv(spark: SparkSession, path: String, schema: StructType,
          sep: String = ",", encoding: String = "UTF-8", header: Boolean = true,
          nullValue: String = ""): DataFrame =
    spark.read.schema(schema)
      .option("sep", sep).option("encoding", encoding)
      .option("header", header.toString).option("nullValue", nullValue)
      .csv(path)

  /** S5: fixed-width text scan (`insee/deces/task_functions.py:71-90`):
    * byte-offset field slicing as substring projections over spark.read.text
    * — stays in whole-stage codegen, splittable, no UDF.
    * @param fields (name, startOffset0Based, length) triples */
  def fixedWidth(spark: SparkSession, path: String,
                 fields: Seq[(String, Int, Int)]): DataFrame = {
    val cols = fields.map { case (name, start, len) =>
      trim(substring(col("value"), start + 1, len)).as(name)
    }
    spark.read.text(path).select(cols: _*)
  }

  /** S8: JSON scan with explicit schema (schema-first everywhere —
    * inference only belongs at exploratory edges). */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S6: raw log scan — one string column per line; parsing is a projection
    * (see pipelines.LogMetrics), not a driver-side loop. */
  def rawLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
