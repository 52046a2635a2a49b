package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Relational

/** Schema-consolidation pipeline (`schema/utils/consolidation.py:953-1041`,
  * SURVEY §3.3): many heterogeneous per-producer files → one frame on the
  * declared schema. Per file: project to the schema (missing optional
  * columns added as typed nulls, extras dropped), discard rows with null
  * required fields, then union everything and keep one row per primary key
  * by recency.
  */
object Consolidation {

  /** Project one source frame onto the declared schema. */
  def projectToSchema(df: DataFrame, schema: StructType): DataFrame = {
    val cols: Seq[Column] = schema.fields.map { f =>
      if (df.columns.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  def consolidate(files: Seq[DataFrame], schema: StructType,
                  requiredCols: Seq[String], primaryKey: Seq[String],
                  recencyCol: String): DataFrame = {
    require(files.nonEmpty, "consolidate: no input files (empty producer listing)")
    // Each file gets a provenance index used as the recency tie-break —
    // the reference's concat order decides ties the same way
    // (`schema/utils/consolidation.py:1027-1041`).
    val projected = files.zipWithIndex.map { case (f, i) =>
      projectToSchema(f, schema).withColumn("__src", lit(i))
    }
    val unioned = projected.reduce(_.unionByName(_))
      .na.drop(requiredCols)
    Relational.dedupKeepFirst(unioned, primaryKey,
        Seq(desc(recencyCol), asc("__src")))
      .drop("__src")
  }
}
