package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-name registration for graft's custom Catalyst expressions, so they are
  * usable from `spark.sql("SELECT unaccent(c) ...")` as well as the Column API.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "unaccent", exprs => Unaccent(exprs.head), "scala_udf")
  }
}
