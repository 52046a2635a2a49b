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
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    // hilbert_index(x, y, order) — order must be an integer literal
    registry.createOrReplaceTempFunction(
      "hilbert_index", exprs => HilbertIndex(exprs(0), exprs(1),
        exprs(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"hilbert_index order must be an integer literal, got $other")
        }), "scala_udf")
    registry.createOrReplaceTempFunction(
      "normadresse", exprs => NormAdresseAbrev(exprs.head), "scala_udf")
    // minhash_bands(toks, w, k, b) — w/k/b must be integer literals
    registry.createOrReplaceTempFunction(
      "minhash_bands", exprs => MinhashBands(exprs.head,
        intLit(exprs(1), "w"), intLit(exprs(2), "k"), intLit(exprs(3), "b")),
      "scala_udf")
  }

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"minhash_bands $name must be an integer literal, got $other")
  }
}
