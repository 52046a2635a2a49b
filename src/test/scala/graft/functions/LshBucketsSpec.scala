package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Similarity

/** The fused LshBuckets kernel must be BIT-IDENTICAL to the compositional
  * when(dot)-chain form (which the SQL oracles replay), in both the
  * interpreted and codegen paths, at small and JIT-cliff-sized plane
  * counts, on real embeddings and on short/odd vectors.
  */
class LshBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def realVecs = Tables.embeddings(spark, sf())
    .select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))

  private def assertParity(df: org.apache.spark.sql.DataFrame,
                           nPlanes: Int, dim: Int, nTables: Int): Unit = {
    val mismatches = df
      .withColumn("__fused", Similarity.lshBucketsExpr("v", nPlanes, dim, nTables))
      .withColumn("__hof", Similarity.lshBucketsExprHof("v", nPlanes, dim, nTables))
      .filter(col("__fused") =!= col("__hof"))
      .count()
    assert(mismatches == 0, s"fused != hof at planes=$nPlanes tables=$nTables")
  }

  test("fused == compositional on real embeddings (catalog shapes)") {
    assertParity(realVecs, nPlanes = 4, dim = 64, nTables = 4)
    assertParity(realVecs, nPlanes = 6, dim = 64, nTables = 1)
    assertParity(realVecs, nPlanes = 7, dim = 64, nTables = 8)
  }

  test("fused == compositional at JIT-cliff plane counts") {
    val synth = spark.range(2000).select(col("id").as("vec_id"),
      expr("""transform(sequence(0, 63),
               j -> (pmod(hash(id * 64 + j), 1000) / 1000.0d) - 0.5d)""").as("v"))
    assertParity(synth, nPlanes = 11, dim = 64, nTables = 8)
    assertParity(synth, nPlanes = 13, dim = 64, nTables = 4)
  }

  test("interpreted eval == codegen result") {
    // force the interpreted path through a direct expression eval
    val vec = (0 until 64).map(j => (j % 7 - 3) / 3.0).toArray
    val expr0 = LshBuckets(
      org.apache.spark.sql.catalyst.expressions.Literal.create(vec,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      nPlanes = 11, dim = 64, nTables = 8)
    val interpreted = expr0.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    val viaDf = Seq(Tuple1(vec)).toDF("v")
      .select(Similarity.lshBucketsExpr("v", 11, 64, 8).as("b"))
      .as[Seq[Long]].head()
    assert(interpreted === viaDf)
  }

  test("short vectors use min(dim, len) like the dot-product fold") {
    val shortVec = Array(0.5, -0.25, 0.125)
    val a = Seq(Tuple1(shortVec)).toDF("v")
      .select(Similarity.lshBucketsExpr("v", 5, 64, 2).as("b")).as[Seq[Long]].head()
    val b = Seq(Tuple1(shortVec)).toDF("v")
      .select(Similarity.lshBucketsExprHof("v", 5, 64, 2).as("b")).as[Seq[Long]].head()
    assert(a === b)
  }
}
