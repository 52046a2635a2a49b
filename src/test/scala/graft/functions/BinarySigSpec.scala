package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** 1-bit sign quantization: the native expressions must be bit-identical
  * to the HOF/SQL twin the DuckDB oracle replays, and the hamming-scan
  * search must degrade to the exact brute force when the rerank pool
  * covers the whole corpus.
  */
class BinarySigSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.Tables.embeddings(spark, sf())
    .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("sign pack sets exactly the 32-bit-word layout (hand vectors)") {
    // element i (0-based) sets bit (i % 32) of word (i / 32); only x > 0
    val v = Array.fill(64)(0.0)
    v(0) = 1.0; v(5) = 0.25; v(31) = 1e-300; v(32) = 2.0; v(63) = 3.0
    v(7) = -1.0; v(40) = 0.0 // negative and zero must NOT set bits
    val got = Seq((1L, v.toSeq)).toDF("id", "v")
      .select(BinarySig.signPack($"v").as("s")).as[Seq[Long]].head()
    assert(got == Seq((1L << 0) | (1L << 5) | (1L << 31), (1L << 0) | (1L << 31)))
    // dim not a multiple of 32 → one ceil-width word
    val short = Seq((1L, Seq(1.0, -1.0, 0.0, 4.0, 5.0))).toDF("id", "v")
      .select(BinarySig.signPack($"v").as("s")).as[Seq[Long]].head()
    assert(short == Seq((1L << 0) | (1L << 3) | (1L << 4)))
  }

  test("native sign pack agrees with the HOF twin on real embeddings") {
    val both = vecs
      .withColumn("nat", BinarySig.signPack($"v"))
      .withColumn("hof", expr(BinarySig.signPackHofSql("v", 64)))
    assert(both.filter(not($"nat" <=> $"hof")).count() == 0)
  }

  test("native hamming agrees with the bit_count HOF twin on real pairs") {
    val s = vecs.withColumn("sig", BinarySig.signPack($"v"))
    val pairs = s.select($"vec_id".as("id1"), $"sig".as("s1"))
      .crossJoin(s.limit(7).select($"vec_id".as("id2"), $"sig".as("s2")))
    val both = pairs
      .withColumn("nat", BinarySig.hamming($"s1", $"s2"))
      .withColumn("hof", expr(
        "aggregate(zip_with(s1, s2, (a, b) -> bit_count(a ^ b)), 0L, (acc, x) -> acc + cast(x as long))"))
    assert(both.filter($"nat" =!= $"hof").count() == 0)
  }

  test("interpreted path matches codegen path") {
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try vecs.limit(50)
        .select(BinarySig.hamming(
          BinarySig.signPack($"v"),
          BinarySig.signPack(expr("reverse(v)"))).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("hammingTopK with full-corpus rerank equals the exact brute force") {
    val q = vecs.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val c = vecs.select($"vec_id".as("cid"), $"v".as("cvec"))
    val n = c.count().toInt
    val viaHamming = Similarity.hammingTopK(q, c, k = 3, rerankR = n - 1)
      .select("qid", "rank", "cid", "sim_fp")
    val brute = Similarity.bruteForceTopK(q, c, k = 3)
    assert(viaHamming.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(viaHamming).count() == 0)
  }

  test("hammingTopK is deterministic and well-formed at small rerank") {
    val q = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val c = vecs.select($"vec_id".as("cid"), $"v".as("cvec"))
    val r1 = Similarity.hammingTopK(q, c, k = 3, rerankR = 10).collect().toSet
    val r2 = Similarity.hammingTopK(q, c, k = 3, rerankR = 10).collect().toSet
    assert(r1 == r2)
    assert(r1.groupBy(_.getAs[Long]("qid")).forall { case (_, rows) =>
      rows.map(_.getAs[Int]("rank")).toSeq.sorted == Seq(1, 2, 3)
    })
  }
}
