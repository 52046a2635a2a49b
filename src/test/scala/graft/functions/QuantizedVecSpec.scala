package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Int8 scalar quantization: the native expressions must be bit-identical
  * to the HOF/SQL twin the DuckDB oracle replays, across both execution
  * paths, and the SQ8 search paths must agree with their float baselines
  * where quantization cannot change the answer (exact copies).
  */
class QuantizedVecSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.Tables.embeddings(spark, sf())
    .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))

  /** HOF twin of Int8Quantize at scale 256 (the dQuant oracle formula),
    * as an array<long> for comparison. */
  private val hofQuant256 =
    expr("transform(v, x -> cast(greatest(-127.0d, least(127.0d, floor(x * 256.0d))) as long))")

  test("native quantize bytes match the oracle formula, incl. clamp edges") {
    val hand = Seq(
      (1L, Seq(0.0, 0.1, -0.1, 0.49609375, -0.49609375, 1.5, -1.5, 0.255)),
      (2L, Seq(0.5, -0.5, 0.00390625, -0.00390625, 0.2549, -0.2551, 0.0039, -0.0039))
    ).toDF("vec_id", "v")
    val got = hand.withColumn("q", QuantizedVec.quantizeInt8($"v", 256.0))
      .select($"vec_id", $"q").as[(Long, Array[Byte])].collect().toMap
    def q(x: Double): Byte = {
      var f = math.floor(x * 256.0).toLong
      if (f > 127) f = 127 else if (f < -127) f = -127
      f.toByte
    }
    assert(got(1L).toSeq == Seq(0.0, 0.1, -0.1, 0.49609375, -0.49609375, 1.5, -1.5, 0.255).map(q))
    assert(got(2L).toSeq == Seq(0.5, -0.5, 0.00390625, -0.00390625, 0.2549, -0.2551, 0.0039, -0.0039).map(q))
    // clamp edges explicitly: 0.5*256=128 clamps to 127; -0.5 -> -128 -> -127
    assert(got(2L)(0) == 127.toByte && got(2L)(1) == (-127).toByte)
  }

  test("native quantize agrees with the HOF twin element-wise on real embeddings") {
    val q = vecs
      .withColumn("qb", QuantizedVec.quantizeInt8($"v", 256.0))
      .withColumn("hof", hofQuant256)
      .select($"vec_id".as[Long], $"qb".as[Array[Byte]], $"hof".as[Seq[Long]])
    q.collect().foreach { case (id, qb, hof) =>
      assert(qb.toSeq.map(_.toLong) == hof, s"vec $id")
    }
  }

  test("quantized dot equals the oracle's integer list formula on real embeddings") {
    val q = vecs.withColumn("qv", hofQuant256)
      .withColumn("qb", QuantizedVec.quantizeInt8($"v", 256.0))
    val pairs = q.select($"vec_id".as("id1"), $"qv".as("qv1"), $"qb".as("qb1"))
      .crossJoin(q.limit(5).select($"vec_id".as("id2"), $"qv".as("qv2"), $"qb".as("qb2")))
    val both = pairs
      .withColumn("nat", QuantizedVec.quantizedDot($"qb1", $"qb2"))
      .withColumn("hof",
        expr("aggregate(zip_with(qv1, qv2, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
    assert(both.filter($"nat" =!= $"hof").count() == 0)
  }

  test("interpreted path matches codegen path") {
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try vecs.limit(50)
        .select(QuantizedVec.quantizedDot(
          QuantizedVec.quantizeInt8($"v", 256.0),
          QuantizedVec.quantizeInt8(expr("reverse(v)"), 256.0)).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("int8ScaleFor picks the largest non-clamping power of two") {
    assert(QuantizedVec.int8ScaleFor(0.4856) == 256.0)
    assert(QuantizedVec.int8ScaleFor(1.0) == 64.0)
    assert(QuantizedVec.int8ScaleFor(100.0) == 1.0)
    assert(QuantizedVec.int8ScaleFor(1000.0) == 0.125)
    // no-clamp property: maxAbs * scale <= 127 at each
    for (m <- Seq(0.4856, 1.0, 100.0, 1000.0))
      assert(m * QuantizedVec.int8ScaleFor(m) <= 127.0)
    // corpus-derived scale on the real table == the pinned s6 literal
    assert(Similarity.int8ScaleForCorpus(vecs, "v") == 256.0)
  }

  test("int8 top-1 finds planted exact copies (float-baseline agreement)") {
    // plant exact copies of vecs 0..19 at id+10000: quantization cannot
    // separate a vector from its copy, so int8 top-1 == float top-1 == copy
    val copies = vecs.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val corpus = vecs.unionByName(copies)
      .select($"vec_id".as("cid"), $"v".as("cvec"))
    val queries = vecs.filter($"vec_id" < 20)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val top1Int8 = Similarity.int8TopK(queries, corpus, 1, 256.0)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    val top1Float = Similarity.bruteForceTopK(queries, corpus, 1)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    assert(top1Int8.size == 20)
    for (qid <- 0L until 20L) {
      assert(top1Int8(qid) == qid + 10000, s"int8 top-1 of $qid")
      assert(top1Float(qid) == qid + 10000, s"float top-1 of $qid")
    }
  }

  test("IVF-SQ8 stays cell-keyed and agrees with float IVF on planted copies") {
    val copies = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val all = vecs.unionByName(copies)
    val centroids = vecs.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"v".as("centvec"))
    val queries = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val corpus = all.select($"vec_id".as("cid"), $"v".as("cvec"))
    val got = Similarity.int8IvfTopK(queries, corpus, centroids,
        k = 1, nProbe = 2, scale = 256.0)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    // a copy shares its original's cell (identical vector -> identical
    // assignment), so the cell-restricted search must still surface it
    for (qid <- 100L until 110L) assert(got(qid) == qid + 10000)
  }
}
