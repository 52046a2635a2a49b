package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

/** Product quantization: the native pack/ADC expressions must be
  * bit-identical to the HOF/SQL twin the DuckDB oracle replays (including
  * the unsigned upper half of the byte range), across both execution paths,
  * and the PQ search paths must agree with their float baselines where
  * quantization cannot change the answer (exact copies — identical vectors
  * get identical codes, so the copy's ADC score ties its original's).
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.Tables.embeddings(spark, sf())
    .select($"vec_id", expr("transform(embedding, x -> cast(x as double))").as("v"))

  test("packCodes packs ints to unsigned bytes") {
    val got = Seq((1L, Seq(0, 5, 15, 3)), (2L, Seq(127, 128, 200, 255)))
      .toDF("id", "ca")
      .select($"id", PqVec.packCodes($"ca").as("b"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(got(1L).toSeq == Seq[Byte](0, 5, 15, 3))
    // 128/200/255 wrap to the signed byte with the same unsigned value
    assert(got(2L).toSeq.map(_ & 0xFF) == Seq(127, 128, 200, 255))
  }

  test("ADC score is bit-identical to the HOF/SQL twin (incl. codes > 127)") {
    // deterministic fake LUTs; kCodes=16 exercises the common case and
    // kCodes=256 the unsigned-byte indexing (code 255 -> lut[m*256+255])
    for (kCodes <- Seq(16, 256)) {
      val nSub = 4
      val codes = Seq(Seq(0, 5, kCodes - 1, 3), Seq(kCodes - 1, 0, 7, kCodes / 2))
      val df = codes.zipWithIndex.map { case (ca, i) =>
        (i.toLong, ca, (0 until nSub * kCodes).map(j => ((j * 37 + i) % 100) / 100.0 - 0.5))
      }.toDF("id", "ca", "lut")
      val both = df
        .withColumn("nat", PqVec.adcScore($"lut", PqVec.packCodes($"ca"), kCodes))
        .withColumn("hof", expr(
          s"aggregate(sequence(0, size(ca) - 1), cast(0 as double), " +
            s"(acc, m) -> acc + lut[m * $kCodes + ca[m]])"))
        .select($"nat".as[Double], $"hof".as[Double]).collect()
      both.foreach { case (n, h) =>
        assert(java.lang.Double.doubleToRawLongBits(n) ==
          java.lang.Double.doubleToRawLongBits(h), s"kCodes=$kCodes: $n != $h")
      }
    }
  }

  test("interpreted path matches codegen path") {
    val df = Seq((1L, Seq(3, 250, 0, 128)),
                 (2L, Seq(255, 1, 77, 19))).toDF("id", "ca")
      .withColumn("lut", expr(
        "transform(sequence(0, 1023), j -> (pmod(j * 31 + id, 199) / 199.0d) - 0.5d)"))
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try df.select(
          PqVec.adcScore($"lut", PqVec.packCodes($"ca"), 256).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("codebook/encode: an exact copy gets byte-identical codes") {
    val copies = vecs.filter($"vec_id" < 20)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val corpus = vecs.unionByName(copies)
      .select($"vec_id".as("cid"), $"v".as("cvec"))
    val cb = Similarity.pqCodebook(corpus, "cid", "cvec",
      dim = 64, nSub = 4, kCodes = 16, iters = 1)
    assert(cb.count() == 64) // 4 blocks x 16 codes
    val codes = Similarity.pqEncode(corpus, cb, "cid", "cvec", dim = 64, nSub = 4)
      .as[(Long, Array[Byte])].collect().toMap
    assert(codes.size == corpus.count())
    for (id <- 0L until 20L)
      assert(codes(id).toSeq == codes(id + 10000).toSeq, s"codes of copy $id")
  }

  test("PQ top-1 surfaces planted exact copies (modulo full-code ties)") {
    // L2-ADC guarantee: a query's own code assignment minimizes every block
    // term, so its exact copy scores minimal. Another vector can only beat
    // the copy on the (qdist ASC, cid) tie rule by having BYTE-IDENTICAL
    // codes — so top-1 must either be the copy or share its code word.
    val copies = vecs.filter($"vec_id" < 10)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val corpus = vecs.unionByName(copies)
      .select($"vec_id".as("cid"), $"v".as("cvec"))
    val queries = vecs.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val got = Similarity.pqTopK(queries, corpus, k = 1,
        dim = 64, nSub = 4, kCodes = 16, iters = 2)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    assert(got.size == 10)
    val cb = Similarity.pqCodebook(corpus, "cid", "cvec",
      dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val codes = Similarity.pqEncode(corpus, cb, "cid", "cvec", dim = 64, nSub = 4)
      .as[(Long, Array[Byte])].collect().toMap
    for (qid <- 0L until 10L) {
      val winner = got(qid)
      assert(winner == qid + 10000 ||
        codes(winner).toSeq == codes(qid + 10000).toSeq,
        s"top-1 of $qid is $winner with codes ${codes(winner).toSeq} != " +
          s"copy codes ${codes(qid + 10000).toSeq}")
    }
  }

  test("indexed search == full search over the same corpus (pq + ivfpq)") {
    // the persisted-artifact path (codebook/codes/cell store prebuilt) must
    // be bit-identical to the build-inline path — it is the same math, and
    // this is what lets the catalog warm the artifacts untimed
    val corpus = vecs.select($"vec_id".as("cid"), $"v".as("cvec"))
    val queries = vecs.filter($"vec_id" >= 100 && $"vec_id" < 120)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val centroids = vecs.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"v".as("centvec"))
    val cb = Similarity.pqCodebook(corpus, "cid", "cvec",
      dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val codes = Similarity.pqEncode(corpus, cb, "cid", "cvec", dim = 64, nSub = 4)

    val fullPq = Similarity.pqTopK(queries, corpus, k = 3,
      dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val idxPq = Similarity.pqTopKIndexed(queries, cb, codes, k = 3,
      dim = 64, nSub = 4, kCodes = 16)
    assert(fullPq.exceptAll(idxPq).isEmpty && idxPq.exceptAll(fullPq).isEmpty)

    val cellCodes = Similarity.ivfPqIndex(corpus, centroids, codes)
    val fullIvf = Similarity.ivfPqTopK(queries, corpus, centroids,
      k = 3, nProbe = 2, dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val idxIvf = Similarity.ivfPqTopKIndexed(queries, cb, cellCodes, centroids,
      k = 3, nProbe = 2, dim = 64, nSub = 4, kCodes = 16)
    assert(fullIvf.exceptAll(idxIvf).isEmpty && idxIvf.exceptAll(fullIvf).isEmpty)
  }

  test("rerank with rerankK >= all candidates == exact IVF search") {
    // stage 1 at rerankK >= |corpus| passes EVERY cell-mate through, so the
    // exact-cosine stage 2 must reproduce ivfTopK bit-for-bit (same
    // candidate set, same cosine, same (sim DESC, cid) rank) — pins that
    // the rerank stage itself is exact and the composition loses nothing
    val corpus = vecs.select($"vec_id".as("cid"), $"v".as("cvec"))
    val queries = vecs.filter($"vec_id" >= 100 && $"vec_id" < 120)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val centroids = vecs.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"v".as("centvec"))
    val cb = Similarity.pqCodebook(corpus, "cid", "cvec",
      dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val codes = Similarity.pqEncode(corpus, cb, "cid", "cvec", dim = 64, nSub = 4)
    val cellCodes = Similarity.ivfPqIndex(corpus, centroids, codes)
    val got = Similarity.ivfPqRerankTopK(queries, cb, cellCodes, centroids,
      corpus, k = 3, rerankK = corpus.count().toInt, nProbe = 2,
      dim = 64, nSub = 4, kCodes = 16)
    val exact = Similarity.ivfTopK(queries, corpus, centroids, k = 3, nProbe = 2)
    assert(got.exceptAll(exact).isEmpty && exact.exceptAll(got).isEmpty)
  }

  test("rerank surfaces planted exact copies at top-1") {
    // a copy's ADC score ties its original's (byte-identical codes), so it
    // survives any rerankK >= 1 cut; the exact stage then ranks it first
    // (cosine 1) — quantization noise cannot demote it through the rerank
    val copies = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val all = vecs.unionByName(copies)
    val corpus = all.select($"vec_id".as("cid"), $"v".as("cvec"))
    val queries = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val centroids = vecs.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"v".as("centvec"))
    val cb = Similarity.pqCodebook(corpus, "cid", "cvec",
      dim = 64, nSub = 4, kCodes = 16, iters = 2)
    val codes = Similarity.pqEncode(corpus, cb, "cid", "cvec", dim = 64, nSub = 4)
    val cellCodes = Similarity.ivfPqIndex(corpus, centroids, codes)
    val got = Similarity.ivfPqRerankTopK(queries, cb, cellCodes, centroids,
        corpus, k = 1, rerankK = 12, nProbe = 2,
        dim = 64, nSub = 4, kCodes = 16)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    for (qid <- 100L until 110L) assert(got(qid) == qid + 10000, s"top-1 of $qid")
  }

  test("IVF-PQ stays cell-keyed and surfaces copies through their shared cell") {
    val copies = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select(($"vec_id" + 10000).as("vec_id"), $"v")
    val all = vecs.unionByName(copies)
    val centroids = vecs.filter($"vec_id" < 16)
      .select($"vec_id".as("cent_id"), $"v".as("centvec"))
    val queries = vecs.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select($"vec_id".as("qid"), $"v".as("qvec"))
    val corpus = all.select($"vec_id".as("cid"), $"v".as("cvec"))
    val got = Similarity.ivfPqTopK(queries, corpus, centroids,
        k = 1, nProbe = 2, dim = 64, nSub = 4, kCodes = 16, iters = 2)
      .select($"qid", $"cid").as[(Long, Long)].collect().toMap
    for (qid <- 100L until 110L) assert(got(qid) == qid + 10000, s"top-1 of $qid")
  }
}
