package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeEncode

/** Production-scale batched BPE: byte-parity of the batch-1 path against
  * the legacy single-merge trainer's goldens, the symbol-disjointness the
  * batch apply relies on, the greedy-kernel == sequential-rank-order
  * property the oracle's list_reduce replays, interpreted == codegen for
  * the encode kernel, and the >= 256-merge capacity bar on real testdata. */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  private def wordVocab = graft.Tables.documents(spark, sf())
    .selectExpr("explode(split(text, ' ')) AS w")
    .filter($"w".rlike("^[a-z]+\\z"))
    .groupBy("w").count().withColumnRenamed("count", "f")

  private lazy val docMerges: Vector[Bpe.Merge] =
    Bpe.trainBatched(Bpe.sampleVocab(
      graft.Tables.documents(spark, sf()), "text", "doc_id"), rounds = 48)

  test("batch-1 training == legacy 8-round goldens (symbols translated)") {
    val legacy = Bpe.merges(wordVocab, "w", "f", rounds = 8).orderBy("round")
      .collect().map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt")))
    val vocab = wordVocab.collect()
      .map(r => (r.getAs[String]("w"), r.getAs[Long]("f"))).toSeq
    val batched = Bpe.trainBatched(vocab, rounds = 8, batchM = 1)
    // legacy merge j used symbol ('A'+j); batch-1 merge of round r uses
    // chr(SymBase + r - 1) — translate legacy pair chars and compare
    def tr(p: String): String = p.map { c =>
      if (c >= 'A' && c <= 'Z') (Bpe.SymBase + (c - 'A')).toChar else c
    }
    assert(batched.length === legacy.length)
    assert(batched.map(m => (m.pair, m.cnt)) ===
      legacy.toVector.map { case (p, c) => (tr(p), c) })
    assert(batched.zipWithIndex.forall { case (m, j) =>
      m.round == j + 1 && m.rk == 1 && m.sym == (Bpe.SymBase + j).toChar.toString
    })
  }

  test("each round's batch is mutually symbol-disjoint, symbols pinned") {
    val byRound = docMerges.groupBy(_.round)
    assert(byRound.nonEmpty)
    byRound.foreach { case (r, ms) =>
      // pairwise-disjoint symbol SETS (a self-pair like "aa" is one set)
      val sets = ms.map(m => Set(m.pair.charAt(0), m.pair.charAt(1)))
      sets.combinations(2).foreach { case Seq(x, y) =>
        assert((x & y).isEmpty, s"round $r shares a symbol across pairs")
      }
      ms.foreach { m =>
        assert(m.sym === (Bpe.SymBase + (r - 1) * Bpe.BatchM + m.rk - 1).toChar.toString)
      }
    }
  }

  test("capacity: >= 256 merges learned from the sf0.001 documents sample") {
    assert(docMerges.length >= 256, s"only ${docMerges.length} merges")
  }

  test("greedy encode kernel == sequential rank-order application") {
    val texts = graft.Tables.documents(spark, sf()).select("text")
      .filter(length($"text") > 0).limit(60).as[String].collect()
    val viaKernel = texts.toSeq.toDF("t")
      .select(BpeEncode.encode($"t", docMerges).as("e"))
      .as[String].collect()
    texts.zip(viaKernel).foreach { case (t, k) =>
      assert(k === Bpe.applySequential(t, docMerges), t.take(40))
    }
    // tokens strictly compress and decode lengths are consistent
    assert(viaKernel.zip(texts).forall { case (e, t) => e.length < t.length })
  }

  test("greedy picks by RANK, not first-found: engineered fixture") {
    // merges learned so that a later-rank pair appears earlier in the
    // string; greedy must still apply the lower rank first
    val vocab = Seq(("abab", 50L), ("cd", 40L), ("abcd", 1L))
    val merges = Bpe.trainBatched(vocab, rounds = 3, batchM = 1)
    val enc = Seq("cdabab").toDF("t")
      .select(BpeEncode.encode($"t", merges).as("e")).as[String].head()
    assert(enc === Bpe.applySequential("cdabab", merges))
  }

  test("encode kernel: interpreted path matches codegen path") {
    val texts = graft.Tables.documents(spark, sf()).select("text")
      .filter(length($"text") > 0).limit(40).as[String].collect().toSeq
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try texts.toDF("t").select(BpeEncode.encode($"t", docMerges))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }

  test("empty merge list and unmergeable input are identity") {
    val out = Seq("xyz", "").toDF("t")
      .select(BpeEncode.encode($"t", Vector.empty).as("e")).as[String].collect()
    assert(out.toSeq === Seq("xyz", ""))
    val one = Bpe.trainBatched(Seq(("ab", 1L)), rounds = 1, batchM = 1)
    val out2 = Seq("zz", "ab").toDF("t")
      .select(BpeEncode.encode($"t", one).as("e")).as[String].collect()
    assert(out2.toSeq === Seq("zz", one.head.sym))
  }
}
