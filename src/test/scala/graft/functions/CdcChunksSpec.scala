package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking kernel: parity against an independent BigInt
  * reference chunker (guards off AND on), the tiling invariant, and the
  * property the operator exists for — a prefix edit resynchronizes at the
  * first unaffected window so every later chunk hash is shared. */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val W = 16
  private val MaskBits = 6

  /** Reference chunker: direct per-window polynomial hash in BigInt mod
    * 2^64 (independent of the kernel's Long-wrapped rolling recurrence). */
  private def refChunks(s: String, w: Int, maskBits: Int,
                        minLen: Int, maxLen: Int): Seq[(Int, Int)] = {
    val cps = s.codePoints().toArray
    val n = cps.length
    if (n == 0) return Nil
    val M = BigInt(1) << 64
    val B = BigInt("9E3779B97F4A7C15", 16)
    def winHash(end: Int): BigInt = // 0-based inclusive end, window [end-w+1, end]
      (0 until w).map(j => BigInt(cps(end - w + 1 + j)) * B.modPow(w - 1 - j, M))
        .sum.mod(M)
    val mask = BigInt((1L << maskBits) - 1)
    val cuts = scala.collection.mutable.ListBuffer.empty[Int]
    var start = 0
    for (c <- 1 to n) {
      val len = c - start
      val hashCut = c >= w && (winHash(c - 1) & mask) == 0 && len >= minLen
      if (hashCut || len >= maxLen) { cuts += c; start = c }
    }
    if (start < n) cuts += n
    cuts.scanLeft(0)((_, c) => c).zip(cuts).map { case (p, c) => (p + 1, c - p) }.toSeq
  }

  private def kernel(texts: Seq[String], minLen: Int, maxLen: Int): Seq[Seq[(Int, Int)]] =
    texts.toDF("t")
      .select(CdcChunks.cdcChunks($"t", W, MaskBits, minLen, maxLen).as("c"))
      .as[Seq[(Int, Int)]].collect().toSeq

  private lazy val docs = graft.Tables.documents(spark, sf())
    .select($"text").as[String].collect().take(120).toSeq

  test("kernel equals the BigInt reference on real documents and corners") {
    val corners = Seq("", "short", "x" * (W - 1), "x" * W,
      "héllo wörld ünïcode — čhunk bøundary test padded to pass a window",
      "a" * 500)
    for (minMax <- Seq((1, Int.MaxValue), (32, 128))) {
      val (mn, mx) = minMax
      val got = kernel(docs ++ corners, mn, mx)
      val want = (docs ++ corners).map(refChunks(_, W, MaskBits, mn, mx))
      assert(got == want, s"guards $mn..$mx")
    }
  }

  test("chunks tile the text exactly") {
    for (cs <- kernel(docs, 1, Int.MaxValue); if cs.nonEmpty) {
      assert(cs.head._1 == 1)
      for (Seq((s1, l1), (s2, _)) <- cs.sliding(2); if cs.size > 1)
        assert(s2 == s1 + l1)
    }
    // and lengths respect the guards when they're on
    for (cs <- kernel(docs, 32, 128); (s, l) <- cs) {
      assert(l <= 128)
      // only the final chunk may undershoot minLen
      if (s + l - 1 < cs.map(c => c._1 + c._2 - 1).max) assert(l >= 32)
    }
  }

  test("a prefix edit resynchronizes: all chunks after the splice are shared") {
    val pairs = docs.filter(_.length > 200).map(t => (t, "PREFIX-EDIT: " + t))
    val h1 = pairs.map(_._1).map(t =>
      refChunks(t, W, MaskBits, 1, Int.MaxValue)
        .map { case (s, l) => t.substring(s - 1, s - 1 + l) }.toSet)
    // kernel chunks of the edited docs, rendered to chunk strings
    val h2 = kernel(pairs.map(_._2), 1, Int.MaxValue).zip(pairs).map {
      case (cs, (_, t2)) => cs.map { case (s, l) => t2.substring(s - 1, s - 1 + l) }.toSet
    }
    for (((a, b), t) <- h1.zip(h2).zip(pairs.map(_._1))) {
      val shared = a.intersect(b).size
      // the edit only perturbs chunks overlapping the first W-window span;
      // with mean chunk 64 that is at most the first couple of chunks
      assert(shared >= a.size - 2, s"shared $shared of ${a.size}: ${t.take(40)}")
    }
  }

  test("interpreted path matches codegen path") {
    def run(codegen: String) = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen)
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen == "true") "FALLBACK" else "NO_CODEGEN")
      try docs.take(40).toDF("t")
        .select(CdcChunks.cdcChunks($"t", W, MaskBits, 1, Int.MaxValue).cast("string"))
        .as[String].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(run("true") == run("false"))
  }
}
