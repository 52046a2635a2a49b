package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.{SlidingWindowHashes, SlidingWindows}

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  test("SlidingWindows emits every w-codepoint window, stride 1") {
    val out = Seq("abcdef", "abc", "ab", "", "héllo!").toDF("t")
      .select(SlidingWindows.slidingWindows($"t", 3).as("w"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("abc", "bcd", "cde", "def"))
    assert(out(1) == Seq("abc"))
    assert(out(2) == Seq.empty)          // shorter than w
    assert(out(3) == Seq.empty)
    // code-point (not byte) windows across a 2-byte UTF-8 char
    assert(out(4) == Seq("hél", "éll", "llo", "lo!"))
  }

  test("SlidingWindows null in, null out") {
    val out = Seq[Option[String]](None, Some("abcd")).toDF("t")
      .select(SlidingWindows.slidingWindows($"t", 2).as("w"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[String](0) == Seq("ab", "bc", "cd"))
  }

  test("SlidingWindowHashes: rolling recurrence == direct hash at every offset") {
    // hashes(s)[p] must equal the hash of the isolated window string —
    // i.e. the O(n) rolling pass reproduces the direct polynomial at every
    // position, including across multibyte code points
    val df = Seq("abcdefghij", "héllo wörld — ünïcode £text", "aaaaaaaa",
        "0123456789AB0123456789AB").toDF("t")
    val w = 5
    val pairs = df
      .select(posexplode(SlidingWindows.slidingWindows($"t", w)).as(Seq("p", "win")),
        SlidingWindowHashes.slidingWindowHashes($"t", w).as("hs"))
      .select(element_at($"hs", $"p" + 1).as("rolled"),
        element_at(SlidingWindowHashes.slidingWindowHashes($"win", w), 1).as("direct"))
    assert(pairs.count() > 0)
    assert(pairs.filter($"rolled" =!= $"direct").isEmpty)
  }

  test("hashed full pass == exact full pass on the corpus") {
    val corpus = Tables.documents(spark, sf()).select("doc_id", "text")
    val docs = corpus.unionByName(corpus.filter($"doc_id" % 9 === 1)
      .select(($"doc_id" + 3000000).as("doc_id"), $"text"))
    val exact = Dedup.substringDedupSpans(docs, "doc_id", "text", w = 40)
    val hashed = Dedup.substringDedupSpansHashed(docs, "doc_id", "text", w = 40)
    assert(hashed.exceptAll(exact).isEmpty && exact.exceptAll(hashed).isEmpty)
    assert(exact.filter($"dup_chars" > 0).count() > 0)
  }

  test("hashed incremental == exact incremental on the corpus") {
    val corpus = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch = corpus.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text")
      .unionByName(corpus.filter($"doc_id" % 7 === 3)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat(lit("fresh-"), $"doc_id", lit("-wrap "),
            substring($"text", 1, 60),
            lit(" shared-tail-boilerplate-for-batch-dup-spans")).as("text")))
    val sIdx = Dedup.substringWindowIndex(corpus, "text", w = 40)
    val hIdx = Dedup.substringWindowIndexHashed(corpus, "text", w = 40)
    val exact = Dedup.incrementalSubstringSpans(batch, sIdx, "doc_id", "text", w = 40)
    val hashed = Dedup.incrementalSubstringSpansHashed(batch, hIdx, "doc_id", "text", w = 40)
    assert(hashed.exceptAll(exact).isEmpty && exact.exceptAll(hashed).isEmpty)
    assert(exact.filter($"dup_chars" > 0).count() > 0)
  }

  test("substringDedupSpans marks all-but-first occurrences and merges islands") {
    // doc 0: original. doc 1: repeats a 12-char passage of doc 0 twice,
    // separated, inside otherwise-unique text. doc 2: unique.
    // w=8 → the repeated passage produces 5 overlapping dup windows per
    // occurrence that must merge into ONE island each of length 12.
    val docs = Seq(
      (0L, "0123456789AB-unique-tail-zero"),
      (1L, "xx0123456789ABy1y2y3y4y50123456789ABzz"),
      (2L, "totally-different-content-here")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedupSpans(docs, "doc_id", "text", w = 8)
      .orderBy("doc_id").collect()

    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 holds the first occurrences → zero dup spans
    assert(byId(0L).getAs[Long]("n_dup_spans") == 0L)
    assert(byId(0L).getAs[Long]("dup_chars") == 0L)
    // doc 1: both later occurrences of the passage are islands of 12 chars
    assert(byId(1L).getAs[Long]("n_dup_spans") == 2L)
    assert(byId(1L).getAs[Long]("dup_chars") == 24L)
    assert(byId(1L).getAs[Long]("kept_chars") ==
      byId(1L).getAs[Long]("total_chars") - 24L)
    assert(byId(2L).getAs[Long]("n_dup_spans") == 0L)
  }

  test("incrementalSubstringSpans hits the index, batch-first survives, fresh text clean") {
    // strings chosen with NO accidental shared 8-grams beyond the planted
    // regions (longest unplanned common run is " corpus"/" 012345…" edges
    // < 8 chars)
    val corpus = Seq((0L, "corpusz 0123456789AB corpusq corpusr yy")).toDF("doc_id", "text")
    val batch = Seq(
      // embeds the indexed " 0123456789AB " region → dup span via the index
      (10L, "newhead1 0123456789AB newtail9 abcdefgh"),
      // batch-only shared passage: first occurrence (doc 11) survives,
      // second (doc 12) is a within-batch dup
      (11L, "blockqrstuvwx-shared11 eleven-only-tail"),
      (12L, "twelve-start blockqrstuvwx-shared11 end"),
      (13L, "freshxyz unseen13 totally-new-material7")
    ).toDF("doc_id", "text")
    val index = Dedup.substringWindowIndex(corpus, "text", w = 8)
    val out = Dedup.incrementalSubstringSpans(batch, index, "doc_id", "text", w = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(10L).getAs[Long]("n_dup_spans") == 1L)   // indexed passage found
    assert(out(10L).getAs[Long]("dup_chars") >= 12L)
    assert(out(11L).getAs[Long]("n_dup_spans") == 0L)   // batch-first kept
    assert(out(12L).getAs[Long]("n_dup_spans") == 1L)   // within-batch dup
    assert(out(13L).getAs[Long]("dup_chars") == 0L)     // fresh doc untouched
  }

  test("incrementalSubstringSpans == full pass over corpus ∪ batch restricted to batch") {
    val corpus = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch = corpus.filter($"doc_id" % 10 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text")
      .unionByName(corpus.filter($"doc_id" % 7 === 3)
        .select(($"doc_id" + 2000000).as("doc_id"),
          concat(lit("fresh-"), $"doc_id", lit("-wrap "),
            substring($"text", 1, 60),
            lit(" shared-tail-boilerplate-for-batch-dup-spans")).as("text")))
    val index = Dedup.substringWindowIndex(corpus, "text", w = 40)
    val inc = Dedup.incrementalSubstringSpans(batch, index, "doc_id", "text", w = 40)
    val full = Dedup.substringDedupSpans(corpus.unionByName(batch), "doc_id", "text", w = 40)
      .filter($"doc_id" >= 1000000)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
    // the fixture genuinely exercises both legs
    assert(inc.filter($"dup_chars" > 0).count() > 0)
  }

  test("substringDedupCleanText removes exactly the measured spans, byte-for-byte") {
    // hand fixture: doc 1 repeats doc 0's 12-char passage twice — removal
    // must excise both occurrences and nothing else
    val docs = Seq(
      (0L, "0123456789AB-unique-tail-zero"),
      (1L, "xx0123456789ABy1y2y3y4y50123456789ABzz"),
      (2L, "totally-different-content-here")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedupCleanText(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val expected1 = "xxy1y2y3y4y5zz"
    assert(out(1L).getAs[Long]("clean_chars") == expected1.length.toLong)
    assert(out(1L).getAs[String]("clean_md5") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest(expected1.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // zero-dup docs pass through byte-identical
    assert(out(0L).getAs[Long]("clean_chars") == 29L)
    assert(out(2L).getAs[Long]("clean_chars") == 30L)

    // and on the corpus: clean_chars agrees with the measurement op per doc
    val corpus = Tables.documents(spark, sf()).select("doc_id", "text")
    val stats = Dedup.substringDedupSpans(corpus, "doc_id", "text", w = 40)
      .select($"doc_id", $"kept_chars")
    val clean = Dedup.substringDedupCleanText(corpus, "doc_id", "text", w = 40)
      .select($"doc_id", $"clean_chars".as("kept_chars"))
    assert(stats.exceptAll(clean).isEmpty && clean.exceptAll(stats).isEmpty)
  }

  test("substringDedupSpans keeps zero-dup docs and conserves totals on the corpus") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val out = Dedup.substringDedupSpans(docs, "doc_id", "text", w = 40)
    assert(out.count() == docs.count())  // no doc dropped
    val bad = out.filter($"kept_chars" + $"dup_chars" =!= $"total_chars" ||
      $"dup_chars" < 0 || $"kept_chars" < 0).count()
    assert(bad == 0)
    // the synthetic corpus genuinely contains repeated 40-char passages
    assert(out.filter($"n_dup_spans" > 0).count() > 0)
  }
}
