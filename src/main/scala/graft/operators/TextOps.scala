package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, deterministic 60-bit hashing, MinHash
  * signatures, LSH band hashes, SimHash, fingerprints.
  *
  * Everything here is a pure column expression over arrays — per-row, no
  * shuffle. The hash primitive is md5-based (not Spark's murmur3) so the
  * DuckDB oracle can replay every pipeline bit-for-bit.
  *
  * CRITICAL evaluation-cost note: Catalyst's CollapseProject inlines
  * `withColumn` chains, so an expression that references its input column
  * N times re-evaluates the ENTIRE upstream expression N times (observed:
  * `split()` re-executed inside every shingle's concat_ws — exponential in
  * pipeline depth, a multi-minute hang at 5k docs). Multi-stage pipelines
  * below therefore bind each stage exactly once as a lambda variable via
  * [[letSql]]: `transform(array(E), v -> body)` evaluates E once and lets
  * the body reference `v` freely.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** SQL fragment: deterministic 60-bit positive hash of a string expr —
    * identical on Spark and DuckDB (`('0x'||substr(md5(x),1,15))::BIGINT`). */
  def md5LongSql(x: String): String =
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"

  /** SQL fragment: the LOW half of the 120-bit signature hash — md5 hex
    * nibbles 16–30 (same cross-engine idiom as [[md5LongSql]]). */
  def md5LongLoSql(x: String): String =
    s"cast(conv(substring(md5($x), 16, 15), 16, 10) as bigint)"

  /** SQL let-binding: evaluate `bound` once, reference it as `v` in `body`.
    * Implemented as a single-element transform — works interpreted and
    * codegen'd, and survives CollapseProject without duplication. */
  def letSql(bound: String, v: String)(body: String => String): String =
    s"element_at(transform(array($bound), $v -> ${body(v)}), 1)"

  /** SQL: w-word shingles of token-array expr `toks` (distinct set; empty
    * when the doc has < w tokens — Spark's sequence(1,0) would DESCEND). */
  def shinglesSql(toks: String, w: Int): String = {
    val cat = (0 until w).map(o => s"element_at($toks, i + $o)")
      .mkString("concat_ws(' ', ", ", ", ")")
    s"if(size($toks) < $w, array(), array_distinct(transform(sequence(1, size($toks) - ${w - 1}), i -> $cat)))"
  }

  /** SQL: ALL w-word gram occurrences of token-array expr `toks` —
    * the multiset `shinglesSql` collapses with array_distinct; repetition
    * counting needs every occurrence. Empty when the doc has < w tokens. */
  def allGramsSql(toks: String, w: Int): String = {
    val cat = (0 until w).map(o => s"element_at($toks, i + $o)")
      .mkString("concat_ws(' ', ", ", ", ")")
    s"if(size($toks) < $w, array(), transform(sequence(1, size($toks) - ${w - 1}), i -> $cat))"
  }

  /** SQL: one md5 hash per element of string-array expr `arr`. */
  def tokenHashesSql(arr: String): String =
    s"transform($arr, t -> ${md5LongSql("t")})"

  /** SQL: MinHash signature over pre-hashed array expr `hs` — k affine
    * hashes with driver-derived literal seeds (DetHash); per-row cost is
    * k*n multiply-adds, no md5 in the inner loop. */
  def minhashSql(hs: String, k: Int): String =
    DetHash.minhashSeeds(k).map { case (a, b) =>
      s"array_min(transform($hs, h -> ($a * (h % ${DetHash.P}) + $b) % ${DetHash.P}))"
    }.mkString("array(", ", ", ")")

  /** SQL: LSH band hashes — b bands of r signature rows of array expr `sg`.
    * Collision prob for Jaccard j: 1-(1-j^r)^b. */
  def bandsSql(sg: String, b: Int, r: Int): String =
    s"""transform(sequence(0, ${b - 1}),
       |  j -> md5(array_join(transform(slice($sg, j * $r + 1, $r),
       |    x -> cast(x as string)), '|')))""".stripMargin

  /** The full shingle → MinHash → band pipeline as ONE let-bound expression
    * over a token-array column: struct(shingles, bands), null when the doc
    * is too short to shingle. Each stage evaluates exactly once per row. */
  def minhashBandsExpr(toksCol: String, w: Int, k: Int, b: Int, r: Int): Column = expr(
    letSql(toksCol, "tv") { tv =>
      letSql(shinglesSql(tv, w), "sh") { sh =>
        s"""if(size($sh) = 0, null, named_struct(
           |  'shingles', $sh,
           |  'bands', ${letSql(tokenHashesSql(sh), "hs") { hs =>
                letSql(minhashSql(hs, k), "sg") { sg => bandsSql(sg, b, r) } }}))""".stripMargin
      }
    })

  /** 16-bit SimHash of a token-array column as one let-bound expression:
    * bit b is the sign of the sum of +-1 votes from each token hash's bit b.
    * Token hashes are computed once, not once per bit. */
  def simhash16Expr(toksCol: String): Column = expr(
    letSql(toksCol, "tv") {
      tv => letSql(tokenHashesSql(tv), "hs") { hs =>
        s"""aggregate(sequence(0, 15), 0L, (acc, b) -> acc +
           |  if(aggregate($hs, 0L,
           |       (w, h) -> w + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
           |     shiftleft(1L, b), 0L))""".stripMargin
      }
    })

  /** w-word shingles of a token-array column (Column form of shinglesSql). */
  def shinglesExpr(colName: String, w: Int = 3): Column =
    expr(letSql(colName, "tv")(tv => shinglesSql(tv, w)))

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set (the reference's checksum idiom, `utils/filesystem.py:106-114`,
    * lifted to content-defined identity). */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** PII patterns in the Java∩RE2 regex subset (char classes, bounded
    * repeats, \b, non-capturing groups — no backrefs/lookaround), so the
    * DuckDB oracle replays them verbatim. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val Phone10Re: String = "\\b\\d{10}\\b"

  /** PII scrub — the pre-training redaction pass: count each PII class on
    * the RAW text, then redact in a fixed order (emails, then IPv4, then
    * 10-digit phones). Pure codegen'd string expressions; one scan. The
    * redaction chain feeds BOTH red_len and red_sha, so it runs inside a
    * transform lambda (bound once per row) exploded through `inline` —
    * a plain alias would be duplicated per reference by CollapseProject
    * (measured: 6 regexp_replace in the plan instead of 3; PlanSpec pins
    * the 3). */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def esc(p: String) = p.replace("\\", "\\\\")
    val redSql =
      s"""regexp_replace(regexp_replace(regexp_replace($textCol,
         |  '${esc(EmailRe)}', '<EMAIL>'),
         |  '${esc(Ipv4Re)}', '<IP>'),
         |  '${esc(Phone10Re)}', '<PHONE>')""".stripMargin
    df.select(col(idCol),
      size(expr(s"regexp_extract_all($textCol, '${esc(EmailRe)}', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all($textCol, '${esc(Ipv4Re)}', 0)")).as("n_ips"),
      size(expr(s"regexp_extract_all($textCol, '${esc(Phone10Re)}', 0)")).as("n_phones"),
      expr(s"""inline(transform(array($redSql), r ->
              |  named_struct('red_len', length(r), 'red_sha', md5(r))))""".stripMargin))
  }

  /** Sliding token windows — training-sequence chunking: windows of
    * `size` tokens at `stride` steps (the last window may be short; a doc
    * shorter than one window yields exactly one chunk). Emits
    * (id, chunk_idx, n_toks, chunk_sha); the explode fans out AFTER the
    * token array is projected once per row. */
  def chunkWindows(df: DataFrame, idCol: String, toksCol: String,
                   size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size (a stride past the window would skip tokens)")
    // chunk count = 1 + ceil((n - size) / stride): every token lands in
    // some window (a floor here would orphan up to stride-1 tail tokens)
    df.select(col(idCol), col(toksCol).as("__toks"))
      .withColumn("__n", expr("size(__toks)"))
      .withColumn("chunk_idx", explode(expr(
        s"sequence(0, cast((greatest(__n - $size, 0) + $stride - 1) div $stride as int))")))
      .select(col(idCol), col("chunk_idx"),
        // tail length arithmetically (least(size, n - start)) so the
        // slice expression is referenced exactly once (letSql discipline)
        least(lit(size), col("__n") - col("chunk_idx") * stride)
          .cast("int").as("n_toks"),
        md5(concat_ws(" ",
          expr(s"slice(__toks, chunk_idx * $stride + 1, $size)"))).as("chunk_sha"))
  }

  /** Repetition quality signals in the published large-corpus filter style
    * (duplicate-n-gram and top-n-gram character/count fractions): per doc,
    * the fraction of characters covered by REPEATED bigram / 5-gram
    * occurrences (occurrences beyond each gram's first) and the count share
    * of the single most frequent bigram. `t5_repetition_ratio` is the
    * distinct-set summary; these are the multiset signals a quality filter
    * thresholds on.
    *
    * Scale shape: ZERO exchanges — the gram multiset is row-local by
    * definition, so [[graft.functions.RepSignals]] counts it in one local
    * hash pass per row (O(tokens) time/memory inside the row's own task,
    * which holds at any corpus size because the row already lives in one
    * task). The previous explode → count-per-(doc, width, gram) →
    * per-doc-fold plan shuffled the whole gram multiset (~7× the corpus
    * bytes at w ∈ {2, 5}) to compute a per-row quantity; it survives as
    * [[repetitionSignalsExchange]] — the oracle-shaped twin —
    * and RepetitionSignalsSpec pins bit equality of the two. All ppms are
    * PURE INTEGER arithmetic (long division == floor for non-negatives ==
    * DuckDB `//`) — no double ever reaches the output (the r10 driver
    * hash-fail surface, VERDICT #2).
    *
    * Flag thresholds follow the published filter family (top/duplicate
    * n-gram char fraction): dup-bigram chars > 20% or dup-5-gram chars
    * > 10% of the document. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        nCharsCol: String): DataFrame =
    df.select(col(idCol),
        greatest(col(nCharsCol).cast("long"), lit(1L)).as("__nc"),
        tokens(col(textCol)).as("__tv"))
      .withColumn("__r", graft.functions.RepSignals.repSignals(col("__tv")))
      .select(col(idCol), size(col("__tv")).cast("long").as("n_tokens"),
        col("__r.n2").as("n_bigrams"),
        expr("__r.dup2c * 1000000L div __nc").as("dup2_char_ppm"),
        expr("__r.dup5c * 1000000L div __nc").as("dup5_char_ppm"),
        expr("__r.top2 * 1000000L div greatest(__r.n2, 1L)").as("top2_count_ppm"),
        // frac > 0.20  ⇔  5·dup2c > nc; frac > 0.10 ⇔ 10·dup5c > nc
        (col("__r.dup2c") * lit(5L) > col("__nc") ||
          col("__r.dup5c") * lit(10L) > col("__nc")).as("rep_flagged"))

  /** The exchange form of [[repetitionSignals]] — explode every gram
    * occurrence, count per (doc, width, gram), per-doc fold, join back so
    * gram-less docs survive. Kept as the oracle-shaped twin of the
    * [[graft.functions.RepSignals]] kernel (the DuckDB oracle replays
    * this plan); the spec pins equality on real corpora. */
  def repetitionSignalsExchange(df: DataFrame, idCol: String, textCol: String,
                                nCharsCol: String): DataFrame = {
    val base = df.select(col(idCol), greatest(col(nCharsCol).cast("long"), lit(1L)).as("__nc"),
      tokens(col(textCol)).as("__tv"))
    def gramRows(w: Int) =
      base.select(col(idCol), lit(w).as("__w"),
        explode(expr(allGramsSql("__tv", w))).as("__g"))
    val counted = gramRows(2).unionByName(gramRows(5))
      .groupBy(col(idCol), col("__w"), col("__g"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__glen", length(col("__g")).cast("long"))
    val perDoc = counted.groupBy(col(idCol)).agg(
      sum(when(col("__w") === 2, col("__cnt"))).as("__n2"),
      max(when(col("__w") === 2, col("__cnt"))).as("__top2"),
      sum(when(col("__w") === 2 && col("__cnt") > 1,
        (col("__cnt") - 1) * col("__glen"))).as("__dup2c"),
      sum(when(col("__w") === 5 && col("__cnt") > 1,
        (col("__cnt") - 1) * col("__glen"))).as("__dup5c"))
    val dup2c = coalesce(col("__dup2c"), lit(0L))
    val dup5c = coalesce(col("__dup5c"), lit(0L))
    base.select(col(idCol), col("__nc"), size(col("__tv")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__n2"), lit(0L)).as("n_bigrams"),
        expr("coalesce(__dup2c, 0L) * 1000000L div __nc").as("dup2_char_ppm"),
        expr("coalesce(__dup5c, 0L) * 1000000L div __nc").as("dup5_char_ppm"),
        expr("coalesce(__top2, 0L) * 1000000L div greatest(coalesce(__n2, 0L), 1L)")
          .as("top2_count_ppm"),
        (dup2c * lit(5L) > col("__nc") || dup5c * lit(10L) > col("__nc"))
          .as("rep_flagged"))
  }

  /** SQL twin (Spark dialect) of [[graft.functions.HashedLinearScore]] —
    * parity spec + oracle generation; let-bound so the gram array is built
    * once (catalyst-eval-cost invariant). Weight arithmetic is all-integer:
    * slot = md5_60(gram) % buckets, weight = md5_60("w:"+slot) % 2001 − 1000. */
  def hashedLinearSql(toks: String, buckets: Int): String =
    letSql(s"concat($toks, ${allGramsSql(toks, 2)})", "gs")(gs =>
      s"named_struct('n_grams', cast(size($gs) as bigint), 'score_sum', " +
        s"aggregate($gs, cast(0 as bigint), (acc, g) -> acc + " +
        s"((${md5LongSql(s"concat('w:', cast(${md5LongSql("g")} % $buckets as string))")} % 2001) - 1000)))")

  /** Model-based quality filter — the fastText/DCLM classifier-filter
    * inference shape over hashed unigram+bigram features (native kernel:
    * [[graft.functions.HashedLinearScore]], weight table executor-resident).
    * `thresholdMilli` is the keep cut on the MEAN slot weight in
    * milli-units (integer weights span ±1000 ≙ a ±1.0 trained weight):
    * keep ⟺ score_sum > thresholdMilli·n_grams — pure integer, so the
    * verdict is engine-exact. Zero shuffle: one codegen'd projection per
    * document. */
  def hashedLinearQuality(df: DataFrame, idCol: String, textCol: String,
                          buckets: Int, thresholdMilli: Long): DataFrame =
    df.select(col(idCol),
        graft.functions.HashedLinearScore.hashedLinearScore(
          tokens(col(textCol)), buckets).as("__hl"))
      .select(col(idCol),
        col("__hl").getField("n_grams").as("n_grams"),
        col("__hl").getField("score_sum").as("score_sum"),
        (col("__hl").getField("score_sum") >
          col("__hl").getField("n_grams") * lit(thresholdMilli)).as("keep"))

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** Integer-exact Jaccard ppm (⌊i·10⁶/u⌋ over the set sizes) — the
    * OUTPUT form of the similarity: pure long floor-division, identical to
    * DuckDB `i*1000000 // u` on any engine version (the no-raw-double-
    * output invariant). [[jaccard]] stays the THRESHOLD form (per-row
    * double compare, engine-stable). */
  def jaccardPpm(aCol: String, bCol: String): Column = expr(
    s"cast(size(array_intersect($aCol, $bCol)) as bigint) * 1000000L div " +
      s"cast(size(array_distinct(concat($aCol, $bCol))) as bigint)")

  /** num·10⁶ div den over arbitrary integer Columns — the generic
    * fixed-point ratio (long integral division ≡ DuckDB `//` for
    * non-negative operands). Column form of the SQL `div` operator, which
    * has no public `functions._` equivalent. */
  def divPpm(num: Column, den: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graft.Bridge.expression(
          num.cast("long") * lit(1000000L)),
        org.apache.spark.sql.graft.Bridge.expression(den.cast("long"))))

  /** Spark-dialect SQL: crude-but-real HTML→text extraction — script and
    * style blocks removed WITH their content, then every remaining tag,
    * each replaced by a space; the three core entities decoded (&amp;
    * LAST, so a double-escaped `&amp;lt;` correctly yields the literal
    * text `&lt;`); whitespace collapsed and trimmed. Patterns stay in the
    * Java∩RE2 intersection (the t9 rule) so the DuckDB twin replays them
    * with 'g'-flag regexp_replace. Each stage is referenced exactly once,
    * so the chain needs no let-binding. */
  def htmlToTextSql(h: String): String = {
    val noScript = s"regexp_replace($h, '(?s)<script.*?</script>', ' ')"
    val noStyle  = s"regexp_replace($noScript, '(?s)<style.*?</style>', ' ')"
    val noTags   = s"regexp_replace($noStyle, '<[^>]*>', ' ')"
    val decoded  =
      s"replace(replace(replace($noTags, '&lt;', '<'), '&gt;', '>'), '&amp;', '&')"
    s"trim(regexp_replace($decoded, ' +', ' '))"
  }

  /** C4 cleaning battery (Raffel et al. 2020 §2.2) over an array-of-lines
    * SQL expression: a line is retained iff it ends in terminal
    * punctuation AND has ≥ `minWords` words AND does not contain the word
    * "javascript"; page-level flags drop any page containing "lorem
    * ipsum" or a curly brace, or with fewer than `minKept` surviving
    * lines. One let-bound projection per document (zero shuffle, stays in
    * whole-stage codegen); the cleaned text is proven by md5 so BYTES are
    * compared cross-engine, never re-rendered strings. The corpus-level
    * half of C4 (three-sentence span dedup) is the d16 substring family.
    */
  def c4Rules(df: DataFrame, idCol: String, linesSql: String,
              minWords: Int = 5, minKept: Int = 3): DataFrame = {
    val st = org.apache.spark.sql.functions.expr(letSql(linesSql, "ls") { ls =>
      letSql(
        s"""filter($ls, l -> right(l, 1) = '.'
           |  and size(split(l, ' ')) >= $minWords
           |  and not contains(l, 'javascript'))""".stripMargin, "ks") { ks =>
        s"""named_struct(
           |  'n_lines', cast(size($ls) as bigint),
           |  'n_kept', cast(size($ks) as bigint),
           |  'has_lorem', size(filter($ls, l -> contains(l, 'lorem ipsum'))) > 0,
           |  'has_brace', size(filter($ls, l -> contains(l, '{'))) > 0,
           |  'clean_md5', md5(array_join($ks, ' ')))""".stripMargin
      }
    })
    df.select(col(idCol), st.as("__c4"))
      .select(col(idCol),
        col("__c4").getField("n_lines").as("n_lines"),
        col("__c4").getField("n_kept").as("n_kept"),
        col("__c4").getField("has_lorem").as("has_lorem"),
        col("__c4").getField("has_brace").as("has_brace"),
        (col("__c4").getField("n_kept") >= minKept &&
          !col("__c4").getField("has_lorem") &&
          !col("__c4").getField("has_brace")).as("page_keep"),
        col("__c4").getField("clean_md5").as("clean_md5"))
  }
}
