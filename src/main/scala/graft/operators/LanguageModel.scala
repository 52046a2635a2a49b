package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring — the perplexity-proxy filter of
  * web-corpus pipelines (score every document under a corpus-level n-gram
  * LM, threshold the tail), re-expressed exactly.
  *
  * Standard LM scores sum log-probabilities; ln() is libm-bound and
  * engines disagree in the last ulp (the repo float-parity invariant).
  * The score here is the average SCALED Laplace-smoothed conditional
  * probability — avg over a doc's bigrams of
  * floor((c(w1,w2)+1)·scale / (c(w1)+V)), V the history vocabulary —
  * computed entirely in integers: bit-identical on any engine, monotone
  * in the same signal (corpus-typical word sequences score high,
  * shuffled/rare ones low), thresholded the same way. The smoothing term
  * matters beyond unseen-bigram math: UNSMOOTHED MLE awards probability
  * 1.0 to any hapax history (c12 = c1 = 1), making gibberish of unique
  * tokens score perfectly; +V in the denominator collapses exactly that
  * artifact.
  *
  * Scale shape: one exploded-bigram pass; two map-side-combined count
  * aggregations form the "LM" (c12 keyed on the bigram, c1 on the history
  * token — both grow with the VOCABULARY, not the corpus); per-doc
  * bigrams collapse to (doc, bigram, k) before scoring so repetitive
  * documents don't multiply join fan-in; and the doc-vs-LM join is
  * SALTED on a doc-derived salt — token frequencies are Zipfian, so the
  * hot bigrams ("of the") would otherwise each hot-spot one reducer, and
  * this is the agg-fed join shape AQE's skew splitting cannot touch.
  */
object LanguageModel {

  /** @param scale fixed-point scale for the conditional probability
    * @return (idCol, n_bigrams, lm_score) for every doc with >= 2 tokens:
    *         lm_score = floor(sum(k·floor((c12+1)·scale/(c1+V))) / n_bigrams). */
  def bigramLmScore(docs: DataFrame, idCol: String, toksCol: String,
                    scale: Long = 1000000L, nSalts: Int = 8): DataFrame = {
    // slice + arrays_zip, not transform(sequence, λ): this runs per token
    // of every document, and higher-order functions are CodegenFallback
    // (a boxed lambda per element) while Slice/ArraysZip are codegen'd —
    // the repo hot-kernel invariant. <2-token docs have no bigrams
    // and are filtered rather than special-cased in the expression.
    val t = col(toksCol)
    val bi = docs.filter(size(t) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1))).as("__bg"))
      .select(col(idCol), col("__bg").getField("0").as("__w1"),
        col("__bg").getField("1").as("__w2"))
    val c12 = bi.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c12"))
    val c1 = bi.groupBy("__w1").agg(count(lit(1)).as("__c1"))
    // history vocabulary size: one scalar row, broadcast into the LM build
    val v = bi.agg(countDistinct(col("__w1")).as("__v"))
    // the LM table: vocabulary-sized, one fixed-point probability per
    // bigram. The c12⋈c1 join keys on the history token — its skew is
    // bounded by DISTINCT successors per token (vocab-ish), not
    // occurrences, so it stays un-salted.
    // NUL-separated key: a space-joined key is ambiguous the moment tokens
    // themselves contain spaces (word-shingle inputs) — ("a b","c") and
    // ("a","b c") would collide and double-count
    val bgKey = concat_ws("\u0000", col("__w1"), col("__w2"))
    val lm = c12.join(c1, "__w1").crossJoin(broadcast(v))
      .withColumn("__p", expr(s"((__c12 + 1L) * ${scale}L) div (__c1 + __v)"))
      .withColumn("__bg", bgKey)
      .select("__bg", "__p")
    // per-doc bigram multiset, then the salted LM join (occurrence-skewed)
    val perDoc = bi.groupBy(col(idCol), col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__k"))
      .withColumn("__bg", bgKey)
      .select(col(idCol), col("__bg"), col("__k"))
    // salt from hash(id): type-agnostic and deterministic (a salt never
    // changes results, only the shuffle spread)
    Relational.saltedJoin(perDoc, lm, "__bg", hash(col(idCol)), nSalts)
      .groupBy(idCol)
      .agg(sum(col("__k") * col("__p")).as("__s"), sum("__k").as("n_bigrams"))
      .select(col(idCol), col("n_bigrams"),
        expr("__s div n_bigrams").as("lm_score"))
  }
}
