package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.AcDistinctHits
import graft.operators.TextOps

/** Scale probe for the Aho–Corasick blocklist kernel (t20): wall time vs
  * DICTIONARY SIZE for (a) the automaton kernel and (b) the rlike
  * regex-alternation shape it replaces (f21's idiom). The kernel's per-row
  * cost is O(len + matches) — independent of the term count — so its
  * exponent in K must be ~0; java.util.regex retries every alternative at
  * every position, so the alternation grows ~linearly with K.
  *
  * Both sides time the same FLAG question (any dictionary term contained?)
  * so the comparison is like-for-like. Dictionaries are the top-K 2/3/4-gram
  * phrases of the corpus (pooled, ranked (cnt DESC, phrase ASC)).
  *
  * Usage: runMain graft.tools.AcProbe <sfDir>
  */
object AcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")

    val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    val nDocs = docs.count()

    val toks = docs.select(TextOps.tokens(col("text")).as("toks"))
    val pool = toks.select(explode(concat(
        expr(TextOps.allGramsSql("toks", 2)),
        expr(TextOps.allGramsSql("toks", 3)),
        expr(TextOps.allGramsSql("toks", 4)))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("g")).limit(4096)
      .collect().map(_.getAs[String]("g")).toSeq
    println(s"""{"dir": "$d", "docs": $nDocs, "pool": ${pool.size}}""")

    def timed(f: => Long): (Long, Double) = {
      System.gc()
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // The DISTINCT-COUNT question (t20's semantics) — every term must be
    // tested, so it exposes the per-term cost honestly. The f21-shape
    // alternative is one when(contains) per term: the parameter-unrolled
    // expression structure the LshBuckets rule bans.
    def kernel(terms: Seq[String]): Long =
      docs.select(sum(AcDistinctHits.distinctHits(col("text"), terms)
        .cast("long"))).collect()(0).getLong(0)
    // NB: the natural `.reduce(_ + _)` left fold dies with a
    // StackOverflowError in ColumnNode→Expression conversion already at
    // K=512 (linear-depth AST) — the unrolled shape cannot even be BUILT
    // at dictionary scale without a balanced tree.
    def balanced(cs: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
      if (cs.size == 1) cs.head
      else { val (a, b) = cs.splitAt(cs.size / 2); balanced(a) + balanced(b) }
    def fold(terms: Seq[String]): Long =
      docs.select(sum(balanced(terms.map(t =>
        when(contains(col("text"), lit(t)), 1L).otherwise(0L)))))
        .collect()(0).getLong(0)
    // The FLAG question (any term present?) — rlike's alternation may
    // short-circuit at the first match, so it under-reports term scaling;
    // recorded for completeness.
    def rx(terms: Seq[String]): Long =
      docs.filter(col("text").rlike(
        terms.map(java.util.regex.Pattern.quote).mkString("(", "|", ")"))).count()
    def kflag(terms: Seq[String]): Long =
      docs.filter(AcDistinctHits.distinctHits(col("text"), terms) >= 1).count()

    val ks = Seq(64, 512, 4096).filter(_ <= pool.size)
    kernel(pool.take(ks.head)); fold(pool.take(ks.head)) // warm
    rx(pool.take(ks.head)); kflag(pool.take(ks.head))
    val rows = ks.map { k =>
      val t = pool.take(k)
      val (nk, sk) = timed(kernel(t))
      val (nf, sf) = timed(fold(t))
      require(nk == nf, s"kernel/fold count disagreement at K=$k: $nk vs $nf")
      val (nkf, skf) = timed(kflag(t))
      val (nr, sr) = timed(rx(t))
      require(nkf == nr, s"kernel/regex flag disagreement at K=$k: $nkf vs $nr")
      println(f"""{"k": $k, "hits": $nk, "kernel_secs": $sk%.3f, "fold_secs": $sf%.3f, "flag_kernel_secs": $skf%.3f, "flag_rlike_secs": $sr%.3f}""")
      (k, sk, sf)
    }
    val (k1, s1, _) = rows.head
    val (k2, s2, _) = rows.last
    if (k2 > k1) // a pool under 512 phrases leaves one K — no exponent
      println(f"""{"kernel_exponent": ${math.log(s2 / s1) / math.log(k2.toDouble / k1)}%.2f, "fold_exponent": ${math.log(rows.last._3 / rows.head._3) / math.log(k2.toDouble / k1)}%.2f, "fold_over_kernel_at_max": ${rows.last._3 / rows.last._2}%.1f}""")
    spark.stop()
  }
}
