package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge induction — the tokenizer-vocabulary step of
  * an LLM data pipeline (Sennrich et al. 2016), made exactly replayable:
  *
  *  - symbols start as single characters and every merge is assigned a
  *    fresh single RESERVED character ('A' + round over a lowercase-only
  *    corpus), so a symbol sequence is always a plain string — pair
  *    enumeration is substring(s, i, 2) and a merge is one replace();
  *  - pair counts enumerate POSITIONS (overlapping occurrences count,
  *    the standard zip-adjacent convention), weighted by word frequency;
  *  - the merge applies left-to-right non-overlapping — exactly what
  *    both Spark's and DuckDB's replace() implement;
  *  - the argmax is (count DESC, pair ASC) — a total order.
  *
  * Scale shape: the loop runs over the DISTINCT-WORD vocabulary (one
  * corpus aggregation, localCheckpoint'd once, freed on exit under the
  * r10 hygiene rule), so each round is an explode+groupBy over vocab
  * rows, never over the corpus; the per-round driver scalar is the
  * single argmax row (the sanctioned kcore-style collect). Rounds are
  * bounded by the caller.
  */
object Bpe {

  /** Run `rounds` BPE merges over (wordCol, freqCol) — words must be
    * lowercase a-z only (the reserved merge alphabet is 'A'-'Z').
    * @return (round, pair, cnt, sym): merge r replaced `pair` (count
    *         `cnt` at selection time) with the single character `sym` */
  def merges(vocab: DataFrame, wordCol: String, freqCol: String,
             rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 26, s"rounds must be 1..26, got $rounds")
    val spark = vocab.sparkSession
    val protect = Bridge.checkpointIds(vocab)
    var cur = vocab.select(col(wordCol).as("s"), col(freqCol).cast("long").as("f"))
      .localCheckpoint()
    val out = Seq.newBuilder[Row]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val best = cur.filter(length(col("s")) >= 2)
        .select(col("f"),
          explode(expr("transform(sequence(1, length(s) - 1), i -> substring(s, i, 2))"))
            .as("p"))
        .groupBy("p").agg(sum("f").as("cnt"))
        .orderBy(desc("cnt"), asc("p")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getAs[String]("p")
        val cnt = best(0).getAs[Long]("cnt")
        val sym = ('A' + r).toChar.toString
        out += Row((r + 1).toLong, pair, cnt, sym)
        val next = cur.select(expr(s"replace(s, '$pair', '$sym')").as("s"), col("f"))
          .localCheckpoint()
        Bridge.freeCheckpointExcept(cur, protect)
        cur = next
        r += 1
      }
    }
    Bridge.freeCheckpointExcept(cur, protect)
    spark.createDataFrame(spark.sparkContext.parallelize(out.result(), 1),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("pair", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false),
        StructField("sym", StringType, nullable = false))))
  }
}
