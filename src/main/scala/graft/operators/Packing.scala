package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-token-budget
  * sequences (the step between corpus filtering and tokenized-shard
  * writing in an LLM data pipeline).
  *
  * Contiguous-fill semantics: within a shard, documents are laid out in a
  * deterministic order and a document belongs to the sequence in which it
  * STARTS (seq_id = floor(tokens_before_doc / budget)) — the streaming
  * concat-then-chunk layout real pipelines use, not NP-hard bin packing.
  *
  * Scale shape: the cumulative sum windows over (shard, order) — shards
  * partition the work, so no global-order single-partition window exists
  * anywhere. One shuffle on the shard key, parallel across shards.
  */
object Packing {

  /** @param orderCol deterministic within-shard layout order (unique).
    * @return input + (tokens_before, seq_id). Documents longer than the
    *         budget still start a sequence (and overflow into the next
    *         budget boundary, as concat-then-chunk does). */
  def contiguousPack(df: DataFrame, shardCol: String, orderCol: String,
                     nTokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("tokens_before", sum(col(nTokCol)).over(w) - col(nTokCol))
      .withColumn("seq_id", floor(col("tokens_before") / budget))
  }

  /** Per-sequence fill statistics: how many docs landed in each sequence
    * and how full it is (sequences can exceed `budget` by at most one
    * boundary-spanning document's tail). */
  def packStats(packed: DataFrame, shardCol: String, nTokCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(nTokCol)).as("seq_tokens"))
}
