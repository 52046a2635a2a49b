package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd hashed-n-gram linear scorer — the fastText / DCLM
  * model-based quality-filter INFERENCE shape (Joulin et al. 2016,
  * "Bag of Tricks for Efficient Text Classification"): word unigram +
  * bigram features hashed into `buckets` weight slots, document score =
  * sum of the slot weights, decision = mean-weight threshold. One tight
  * loop per row over the token array; the weight table is materialized
  * once per `buckets` value and resident per executor (the broadcast-model
  * analogue — fastText inference ships the model to every worker exactly
  * like this).
  *
  * Weights here are a DETERMINISTIC STAND-IN for trained parameters:
  * slot b carries ((md5_60("w:" + b) mod 2001) − 1000) ∈ [−1000, 1000],
  * derived from the slot INDEX alone (rule-derived cache key). Swapping in
  * a trained model replaces only the table contents; hashing, pooling, and
  * the threshold shape are the production pipeline verbatim. Everything is
  * integer, so any engine reproduces the score exactly (the
  * no-raw-double-output invariant); the HOF/SQL twin lives in
  * `TextOps.hashedLinearSql` and MUST stay bit-identical
  * (HashedLinearSpec pins it).
  *
  * Output: struct(n_grams BIGINT, score_sum BIGINT).
  */
case class HashedLinearScore(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_score requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("score_sum", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(v: Any): Any =
    HashedLinearScore.compute(v.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedLinearScore.compute($c, $buckets);")
  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}

object HashedLinearScore {
  // weight table per bucket count — keyed by RULE-derived data only
  // (the repo cache invariant), tiny (8 B per slot), executor-resident
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  /** The deterministic weight table for `buckets` slots (exposed for the
    * spec's hand-computed pins). */
  def weights(buckets: Int): Array[Long] =
    tables.computeIfAbsent(buckets, (b: Int) => {
      val t = new Array[Long](b)
      var i = 0
      while (i < b) {
        t(i) = MinhashBands.md5Long60(
          ("w:" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8)) % 2001L - 1000L
        i += 1
      }
      t
    })

  /** n_grams + score_sum over unigrams and bigrams of `toks`. */
  def compute(toks: ArrayData, buckets: Int): GenericInternalRow = {
    val w = weights(buckets)
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      sum += w((MinhashBands.md5Long60(t.getBytes) % buckets).toInt)
      if (i + 1 < n) {
        val bg = t.toString + " " + toks.getUTF8String(i + 1).toString
        sum += w((MinhashBands.md5Long60(
          bg.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % buckets).toInt)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n + math.max(n - 1L, 0L), sum))
  }

  /** Column wrapper. */
  def hashedLinearScore(toks: Column, buckets: Int): Column =
    Bridge.column(HashedLinearScore(Bridge.expression(toks), buckets))
}
