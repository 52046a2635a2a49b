package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Data-driven BPE encode: greedy lowest-rank adjacent-pair merging over a
  * string whose tokens are single BMP codepoints, with the learned merge
  * table as DATA (one broadcast open-addressed map reference), never as
  * unrolled expression structure — the LshBuckets rule: any kernel whose
  * multiplicity scales with a corpus-derived parameter (here the merge
  * count) must be a single fused loop with the parameter as data, or the
  * generated method blows the JIT bytecode budget (PLANS r11 s7; the r14
  * t18 encode was a replace()-chain unrolled once per merge and capped at
  * 26 merges for exactly this reason).
  *
  * Greedy ≡ sequential rank-order application (the property every BPE
  * implementation leans on, e.g. HF tokenizers): merging the lowest-ranked
  * present pair can only create adjacencies involving its fresh symbol,
  * and every pair containing that symbol was learned later, so ranks are
  * consumed in increasing order and each is exhausted left-to-right —
  * exactly `Bpe.applySequential`, which the DuckDB oracle replays as a
  * list_reduce of replace() over the rank-ordered merge list. Per-row cost
  * is O(len · distinct-pairs-applied), independent of the table size.
  *
  * Each merge is encoded as a 3-char code `pair ++ sym` (the same shape the
  * oracle folds over), in global rank order.
  */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends UnaryExpression {
  require(merges.forall(_.length == 3), "each merge code must be pair+sym (3 chars)")
  require(merges.length < 0x8000, "merge rank must pack into 15 bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  @transient private lazy val table: BpeTable = BpeTable.build(merges)

  override def nullSafeEval(v: Any): Any =
    BpeEncode.compute(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncode.compute($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Open-addressed (pair -> rank, sym) map. Keys pack two BMP chars into one
  * non-negative Int (never 0: no token is NUL); values pack (rank << 16) |
  * sym. Linear probing over a power-of-two table at <= 50% load. */
final class BpeTable(val keys: Array[Int], val vals: Array[Int]) extends Serializable {
  /** @return (rank << 16) | sym, or -1 when the pair is not a merge. */
  def lookup(k: Int): Int = {
    val mask = keys.length - 1
    var idx = (k * 0x9E3779B1) >>> 1 & mask
    while (true) {
      val kk = keys(idx)
      if (kk == k) return vals(idx)
      if (kk == 0) return -1
      idx = (idx + 1) & mask
    }
    -1
  }
}

object BpeTable {
  def build(merges: Seq[String]): BpeTable = {
    var cap = 8
    while (cap < merges.length * 2 + 2) cap <<= 1
    val keys = new Array[Int](cap)
    val vals = new Array[Int](cap)
    val mask = cap - 1
    var rank = 0
    merges.foreach { m =>
      val k = (m.charAt(0) << 16) | m.charAt(1)
      var idx = (k * 0x9E3779B1) >>> 1 & mask
      while (keys(idx) != 0 && keys(idx) != k) idx = (idx + 1) & mask
      if (keys(idx) == 0) { // first occurrence of a pair wins (lowest rank)
        keys(idx) = k
        vals(idx) = (rank << 16) | m.charAt(2)
      }
      rank += 1
    }
    new BpeTable(keys, vals)
  }
}

object BpeEncode {
  /** Greedy lowest-rank merge loop; called from both interpreted eval and
    * the generated code. */
  def compute(s: UTF8String, t: BpeTable): UTF8String = {
    val w = s.toString
    val buf = w.toCharArray
    var n = buf.length
    var more = n >= 2
    while (more) {
      var best = Int.MaxValue
      var bp = 0
      var i = 0
      while (i < n - 1) {
        val v = t.lookup((buf(i) << 16) | buf(i + 1))
        if (v >= 0 && (v >>> 16) < best) { best = v >>> 16; bp = (buf(i) << 16) | buf(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) more = false
      else {
        val sym = (t.lookup(bp) & 0xFFFF).toChar
        var wr = 0
        i = 0
        while (i < n) {
          if (i < n - 1 && ((buf(i) << 16) | buf(i + 1)) == bp) {
            buf(wr) = sym; wr += 1; i += 2
          } else { buf(wr) = buf(i); wr += 1; i += 1 }
        }
        n = wr
        more = n >= 2
      }
    }
    UTF8String.fromString(new String(buf, 0, n))
  }

  /** Column form: `merges` in global rank order, each as 3-char pair+sym. */
  def encode(text: Column, merges: Seq[graft.operators.Bpe.Merge]): Column =
    Bridge.column(BpeEncode(Bridge.expression(text), merges.map(m => m.pair + m.sym)))
}
