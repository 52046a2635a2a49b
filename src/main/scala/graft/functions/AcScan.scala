package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary-scale multi-pattern scan: the number of DISTINCT dictionary
  * terms occurring as a substring of the input, via one Aho–Corasick
  * automaton (Aho & Corasick 1975) with the term table as DATA — the
  * LshBuckets/BpeEncode rule applied to keyword matching: a blocklist is a
  * corpus/config-derived parameter, so it must never become unrolled
  * expression structure (f21's rlike shape is the right shape for a
  * handful of keywords; a real content-filter list is 10⁴–10⁵ terms, where
  * the alternation blows both the regex engine and, if unrolled into
  * per-term expressions, the JIT bytecode budget — PLANS r11 s7). Per-row
  * cost is O(len + matches), INDEPENDENT of the dictionary size (the
  * distinct-term visited set is a thread-local generation-stamped array,
  * never a per-row allocation); the automaton is built once per plan
  * instance on the driver and ships as a broadcast reference object.
  *
  * Match semantics are plain substring containment (no word boundaries) —
  * exactly DuckDB `contains(text, term)`, which the oracle replays as a
  * dict × docs containment count. Matching runs over UTF-16 code units;
  * for valid strings a code-unit match ≡ a codepoint match ≡ a UTF-8
  * byte-level match (UTF-8's continuation-byte structure forbids
  * mid-codepoint alignment), so the two engines agree beyond ASCII too.
  *
  * Duplicate terms are collapsed (first occurrence keeps the id), matching
  * the oracle's DISTINCT dictionary; empty terms are rejected.
  */
case class AcDistinctHits(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.forall(_.nonEmpty), "dictionary terms must be non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ac_distinct_hits requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  @transient private lazy val auto: AcAutomaton = AcAutomaton.build(terms)

  override def nullSafeEval(v: Any): Any =
    AcDistinctHits.compute(v.asInstanceOf[UTF8String], auto)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("acAutomaton", auto, classOf[AcAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.AcDistinctHits.compute($c, $a)")
  }

  override protected def withNewChildInternal(newChild: Expression): AcDistinctHits =
    copy(child = newChild)
}

/** Flattened Aho–Corasick automaton. Node 0 is the root. Edges of node i
  * live at `[edgeStart(i), edgeStart(i+1))`, sorted by char for binary
  * search. `dict(v)` is the nearest terminal node on v's suffix chain
  * (including v itself), 0 when there is none — the output-link chain, so
  * reporting walks only terminal states. */
final class AcAutomaton(
    val edgeChar: Array[Char], val edgeTo: Array[Int], val edgeStart: Array[Int],
    val fail: Array[Int], val dict: Array[Int], val termId: Array[Int],
    val nTerms: Int) extends Serializable {

  /** Child of `state` on `c`, or -1. */
  def next(state: Int, c: Char): Int = {
    var lo = edgeStart(state)
    var hi = edgeStart(state + 1) - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mc = edgeChar(mid)
      if (mc == c) return edgeTo(mid)
      else if (mc < c) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Per-thread visited-term scratch: a generation-stamped int array, so
    * the per-row cost carries no nTerms-proportional allocation or zeroing
    * (the instance may be shared across tasks in one executor JVM —
    * thread-local keeps rows isolated without locking). */
  @transient private lazy val scratch: ThreadLocal[AcScratch] =
    ThreadLocal.withInitial(() => new AcScratch(nTerms))
  def rowScratch(): AcScratch = scratch.get()
}

/** Generation-stamped visited set: `gen(t) == stamp` means term t was seen
  * in the current row. Advancing the stamp invalidates all marks in O(1);
  * the array is re-zeroed only on the (once per 2³¹ rows) stamp wrap. */
final class AcScratch(n: Int) {
  val gen: Array[Int] = new Array[Int](n)
  private var stamp: Int = 0
  def nextStamp(): Int = {
    if (stamp == Int.MaxValue) { java.util.Arrays.fill(gen, 0); stamp = 0 }
    stamp += 1
    stamp
  }
}

object AcAutomaton {
  def build(terms: Seq[String]): AcAutomaton = {
    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val termOf = mutable.ArrayBuffer(-1)
    var nTerms = 0
    terms.foreach { t =>
      var node = 0
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        node = children(node).getOrElseUpdate(c, {
          children += mutable.TreeMap.empty[Char, Int]
          termOf += -1
          children.length - 1
        })
        i += 1
      }
      if (termOf(node) < 0) { termOf(node) = nTerms; nTerms += 1 } // dup term: first id wins
    }
    val n = children.length
    val edgeStart = new Array[Int](n + 1)
    var tot = 0
    var i = 0
    while (i < n) { edgeStart(i) = tot; tot += children(i).size; i += 1 }
    edgeStart(n) = tot
    val edgeChar = new Array[Char](tot)
    val edgeTo = new Array[Int](tot)
    i = 0
    while (i < n) { // TreeMap iterates sorted — binary-search ready
      var j = edgeStart(i)
      children(i).foreach { case (c, to) => edgeChar(j) = c; edgeTo(j) = to; j += 1 }
      i += 1
    }
    // fail/dict are filled through the instance so the BFS shares the same
    // binary-search `next` the matcher uses (no duplicated lookup code)
    val a = new AcAutomaton(edgeChar, edgeTo, edgeStart,
      new Array[Int](n), new Array[Int](n), termOf.toArray, nTerms)
    val queue = new java.util.ArrayDeque[Integer]()
    children(0).foreach { case (_, v) => a.fail(v) = 0; queue.add(v) }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      a.dict(u) = if (a.termId(u) >= 0) u else a.dict(a.fail(u))
      children(u).foreach { case (c, v) =>
        var f = a.fail(u)
        var nx = -1
        while ({ nx = a.next(f, c); nx < 0 && f != 0 }) f = a.fail(f)
        a.fail(v) = if (nx >= 0 && nx != v) nx else 0
        queue.add(v)
      }
    }
    a
  }
}

object AcDistinctHits {
  /** Distinct-term containment count; called from both interpreted eval and
    * the generated code. The scan early-exits once every term has been
    * seen. */
  def compute(s: UTF8String, a: AcAutomaton): Int = {
    if (a.nTerms == 0) return 0
    val str = s.toString
    val sc = a.rowScratch()
    val stamp = sc.nextStamp()
    val gen = sc.gen
    var cnt = 0
    var st = 0
    var i = 0
    val len = str.length
    while (i < len && cnt < a.nTerms) {
      val c = str.charAt(i)
      var nx = a.next(st, c)
      while (nx < 0 && st != 0) { st = a.fail(st); nx = a.next(st, c) }
      st = if (nx >= 0) nx else 0
      var d = a.dict(st)
      while (d > 0) {
        val t = a.termId(d)
        if (gen(t) != stamp) { gen(t) = stamp; cnt += 1 }
        d = a.dict(a.fail(d))
      }
      i += 1
    }
    cnt
  }

  /** Column form: count of distinct `terms` contained in `text`. */
  def distinctHits(text: Column, terms: Seq[String]): Column =
    Bridge.column(AcDistinctHits(Bridge.expression(text), terms))
}
