package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.DetHash

/** Native codegen'd MinHash pipeline: token array → w-shingles → 60-bit md5
  * hashes → k-signature affine MinHash → b band hashes, in ONE JVM call per
  * row.
  *
  * Bit-identical to the HOF form it replaces (`TextOps.minhashBandsExpr`,
  * which still generates the DuckDB oracle SQL): same md5-first-15-nibbles
  * hash, same (a*h%P+b)%P family from [[DetHash]], same first-occurrence
  * shingle order, same '|'-joined band digests. The HOF form is
  * CodegenFallback — a boxed lambda call per element per stage (the
  * catalyst-eval-cost trap); this expression is one tight loop inside
  * WholeStageCodegen.
  */
case class MinhashBands(child: Expression, w: Int, k: Int, bands: Int)
    extends UnaryExpression {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("shingles", ArrayType(StringType)),
    StructField("bands", ArrayType(StringType))))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinhashBands.compute(v.asInstanceOf[ArrayData], w, k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.compute($c, $w, $k, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MinhashBands =
    copy(child = newChild)
}

/** Long-token sibling of [[MinhashBands]] at w = 1: input array<long> (a
  * neighbor-id set, a pre-hashed shingle set), each distinct value hashed
  * as the md5-60 of its decimal-string rendering. BIT-IDENTICAL signatures
  * and band digests to `MinhashBands(transform(xs, x -> cast(x AS
  * string)), 1, k, bands)` — so the DuckDB oracle twin stays the
  * stringified HOF form unchanged — but skips the CodegenFallback
  * ArrayTransform (a boxed lambda per element) and the UTF8String
  * materialization per token (the g6 dominant kernel, VERDICT r13).
  * Shingles ship as the raw longs: long → decimal string is a bijection,
  * so downstream set-Jaccard verification is value-identical. Null
  * elements are out of contract (collect_set-shaped inputs only);
  * MinhashBandsSpec pins the bit parity. */
case class MinhashBandsLong(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(k % bands == 0, s"k=$k must be divisible by bands=$bands")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands_long requires array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("shingles", ArrayType(LongType)),
    StructField("bands", ArrayType(StringType))))
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinhashBands.computeLong(v.asInstanceOf[ArrayData], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.computeLong($c, $k, $bands);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MinhashBandsLong =
    copy(child = newChild)
}

/** Signature-only sibling of [[MinhashBands]]: the k MinHash values as
  * array<long>. Same hash family/seeds — a band hash produced by
  * [[MinhashBands]] is the digest of a contiguous slice of this signature.
  */
case class MinhashSig(child: Expression, w: Int, k: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinhashBands.computeSig(v.asInstanceOf[ArrayData], w, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.computeSig($c, $w, $k);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** Hashed-shingle projection: token array → array<long> of the 60-bit md5
  * hashes of the DISTINCT w-grams in first-occurrence order — bit-identical
  * to the HOF chain `TextOps.tokenHashesSql(TextOps.shinglesSql(toks, w))`
  * it replaces (same concat_ws(' ') gram render, same md5-first-15-nibbles
  * long), which stays as the DuckDB oracle twin. The HOF form is two
  * CodegenFallback ArrayTransforms — a boxed lambda, an md5 HEX-STRING
  * materialization, and a conv() parse per gram (the catalyst-eval-cost
  * trap); this is one tight digest loop per row. Measured at sf0.1: the
  * d19/d20 input projection drops 5.8 s → sub-second.
  *
  * HOF parity corners (MinhashBandsSpec pins them): n < w → EMPTY array
  * (not null), null token array → null, null tokens vanish with their
  * separator inside a gram. */
case class ShingleHashes(child: Expression, w: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    MinhashBands.computeShingleHashes(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinhashBands.computeShingleHashes($c, $w);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object MinhashBands {
  private val P = DetHash.P
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray
  // seed cache per k (tiny): (a[], b[]) from the shared deterministic family
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def seeds(k: Int): (Array[Long], Array[Long]) =
    seedCache.computeIfAbsent(k, (kk: Int) => {
      val s = DetHash.minhashSeeds(kk)
      (s.map(_._1).toArray, s.map(_._2).toArray)
    })

  /** First 15 md5 hex nibbles as a 60-bit long (== md5LongSql). */
  private[functions] def md5Long60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def md5Hex(s: String): UTF8String = {
    val d = md.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** w-shingles with first-occurrence order (array_distinct semantics);
    * null when the document is too short to shingle. Shared by the
    * bands/signature entry points so their bit parity is structural. */
  private def shinglesOf(toks: ArrayData, w: Int): java.util.LinkedHashSet[String] = {
    val n = toks.numElements()
    if (n < w) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= n - w) {
      // concat_ws(' ', ...) semantics: null elements vanish WITH their
      // separator; empty strings are kept
      val sb = new java.lang.StringBuilder()
      var j = 0
      var appended = 0
      while (j < w) {
        val t = toks.getUTF8String(i + j)
        if (t != null) {
          if (appended > 0) sb.append(' ')
          sb.append(t.toString)
          appended += 1
        }
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    if (seen.isEmpty) null else seen
  }

  /** k-value affine MinHash signature over a shingle set. */
  private def sigOf(seen: java.util.LinkedHashSet[String], k: Int): Array[Long] = {
    val (sa, sb2) = seeds(k)
    val sig = Array.fill(k)(Long.MaxValue)
    val it = seen.iterator()
    while (it.hasNext) {
      val sh = it.next()
      val h = md5Long60(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % P
      var q = 0
      while (q < k) {
        val v = (sa(q) * h + sb2(q)) % P
        if (v < sig(q)) sig(q) = v
        q += 1
      }
    }
    sig
  }

  /** Band digests of a k-signature: md5 hex of the '|'-joined contiguous
    * signature slices — shared verbatim by the string- and long-token
    * entry points so their band spaces are structurally identical. */
  private def bandsOf(sig: Array[Long], k: Int, nBands: Int): Array[AnyRef] = {
    val r = k / nBands
    val bandArr = new Array[AnyRef](nBands)
    var bIdx = 0
    while (bIdx < nBands) {
      val sj = new java.lang.StringBuilder()
      var x = 0
      while (x < r) {
        if (x > 0) sj.append('|')
        sj.append(sig(bIdx * r + x))
        x += 1
      }
      bandArr(bIdx) = md5Hex(sj.toString)
      bIdx += 1
    }
    bandArr
  }

  def compute(toks: ArrayData, w: Int, k: Int, nBands: Int): InternalRow = {
    val seen = shinglesOf(toks, w)
    if (seen == null) return null
    val sig = sigOf(seen, k)
    val shingleArr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var s = 0
    while (it.hasNext) {
      shingleArr(s) = UTF8String.fromString(it.next())
      s += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(shingleArr),
      new GenericArrayData(bandsOf(sig, k, nBands))))
  }

  /** Long-token kernel (see [[MinhashBandsLong]]): distinct first-
    * occurrence longs, each hashed as the md5-60 of its DECIMAL-STRING
    * rendering — bit-identical signatures and band digests to
    * `compute(transform(xs, x -> cast(x AS string)), w = 1, …)`, minus the
    * CodegenFallback transform and the per-token UTF8String round-trip.
    * Null elements are out of contract (collect_set-shaped inputs). */
  def computeLong(toks: ArrayData, k: Int, nBands: Int): InternalRow = {
    val n = toks.numElements()
    if (n < 1) return null
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) { seen.add(toks.getLong(i)); i += 1 }
    val (sa, sb2) = seeds(k)
    val sig = Array.fill(k)(Long.MaxValue)
    val shingleArr = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var s = 0
    while (it.hasNext) {
      val v = it.next().longValue()
      shingleArr(s) = Long.box(v)
      s += 1
      val h = md5Long60(java.lang.Long.toString(v)
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)) % P
      var q = 0
      while (q < k) {
        val x = (sa(q) * h + sb2(q)) % P
        if (x < sig(q)) sig(q) = x
        q += 1
      }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(shingleArr),
      new GenericArrayData(bandsOf(sig, k, nBands))))
  }

  /** Column entry point for [[computeLong]]. */
  def minhashBandsLong(toks: Column, k: Int, b: Int): Column =
    Bridge.column(MinhashBandsLong(Bridge.expression(toks), k, b))

  /** Column entry point matching `TextOps.minhashBandsExpr`'s shape. */
  def minhashBands(toks: Column, w: Int, k: Int, b: Int): Column =
    Bridge.column(MinhashBands(Bridge.expression(toks), w, k, b))

  /** k-value MinHash signature (array<long>) — same shingling and hash
    * family as [[compute]], exposed raw for consumers that estimate
    * Jaccard by signature agreement (the streaming near-dup state).
    * Null when the document is too short to shingle. */
  def computeSig(toks: ArrayData, w: Int, k: Int): ArrayData = {
    val seen = shinglesOf(toks, w)
    if (seen == null) return null
    new GenericArrayData(sigOf(seen, k).map(Long.box(_).asInstanceOf[AnyRef]))
  }

  /** Column entry point for [[computeSig]]. */
  def minhashSig(toks: Column, w: Int, k: Int): Column =
    Bridge.column(MinhashSig(Bridge.expression(toks), w, k))

  /** 60-bit hashes of the distinct w-grams, first-occurrence order —
    * the [[ShingleHashes]] kernel. */
  def computeShingleHashes(toks: ArrayData, w: Int): ArrayData = {
    if (toks.numElements() < w)
      return new GenericArrayData(new Array[AnyRef](0))
    val seen = shinglesOf(toks, w)
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = Long.box(md5Long60(
        it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry point for [[computeShingleHashes]]. */
  def shingleHashes(toks: Column, w: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(toks), w))

  /** 60-bit SimHash of a token array: bit b is the sign of the sum of ±1
    * votes from bit b of each token's 60-bit md5 hash. One md5 + one
    * 60-counter pass per token — the wide-signature variant that keeps
    * near-dup SEARCH collisions content-driven (16 bits saturate: identical-
    * signature groups grow with corpus size and pair counts go quadratic). */
  def simhash60(toks: ArrayData): Long = {
    if (toks == null) return 0L // HOF/DuckDB: null array folds to all-zero bits
    val n = toks.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        val h = md5Long60(t.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      } else {
        // null element: (null >> b) & 1 = 1 is null-false on both engines → -1
        var b = 0
        while (b < 60) { votes(b) -= 1; b += 1 }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  def simhash60Col(toks: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(toks)))

  /** 120-bit SimHash as [hi60, lo60]: one md5 per token feeds BOTH halves —
    * hi from hex nibbles 1–15 (== [[simhash60]]'s hash), lo from nibbles
    * 16–30 (both replayable as ('0x'||substr(md5(t), o, 15))::BIGINT). The
    * corpus-scale variant: identical-signature collision groups shrink by
    * another 2^60, and 8×15-bit bands stay pigeonhole-complete to
    * hamming 7 (vs 3 for the 60-bit/4-band search). */
  def simhash120(toks: ArrayData): ArrayData = {
    val votes = new Array[Int](120)
    if (toks != null) {
      val n = toks.numElements()
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        if (t != null) {
          val d = md.get().digest(t.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var hi = 0L
          var j = 0
          while (j < 8) { hi = (hi << 8) | (d(j) & 0xffL); j += 1 }
          hi = hi >>> 4
          var lo = d(7) & 0xfL
          j = 8
          while (j < 15) { lo = (lo << 8) | (d(j) & 0xffL); j += 1 }
          var b = 0
          while (b < 60) {
            if (((hi >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            if (((lo >>> b) & 1L) == 1L) votes(60 + b) += 1 else votes(60 + b) -= 1
            b += 1
          }
        } else {
          // null element: every bit test is null-false on both engines → -1
          var b = 0
          while (b < 120) { votes(b) -= 1; b += 1 }
        }
        i += 1
      }
    }
    var hiSig = 0L
    var loSig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) hiSig |= (1L << b)
      if (votes(60 + b) > 0) loSig |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array[Any](hiSig, loSig))
  }

  def simhash120Col(toks: Column): Column =
    Bridge.column(SimHash120(Bridge.expression(toks)))
}

/** Codegen'd 60-bit SimHash (see [[MinhashBands.simhash60]]). Never null:
  * a null token array folds to signature 0, matching the HOF/DuckDB vote
  * formula (aggregate over a null list yields null sums, and `null > 0`
  * selects the 0 branch for every bit). */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashBands.simhash60(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${c.code}
        long ${ev.value} = graft.functions.MinhashBands.simhash60(
          ${c.isNull} ? null : ${c.value});
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Codegen'd 120-bit SimHash → array(hi60, lo60); never null (a null token
  * array folds to [0, 0], matching the vote formula — see [[SimHash60]]). */
case class SimHash120(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash120 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    MinhashBands.simhash120(child.eval(input).asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.MinhashBands.simhash120(${c.isNull} ? null : ${c.value});
      """)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash120 =
    copy(child = newChild)
}
