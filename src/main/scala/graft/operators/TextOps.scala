package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, deterministic 60-bit hashing, MinHash
  * signatures, LSH band hashes, SimHash, fingerprints.
  *
  * Everything here is a pure column expression over arrays — per-row, no
  * shuffle, stays inside whole-stage codegen via Spark's higher-order
  * functions. The hash primitive is md5-based (not Spark's murmur3) so the
  * DuckDB oracle can replay every pipeline bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** SQL fragment: deterministic 60-bit positive hash of a string expr —
    * identical on Spark and DuckDB (`('0x'||substr(md5(x),1,15))::BIGINT`). */
  def md5LongSql(x: String): String =
    s"cast(conv(substring(md5($x), 1, 15), 16, 10) as bigint)"

  /** w-word shingles (default 3) of a token-array column named `colName`.
    * Distinct-ified, since MinHash operates on the shingle SET. Empty when
    * the document has fewer than w tokens (Spark's `sequence(1, 0)` would
    * otherwise DESCEND — a cross-engine trap). */
  def shinglesExpr(colName: String, w: Int = 3): Column = expr(
    s"""if(size($colName) < $w, array(),
       |  array_distinct(transform(sequence(1, size($colName) - ${w - 1}),
       |    i -> ${(0 until w).map(o => s"element_at($colName, i + $o)").mkString("concat_ws(' ', ", ", ", ")")})))""".stripMargin)

  /** One 60-bit md5 hash per element of a string-array column — computed
    * once, then reused by every MinHash seed and every SimHash bit. */
  def tokenHashesExpr(colName: String): Column =
    expr(s"transform($colName, t -> ${md5LongSql("t")})")

  /** MinHash signature over pre-hashed tokens: sig_i = min((a_i*h + b_i) mod P).
    * Seeds are driver-derived literals (DetHash), so per-row cost is k*n
    * multiply-adds — no md5 in the inner loop. Pure per-row map work. */
  def minhashExpr(hashesCol: String, k: Int): Column = {
    val mins = DetHash.minhashSeeds(k).map { case (a, b) =>
      s"array_min(transform($hashesCol, h -> ($a * (h % ${DetHash.P}) + $b) % ${DetHash.P}))"
    }
    expr(mins.mkString("array(", ", ", ")"))
  }

  /** LSH band hashes: b bands of r signature rows each. Two documents whose
    * shingle-set Jaccard is j collide in >=1 band with prob 1-(1-j^r)^b. */
  def bandsExpr(sigCol: String, b: Int, r: Int): Column = expr(
    s"""transform(sequence(0, ${b - 1}),
       |  j -> md5(array_join(transform(slice($sigCol, j * $r + 1, $r),
       |    x -> cast(x as string)), '|')))""".stripMargin)

  /** 16-bit SimHash over pre-hashed tokens: bit b is the sign of the sum of
    * +-1 votes from each token hash's bit b. */
  def simhash16Expr(hashesCol: String): Column = expr(
    s"""aggregate(sequence(0, 15), 0L, (acc, b) -> acc +
       |  if(aggregate($hashesCol, 0L,
       |       (w, h) -> w + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0,
       |     shiftleft(1L, b), 0L))""".stripMargin)

  /** Order-insensitive document fingerprint: md5 over the sorted distinct
    * token set (the reference's checksum idiom, `utils/filesystem.py:106-114`,
    * lifted to content-defined identity). */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")
}
