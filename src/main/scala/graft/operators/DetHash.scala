package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic hash-family derivation shared by the Spark expressions and
  * the generated DuckDB oracle SQL.
  *
  * The row-level hash primitive on both engines is "md5 hex, first 15
  * nibbles, parsed as a 60-bit positive integer". Seeds and hyperplanes are
  * derived HERE (driver-side, once) with the same md5 and inlined as
  * literals into both engines' expressions — so per-row work is one md5 per
  * token plus cheap affine arithmetic, not k md5s per token.
  */
object DetHash {
  /** Modulus for the affine MinHash family: fits (a*h+b) in a 64-bit long. */
  val P: Long = 1000000007L

  /** Driver-side twin of the SQL fragment TextOps.md5LongSql. */
  def md5Long(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** k affine MinHash seed pairs (a_i, b_i), a_i != 0 mod P. */
  def minhashSeeds(k: Int): Seq[(Long, Long)] =
    (0 until k).map { i =>
      val a = md5Long(s"a:$i") % P
      val b = md5Long(s"b:$i") % P
      (if (a == 0) 1L else a, b)
    }

  /** nPlanes random hyperplanes of dimension dim, weights uniform in [-1, 1]
    * derived from md5(p:j). */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { j => ((md5Long(s"$p:$j") % 2001) - 1000) / 1000.0 }
    }
}
