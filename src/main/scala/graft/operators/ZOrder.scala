package graft.operators

/** Z-order (Morton) interleaving — the multi-dimensional layout key:
  * writing shards in z order gives every shard a small bounding box in
  * BOTH dimensions at once, so a range predicate on either (or both)
  * dimensions prunes most shards from a scan — the standard multi-dim
  * locality layout (z-ordered clustering) re-expressed with the repo's
  * deterministic [[RangeShard]] writer (exact cut keys by distributed
  * selection — no sampled boundaries, so the same data always lands in
  * the same files and the oracle replays the layout in closed form).
  *
  * The interleave itself is a pure 16+16→32-bit integer expression
  * (shift/mask/or), generated once for each engine's operator syntax —
  * no libm, engine-exact by construction. Inputs must already fit 16
  * bits (caller masks); bit k of x lands at 2k, bit k of y at 2k+1.
  */
object ZOrder {

  /** Spark SQL expression: interleave the low 16 bits of `x` and `y`. */
  def zSparkSql(x: String, y: String): String =
    (0 until 16).flatMap { k =>
      Seq(s"shiftleft((shiftright($x, $k) & 1), ${2 * k})",
        s"shiftleft((shiftright($y, $k) & 1), ${2 * k + 1})")
    }.mkString("(", " + ", ")")

  /** DuckDB twin of [[zSparkSql]]. */
  def zDuckSql(x: String, y: String): String =
    (0 until 16).flatMap { k =>
      Seq(s"((($x >> $k) & 1) << ${2 * k})",
        s"((($y >> $k) & 1) << ${2 * k + 1})")
    }.mkString("(", " + ", ")")

  /** Driver-side reference (for specs). */
  def z(x: Long, y: Long): Long =
    (0 until 16).map { k =>
      (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }.sum
}
