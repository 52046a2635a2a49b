package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ZOrder.scala: the SQL interleave matches the driver reference, and
  * z-ordering delivers its locality property (shards of a z-sorted set
  * have tighter per-dimension bounding boxes than row-order shards). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("SQL interleave == driver reference on exhaustive small inputs") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("z", expr(ZOrder.zSparkSql("x", "y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) => assert(got((x, y)) === ZOrder.z(x, y)) }
  }

  test("known interleaves") {
    assert(ZOrder.z(0, 0) === 0L)
    assert(ZOrder.z(1, 0) === 1L)
    assert(ZOrder.z(0, 1) === 2L)
    assert(ZOrder.z(3, 3) === 15L)
    assert(ZOrder.z(65535, 0) === 0x55555555L)
    assert(ZOrder.z(0, 65535) === 0xAAAAAAAAL)
  }

  test("z-sorted shards have tighter 2-d bounding boxes than 1-d sorting") {
    // 64x64 grid sharded 16 ways: z-order boxes are ~16x16; sorting by x
    // alone gives boxes spanning the full y range (64)
    val pts = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).sorted
    val zSharded = pts.sortBy { case (x, y) => ZOrder.z(x, y) }
      .grouped(256).toSeq
    val zArea = zSharded.map { g =>
      val xs = g.map(_._1); val ys = g.map(_._2)
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }.max
    val xSharded = pts.grouped(256).toSeq
    val xArea = xSharded.map { g =>
      val xs = g.map(_._1); val ys = g.map(_._2)
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }.max
    assert(zArea === 256L, s"z shards must be exact 16x16 tiles, got $zArea")
    assert(xArea === 256L, "x-major shards cover full-height strips")
    // the real difference: max per-dimension EXTENT (what a 1-d range
    // predicate on y prunes by): z shards span 16 in y, x-major span 64
    val zYext = zSharded.map(g => g.map(_._2).max - g.map(_._2).min + 1).max
    val xYext = xSharded.map(g => g.map(_._2).max - g.map(_._2).min + 1).max
    assert(zYext === 16L)
    assert(xYext === 64L)
  }
}
