package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The PNG encode → ImageIO decode → dHash path must reproduce the pixel
  * formula exactly (PNG grayscale is lossless and the hash reads raw
  * raster samples), and the banded near-dup join must find exactly the
  * brute-force hamming pairs (pigeonhole completeness).
  */
class ImagesSpec extends SparkSpec {
  import spark.implicits._

  /** dHash computed straight from the formula — no container, no decode. */
  private def directDHash(seed: Long, noise: Boolean): (Long, Long) = {
    def blockSum(bx: Int, by: Int): Long =
      (for (dx <- 0 to 1; dy <- 0 to 1)
        yield Images.synthPixel(seed, 2 * bx + dx, 2 * by + dy, noise).toLong).sum
    var bits = 0L
    for (by <- 0 until Images.GridH; bx <- 0 until Images.GridW - 1)
      if (blockSum(bx, by) > blockSum(bx + 1, by)) bits |= 1L << (by * 8 + bx)
    (bits >>> 32, bits & 0xFFFFFFFFL)
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("decoded dHash == direct formula dHash (PNG round-trip is exact)") {
    val meta = (0L until 40L).map(i => (i, i, i % 5 == 2)).toDF("media_id", "seed", "noise")
    val got = Images.dHash(Images.synthPngCorpus(meta, "media_id", "seed", "noise"),
        "media_id", "image")
      .select($"media_id", $"dhash_hi", $"dhash_lo")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.size == 40)
    for (i <- 0L until 40L)
      assert(got(i) == directDHash(i, i % 5 == 2), s"dHash of image $i")
  }

  test("undecodable payloads yield null hashes, rows kept") {
    val media = Seq((1L, "not a png".getBytes("UTF-8")),
        (2L, Array.emptyByteArray)).toDF("media_id", "image")
    val out = Images.dHash(media, "media_id", "image").orderBy("media_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.isNullAt(2)))
  }

  test("exact copy hamming 0, perturbed copy small, unrelated far") {
    val base = directDHash(7L, noise = false)
    assert(hamming(base, directDHash(7L, noise = false)) == 0)
    val pert = hamming(base, directDHash(7L, noise = true))
    assert(pert > 0 && pert <= 6, s"perturbed hamming $pert")
    // every perturbed copy stays under the near-dup threshold (some hash
    // IDENTICALLY — invariance to slight re-encoding is the point of a
    // perceptual hash); unrelated images stay far outside it
    for (s <- 0L until 30L) {
      val d = hamming(directDHash(s, noise = false), directDHash(s, noise = true))
      assert(d <= 6, s"perturbed hamming of seed $s is $d")
    }
    for (s <- 1L until 30L)
      assert(hamming(directDHash(0L, noise = false),
        directDHash(s, noise = false)) > 6, s"unrelated seed $s too close")
  }

  test("banded near-dup pairs == brute-force hamming pairs") {
    // 30 base images + exact copies of 3 + perturbed copies of 3
    val meta = ((0L until 30L).map(i => (i, i, false)) ++
        Seq(100L, 101L, 102L).map(i => (i, i - 100L, false)) ++
        Seq(200L, 201L, 202L).map(i => (i, i - 200L, true)))
      .toDF("media_id", "seed", "noise")
    val hashes = Images.dHash(
      Images.synthPngCorpus(meta, "media_id", "seed", "noise"), "media_id", "image")
    val got = Images.dHashNearDupPairs(hashes, "media_id", maxHamming = 6)
      .select($"a_id", $"b_id", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    // brute force over the direct hashes
    val all = meta.as[(Long, Long, Boolean)].collect()
      .map { case (id, seed, noise) => id -> directDHash(seed, noise) }
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      d = hamming(ha, hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute)
    // the planted structure is actually exercised
    assert(brute.exists(_._3 == 0L) && brute.exists(_._3 > 0L))
  }

  test("imageStats == scalar recompute from the pixel formula") {
    val meta = (0L until 25L).map(i => (i, i, i % 4 == 1)).toDF("media_id", "seed", "noise")
    val got = Images.imageStats(
        Images.synthPngCorpus(meta, "media_id", "seed", "noise"), "media_id", "image")
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_px"), r.getAs[Long]("sum_lum"), r.getAs[Long]("min_lum"),
          r.getAs[Long]("max_lum"), r.getAs[Long]("contrast"),
          r.getAs[Long]("n_levels"), r.getAs[Long]("grad_sum"))).toMap
    assert(got.size == 25)
    for (i <- 0L until 25L) {
      val noise = i % 4 == 1
      val px = for (y <- 0 until Images.ImgH; x <- 0 until Images.ImgW)
        yield Images.synthPixel(i, x, y, noise)
      val grad = (for (y <- 0 until Images.ImgH; x <- 0 until Images.ImgW - 1)
        yield math.abs(Images.synthPixel(i, x + 1, y, noise) -
          Images.synthPixel(i, x, y, noise)).toLong).sum
      assert(got(i) === ((px.size.toLong, px.map(_.toLong).sum, px.min.toLong,
        px.max.toLong, (px.max - px.min).toLong, px.distinct.size.toLong, grad)),
        s"stats of image $i")
    }
  }

  test("imageStats: undecodable payload yields null stats, row kept") {
    val media = Seq((1L, "junk".getBytes("UTF-8"))).toDF("media_id", "image")
    val out = Images.imageStats(media, "media_id", "image").collect()
    assert(out.length == 1 && out(0).isNullAt(2) && out(0).getAs[Long]("n_px") == 0L)
  }
}
