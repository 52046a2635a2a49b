package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image dedup via perceptual difference hashing (dHash) over REAL PNG
  * decode — the standard image near-dup shape of multimodal training
  * pipelines (LAION-style: hash every image, band the hashes, verify by
  * hamming distance). PNG grayscale is fully decodable in pure JVM
  * (`javax.imageio`), so this family round-trips real containers end to
  * end, like the WAV path ([[Audio]]) and unlike the MP4 codec boundary.
  *
  * dHash (difference hash): downscale to a (DW+1)×DH grid by exact 2×2
  * block sums (the synth images are 2(DW+1)×2DH, so "resize" is integer
  * block summation — no interpolation, no doubles anywhere), then emit one
  * bit per horizontal neighbor comparison: bit(bx,by) = S(bx,by) >
  * S(bx+1,by). 64 bits total, carried as two 32-bit halves in BIGINTs so
  * every engine's integer semantics agree (no 1<<63 sign games).
  *
  * The deterministic synth corpus exists so the DuckDB oracle can replay
  * the HASHES in closed form (pure integer pixel formula) while Spark
  * exercises the full PNG encode → decode → hash path; the near-dup
  * banding is pigeonhole-complete: hamming ≤ 6 over 8 disjoint 8-bit
  * bands forces at least one identical band, so the band join loses no
  * true pair and never goes all-pairs (the SimHash argument, d3b).
  */
object Images {

  /** dHash grid: 9×8 block sums → 8×8 = 64 comparison bits. */
  val GridW = 9
  val GridH = 8
  /** Synth image dimensions: 2×2 pixels per grid cell. */
  val ImgW: Int = 2 * GridW
  val ImgH: Int = 2 * GridH

  /** Pixel (x, y) of the synthetic image for `seed` — pure-integer hash
    * texture, exactly replayable in SQL (xor-mixed so images of different
    * seeds are unrelated, never a constant shift of each other: measured
    * min unrelated hamming 14). Range [0, 240+11]; `noise` adds +11 on a
    * sparse diagonal lattice (the "slightly re-encoded copy" shape: most
    * gradient signs survive, 0–6 flip — a hash-identical perturbed copy
    * is exactly what perceptual hashing promises). 241+11 < 256, so every
    * value fits the 8-bit raster exactly (no clamp, no wrap). */
  def synthPixel(seed: Long, x: Int, y: Int, noise: Boolean): Int = {
    val pos = y * ImgW + x
    val v = ((seed * 2654435761L) ^ (pos * 2654435789L)) % 241L
    (v + (if (noise && (x + y) % 5 == 0) 11 else 0)).toInt
  }

  /** A real grayscale PNG container for `seed`. */
  def pngBytes(seed: Long, noise: Boolean): Array[Byte] = {
    val img = new BufferedImage(ImgW, ImgH, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        raster.setSample(x, y, 0, synthPixel(seed, x, y, noise))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic PNG corpus: (media_id, image) — real PNG
    * containers whose pixels follow [[synthPixel]](seedCol, noiseCol).
    * Batched per partition (no driver loop), mirroring [[Audio.synthCorpus]]. */
  def synthPngCorpus(df: DataFrame, idCol: String, seedCol: String,
                     noiseCol: String): DataFrame = {
    val spark = df.sparkSession
    val rows = df.select(col(idCol).cast("long"), col(seedCol).cast("long"),
        col(noiseCol).cast("boolean")).rdd
      .mapPartitions(_.map { r =>
        Row(r.getLong(0), pngBytes(r.getLong(1), r.getBoolean(2)))
      })
    spark.createDataFrame(rows, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("image", BinaryType, nullable = true))))
  }

  /** 64-bit dHash of a decoded grayscale grid, split (hi32, lo32).
    * Bit i = by·8+bx is set iff S(bx,by) > S(bx+1,by) over the exact 2×2
    * block sums. Raster samples, not getRGB — getRGB routes grayscale
    * through a color-space conversion and would un-determinize the path. */
  private def dHashOf(img: BufferedImage): Option[(Long, Long)] = {
    if (img.getWidth != ImgW || img.getHeight != ImgH) return None
    val raster = img.getRaster
    val sums = Array.ofDim[Long](GridH, GridW)
    var by = 0
    while (by < GridH) {
      var bx = 0
      while (bx < GridW) {
        sums(by)(bx) =
          raster.getSample(2 * bx, 2 * by, 0).toLong +
          raster.getSample(2 * bx + 1, 2 * by, 0).toLong +
          raster.getSample(2 * bx, 2 * by + 1, 0).toLong +
          raster.getSample(2 * bx + 1, 2 * by + 1, 0).toLong
        bx += 1
      }
      by += 1
    }
    var bits = 0L
    by = 0
    while (by < GridH) {
      var bx = 0
      while (bx < GridW - 1) {
        if (sums(by)(bx) > sums(by)(bx + 1)) bits |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    Some((bits >>> 32, bits & 0xFFFFFFFFL))
  }

  /** Distributed per-image dHash over a binary PNG column — the REAL
    * decode runs inside mapPartitions. Undecodable or wrong-shape payloads
    * yield null hashes (corpus-audit shape: count the bad, keep the row). */
  def dHash(media: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      val decoded =
        if (bytes == null) None
        else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          .flatMap(dHashOf)
        catch { case scala.util.control.NonFatal(_) => None }
      decoded match {
        case Some((hi, lo)) => Row(id, bytes.length.toLong, hi, lo)
        case None => Row(id,
          if (bytes == null) 0L else bytes.length.toLong, null, null)
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("dhash_hi", LongType, nullable = true),
      StructField("dhash_lo", LongType, nullable = true))))
  }

  /** Exact 2×2 area-sum downscale over the REAL PNG decode — the resize
    * primitive of the multimodal family (dHash consumes the same grid):
    * one row per (media_id, by, bx) with the integer block sum. With
    * interpolation libraries this would be area-averaging; on the exact
    * 2×-divisible synth grid the block SUM is the area average times 4 —
    * deterministic integers on any engine, no float resampling.
    *
    * Scale shape: one mapPartitions decode pass, GridW·GridH rows out per
    * image, no shuffle — the thumbnail table a downstream pipeline keys by
    * (media_id, by, bx) or re-packs to arrays. */
  def blockSumGrid(media: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.flatMap { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      val decoded =
        if (bytes == null) None
        else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          .filter(img => img.getWidth == ImgW && img.getHeight == ImgH)
        catch { case scala.util.control.NonFatal(_) => None }
      decoded match {
        case Some(img) =>
          val raster = img.getRaster
          for (by <- 0 until GridH; bx <- 0 until GridW) yield {
            val s =
              raster.getSample(2 * bx, 2 * by, 0).toLong +
              raster.getSample(2 * bx + 1, 2 * by, 0).toLong +
              raster.getSample(2 * bx, 2 * by + 1, 0).toLong +
              raster.getSample(2 * bx + 1, 2 * by + 1, 0).toLong
            Row(id, by.toLong, bx.toLong, s)
          }
        case None => Seq.empty[Row]
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("by", LongType, nullable = false),
      StructField("bx", LongType, nullable = false),
      StructField("block_sum", LongType, nullable = false))))
  }

  /** Per-image luminance statistics over the REAL PNG decode — the
    * image-quality filter inputs of multimodal curation pipelines
    * (brightness / contrast / flatness / edge energy screens, the LAION
    * shape): pixel sum, min, max, contrast (max − min), distinct-level
    * count (flatness — a near-constant image has few levels), and the
    * horizontal gradient energy Σ|v(x+1,y) − v(x,y)| (sharpness proxy;
    * screenshots and synthetic flats score near 0). All integers off the
    * 8-bit raster — thresholds are the CONSUMER's policy, the operator
    * emits the measurements.
    *
    * Scale shape: one mapPartitions pass, one row out per image — no
    * shuffle at all; the stats frame is media-dimension sized. */
  def imageStats(media: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = media.sparkSession
    val ii = media.schema.fieldIndex(idCol)
    val bi = media.schema.fieldIndex(binCol)
    val rows = media.rdd.mapPartitions(_.map { r =>
      val id = r.getLong(ii)
      val bytes = r.getAs[Array[Byte]](bi)
      val decoded =
        if (bytes == null) None
        else try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      decoded match {
        case Some(img) =>
          val (w, h) = (img.getWidth, img.getHeight)
          val raster = img.getRaster
          var sum = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var grad = 0L
          val seen = new java.util.BitSet(256)
          var y = 0
          while (y < h) {
            var x = 0
            var prev = -1
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sum += v
              if (v < mn) mn = v
              if (v > mx) mx = v
              seen.set(v)
              if (prev >= 0) grad += math.abs(v - prev)
              prev = v
              x += 1
            }
            y += 1
          }
          Row(id, (w * h).toLong, sum, mn.toLong, mx.toLong,
            (mx - mn).toLong, seen.cardinality().toLong, grad)
        case None => Row(id, 0L, null, null, null, null, null, null)
      }
    })
    spark.createDataFrame(rows, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_px", LongType, nullable = false),
      StructField("sum_lum", LongType, nullable = true),
      StructField("min_lum", LongType, nullable = true),
      StructField("max_lum", LongType, nullable = true),
      StructField("contrast", LongType, nullable = true),
      StructField("n_levels", LongType, nullable = true),
      StructField("grad_sum", LongType, nullable = true))))
  }

  /** Near-duplicate image pairs by dHash hamming distance ≤ `maxHamming`
    * (< 8) — banded pigeonhole join, never all-pairs: the 64-bit hash
    * splits into 8 disjoint 8-bit bands, and any pair within hamming 7
    * shares at least one band verbatim, so candidates come from an
    * equality join on (band index, band value) and only candidates pay
    * the exact hamming check. Output (id_a < id_b, hamming). */
  def dHashNearDupPairs(hashes: DataFrame, idCol: String,
                        maxHamming: Int): DataFrame =
    Hash64.bandedNearDupPairs(hashes, idCol, "dhash_hi", "dhash_lo", maxHamming)
}
