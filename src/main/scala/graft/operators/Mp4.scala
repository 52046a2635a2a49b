package graft.operators

/** Minimal pure-JDK MP4 (ISO-BMFF) container walk — the demux half of
  * video frame sampling. The reference pipeline hands video decode to
  * external tooling; here the CONTAINER layer is real (box tree, sample
  * table, true byte offsets, codec fourcc) and only the pixel decode is
  * stubbed, since the JDK ships no video codec.
  *
  * Box grammar: each box is [size:u32][type:4cc][payload], size==1 means a
  * u64 largesize follows the type, size==0 means "to end of file".
  * Container boxes (moov/trak/mdia/minf/stbl) nest child boxes directly in
  * their payload. The sample table lives under
  * moov → trak → mdia → minf → stbl:
  *  - stsd: codec sample entry (first entry's fourcc — avc1/hev1/mp4v…);
  *  - stsz: per-sample byte sizes (or one fixed size for all);
  *  - stsc: chunk→samples-per-chunk runs (first_chunk is 1-based, each run
  *    applies until the next run's first_chunk);
  *  - stco/co64: chunk byte offsets (u32 / u64).
  * A sample's file offset = its chunk's offset + the sizes of the samples
  * before it in that chunk.
  *
  * Truncated or out-of-spec containers return None — the walk never
  * throws, so the calling operator stays total on arbitrary bytes.
  */
object Mp4 {

  /** One video track's demuxed layout: codec fourcc from stsd plus the
    * true byte offset and size of every sample in container order. */
  final case class Mp4Track(codec: String, offsets: Seq[Long], sizes: Seq[Long])

  /** ISO-BMFF sniff: every MP4-family file carries `ftyp` at byte 4. */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  private def be32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def be64(b: Array[Byte], p: Int): Long = (be32(b, p) << 32) | be32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Child boxes of [from, until) as (type, payloadStart, payloadEnd). */
  private def boxes(b: Array[Byte], from: Int, until: Int): List[(String, Int, Int)] = {
    val out = List.newBuilder[(String, Int, Int)]
    var p = from
    var ok = true
    while (ok && p + 8 <= until) {
      val size = be32(b, p)
      val typ = fourcc(b, p + 4)
      val (payloadStart, boxEnd) =
        if (size == 0L) (p + 8, until.toLong)                    // to end
        else if (size == 1L && p + 16 <= until) (p + 16, p + be64(b, p + 8))
        else (p + 8, p + size)
      if (size != 0L && (boxEnd < payloadStart || boxEnd > until)) ok = false // truncated
      else { out += ((typ, payloadStart, boxEnd.toInt)); p = boxEnd.toInt }
    }
    out.result()
  }

  private def find(b: Array[Byte], from: Int, until: Int, typ: String): Option[(Int, Int)] =
    boxes(b, from, until).collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Walk the first trak that carries a complete sample table. Returns
    * None when the payload is not MP4, the tree is truncated, or no trak
    * has stsz+chunk offsets. */
  def sampleTable(bytes: Array[Byte]): Option[Mp4Track] =
    try {
      if (!isMp4(bytes)) None
      else
        find(bytes, 0, bytes.length, "moov").flatMap { case (ms, me) =>
          boxes(bytes, ms, me).collect { case ("trak", ts, te) => (ts, te) }
            .flatMap { case (ts, te) => trakTable(bytes, ts, te) }
            .headOption
        }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def trakTable(b: Array[Byte], ts: Int, te: Int): Option[Mp4Track] =
    for {
      (ds, de) <- find(b, ts, te, "mdia")
      (fs, fe) <- find(b, ds, de, "minf")
      (ss, se) <- find(b, fs, fe, "stbl")
      sizes <- stszSizes(b, ss, se)
      chunkOffs <- chunkOffsets(b, ss, se)
      if sizes.nonEmpty && chunkOffs.nonEmpty
    } yield {
      val codec = find(b, ss, se, "stsd")
        // payload: version/flags(4) entry_count(4), then entry size(4) + fourcc
        .filter { case (s, e) => e - s >= 16 }
        .map { case (s, _) => fourcc(b, s + 12) }
        .getOrElse("????")
      Mp4Track(codec, sampleOffsets(sizes, chunkOffs, stscRuns(b, ss, se)), sizes)
    }

  /** Most samples a track may declare before we call it corrupt — hours of
    * 60 fps video; anything above it in a payload we hold whole in memory
    * is adversarial, and the downstream offsets table is O(samples). */
  private val MaxSamples: Int = 1 << 22

  /** stsz payload: version/flags(4) sample_size(4) count(4) [sizes…]. */
  private def stszSizes(b: Array[Byte], ss: Int, se: Int): Option[Seq[Long]] =
    find(b, ss, se, "stsz").flatMap { case (s, e) =>
      if (e - s < 12) None
      else {
        val fixed = be32(b, s + 4)
        val n = be32(b, s + 8).toInt
        // every sample occupies >= 1 byte of the container, so a declared
        // count beyond the file size is corrupt; the MaxSamples ceiling
        // additionally stops a large payload (100 MB declaring 1e8
        // samples) from allocating sample tables far bigger than itself
        if (n < 0 || n > b.length || n > MaxSamples) None
        else if (fixed != 0L) Some(constSeq(n, fixed)) // O(1) space, not fill(n)
        else if (e - s < 12 + 4L * n) None // truncated size table
        else Some((0 until n).map(i => be32(b, s + 12 + 4 * i)))
      }
    }

  /** n copies of one value without materializing them (the fixed-sample-
    * size stsz case: carry size + count, compute on access). */
  private def constSeq(n0: Int, v0: Long): IndexedSeq[Long] =
    new scala.collection.immutable.IndexedSeq[Long] with Serializable {
      // stable vals (not the enclosing method's params) so Java
      // serialization — e.g. a track object captured in a closure —
      // round-trips; the Seq.fill this replaced was serializable too
      private val n: Int = n0
      private val v: Long = v0
      def length: Int = n
      def apply(i: Int): Long =
        if (i < 0 || i >= n) throw new IndexOutOfBoundsException(s"$i of $n")
        else v
    }

  /** stco (u32) or co64 (u64) payload: version/flags(4) count(4) [offs…]. */
  private def chunkOffsets(b: Array[Byte], ss: Int, se: Int): Option[Seq[Long]] = {
    def table(typ: String, w: Int, rd: (Array[Byte], Int) => Long) =
      find(b, ss, se, typ).flatMap { case (s, e) =>
        if (e - s < 8) None
        else {
          val n = be32(b, s + 4).toInt
          if (e - s < 8 + w.toLong * n) None
          else Some((0 until n).map(i => rd(b, s + 8 + w * i)))
        }
      }
    table("stco", 4, be32).orElse(table("co64", 8, be64))
  }

  /** stsc payload: version/flags(4) count(4) [first_chunk spc sdi]…
    * (1-based chunk indices). Missing/empty table → one-sample-per-chunk. */
  private def stscRuns(b: Array[Byte], ss: Int, se: Int): Seq[(Int, Int)] =
    find(b, ss, se, "stsc").map { case (s, e) =>
      val n = if (e - s >= 8) be32(b, s + 4).toInt else 0
      if (e - s < 8 + 12L * n) Seq.empty
      else (0 until n).map(i =>
        (be32(b, s + 8 + 12 * i).toInt, be32(b, s + 12 + 12 * i).toInt))
    }.getOrElse(Seq.empty) match {
      case runs if runs.nonEmpty => runs
      case _ => Seq((1, 1))
    }

  /** Per-sample file offsets: walk chunks in order, each chunk carrying
    * its stsc run's samples-per-chunk, samples packed back to back. */
  private def sampleOffsets(sizes: Seq[Long], chunkOffs: Seq[Long],
                            runs: Seq[(Int, Int)]): Seq[Long] = {
    val out = Vector.newBuilder[Long]
    var ri = 0
    var s = 0
    var c = 0
    while (c < chunkOffs.length && s < sizes.length) {
      while (ri + 1 < runs.length && runs(ri + 1)._1 <= c + 1) ri += 1
      var off = chunkOffs(c)
      var j = 0
      while (j < runs(ri)._2 && s < sizes.length) {
        out += off
        off += sizes(s)
        s += 1
        j += 1
      }
      c += 1
    }
    out.result()
  }
}
