package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MinhashBands

/** Streaming NEAR-duplicate detection — the stream-native counterpart of
  * the batch d2 operator (`operators/Dedup.minhashLshPairs`), for the
  * window where ingest near-dups actually cluster (re-crawls, template
  * re-renders, producer retries).
  *
  * Shape: each document computes its k-value MinHash signature and b LSH
  * band hashes ONCE (native codegen'd expressions), fans out one row per
  * band, and `flatMapGroupsWithState` keyed on (band index, band hash)
  * keeps the recent signatures per bucket. A new arrival is compared only
  * against its bucket's entries — the LSH candidate-generation guarantee,
  * never all-pairs — and a pair is emitted when the signature-agreement
  * estimate of Jaccard clears `minEst`.
  *
  * Two deliberate divergences from batch d2, both forced by unbounded
  * input:
  *  - Jaccard is ESTIMATED from signature agreement (matching fraction of
  *    the k MinHash components) instead of recomputed exactly from shingle
  *    sets — state carries k longs per (doc, band), not the document text.
  *  - Only pairs within the watermark window are found; corpus-wide dedup
  *    remains the batch operator's job over landed data.
  *
  * State is bounded by the watermark: entries evict once the watermark
  * passes their event time + delay (same contract as
  * `dropDuplicatesWithinWatermark`), and an event-time timeout clears
  * whole buckets that stop receiving traffic. A pair sharing several bands
  * may be emitted once per shared band — downstream `dropDuplicates` on
  * (id1, id2) collapses them (kept out of this operator so the output
  * needs no second stateful stage).
  */
object StreamingNearDup {

  case class BandRow(doc_id: Long, ts: Timestamp, sig: Array[Long], band: String)
  case class Entry(id: Long, tsUs: Long, sig: Array[Long])
  case class BucketState(entries: List[Entry])
  case class DupPair(id1: Long, id2: Long, est_jaccard: Double, band: String)

  /** Matching fraction of the two k-value signatures — the standard
    * unbiased MinHash estimator of Jaccard similarity. */
  def sigAgreement(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    while (i < a.length) {
      if (a(i) == b(i)) eq += 1
      i += 1
    }
    eq.toDouble / a.length
  }

  /** @param docs   streaming frame with (idCol: long, tsCol: timestamp,
    *               toksCol: array<string>).
    * @param w      shingle width, `k` signature size, `b` LSH bands —
    *               same knobs as batch d2.
    * @param minEst minimum signature-agreement estimate to emit a pair.
    * @param delayMs watermark lateness AND state retention, in ms. */
  def pairs(docs: DataFrame, idCol: String, tsCol: String, toksCol: String,
            w: Int, k: Int, b: Int, minEst: Double,
            delayMs: Long): Dataset[DupPair] = {
    implicit val rowEnc = Encoders.product[BandRow]
    implicit val pairEnc = Encoders.product[DupPair]
    implicit val stateEnc = Encoders.product[BucketState]
    implicit val keyEnc = Encoders.STRING

    def update(band: String, rows: Iterator[BandRow],
               state: GroupState[BucketState]): Iterator[DupPair] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        // evict entries the watermark has passed (event time + delay)
        var kept = state.getOption.map(_.entries).getOrElse(Nil)
          .filter(e => e.tsUs + delayMs * 1000L >= wmUs)
        val out = Vector.newBuilder[DupPair]
        // deterministic intra-batch order: event time, then id
        rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id)).foreach { r =>
          kept.foreach { e =>
            if (e.id != r.doc_id) {
              val est = sigAgreement(e.sig, r.sig)
              if (est >= minEst)
                out += DupPair(math.min(e.id, r.doc_id),
                  math.max(e.id, r.doc_id), est, band)
            }
          }
          kept = Entry(r.doc_id, r.ts.getTime * 1000L, r.sig) :: kept
        }
        state.update(BucketState(kept))
        val maxTsMs = kept.iterator.map(_.tsUs / 1000L).max
        // fire once the watermark passes the newest entry's retention end
        state.setTimeoutTimestamp(
          math.max(maxTsMs + delayMs, state.getCurrentWatermarkMs() + 1))
        out.result().iterator
      }
    }

    docs
      .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
        MinhashBands.minhashSig(col(toksCol), w, k).as("sig"),
        MinhashBands.minhashBands(col(toksCol), w, k, b)
          .getField("bands").as("bands"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("ts"), col("sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      .select(col("doc_id"), col("ts"), col("sig"),
        concat_ws(":", col("band_idx"), col("band_hash")).as("band"))
      .as[BandRow]
      .withWatermark("ts", s"$delayMs milliseconds")
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
