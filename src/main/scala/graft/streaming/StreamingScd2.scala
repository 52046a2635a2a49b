package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming maintenance of the SCD2 (type-2 slowly-changing-dimension)
  * interval history — the ELEVENTH ExactlyOnce maintainer: per user, runs
  * of identical event_type become versioned [valid_from, valid_to)
  * intervals (`w8_scd2_intervals` semantics), kept current as event
  * batches arrive, without ever rebuilding closed history.
  *
  * Ingestion contract (standard CDC ordering): within a user, every event
  * of batch N+1 is at least as late as every event of batch N — the
  * stream EXTENDS each user's history at the tail, it never back-fills.
  * Under that contract the fold is exact: a batch's first run either
  * extends the user's open version (same event_type — n_events
  * accumulate, valid_from keeps) or closes it (valid_to = the run's
  * valid_from) and appends new versions; the spec pins streamed == the
  * w8 batch rebuild after every drain.
  *
  * Exactly-once: protocol 2 with self-exclusion (the
  * [[StreamingDomainMembership]] shape). The store holds DELTA rows under
  * `batch_id=` partitions — each batch lands only the versions it created
  * or superseded (per (user, version), never full buckets) — and the fold
  * reads the resolved view of the partitions BELOW its own batch id, so a
  * replayed batch recomputes against the identical prior state and
  * overwrites its partition byte-identically. The consumer view resolves
  * supersedes by per-(user, version) argmax on batch_id — one window over
  * a store sized by versions + updates, independent of raw event volume.
  */
object StreamingScd2 {

  /** Batch-local runs of identical event_type in (ts, event_id) order:
    * (user_id, seq 1.., event_type, valid_from, n_events, valid_to
    * within-batch [-1 = open]). */
  def localRuns(batch: DataFrame): DataFrame = {
    val wOrd = Window.partitionBy("user_id")
      .orderBy(col("ts_us_long"), col("event_id"))
    val prev = lag(col("event_type"), 1).over(wOrd)
    val wSeq = Window.partitionBy("user_id").orderBy("seq")
    batch
      .withColumn("__chg",
        when(prev.isNull.or(prev =!= col("event_type")), 1L).otherwise(0L))
      .withColumn("seq", sum(col("__chg")).over(wOrd))
      .groupBy("user_id", "seq", "event_type")
      .agg(min("ts_us_long").as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wSeq), lit(-1L)))
  }

  /** Delta rows for one batch against the prior resolved history: every
    * (user, version) row this batch creates or supersedes. `prior` may be
    * empty (first batch). */
  def foldBatch(prior: DataFrame, batch: DataFrame): DataFrame = {
    val runs = localRuns(batch)
    val open = prior.filter(col("valid_to") === -1L)
      .select(col("user_id"), col("version").as("__over"),
        col("event_type").as("__otype"), col("valid_from").as("__ofrom"),
        col("n_events").as("__on"))
    // whether the batch's FIRST run extends the user's open version is a
    // PER-USER fact (it shifts every later run's version number by one),
    // so it is computed once from the seq-1 run and joined back — a
    // per-ROW type compare would collide versions whenever a later run
    // returns to the open version's type (caught by StreamingScd2Spec's
    // b3: click-open + [click, view, click] mapped both view and the
    // final click to the same version).
    val first = runs.filter(col("seq") === 1L)
      .select(col("user_id"), col("event_type").as("__ft"))
    val r = runs.join(open, Seq("user_id"), "left")
      .join(first, Seq("user_id"))
    val hasOpen = col("__over").isNotNull
    val merges = hasOpen && col("__ft") === col("__otype")
    // the run rows: seq 1 merges into the open version when the first
    // run's type matches, otherwise appends after it; new users start at
    // version = seq
    val runRows = r.select(
      col("user_id"),
      when(hasOpen,
        when(merges, col("__over") + col("seq") - 1L)
          .otherwise(col("__over") + col("seq")))
        .otherwise(col("seq")).as("version"),
      col("event_type"),
      when(merges && col("seq") === 1L, col("__ofrom"))
        .otherwise(col("valid_from")).as("valid_from"),
      col("valid_to"),
      when(merges && col("seq") === 1L, col("__on") + col("n_events"))
        .otherwise(col("n_events")).as("n_events"))
    // closing row for an open version a DIFFERENT-type batch run follows:
    // same (user, version), valid_to stamped with the new run's start
    val closeRows = r.filter(col("seq") === 1L && hasOpen && !merges)
      .select(col("user_id"), col("__over").as("version"),
        col("__otype").as("event_type"), col("__ofrom").as("valid_from"),
        col("valid_from").as("valid_to"), col("__on").as("n_events"))
    runRows.unionByName(closeRows)
  }

  /** Drain available event files (user_id, event_type, ts_us_long,
    * event_id) once (AvailableNow), folding each batch's delta into the
    * `batch_id=` partitioned store. Re-invoke per ingest cycle; safe to
    * re-run after a crash at any point. */
  def run(spark: SparkSession, inGlob: String, schemaSource: DataFrame,
          storePath: String, checkpoint: String,
          batchHook: Long => Unit = _ => ()): Unit =
    ExactlyOnce.drainAvailableNow(spark, inGlob, schemaSource, checkpoint) {
      (batch, batchId) =>
        val prior = priorView(spark, storePath, batchId, batch)
        ExactlyOnce.landBatchPartition(foldBatch(prior, batch), storePath,
          batchId)
        batchHook(batchId)
    }

  /** The resolved history from partitions strictly below `batchId` (self-
    * exclusion: a replayed batch folds against the identical prior
    * state). Empty-schema frame when the store doesn't exist yet. */
  private def priorView(spark: SparkSession, storePath: String,
                        batchId: Long, batch: DataFrame): DataFrame = {
    if (ExactlyOnce.storeNonEmpty(spark, storePath))
      resolve(spark.read.parquet(storePath)
        .filter(col("batch_id") < batchId))
    else
      foldBatch(emptyHistory(batch), batch).limit(0)
  }

  private def emptyHistory(batch: DataFrame): DataFrame =
    localRuns(batch)
      .select(col("user_id"), col("seq").as("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .limit(0)

  /** Per-(user, version) argmax on batch_id: the latest delta row wins. */
  private def resolve(store: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "version")
      .orderBy(col("batch_id").desc)
    store.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "version", "event_type", "valid_from", "valid_to",
        "n_events")
  }

  /** The maintained SCD2 view — identical to the w8 batch rebuild over
    * every event drained so far (spec-pinned). */
  def historySoFar(spark: SparkSession, storePath: String): DataFrame =
    resolve(spark.read.parquet(storePath))
}
