package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.Dedup

/** The streamed chunk index must equal the batch-built distinct chunk set
  * over the same corpus — across drains, idle re-runs, and the landed-
  * write/lost-commit crash window — and the landed survivors must show the
  * dedup-storage property: an edited re-send of known documents persists
  * only the chunks the edit actually created. */
class StreamingChunkIndexSpec extends SparkSpec {
  import spark.implicits._

  test("streamed chunk set == batch chunk set; edited re-sends store only new chunks") {
    val root = Files.createTempDirectory("graft-stream-cdcidx").toString
    val in = s"$root/raw"
    val docsAll = Tables.documents(spark, sf()).select("doc_id", "text")
    val batch1 = docsAll.filter($"doc_id" < 300)
    // batch2: fresh docs + prefix-EDITED versions of known batch1 docs —
    // the delta-ingest shape the chunk store exists for
    val edited = batch1.filter($"doc_id" % 7 === 0)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat(lit("EDIT-"), $"doc_id".cast("string"), lit(": "), $"text").as("text"))
    val batch2 = docsAll.filter($"doc_id" >= 300 && $"doc_id" < 400)
      .unionByName(edited)
    batch1.write.parquet(s"$in/f1")

    def runOnce(hook: Long => Unit = _ => ()): Unit =
      StreamingChunkIndex.run(spark, s"$in/*", batch1,
        "doc_id", "text", s"$root/index", s"$root/ckpt", batchHook = hook)
    def streamed() = StreamingChunkIndex.indexSoFar(spark, s"$root/index").get
    def batchSet(docs: org.apache.spark.sql.DataFrame) =
      Dedup.contentDefinedChunks(docs, "doc_id", "text")
        .groupBy("chunk_md5").agg(min($"len".cast("long")).as("len"))
    def assertSame(a: org.apache.spark.sql.DataFrame,
                   b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.exceptAll(b).count() == 0)
      assert(b.exceptAll(a).count() == 0)
    }

    runOnce()
    assertSame(streamed(), batchSet(batch1))

    // idle re-run: registry remembers everything — no duplicates
    runOnce()
    assertSame(streamed(), batchSet(batch1))

    // incremental drain: set identity with the batch build over the union
    batch2.write.parquet(s"$in/f2")
    runOnce()
    val union = batch1.unionByName(batch2)
    assertSame(streamed(), batchSet(union))

    // dedup-storage property: the edited docs' chunks were mostly already
    // stored — batch2's landed bytes are far below its raw chunk bytes
    val landed = spark.read.parquet(s"$root/index")
      .filter($"batch_id" === 1L)
    val editedChunks = Dedup.contentDefinedChunks(edited, "doc_id", "text")
    val editedBytes = editedChunks.agg(sum($"len".cast("long"))).head().getLong(0)
    val editedStored = landed.join(
        editedChunks.select("chunk_md5").distinct(), Seq("chunk_md5"), "left_semi")
      .agg(coalesce(sum("len"), lit(0L))).head().getLong(0)
    // at this SF docs are ~3-5 chunks, and a prefix edit re-stores exactly
    // the spliced first chunk — so roughly 1/4-1/3 of bytes, never all
    assert(editedStored > 0 && editedStored < editedBytes / 2,
      s"edited re-send stored $editedStored of $editedBytes chunk bytes")

    // crash window: batch 3's output lands, the checkpoint commit is lost
    val batch3 = docsAll.filter($"doc_id" >= 400 && $"doc_id" < 450)
    batch3.write.parquet(s"$in/f3")
    val boom = intercept[Exception] {
      runOnce(_ => throw new RuntimeException("crash after write"))
    }
    assert(boom.getMessage != null)
    // replay overwrites the same partition byte-identically — still a set
    runOnce()
    assertSame(streamed(), batchSet(union.unionByName(batch3)))
  }

  test("d23b's per-source dedup accounting off the streamed store == batch store") {
    val root = Files.createTempDirectory("graft-stream-cdcidx-d23b").toString
    val in = s"$root/raw"
    val docs = Tables.documents(spark, sf()).filter(length($"text") > 0)
      .select("doc_id", "source", "text").localCheckpoint(true)
    // two-batch arrival split that does NOT follow doc_id order — the
    // accounting must be arrival-order-independent
    docs.filter($"doc_id" % 3 =!= 0).write.parquet(s"$in/f1")
    StreamingChunkIndex.run(spark, s"$in/*", docs, "doc_id", "text",
      s"$root/index", s"$root/ckpt")
    docs.filter($"doc_id" % 3 === 0).write.parquet(s"$in/f2")
    StreamingChunkIndex.run(spark, s"$in/*", docs, "doc_id", "text",
      s"$root/index", s"$root/ckpt")

    val inst = graft.operators.Dedup
      .contentDefinedChunks(docs, "doc_id", "text")
      .select("doc_id", "chunk_md5", "len").localCheckpoint(true)
    // d23b's attribution: store rows charged to the source of their
    // min-doc_id instance
    def perSource(store: org.apache.spark.sql.DataFrame) = {
      val owner = inst.groupBy("chunk_md5").agg(min("doc_id").as("doc_id"))
      store.join(owner, "chunk_md5")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_stored"),
          sum($"len".cast("long")).as("chars_stored"))
        .orderBy("source")
        .collect().toSeq
    }
    val batchStore = inst.groupBy("chunk_md5")
      .agg(min($"len".cast("long")).as("len"))
    val streamedStore = StreamingChunkIndex.indexSoFar(spark, s"$root/index").get
    assert(perSource(streamedStore) === perSource(batchStore))
  }
}
