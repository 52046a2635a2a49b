package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S22: Grist-shaped connector over an in-memory stub transport — the
  * write-mode / chunking / column-rename contracts of the reference's
  * `utils/grist.py` GristTable, plus the simplifions snapshot diff
  * (`diff_manager.py:37-53`) as a frame composition. */
class GristSpec extends SparkSpec {
  import spark.implicits._

  /** Stub transport: one in-memory doc. Records per table, columns as
    * (id, label); renames 'id' → 'id2' like the real server refuses the
    * reserved column id (grist.py:110 comment). Tracks every postRecords
    * chunk so the 100-row contract is observable. */
  private class StubTransport extends Grist.Transport {
    val tables = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ListBuffer[String]]
    val cols = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[(String, String)]]
    val chunkSizes = scala.collection.mutable.ListBuffer.empty[Int]

    private def assignIds(labels: Seq[String]): Seq[(String, String)] =
      labels.map(l => (if (l == "id") "id2" else l, l))

    def listTables(): Seq[String] = tables.keys.toSeq
    def columns(tableId: String): Seq[(String, String)] = cols(tableId)
    def createTable(tableId: String, c: Seq[String]): Map[String, String] = {
      tables(tableId) = scala.collection.mutable.ListBuffer.empty
      cols(tableId) = assignIds(c)
      cols(tableId).map { case (id, label) => label -> id }.toMap
    }
    def addColumns(tableId: String, c: Seq[String]): Map[String, String] = {
      cols(tableId) = cols(tableId) ++ assignIds(c)
      cols(tableId).map { case (id, label) => label -> id }.toMap
    }
    def deleteRows(tableId: String): Unit = tables(tableId).clear()
    def recreateColumns(tableId: String, c: Seq[String]): Map[String, String] = {
      cols(tableId) = assignIds(c)
      cols(tableId).map { case (id, label) => label -> id }.toMap
    }
    def postRecords(tableId: String, chunk: Seq[String]): Unit = {
      chunkSizes += chunk.size
      tables(tableId) ++= chunk
    }
    def records(tableId: String): Seq[String] = tables(tableId).toSeq
  }

  test("fromDataFrame chunks at 100, preserves order, renames reserved ids") {
    val t = new StubTransport
    val df = spark.range(0, 250)
      .select(col("id"), concat(lit("row-"), col("id")).as("name"))
    val n = Grist.fromDataFrame(df, t, "T1")
    assert(n == 250)
    // grist.py:91 chunkify: 100,100,50
    assert(t.chunkSizes.toSeq == Seq(100, 100, 50))
    // ordered rows; the reserved 'id' column travels under its server id
    assert(t.records("T1").head.contains(""""id2":0"""))
    assert(t.records("T1").head.contains(""""name":"row-0""""))
    assert(t.records("T1").last.contains(""""id2":249"""))
    // replace mode on re-upload: rows reset, not appended
    Grist.fromDataFrame(df.limit(3), t, "T1")
    assert(t.records("T1").size == 3)
  }

  test("append modes: lazy adds columns, exact requires a match") {
    val t = new StubTransport
    Grist.fromDataFrame(Seq((1, "a")).toDF("k", "v"), t, "T2")
    // exact with matching columns appends
    Grist.fromDataFrame(Seq((2, "b")).toDF("k", "v"), t, "T2",
      mode = Grist.AppendExact)
    assert(t.records("T2").size == 2)
    // exact with a new column refuses (grist.py:133-140)
    val ex = intercept[IllegalArgumentException] {
      Grist.fromDataFrame(Seq((3, "c", true)).toDF("k", "v", "flag"), t, "T2",
        mode = Grist.AppendExact)
    }
    assert(ex.getMessage.contains("don't match"))
    // lazy adds the missing column and appends
    Grist.fromDataFrame(Seq((3, "c", true)).toDF("k", "v", "flag"), t, "T2",
      mode = Grist.AppendLazy)
    assert(t.records("T2").size == 3)
    assert(t.columns("T2").map(_._2) == Seq("k", "v", "flag"))
    assert(t.records("T2").last.contains(""""flag":true"""))
  }

  test("toDataFrame + fields round-trips distributed, id→label rename") {
    val t = new StubTransport
    Grist.fromDataFrame(Seq((1L, "x"), (2L, "y")).toDF("id", "label"), t, "T3")
    val raw = Grist.toDataFrame(spark, t, "T3")
    assert(raw.count() == 2)
    val idToLabel = t.columns("T3").toMap // the reference's id_to_label read
    val back = Grist.fields(raw, Seq("id2", "label"), mapping = idToLabel)
      .orderBy("id")
    assert(back.columns.toSeq == Seq("id", "label"))
    assert(back.as[(String, String)].collect().toSeq ==
      Seq(("1", "x"), ("2", "y")))
  }

  test("snapshotDiff: per-cell old/new, ignored keys excluded, add/delete as null") {
    val newDf = Seq(
      (1L, "alpha", "2026-01-02", 10L),
      (2L, "beta", "2026-01-02", 20L),
      (4L, "delta", "2026-01-02", 40L)).toDF("id", "name", "Modifie_le", "n")
    val oldDf = Seq(
      (1L, "alpha", "2026-01-01", 10L),
      (2L, "BETA", "2026-01-01", 20L),
      (3L, "gamma", "2026-01-01", 30L)).toDF("id", "name", "Modifie_le", "n")
    val diff = Grist.snapshotDiff(newDf, oldDf, "id",
        ignored = Seq("Modifie_le"))
      .orderBy("id", "column")
      .as[(Long, String, String, String)].collect().toSeq
    assert(diff == Seq(
      (2L, "name", "BETA", "beta"),          // changed cell
      (3L, "n", "30", null),                 // deleted row
      (3L, "name", "gamma", null),
      (4L, "n", null, "40"),                 // added row
      (4L, "name", null, "delta")))
    // row 1 differs only on the ignored column → absent entirely
    assert(!diff.exists(_._1 == 1L))
  }
}
