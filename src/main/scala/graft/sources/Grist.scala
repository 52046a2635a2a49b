package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** S22: Grist-shaped table connector — DataFrame ⇄ record-batch source/sink
  * behind a pluggable transport (the S11/S13 harness pattern: production
  * wires an HTTP client against the table API, tests wire a stub; the
  * ENGINE owns everything expressible as frames).
  *
  * Shapes mirrored from the reference's `utils/grist.py`:
  *   - writes are CHUNKED at 100 records per call (`grist.py:91` chunkify —
  *     the API 413-avoidance contract), streamed off `toLocalIterator` so
  *     driver memory stays one-chunk-bounded and table row ORDER is the
  *     frame's order (a serving-UI table is ordered; the sink is
  *     API-bounded by nature — a Grist doc is thousands of rows, never
  *     data-scale, so a sequential ordered write IS the scale story);
  *   - three write modes (`grist.py:164-225` from_dataframe): REPLACE
  *     (delete rows, recreate columns), APPEND-LAZY (add missing columns),
  *     APPEND-EXACT (column sets must match);
  *   - the server may rename requested column ids (`grist.py:110-124`
  *     get_columns_mapping: 'id' is reserved) — writes rename through the
  *     returned label→id mapping, reads can rename back id→label;
  *   - reads land as raw record-JSON strings and parse DISTRIBUTED
  *     ([[fields]], the [[Sparql.bindings]] idiom) — a doc is small but a
  *     UNION of docs/tables (the verticales walk) is a frame like any
  *     other.
  */
object Grist {

  /** Record-batch transport for one Grist-shaped document: everything the
    * reference's GristTable does over HTTP, minus the HTTP. All methods are
    * driver-side (the API is the bottleneck and pages are small); `records`
    * returns one JSON object string per row ("fields" content). */
  trait Transport {
    /** Table ids present in the doc. */
    def listTables(): Seq[String]
    /** (column id, column label) pairs, in table order. */
    def columns(tableId: String): Seq[(String, String)]
    /** Create the table with the given column ids (labels = ids);
      * returns label→assigned-id (the server may rename, e.g. 'id'). */
    def createTable(tableId: String, cols: Seq[String]): Map[String, String]
    /** Add columns (labels = ids); returns the FULL label→id mapping. */
    def addColumns(tableId: String, cols: Seq[String]): Map[String, String]
    /** Delete all rows, keep columns. */
    def deleteRows(tableId: String): Unit
    /** Drop every column and recreate from labels; returns label→id. */
    def recreateColumns(tableId: String, cols: Seq[String]): Map[String, String]
    /** Append one chunk (≤ chunkSize rows) of record-JSON objects. */
    def postRecords(tableId: String, chunk: Seq[String]): Unit
    /** Every row as one JSON object string keyed by column ID. */
    def records(tableId: String): Seq[String]
  }

  sealed trait WriteMode
  /** Erase rows + recreate columns, then fill (grist.py append=False). */
  case object Replace extends WriteMode
  /** Append; add any missing columns first (grist.py append='lazy'). */
  case object AppendLazy extends WriteMode
  /** Append; fail unless column sets match (grist.py append='exact'). */
  case object AppendExact extends WriteMode

  /** The reference's chunk size (grist.py:91). */
  val ChunkSize = 100

  /** Upload a frame to a table (the reference's from_dataframe,
    * grist.py:164-233): create-if-missing, mode-dependent column handling,
    * then ordered chunked record posts. String-typed cells travel as JSON
    * strings; numeric/bool cells as JSON literals. Returns rows written. */
  def fromDataFrame(df: DataFrame, transport: Transport, tableId: String,
                    mode: WriteMode = Replace,
                    chunkSize: Int = ChunkSize): Long = {
    val cols = df.columns.toSeq
    val mapping: Map[String, String] =
      if (!transport.listTables().contains(tableId)) {
        transport.createTable(tableId, cols)
      } else mode match {
        case Replace =>
          transport.deleteRows(tableId)
          transport.recreateColumns(tableId, cols)
        case AppendExact =>
          val existing = transport.columns(tableId).map(_._2)
          require(existing.sorted == cols.sorted,
            "Columns of the existing table don't match with sent data: " +
              s"existing=${existing.sorted.mkString(",")} " +
              s"sent=${cols.sorted.mkString(",")}")
          transport.columns(tableId).map { case (id, label) => label -> id }.toMap
        case AppendLazy =>
          val existingLabels = transport.columns(tableId).map(_._2).toSet
          val missing = cols.filterNot(existingLabels.contains)
          if (missing.nonEmpty) transport.addColumns(tableId, missing)
          else transport.columns(tableId)
            .map { case (id, label) => label -> id }.toMap
      }
    // rename through the server's label→id mapping BEFORE serializing, so
    // the posted JSON keys are the accepted column ids (grist.py:228
    // recordify) — then stream ordered chunks, one in driver memory at a
    // time (the API-bounded sink contract).
    val renamed = df.toDF(cols.map(c => mapping.getOrElse(c, c)): _*)
    var n = 0L
    renamed.toJSON.toLocalIterator().asScala.grouped(chunkSize).foreach { chunk =>
      transport.postRecords(tableId, chunk)
      n += chunk.size
    }
    n
  }

  /** A table's rows as a frame of raw record-JSON strings (one per row,
    * keyed by column id) — the reference's to_dataframe up to the parse,
    * which stays distributed: pipe through [[fields]]. */
  def toDataFrame(spark: SparkSession, transport: Transport,
                  tableId: String): DataFrame =
    spark.createDataset(transport.records(tableId))(Encoders.STRING)
      .toDF("record")

  /** Distributed parse of [[toDataFrame]] records: one string column per
    * requested column id, renamed id→label through `mapping` when given
    * (the reference's columns_labels=True path). Null where a key is
    * absent — Grist rows are partial like SPARQL solutions. */
  def fields(records: DataFrame, cols: Seq[String],
             mapping: Map[String, String] = Map.empty,
             recordCol: String = "record"): DataFrame = {
    require(cols.nonEmpty, "cols must name at least one column id")
    records.select(cols.map(c =>
      get_json_object(col(recordCol), s"$$.$c").as(mapping.getOrElse(c, c))): _*)
  }

  /** The simplifions diff flow (`verticales/simplifions/diff_manager.py:
    * 37-53` get_diff) as a frame composition: per (row key, column) the
    * OLD vs NEW value where they differ, ignored columns excluded, with
    * row adds/deletes surfacing as diffs against null. Both snapshots are
    * wide frames (one column per field, e.g. two [[fields]] results or two
    * archived parquet snapshots); the melt is a `stack`, the compare one
    * full-outer join on (key, column) — no driver-side row loop, so a
    * backup diff over every table of every doc is one distributed job.
    * Values compare as strings (the JSON-cell surface the API exposes). */
  def snapshotDiff(newDf: DataFrame, oldDf: DataFrame, keyCol: String,
                   ignored: Seq[String] = Seq.empty): DataFrame = {
    def melt(df: DataFrame, valName: String): DataFrame = {
      val cols = df.columns.filterNot(c => c == keyCol || ignored.contains(c))
      require(cols.nonEmpty, "nothing to diff outside key + ignored columns")
      val pairs = cols.map(c =>
        s"'$c', cast(`$c` as string)").mkString(", ")
      df.select(col(keyCol).as("__key"),
        expr(s"stack(${cols.length}, $pairs)").as(Seq("__col", valName)))
    }
    melt(newDf, "new_value")
      .join(melt(oldDf, "old_value"), Seq("__key", "__col"), "full_outer")
      .filter(not(col("new_value") <=> col("old_value")))
      .select(col("__key").as(keyCol), col("__col").as("column"),
        col("old_value"), col("new_value"))
  }

  private implicit class IterCompat[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }
}
