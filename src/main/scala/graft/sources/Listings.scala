package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S13-family: remote tree listings (FTP/SFTP/HTTP-index) as an engine
  * source. The reference walks an FTP tree, compares file mtimes against
  * per-key state, and processes only fresh files
  * (`meteo/ftp_processing/task_functions.py:165-257`). Here the WALK is
  * the engine operator — the transport (one directory listing per call)
  * stays a pluggable client, like [[graft.operators.Enrichment.PageFetch]]
  * for paginated APIs; the result is a metadata-sized frame that composes
  * with `Writers.freshSourcesOnly` (St6) for the recency filter and with
  * `Writers.newFilesOnly` (St2) for the seen-registry.
  */
object Listings {

  /** One listing entry as the transport reports it. `mtime` is epoch
    * micros (the engine-wide timestamp convention). */
  final case class Entry(path: String, isDir: Boolean, size: Long, mtime: Long)

  /** Breadth-first tree walk over the listing transport: cycle-guarded
    * (symlinked loops list once), bounded by `maxDirs`. The walk is
    * inherently sequential per directory (each listing names the next
    * level) and runs driver-side exactly like the reference; listings are
    * metadata-sized, never data-scale.
    * @return (path, size, mtime_us) — files only. */
  def walkTree(spark: SparkSession, fetch: String => Seq[Entry], root: String,
               maxDirs: Int = 100000): DataFrame = {
    val files = scala.collection.mutable.ArrayBuffer[Entry]()
    val queue = scala.collection.mutable.Queue(root)
    val seen = scala.collection.mutable.HashSet[String]()
    while (queue.nonEmpty && seen.size < maxDirs) {
      val dir = queue.dequeue()
      if (seen.add(dir)) fetch(dir).foreach { e =>
        if (e.isDir) queue.enqueue(e.path) else files += e
      }
    }
    import spark.implicits._
    files.toSeq.map(e => (e.path, e.size, e.mtime)).toDF("path", "size", "mtime_us")
  }
}
