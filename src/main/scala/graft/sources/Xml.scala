package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: minimal XML scan (`elections/miom_mirroring/task_functions.py:430-494`,
  * `carburants/scripts/reformat_prix.py:30-44`) without external libraries:
  * whole-file read → explode row-tag elements → per-field regex projection.
  * Suits the reference's flat record-per-element files; not a general XML
  * parser (no namespaces/nesting beyond one level).
  */
object Xml {

  /** Field spec: name → either "@attr" (attribute of the row tag) or a
    * child tag whose text content becomes the value. */
  def read(spark: SparkSession, path: String, rowTag: String,
           fields: Seq[(String, String)]): DataFrame = {
    val docs = spark.read.option("wholetext", "true").text(path)
    val elems = docs.select(
      explode(expr(s"regexp_extract_all(value, '(?s)<$rowTag(?:\\\\s[^>]*)?>.*?</$rowTag>|<$rowTag[^>]*/>', 0)"))
        .as("elem"))
    val cols = fields.map {
      case (name, spec) if spec.startsWith("@") =>
        // \s boundary so e.g. @id cannot match the tail of uuid="..."
        regexp_extract(col("elem"), s"""\\s${spec.drop(1)}="([^"]*)"""", 1).as(name)
      case (name, tag) =>
        regexp_extract(col("elem"), s"<$tag>([^<]*)</$tag>", 1).as(name)
    }
    elems.select(cols: _*)
  }
}
