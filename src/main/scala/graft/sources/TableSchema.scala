package graft.sources

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Table-Schema (frictionless) JSON → Spark schema converter — the
  * schema.data.gouv.fr ingestion edge the consolidation pipeline starts from
  * (`schema/utils/consolidation.py:881-893`: field list,
  * `constraints.required`, `primaryKey`).
  *
  * Types follow the frictionless spec; unknown/complex types (geopoint,
  * geojson, object, array) stay raw strings, matching the reference's
  * read-everything-as-string ingestion (`consolidation.py:936` `dtype=str`)
  * while still typing the common scalars for downstream Spark use.
  */
object TableSchema {

  final case class Parsed(schema: StructType, requiredCols: Seq[String],
                          primaryKey: Seq[String])

  private val typeMap: Map[String, DataType] = Map(
    "string" -> StringType,
    "integer" -> LongType,
    "number" -> DoubleType,
    "boolean" -> BooleanType,
    "date" -> DateType,
    "datetime" -> TimestampType,
    "year" -> IntegerType)

  /** Parse a Table-Schema JSON document. */
  def parse(json: String): Parsed = {
    val root = JsonMethods.parse(json)
    val fields = (root \ "fields") match {
      case JArray(fs) => fs
      case _ => throw new IllegalArgumentException("Table-Schema: no fields array")
    }
    val structFields = fields.map { f =>
      val name = (f \ "name") match {
        case JString(s) => s
        case _ => throw new IllegalArgumentException("Table-Schema: field without name")
      }
      val tpe = (f \ "type") match {
        case JString(t) => typeMap.getOrElse(t, StringType)
        case _ => StringType
      }
      val required = (f \ "constraints" \ "required") match {
        case JBool(b) => b
        case _ => false
      }
      StructField(name, tpe, nullable = !required)
    }
    val required = structFields.filterNot(_.nullable).map(_.name)
    val pk = (root \ "primaryKey") match {
      case JString(s) => Seq(s)
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    Parsed(StructType(structFields), required, pk)
  }

  /** Parse from a local file path. */
  def fromFile(path: String): Parsed =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
