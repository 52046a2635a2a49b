package graft.sources

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.pipelines.Consolidation

/** Table-Schema JSON → StructType conversion plus the end-to-end feed into
  * the consolidation pipeline (the reference's schema.data.gouv.fr edge).
  */
class TableSchemaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parsed = TableSchema.fromFile(
    getClass.getResource("/irve-tableschema.json").getPath)

  test("maps frictionless types to Spark types, geopoint stays string") {
    val byName = parsed.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("id_pdc_itinerance") == StringType)
    assert(byName("puissance_nominale") == DoubleType)
    assert(byName("nbre_pdc") == LongType)
    assert(byName("prise_type_2") == BooleanType)
    assert(byName("date_mise_en_service") == DateType)
    assert(byName("derniere_modification") == TimestampType)
    assert(byName("coordonneesXY") == StringType)
    assert(parsed.schema.fields.map(_.name).toSeq == Seq("id_pdc_itinerance",
      "nom_operateur", "puissance_nominale", "nbre_pdc", "prise_type_2",
      "date_mise_en_service", "derniere_modification", "coordonneesXY"))
  }

  test("required columns come from constraints.required, primaryKey from root") {
    assert(parsed.requiredCols == Seq("id_pdc_itinerance", "puissance_nominale",
      "prise_type_2"))
    assert(parsed.primaryKey == Seq("id_pdc_itinerance"))
    assert(!parsed.schema("id_pdc_itinerance").nullable)
    assert(parsed.schema("nom_operateur").nullable)
  }

  test("parsed schema drives consolidate: projection, required-null drop, pk dedup") {
    // producer A: strings only (the reference's dtype=str ingestion), extra col
    val a = Seq(
      ("FRA1", "OpA", "22.0", "true", "junk", 1L),
      ("FRA2", "OpA", null, "false", "junk", 1L) // null required -> dropped
    ).toDF("id_pdc_itinerance", "nom_operateur", "puissance_nominale",
      "prise_type_2", "not_in_schema", "ts")
    // producer B: same pk as FRA1, newer -> wins the dedup
    val b = Seq(("FRA1", "OpB", "50.0", "true", 2L))
      .toDF("id_pdc_itinerance", "nom_operateur", "puissance_nominale",
        "prise_type_2", "ts")
    val schemaWithTs = StructType(parsed.schema.fields :+ StructField("ts", LongType))
    val out = Consolidation.consolidate(Seq(a, b), schemaWithTs,
      parsed.requiredCols, parsed.primaryKey, "ts")
    val rows = out.select("id_pdc_itinerance", "nom_operateur", "puissance_nominale")
      .as[(String, String, Double)].collect().toSeq
    assert(rows == Seq(("FRA1", "OpB", 50.0)))
    assert(!out.columns.contains("not_in_schema"))
  }
}
