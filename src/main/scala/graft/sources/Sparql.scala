package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S12-family: SPARQL query results as an engine source. The reference
  * posts a query to an endpoint and consumes the response
  * (`geozones/task_functions.py:42-50`); the transport (HTTP POST, or the
  * [[graft.operators.Enrichment.PageFetch]] walk for LIMIT/OFFSET paging)
  * stays driver-side, and the ENGINE part — parsing the W3C SPARQL 1.1
  * JSON results format into a typed frame — runs distributed via
  * `from_json` over the raw response strings.
  */
object Sparql {

  /** W3C SPARQL 1.1 JSON results layout: head.vars + results.bindings,
    * each binding a map var → {type, value, datatype?, xml:lang?}. */
  val ResultsSchema: String =
    "struct<head: struct<vars: array<string>>, " +
      "results: struct<bindings: array<map<string, " +
      "struct<type: string, value: string, datatype: string>>>>>"

  private def parsed(recordCol: Column): Column =
    from_json(recordCol, org.apache.spark.sql.types.DataType.fromDDL(ResultsSchema))

  /** One row per solution binding, one string column per requested var
    * (null where the var is unbound — SPARQL solutions are partial).
    * `responses` carries raw response JSON strings (one or many — e.g.
    * every page of a paged walk); parsing is codegen'd `from_json`, fully
    * distributed over the response frame. */
  def bindings(responses: DataFrame, vars: Seq[String],
               recordCol: String = "record"): DataFrame = {
    require(vars.nonEmpty, "vars must name at least one projection variable")
    val rows = responses
      .select(parsed(col(recordCol)).as("__r"))
      .select(explode(col("__r.results.bindings")).as("__b"))
    rows.select(vars.map(v => col("__b")(v)("value").as(v)): _*)
  }
}
