package graft

/** The driver smoke-checks SparkEntry.entry rows>0 on sf0.001 — keep that
  * guarantee in CI, plus the rollup-grain shape it promises.
  */
class EntrySpec extends SparkSpec {

  test("flagship entry returns rolled-up rows at all three grains") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // ROLLUP produces the grand-total row and at least one per-region row
    assert(rows.exists(r => r.getString(0) == "ALL" && r.getString(1) == "ALL"))
    assert(rows.exists(r => r.getString(0) != "ALL" && r.getString(2) == "ALL"))
    assert(rows.exists(r => r.getString(2) != "ALL"))
  }

  test("every catalog query carries a DuckDB oracle") {
    // If a legitimately non-SQL-expressible operator ever lands, add it to
    // this allowlist WITH the reason — the driver silently downgrades
    // oracle-less queries to a rows-only check.
    val allowedNoOracle = Set.empty[String]
    val noOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- allowedNoOracle
    assert(noOracle.isEmpty,
      s"queries without DuckDB oracle (driver downgrades to rows-only): $noOracle")
  }

  test("catalog query names are unique (toMap would silently shadow a duplicate)") {
    val names = SparkEntry.catalog.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }
    assert(dups.isEmpty, s"duplicate catalog names: $dups")
    assert(names.size === SparkEntry.queries.size)
  }
}
