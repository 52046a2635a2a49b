package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hilbert, NormAdresse, NormAdresseFixtures, NormAdresseFull, PolygonContains}
import QH._

/** Geospatial + address-normalization inventory (J13, F23, F9): custom
  * Catalyst expressions (point-in-polygon, Hilbert index) exercised as
  * oracle-checked queries. The DuckDB twins are generated from the same
  * literals/rule tables, iterating edges in the same order for bit parity.
  */
object GeoQueries {

  /** Test pentagon (x: 0–330 value axis, y: 0–100 user axis). */
  private val Poly = Seq((50.0, 10.0), (300.0, 5.0), (320.0, 80.0), (150.0, 95.0), (20.0, 60.0))

  private def dPointInPoly(x: String, y: String,
                           poly: Seq[(Double, Double)] = Poly): String = {
    val px = poly.map(_._1).mkString("[", ", ", "]")
    val py = poly.map(_._2).mkString("[", ", ", "]")
    val n = poly.size
    s"""(len(list_filter(range(1, ${n + 1}), i ->
       |  (($py[i] > $y) <> ($py[(i % $n) + 1] > $y)) AND
       |  ($x < ($px[(i % $n) + 1] - $px[i]) * ($y - $py[i])
       |        / ($py[(i % $n) + 1] - $py[i]) + $px[i]))) % 2 = 1)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    // J13: point-in-polygon spatial membership as a per-row projection —
    // the polygon is driver-known, so no join materializes.
    Q("j13_point_in_polygon",
      (s, d) => Tables.events(s, d)
        .withColumn("inside", PolygonContains.pointInPolygon(
          col("value"), (col("user_id") % 100).cast("double"), Poly))
        .groupBy("event_type", "inside").agg(count(lit(1)).as("cnt"))
        .orderBy("event_type", "inside"),
      Some(s"""SELECT event_type, ${dPointInPoly("value", "CAST(user_id % 100 AS DOUBLE)")} AS inside,
               |  COUNT(*) AS cnt
               |FROM events GROUP BY 1, 2 ORDER BY event_type, inside""".stripMargin)),

    // F23: Hilbert cell index over a 4x4 grid (order 2). The oracle CASE
    // table is generated from the same Hilbert.index function, so any
    // engine disagreement in the curve itself would surface as a mismatch.
    Q("f23_hilbert_cells",
      (s, d) => {
        val cx = floor(col("value") / 330.0 * 4).cast("long")
        val cy = (col("user_id") % 4).cast("long")
        Tables.events(s, d)
          .withColumn("d", Hilbert.hilbert(least(cx, lit(3L)), cy, 2))
          .groupBy("d").agg(count(lit(1)).as("cnt"))
          .orderBy("d")
      },
      Some {
        val cases = (for { x <- 0 to 3; y <- 0 to 3 }
          yield s"WHEN cx = $x AND cy = $y THEN ${Hilbert.index(2, x, y)}").mkString(" ")
        s"""SELECT CAST((CASE $cases END) AS BIGINT) AS d, COUNT(*) AS cnt
           |FROM (SELECT LEAST(CAST(FLOOR(value / 330.0 * 4) AS BIGINT), 3) AS cx,
           |        CAST(user_id % 4 AS BIGINT) AS cy FROM events)
           |GROUP BY 1 ORDER BY d""".stripMargin
      }),

    // F9: normadresse-style abbreviation over synthetic French addresses.
    Q("f9_normadresse",
      (s, d) => {
        val way = when(col("c_custkey") % 4 === 0, "RUE")
          .when(col("c_custkey") % 4 === 1, "AVENUE")
          .when(col("c_custkey") % 4 === 2, "BOULEVARD").otherwise("PLACE")
        val addr = concat(col("c_custkey").cast("string"), lit(" "), way,
          lit(" DE LA RÉPUBLIQUE"))
        Tables.customer(s, d)
          .select(col("c_custkey"), addr.as("addr"),
            NormAdresse.normadresse(addr).as("norm"))
          .orderBy("c_custkey")
      },
      Some {
        val addrSql = "CAST(c_custkey AS VARCHAR) || ' ' || " +
          "(CASE c_custkey % 4 WHEN 0 THEN 'RUE' WHEN 1 THEN 'AVENUE' " +
          "WHEN 2 THEN 'BOULEVARD' ELSE 'PLACE' END) || ' DE LA RÉPUBLIQUE'"
        s"""SELECT c_custkey, $addrSql AS addr, ${NormAdresse.oracleSql(addrSql)} AS norm
           |FROM customer ORDER BY c_custkey""".stripMargin
      }),

    // F9 full parity: the 8-stage, 341-rule abbreviator
    // (`insee/sirene/geocodage/scripts/normadresse.py:23-226`) as a codegen'd
    // Catalyst expression, over the reference's own golden fixture addresses
    // keyed by nation. The staged rewriter is not SQL-expressible, so the
    // oracle embeds driver-computed expected values (the f23 CASE-table
    // pattern); engine-vs-reference parity is separately pinned by
    // NormAdresseFullSpec replaying all 41 published golden pairs.
    Q("f9b_normadresse_full",
      (s, d) => {
        val addrs = NormAdresseFixtures.inputs
        val arr = array(addrs.map(lit): _*)
        Tables.nation(s, d)
          .select(col("n_nationkey"),
            element_at(arr, col("n_nationkey") % addrs.size + 1).as("addr"))
          .withColumn("norm", NormAdresseFull.normadresseFull(col("addr")))
          .orderBy("n_nationkey")
      },
      Some {
        def q(s: String) = s.replace("'", "''")
        val ins = NormAdresseFixtures.inputs.map(c => s"'${q(c)}'")
          .mkString("[", ", ", "]")
        val outs = NormAdresseFixtures.inputs
          .map(c => s"'${q(NormAdresseFull.abrev(c))}'")
          .mkString("[", ", ", "]")
        val idx = s"n_nationkey % ${NormAdresseFixtures.inputs.size} + 1"
        s"""SELECT n_nationkey, ($ins)[$idx] AS addr, ($outs)[$idx] AS norm
           |FROM nation ORDER BY n_nationkey""".stripMargin
      }),

    // Coordinate-order repair (geo.py:32-66): synthetic [lat, lon] /
    // [lon, lat] JSON strings from nation keys; the operator swaps exactly
    // the pairs whose REVERSAL lands in a France bbox (ray-cast through the
    // codegen'd PolygonContains) and extracts lon/lat. The oracle replays
    // the textual token swap AND the same ray-cast (dPointInPoly over every
    // bbox) — number tokens are integer-derived text, lon/lat parse to
    // exact dyadic doubles on both engines (per-row, no aggregation).
    Q("geo1_fix_coordinates",
      (s, d) => {
        val nk = col("n_nationkey")
        val latTxt = concat((lit(42) + nk % 8).cast("string"), lit(".25"))
        val lonTxt = concat((nk % 5).cast("string"), lit(".5"))
        val coords = when(nk % 2 === 1,
          concat(lit("["), latTxt, lit(", "), lonTxt, lit("]")))
          .otherwise(concat(lit("["), lonTxt, lit(", "), latTxt, lit("]")))
        val raw = Tables.nation(s, d).select(nk.as("nk"), coords.as("coordonneesXY"))
        graft.sources.GeoWriter.createLonLatCols(
          graft.sources.GeoWriter.fixCoordinatesOrder(raw))
          .select(col("nk"), col("coordonneesXY"),
            col("consolidated_coordinates_reordered").as("reordered"),
            col("consolidated_longitude").as("lon"),
            col("consolidated_latitude").as("lat"))
          .orderBy("nk")
      },
      Some {
        val inFrance = graft.sources.GeoWriter.FranceBboxes
          .map(b => dPointInPoly("c2", "c1", b)).mkString("(", " OR ", ")")
        s"""WITH n AS (SELECT n_nationkey AS nk,
           |    CAST(42 + n_nationkey % 8 AS VARCHAR) || '.25' AS lat_txt,
           |    CAST(n_nationkey % 5 AS VARCHAR) || '.5' AS lon_txt FROM nation),
           |raw AS (SELECT nk, CASE WHEN nk % 2 = 1
           |    THEN '[' || lat_txt || ', ' || lon_txt || ']'
           |    ELSE '[' || lon_txt || ', ' || lat_txt || ']' END AS coords FROM n),
           |parsed AS (SELECT nk, coords,
           |    regexp_extract(coords, '^\\s*\\[\\s*(.+?)\\s*,\\s*(.+?)\\s*\\]\\s*$$', 1) AS t1,
           |    regexp_extract(coords, '^\\s*\\[\\s*(.+?)\\s*,\\s*(.+?)\\s*\\]\\s*$$', 2) AS t2 FROM raw),
           |flag AS (SELECT nk, coords, t1, t2,
           |    CAST(t1 AS DOUBLE) AS c1, CAST(t2 AS DOUBLE) AS c2,
           |    $inFrance AS reordered FROM parsed)
           |SELECT nk,
           |  CASE WHEN reordered THEN '[' || t2 || ', ' || t1 || ']' ELSE coords END
           |    AS "coordonneesXY",
           |  reordered,
           |  CASE WHEN reordered THEN c2 ELSE c1 END AS lon,
           |  CASE WHEN reordered THEN c1 ELSE c2 END AS lat
           |FROM flag ORDER BY nk""".stripMargin
      }),

    // Geozones closest-exported-parent (`geozones/task_functions.py:149-164`)
    // over the real customer→nation→region FK hierarchy, with odd nations
    // playing the filtered-out level (the reference's canton/arrondissement):
    // customers under an odd nation climb through it to their region.
    Q("h1_closest_exported_parent",
      (s, d) => {
        val custEdges = Tables.customer(s, d)
          .select(concat(lit("c:"), col("c_custkey")).as("child"),
            concat(lit("n:"), col("c_nationkey")).as("parent"))
        val natEdges = Tables.nation(s, d)
          .select(concat(lit("n:"), col("n_nationkey")).as("child"),
            concat(lit("r:"), col("n_regionkey")).as("parent"))
        val edges = custEdges.unionByName(natEdges)
        val exported = custEdges.select(col("child").as("id"))
          .unionByName(Tables.nation(s, d).filter(col("n_nationkey") % 2 === 0)
            .select(concat(lit("n:"), col("n_nationkey")).as("id")))
          .unionByName(Tables.region(s, d)
            .select(concat(lit("r:"), col("r_regionkey")).as("id")))
        val parents = graft.operators.Hierarchy.closestExportedParents(
          edges, "child", "parent", exported, "id")
          // reference computes parents only FOR exported ids (task_functions.py:168)
          .join(exported, col("node") === col("id"), "left_semi")
        graft.operators.Hierarchy.parentList(parents).orderBy("node")
      },
      Some(
        """WITH n AS (SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation),
          |cust AS (SELECT 'c:' || c_custkey AS node,
          |           CASE WHEN n.nk % 2 = 0 THEN 'n:' || n.nk
          |                ELSE 'r:' || n.rk END AS parent
          |         FROM customer JOIN n ON c_nationkey = n.nk),
          |nat AS (SELECT 'n:' || nk AS node, 'r:' || rk AS parent FROM n WHERE nk % 2 = 0),
          |allp AS (SELECT node, parent FROM cust UNION SELECT node, parent FROM nat)
          |SELECT node, array_to_string(list_sort(list(DISTINCT parent)), '|') AS parents
          |FROM allp GROUP BY node ORDER BY node""".stripMargin)),

    // Geozones transitive-closure ancestors (`geozones/task_functions.py:
    // 53-177`, the denormalized `ancestors` arrays): path-doubling
    // self-join to fixpoint (Hierarchy.transitiveClosure) over the full
    // customer→nation→region FK hierarchy, flattened to h1's pipe-joined
    // flat-scalar form. The oracle replays it as a recursive CTE — any
    // depth, not just this geography's 2 levels, so the closure SEMANTICS
    // are gated, not the unrolled special case.
    Q("h2_ancestors",
      (s, d) => {
        val custEdges = Tables.customer(s, d)
          .select(concat(lit("c:"), col("c_custkey")).as("child"),
            concat(lit("n:"), col("c_nationkey")).as("parent"))
        val natEdges = Tables.nation(s, d)
          .select(concat(lit("n:"), col("n_nationkey")).as("child"),
            concat(lit("r:"), col("n_regionkey")).as("parent"))
        val closure = graft.operators.Hierarchy.transitiveClosure(
          custEdges.unionByName(natEdges), "child", "parent")
        graft.operators.Hierarchy.ancestorArrays(closure)
          .withColumn("ancestors", array_join(col("ancestors"), "|"))
          .orderBy("node")
      },
      Some(
        """WITH RECURSIVE e AS (
          |  SELECT 'c:' || c_custkey AS node, 'n:' || c_nationkey AS anc
          |  FROM customer
          |  UNION ALL
          |  SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation),
          |anc AS (
          |  SELECT node, anc FROM e
          |  UNION
          |  SELECT a.node, e.anc FROM anc a JOIN e ON a.anc = e.node)
          |SELECT node, array_to_string(list_sort(list(DISTINCT anc)), '|') AS ancestors
          |FROM anc GROUP BY node ORDER BY node""".stripMargin)),

    // Geohash spatial binning — the other standard space-filling cell key
    // next to Hilbert (f23): 4-char geohash (20 bits — lon bit i at cell
    // bit 2i+1, lat bit i at 2i, base32 per 5 bits from the top) over
    // synthetic 10-bit coordinates from integer event fields. The
    // interleave and base32 lookup are pure integer bit ops + substring —
    // BOTH engines evaluate the identical formula (generated once with
    // per-dialect shift spelling), so the cell string can never drift;
    // the only double is floor(value·2¹⁰/330), an exact floor of a
    // deterministic IEEE product. Per-cell counts = ONE map-side-combined
    // aggregation keyed on the cell — the geo-sharding shape S17/layout3
    // write with.
    Q("geo2_geohash_cells",
      (s, d) => Tables.events(s, d)
        .select(col("user_id"),
          expr("cast(least(greatest(floor(value / cast(330 as double)" +
            " * cast(1024 as double)), cast(0 as double))," +
            " cast(1023 as double)) as bigint)").as("cx"),
          expr("cast(user_id % 1024 as bigint)").as("cy"))
        .withColumn("cell", expr(geohashInterleave(spark = true)))
        .withColumn("gh", expr(geohashBase32("cell", spark = true)))
        .groupBy("gh")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy("gh"),
      Some {
        s"""WITH pts AS (SELECT user_id,
           |    CAST(least(greatest(floor(value / CAST(330 AS DOUBLE)
           |      * CAST(1024 AS DOUBLE)), CAST(0 AS DOUBLE)),
           |      CAST(1023 AS DOUBLE)) AS BIGINT) AS cx,
           |    CAST(user_id % 1024 AS BIGINT) AS cy
           |  FROM events),
           |cells AS (SELECT user_id, ${geohashInterleave(spark = false)} AS cell
           |          FROM pts),
           |gh AS (SELECT user_id, ${geohashBase32("cell", spark = false)} AS gh
           |       FROM cells)
           |SELECT gh, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
           |FROM gh GROUP BY gh ORDER BY gh""".stripMargin
      })
  )

  /** 20-bit lon/lat interleave over columns `cx`, `cy` (10 bits each):
    * lon bit i lands at cell bit 2i+1, lat bit i at 2i — the standard
    * geohash layout for an even char count. Generated per dialect
    * (shiftleft/shiftright vs <</>>) from ONE formula. */
  private def geohashInterleave(spark: Boolean): String = {
    def shl(e: String, n: Int) = if (spark) s"shiftleft($e, $n)" else s"($e << $n)"
    def shr(e: String, n: Int) = if (spark) s"shiftright($e, $n)" else s"($e >> $n)"
    (0 until 10).map(i =>
      s"${shl(s"(${shr("cx", i)} & 1)", 2 * i + 1)} + ${shl(s"(${shr("cy", i)} & 1)", 2 * i)}")
      .mkString("(", " + ", ")")
  }

  /** Base32 geohash alphabet render of a 20-bit cell: 4 chars, 5 bits
    * each from the top. */
  private def geohashBase32(cell: String, spark: Boolean): String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    (0 until 4).map { j =>
      val sh = 15 - 5 * j
      if (spark)
        s"substring('$alpha', cast((shiftright($cell, $sh) & 31) as int) + 1, 1)"
      else
        s"substr('$alpha', CAST((($cell >> $sh) & 31) AS INTEGER) + 1, 1)"
    }.mkString("concat(", ", ", ")")
  }
}
