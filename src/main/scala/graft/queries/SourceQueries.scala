package graft.queries

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.{Readers, Xlsx, Xml}

/** File-format reader queries (S4 xlsx / S5 fixed-width / S7 xml) under the
  * DuckDB oracle gate. Each query materializes a fixture FROM the sf
  * parquet tables driver-side, reads it back through the reader under
  * test, and aggregates; the oracle runs the same aggregate over the
  * parquet table directly — so a parsing defect anywhere in the reader
  * surfaces as a value mismatch, end-to-end through the driver's gate
  * (previously these readers had ScalaTest evidence only).
  *
  * The fixture write is verification scaffolding, deliberately driver-side
  * and small (nation/supplier/customer); the operator under test is the
  * distributed READ path.
  */
object SourceQueries {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fresh per-(query, sfDir) fixture directory under java.io.tmpdir. */
  private def fixtureDir(name: String, sfDir: String): File = {
    val safe = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val d = new File(new File(sys.props("java.io.tmpdir")), s"graft-srcgate-$safe/$name")
    if (d.exists()) {
      d.listFiles().foreach(_.delete())
    } else d.mkdirs()
    d
  }

  /** Per-JVM memo so each driver-side fixture is written ONCE per
    * (query, sfDir): the query fn builds on first call (Verify runs with
    * no setup), while Bench's untimed setup pre-warms the same memo so
    * the timed window measures only the distributed READ + aggregate —
    * never the fixture write (r12 verdict item 6). */
  private val fixtureMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def memoFixture(name: String, sfDir: String)(build: File => Unit): String =
    fixtureMemo.computeIfAbsent(s"$name|$sfDir", { _ =>
      val dir = fixtureDir(name, sfDir)
      build(dir)
      dir.getAbsolutePath
    })

  /** Minimal xlsx writer (zip of OOXML parts, inlineStr cells) — the
    * fixture-side counterpart of [[graft.sources.Xlsx]]. Sheets are
    * (tabName, rows including header) in tab order. */
  private[queries] def writeXlsx(file: File, sheets: Seq[(String, Seq[Seq[String]])]): Unit = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    val wbSheets = sheets.zipWithIndex.map { case ((tab, _), i) =>
      s"""<sheet name="${xmlEscape(tab)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    put("xl/workbook.xml",
      s"""<?xml version="1.0"?><workbook><sheets>$wbSheets</sheets></workbook>""")
    val rels = sheets.indices.map { i =>
      s"""<Relationship Id="rId${i + 1}" Type="w" Target="worksheets/sheet${i + 1}.xml"/>"""
    }.mkString
    put("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0"?><Relationships>$rels</Relationships>""")
    sheets.zipWithIndex.foreach { case ((_, rows), i) =>
      val body = rows.zipWithIndex.map { case (cells, r) =>
        val cs = cells.map(v =>
          s"""<c t="inlineStr"><is><t>${xmlEscape(v)}</t></is></c>""").mkString
        s"""<row r="${r + 1}">$cs</row>"""
      }.mkString
      put(s"xl/worksheets/sheet${i + 1}.xml",
        s"""<?xml version="1.0"?><worksheet><sheetData>$body</sheetData></worksheet>""")
    }
    zos.close()
    val out = new FileOutputStream(file)
    try out.write(bos.toByteArray) finally out.close()
  }

  val all: Seq[Q] = Seq(

    // S4: nation → two-sheet xlsx (decoy tab first, so selection must
    // resolve the named tab) → Xlsx.read → aggregate. Fixture build is
    // memoized + setup-prewarmed so the timed window is the READ path.
    Q("src1_xlsx_scan",
      (s, d) => {
        val dir = src1Fixture(s, d)
        Xlsx.read(s, s"$dir/nation.xlsx", Xlsx.Sheet.ByName("data"))
          .select(col("n_regionkey").cast("long").as("region"),
            col("n_name"), col("n_nationkey").cast("long").as("nk"))
          .groupBy("region")
          .agg(count(lit(1)).as("n_nations"), sum(col("nk")).as("sum_key"),
            min(col("n_name")).as("first_nation"))
          .orderBy("region")
      },
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS region, COUNT(*) AS n_nations,
             |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key, MIN(n_name) AS first_nation
             |FROM nation GROUP BY 1 ORDER BY region""".stripMargin),
      setup = Some((s, d) => { src1Fixture(s, d); () })),

    // S5: supplier → left-justified fixed-width lines (key 10, name 30,
    // nationkey 5) → Readers.fixedWidth → aggregate.
    Q("src2_fixed_width_scan",
      (s, d) => {
        val dir = src2Fixture(s, d)
        Readers.fixedWidth(s, s"$dir/supplier.txt",
          Seq(("s_suppkey", 0, 10), ("s_name", 10, 30), ("s_nationkey", 40, 5)))
          .select(col("s_nationkey").cast("long").as("nation"),
            col("s_suppkey").cast("long").as("sk"), col("s_name"))
          .groupBy("nation")
          .agg(count(lit(1)).as("n_sup"), sum(col("sk")).as("sum_key"),
            min(col("s_name")).as("first_name"))
          .orderBy("nation")
      },
      Some("""SELECT CAST(s_nationkey AS BIGINT) AS nation, COUNT(*) AS n_sup,
             |  CAST(SUM(s_suppkey) AS BIGINT) AS sum_key, MIN(s_name) AS first_name
             |FROM supplier GROUP BY 1 ORDER BY nation""".stripMargin),
      setup = Some((s, d) => { src2Fixture(s, d); () })),

    // S7: customer → record-per-element xml (id as attribute, fields as
    // child tags) → Xml.read → aggregate. The fixture collect is BOUNDED
    // (c_custkey <= 5000, deterministic at every SF — the same keys exist
    // everywhere) so the driver-side write can never grow with the corpus;
    // the oracle applies the same key cut.
    Q("src3_xml_scan",
      (s, d) => {
        val dir = src3Fixture(s, d)
        Xml.read(s, s"$dir/customer.xml", "row",
          Seq(("id", "@id"), ("name", "name"), ("mkt", "mkt")))
          .select(col("mkt"), col("id").cast("long").as("idl"), col("name"))
          .groupBy("mkt")
          .agg(count(lit(1)).as("n_cust"), sum(col("idl")).as("sum_id"),
            min(col("name")).as("first_name"))
          .orderBy("mkt")
      },
      Some("""SELECT c_mktsegment AS mkt, COUNT(*) AS n_cust,
             |  CAST(SUM(c_custkey) AS BIGINT) AS sum_id, MIN(c_name) AS first_name
             |FROM customer WHERE c_custkey <= 5000
             |GROUP BY 1 ORDER BY mkt""".stripMargin),
      setup = Some((s, d) => { src3Fixture(s, d); () })),

    // ORC round-trip: orders → distributed zstd ORC write → distributed ORC
    // read → aggregate. Unlike src1–src3 (driver-side fixtures feeding a
    // custom reader), both sides here are Spark's native columnar path —
    // the query proves the whole sink+source round-trip preserves values,
    // against the parquet twin in DuckDB.
    Q("src4_orc_roundtrip",
      (s, d) => {
        val dir = fixtureDir("src4", d)
        val path = s"$dir/orders_orc"
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
          .write.mode("overwrite").option("compression", "zstd").orc(path)
        s.read.orc(path)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            QH.moneySum(col("o_totalprice")).as("rev"),
            min(col("o_orderkey")).as("first_key"))
          .orderBy("o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
             |  ${QH.sqlMoneySum("o_totalprice")} AS rev,
             |  MIN(o_orderkey) AS first_key
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // Avro container round-trip — Spark ships avro-core but not the
    // spark-avro datasource, so graft.sources.Avro is the dependency-light
    // path: distributed per-container parse over binaryFile rows (the
    // Xlsx/Xls precedent), one container per partition on the sink side.
    // The aggregate proves the whole sink+source round-trip preserves
    // values against the parquet twin in DuckDB.
    Q("src6_avro_roundtrip",
      (s, d) => {
        val dir = fixtureDir("src6", d)
        val path = s"$dir/orders_avro"
        graft.sources.Avro.write(
          Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice"),
          path)
        graft.sources.Avro.read(s, s"$path/*.avro")
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orders"),
            QH.moneySum(col("o_totalprice")).as("rev"),
            min(col("o_orderkey")).as("first_key"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
             |  ${QH.sqlMoneySum("o_totalprice")} AS rev,
             |  MIN(o_orderkey) AS first_key
             |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // S4 legacy: region → a REAL BIFF8 .xls inside an OLE2 compound file
    // (decoy tab first, numbers as NUMBER records, names via the shared
    // string table) → magic-dispatched pure-JDK Xls reader → aggregate.
    Q("src5_xls_scan",
      (s, d) => {
        val dir = src5Fixture(s, d)
        Xlsx.read(s, s"$dir/region.xls", Xlsx.Sheet.ByName("data"))
          .select(col("r_regionkey").cast("long").as("rk"), col("r_name"))
          .groupBy((col("rk") % 2).as("parity"))
          .agg(count(lit(1)).as("n_regions"), sum(col("rk")).as("sum_key"),
            min(col("r_name")).as("first_region"))
          .orderBy("parity")
      },
      Some("""SELECT CAST(r_regionkey % 2 AS BIGINT) AS parity, COUNT(*) AS n_regions,
             |  CAST(SUM(r_regionkey) AS BIGINT) AS sum_key, MIN(r_name) AS first_region
             |FROM region GROUP BY 1 ORDER BY parity""".stripMargin),
      setup = Some((s, d) => { src5Fixture(s, d); () }))
  )

  /** src1: nation → two-sheet xlsx (decoy first). */
  private def src1Fixture(s: SparkSession, d: String): String =
    memoFixture("src1", d) { dir =>
      val rows = Tables.nation(s, d)
        .orderBy("n_nationkey")
        .select(col("n_nationkey").cast("string"), col("n_name"),
          col("n_regionkey").cast("string"))
        .collect()
        .map(r => Seq(r.getString(0), r.getString(1), r.getString(2))).toSeq
      writeXlsx(new File(dir, "nation.xlsx"),
        Seq("résumé" -> Seq(Seq("decoy"), Seq("1")),
          "data" -> (Seq(Seq("n_nationkey", "n_name", "n_regionkey")) ++ rows)))
    }

  /** src2: supplier → left-justified fixed-width lines (10/30/5). */
  private def src2Fixture(s: SparkSession, d: String): String =
    memoFixture("src2", d) { dir =>
      val lines = Tables.supplier(s, d)
        .orderBy("s_suppkey")
        .select(col("s_suppkey").cast("string"), col("s_name"),
          col("s_nationkey").cast("string"))
        .collect()
        .map(r => r.getString(0).padTo(10, ' ') + r.getString(1).padTo(30, ' ') +
          r.getString(2).padTo(5, ' '))
      java.nio.file.Files.write(new File(dir, "supplier.txt").toPath,
        lines.mkString("\n").getBytes(UTF_8))
    }

  /** src3: customer (c_custkey <= 5000 — bounded at every SF) →
    * record-per-element xml. */
  private def src3Fixture(s: SparkSession, d: String): String =
    memoFixture("src3", d) { dir =>
      val recs = Tables.customer(s, d)
        .filter(col("c_custkey") <= 5000)
        .orderBy("c_custkey")
        .select(col("c_custkey").cast("string"), col("c_name"), col("c_mktsegment"))
        .collect()
        .map(r => s"""<row id="${r.getString(0)}"><name>${xmlEscape(r.getString(1))}</name>""" +
          s"""<mkt>${xmlEscape(r.getString(2))}</mkt></row>""")
      java.nio.file.Files.write(new File(dir, "customer.xml").toPath,
        ("<rows>" + recs.mkString("\n") + "</rows>").getBytes(UTF_8))
    }

  /** src5: region → a real BIFF8 .xls in an OLE2 compound file. */
  private def src5Fixture(s: SparkSession, d: String): String =
    memoFixture("src5", d) { dir0 =>
      import graft.sources.XlsWriter
      val rows = Tables.region(s, d)
        .orderBy("r_regionkey")
        .select(col("r_regionkey").cast("double"), col("r_name"))
        .collect()
        .map(r => (r.getDouble(0), r.getString(1))).toSeq
      val names = rows.map(_._2)
      val header = XlsWriter.label(0, 0, "r_regionkey") ++ XlsWriter.label(0, 1, "r_name")
      val body = rows.zipWithIndex.flatMap { case ((k, _), i) =>
        XlsWriter.number(i + 1, 0, k) ++ XlsWriter.labelSst(i + 1, 1, i)
      }.toArray
      val bytes = XlsWriter.xlsFile(
        Seq("decoy" -> XlsWriter.label(0, 0, "x"), "data" -> (header ++ body)),
        sst = names)
      java.nio.file.Files.write(new File(dir0, "region.xls").toPath, bytes)
    }
}
