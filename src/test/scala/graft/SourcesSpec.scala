package graft

import org.scalacheck.Gen

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{FetchPlanner, TupleJson}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("fetch planning: anti-join restart + bounded checkpoint batches") {
    // the reference refetches only keys missing from its results file
    // (ExternalApiResultsFetcher.py:200-274); batch size 25 per dump
    val all = (1 to 60).map(_.toString).toDF("key")
    val done = (1 to 17).map(_.toString).toDF("key")
    val pending = FetchPlanner.pendingKeys(all, done, "key")
    assert(pending.count() == 43)
    val b = FetchPlanner.batches(pending, "key", 25)
    val sizes = b.groupBy("batch_id").count().as[(Long, Long)].collect().toMap
    assert(sizes == Map(0L -> 25L, 1L -> 18L))
  }

  test("runBatch maps keys through an injected fetcher per partition") {
    val out = FetchPlanner.runBatch(Seq("a", "b").toDF("key"), "key",
        k => s"""{"k":"$k"}""")
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> """{"k":"a"}""", "b" -> """{"k":"b"}"""))
  }

  test("tuple JSON round-trip preserves triples, quads, and order") {
    val tuples = Seq(
      ("s1", "p1", "o1", null, 0L),
      ("s2", "p2", "o2", "lit2", 1L), // quad: positional (s, o, p, lit)
      ("s3", "p3", "o3", null, 2L)
    ).toDF("s", "p", "o", "lit", "ord")
    val dir = Files.createTempDirectory("tj").resolve("t.json").toString
    TupleJson.write(tuples, dir)
    val back = TupleJson.read(spark, dir).orderBy("ord")
    val rows = back.select("s", "p", "o", "lit", "valid")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4)))
    assert(rows.toSeq == Seq(
      ("s1", "p1", "o1", null, true),
      ("s2", "p2", "o2", "lit2", true),
      ("s3", "p3", "o3", null, true)))
  }

  test("invalid arities are flagged, not thrown") {
    val dir = Files.createTempDirectory("tj2")
    Files.write(dir.resolve("bad.json"),
      """{"tuples": [["s","p","o"], ["only","two"]]}""".getBytes)
    val read = TupleJson.read(spark, dir.toString + "/bad.json")
    assert(read.filter(!col("valid")).count() == 1)
    assert(read.filter(col("valid")).count() == 1)
  }

  test("tuple encode/decode are inverse over generated tuples (property)") {
    // arity-3 triples and arity-4 (s, o, p, literal) quads with arbitrary
    // alphanumeric content round-trip exactly through the positional form
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val tup = Gen.zip(word, word, word, Gen.option(word))
    val samples = Iterator.continually(tup.sample).flatten.take(120).toSeq
    val df = samples.zipWithIndex
      .map { case ((s0, p0, o0, l0), i) => (s0, p0, o0, l0, i.toLong) }
      .toDF("s", "p", "o", "lit", "ord")
    val back = df
      .select(TupleJson.decodeTuple(TupleJson.encodeTuple).as("d"), $"ord")
      .orderBy("ord")
      .select("d.s", "d.p", "d.o", "d.lit", "d.valid").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), r.getBoolean(4)))
    samples.zip(back).foreach { case ((s0, p0, o0, l0), (s1, p1, o1, l1, v)) =>
      assert((s0, p0, o0, l0) == (s1, p1, o1, l1) && v)
    }
  }

  test("direct xlsx scan equals the CSV pre-convert of the same grid") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // a minimal real workbook: shared strings (one rich-text), an
    // inline string, a formula-string result, a boolean, numerics, a
    // skipped cell, and a short row
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx")
    val xlsx = dir.resolve("schema.xlsx").toFile
    val zos = new ZipOutputStream(new java.io.FileOutputStream(xlsx))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
        |<si><t>subject</t></si>
        |<si><r><t>cell </t></r><r><t>type</t></r></si>
        |<si><t>B cell</t></si>
        |</sst>""".stripMargin)
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>count</t></is></c><c r="C1" t="str"><v>flag</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c><c r="C2" t="b"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3" t="b"><v>0</v></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><r><t>T </t></r><r><t>cell</t></r></is></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    zos.close()

    val fromXlsx = graft.sources.XlsxSource.read(spark, xlsx.getPath)
    // the CSV pre-convert of the same grid (what rounds 1-4 required)
    val csv = dir.resolve("schema.csv")
    java.nio.file.Files.writeString(csv,
      "subject,count,flag\ncell type,42,true\nB cell,,false\nT cell,,\n")
    val fromCsv = spark.read.option("header", "true").csv(csv.toString)
    assert(fromXlsx.schema == fromCsv.schema)
    assert(fromXlsx.collect().toSeq == fromCsv.collect().toSeq)

    // and the loaded sheet drives SchemaWriter exactly like the CSV path
    import spark.implicits._
    val terms = Seq(("B cell", "CL:0000236"), ("T cell", "CL:0000084"))
      .toDF("schema_name", "curie")
    val resolved = graft.writers.SchemaWriter
      .resolveCurie(fromXlsx, terms, "subject", "subject_curie")
      .select("subject", "subject_curie").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(resolved == Set(("cell type", "NA"), ("B cell", "CL:0000236"),
      ("T cell", "CL:0000084")))
  }

  test("xlsx: entirely-blank rows Excel omits from the XML are restored " +
    "from the row r index (no upward shift of later rows)") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx_blank")
    val xlsx = dir.resolve("gap.xlsx").toFile
    val zos = new ZipOutputStream(new java.io.FileOutputStream(xlsx))
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    // rows 2 and 4 are blank: Excel writes no <row> element for them
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>a</t></is></c><c r="B1" t="inlineStr"><is><t>b</t></is></c></row>
        |<row r="3"><c r="A3"><v>1</v></c><c r="B3"><v>2</v></c></row>
        |<row r="5"><c r="A5"><v>3</v></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
    val grid = graft.sources.XlsxSource.readSheet(xlsx.getPath)
    assert(grid == Vector(
      Vector("a", "b"),
      Vector(null, null),
      Vector("1", "2"),
      Vector(null, null),
      Vector("3", null)))
  }
}
