package graft.sources

import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Direct `.xlsx` workbook scan (SURVEY §2 S6 — the reference loads its
 * schema workbook straight from Excel, CellKnSchemaUtilities.py:28-29;
 * until now this engine required a CSV pre-convert). An xlsx file is a
 * zip of XML parts, so the JDK alone suffices: `java.util.zip` for the
 * container and StAX (already the OWL scan's parser) for the sheet
 * XML — no new dependency.
 *
 * Scope: the reference's usage — a small hand-maintained schema
 * workbook read as strings. Cell types handled: shared strings
 * (`t="s"`, including rich-text runs), inline strings
 * (`t="inlineStr"`), formula-string results (`t="str"`), booleans
 * (`t="b"` → true/false), and raw numeric text. Absent cells inside a
 * row become nulls, exactly as the CSV pre-convert produced
 * (spec-pinned ≡ `spark.read.csv` of the same grid).
 *
 * Scale shape: a schema workbook is a CONFIG artifact (tens of rows),
 * not data — it is parsed once on the driver and becomes a broadcast
 * side of every join it participates in (SchemaWriter.resolveCurie),
 * so there is nothing to distribute; bulk tabular data at 100 TB
 * arrives as parquet/CSV/JSON through the distributed scans.
 */
object XlsxSource {

  private def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** All text content of the sheet's cells, row-major, driver-side.
    * Rows are padded with nulls to the sheet's max used width. */
  def readSheet(path: String, sheetIndex: Int = 1): Vector[Vector[String]] = {
    val zip = new ZipFile(path)
    try {
      val factory = XMLInputFactory.newInstance()
      factory.setProperty(XMLInputFactory.IS_COALESCING, true)
      factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      factory.setProperty("javax.xml.stream.isSupportingExternalEntities", false)

      // shared strings: one entry per <si>, rich-text runs concatenated
      val shared = Option(zip.getEntry("xl/sharedStrings.xml")).map { e =>
        val r = factory.createXMLStreamReader(zip.getInputStream(e))
        val out = Vector.newBuilder[String]
        var cur: StringBuilder = null
        var inT = false
        try {
          while (r.hasNext) {
            r.next() match {
              case XMLStreamConstants.START_ELEMENT =>
                r.getLocalName match {
                  case "si" => cur = new StringBuilder
                  case "t" if cur != null => inT = true
                  case _ =>
                }
              case XMLStreamConstants.CHARACTERS if inT =>
                cur.append(r.getText)
              case XMLStreamConstants.END_ELEMENT =>
                r.getLocalName match {
                  case "t" => inT = false
                  case "si" => out += cur.toString; cur = null
                  case _ =>
                }
              case _ =>
            }
          }
        } finally r.close()
        out.result()
      }.getOrElse(Vector.empty)

      val sheetEntry = Option(zip.getEntry(s"xl/worksheets/sheet$sheetIndex.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"$path has no xl/worksheets/sheet$sheetIndex.xml"))
      val r = factory.createXMLStreamReader(zip.getInputStream(sheetEntry))
      val rows = Vector.newBuilder[Vector[String]]
      var emitted = 0      // rows emitted so far (0-based next index)
      var rowIndex = -1    // this <row>'s 0-based sheet index (r attr)
      var row: scala.collection.mutable.ArrayBuffer[String] = null
      var cellCol = -1
      var cellType = ""
      var text: StringBuilder = null
      var inValue = false
      var maxWidth = 0
      try {
        while (r.hasNext) {
          r.next() match {
            case XMLStreamConstants.START_ELEMENT =>
              r.getLocalName match {
                case "row" =>
                  // Excel omits entirely-blank rows from the XML but
                  // numbers the survivors via the r attribute; losing
                  // them would shift later rows up and diverge from the
                  // CSV render of the same grid (which keeps blank lines)
                  rowIndex = Option(r.getAttributeValue(null, "r"))
                    .map(_.toInt - 1).getOrElse(emitted)
                  row = scala.collection.mutable.ArrayBuffer.empty[String]
                case "c" if row != null =>
                  cellCol = Option(r.getAttributeValue(null, "r"))
                    .map(colIndex).getOrElse(row.length)
                  cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                  text = null
                // <v> (value) and <is><t> (inline string) carry the text
                case "v" | "t" if cellCol >= 0 =>
                  inValue = true
                  if (text == null) text = new StringBuilder
                case _ =>
              }
            case XMLStreamConstants.CHARACTERS if inValue =>
              text.append(r.getText)
            case XMLStreamConstants.END_ELEMENT =>
              r.getLocalName match {
                case "v" | "t" => inValue = false
                case "c" if cellCol >= 0 =>
                  val raw = if (text == null) null else text.toString
                  val value = (cellType, raw) match {
                    case (_, null) => null
                    case ("s", v) => shared(v.trim.toInt)
                    case ("b", v) => if (v.trim == "1") "true" else "false"
                    case (_, v) => v // inlineStr/str/n: the text itself
                  }
                  while (row.length < cellCol) row += null
                  if (row.length == cellCol) row += value
                  else row(cellCol) = value
                  cellCol = -1
                case "row" if row != null =>
                  while (emitted < rowIndex) { // pad skipped blank rows
                    rows += Vector.empty
                    emitted += 1
                  }
                  maxWidth = math.max(maxWidth, row.length)
                  rows += row.toVector
                  emitted += 1
                  row = null
                case _ =>
              }
            case _ =>
          }
        }
      } finally r.close()
      rows.result().map(v => v ++ Vector.fill(maxWidth - v.length)(null: String))
    } finally zip.close()
  }

  /** The worksheet as a DataFrame of strings — with `header = true`
    * (default) the first row names the columns, matching what
    * `spark.read.option("header", true).csv` yields on the CSV
    * pre-convert of the same grid. */
  def read(spark: SparkSession, path: String, sheetIndex: Int = 1,
           header: Boolean = true): DataFrame = {
    val grid = readSheet(path, sheetIndex)
    require(grid.nonEmpty, s"$path sheet $sheetIndex is empty")
    val (names, data) =
      if (header) (grid.head.map(Option(_).getOrElse("")), grid.tail)
      else (grid.head.indices.map(i => s"_c$i").toVector, grid)
    val schema = StructType(names.map(n => StructField(n, StringType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data.map(v => Row.fromSeq(v))).asJava),
      schema)
  }
}
