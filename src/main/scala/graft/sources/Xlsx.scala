package graft.sources

import java.io.{ByteArrayInputStream, File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** R1 — Excel workbook as a relational dim-table source.
  *
  * The reference loads its account dimension from an `.xlsx` workbook
  * (`RSS PARSER/gcp_rss.py:24-28`, `pd.read_excel`). XLSX is a public
  * format — ECMA-376 SpreadsheetML: a zip whose sheet XML stores rows of
  * typed cells, with strings interned in a shared-strings part — so a
  * reader needs nothing beyond the JDK (java.util.zip + StAX streaming
  * XML). No third-party dependency, no driver-side framework.
  *
  * Spark shape: `binaryFiles` hands each workbook's bytes to an executor;
  * parsing is per-file parallel (the C11 pattern applied to workbooks).
  * Dim tables are small by definition, but a directory of many workbooks
  * (one per region/tenant) still fans out. All cells surface as strings —
  * schema-on-read; callers cast, mirroring the CSV path's `try_cast`
  * cleansing stage.
  */
object Xlsx {

  /** Rows of the first worksheet as dense string vectors (null = empty
    * cell). Handles shared strings (`t="s"`), inline strings
    * (`t="inlineStr"`), booleans, and plain numeric cells; formula caches
    * (`t="str"`) surface as their cached text. */
  def parseWorkbook(bytes: Array[Byte]): Vector[Vector[String]] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    val sheetName = parts.keys.filter(_.matches("xl/worksheets/sheet\\d+\\.xml")).toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException("xlsx: no worksheet part found"))
    parseSheet(parts(sheetName), shared)
  }

  /** All `.xlsx` files under `path`, parsed executor-side. Header row of
    * the lexicographically-first file names the columns; every file's own
    * first row is skipped as its header. All columns StringType. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.sparkContext.binaryFiles(path)
    val parsed = bin.flatMap { case (p, pds) =>
      parseWorkbook(pds.toArray()).zipWithIndex.map { case (cells, i) => (p, i, cells) }
    }
    val firstPath = bin.keys.min()
    val header = parsed.filter(t => t._1 == firstPath && t._2 == 0).first()._3
    val n = header.length
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val rows = parsed.filter(_._2 > 0).map { case (_, _, cells) =>
      Row.fromSeq(cells.padTo(n, null).take(n))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Minimal single-sheet workbook writer (fixtures + dim egress):
    * numbers land as numeric cells, everything else via shared strings.
    * Emits only the parts the ECMA-376 package contract requires. */
  def write(header: Seq[String], rows: Seq[Seq[Any]], file: File): Unit = {
    val strings = mutable.LinkedHashMap[String, Int]()
    def intern(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    def cellXml(ref: String, v: Any): String = v match {
      case null => ""
      case n: Number => s"""<c r="$ref"><v>${n.toString}</v></c>"""
      case other => s"""<c r="$ref" t="s"><v>${intern(other.toString)}</v></c>"""
    }
    def colRef(i: Int): String = {
      var c = i; var s = ""
      while (c >= 0) { s = ('A' + c % 26).toChar.toString + s; c = c / 26 - 1 }
      s
    }
    val allRows = header +: rows
    val rowXml = allRows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, i) => cellXml(s"${colRef(i)}${r + 1}", v) }
      s"""<row r="${r + 1}">${cs.mkString}</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowXml</sheetData></worksheet>"""
    val sst = {
      val sis = strings.keys.map(s => s"<si><t>${escape(s)}</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">$sis</sst>"""
    }
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/></Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>"""
    file.getParentFile.mkdirs()
    val zos = new ZipOutputStream(new FileOutputStream(file))
    try Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rootRels,
      "xl/workbook.xml" -> workbook,
      "xl/_rels/workbook.xml.rels" -> wbRels,
      "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> sheet
    ).foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map[String, Array[Byte]]()
    try {
      var e = zis.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = zis.readAllBytes()
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.toMap
  }

  /** `<si>` entries; rich-text runs concatenate their `<t>` fragments. */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = newReader(bytes)
    val out = Vector.newBuilder[String]
    var inT = false
    var sb: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb = new StringBuilder
            case "t" => inT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => out += sb.toString
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  private def parseSheet(bytes: Array[Byte], shared: Vector[String]): Vector[Vector[String]] = {
    val r = newReader(bytes)
    val rows = Vector.newBuilder[Vector[String]]
    var cells: mutable.ArrayBuffer[String] = null
    var colIdx = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    var text: StringBuilder = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cells = mutable.ArrayBuffer[String]()
            case "c" =>
              val ref = Option(r.getAttributeValue(null, "r"))
              colIdx = ref.map(colFromRef).getOrElse(cells.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text = new StringBuilder
            case "v" => inV = true
            case "t" => inIsT = true
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" =>
              val raw = text.toString
              val value = cellType match {
                case "s" => if (raw.isEmpty) null else shared(raw.trim.toInt)
                case "b" => if (raw.trim == "1") "true" else "false"
                case _ => if (raw.isEmpty) null else raw // numeric, str, inlineStr
              }
              while (cells.length <= colIdx) cells += null
              cells(colIdx) = value
            case "row" => rows += cells.toVector
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rows.result()
  }

  /** "BC7" → 54 (0-based column index). */
  private def colFromRef(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  private def newReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }
}
