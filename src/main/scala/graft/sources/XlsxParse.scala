package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import scala.collection.mutable

/** Minimal xlsx (SpreadsheetML) parser — S7 (SURVEY.md §2.1; both big
  * reference flows START from `pd.read_excel`: pedmatch:24, mci:24-37
  * with sheet_name="genetic_analysis"). No external dependency: an
  * .xlsx is a zip of XML parts, and manifest-shaped sheets only need
  * the workbook/sheet-rels lookup, the shared-string table, and the
  * cell grid. Pure JVM-side byte parsing, so it runs driver-side for a
  * single manifest or inside `mapPartitions` over a `binaryFile` scan
  * for fan-out (Readers.xlsx).
  *
  * Supported cell types: shared strings (t="s"), inline strings
  * (t="inlineStr", incl. rich-text runs), formula-cached strings
  * (t="str"), booleans (t="b" → TRUE/FALSE), and numbers (stored as
  * decimal text — returned verbatim). Missing cells inside a row
  * become nulls via the column-letter gap fill.
  */
object XlsxParse {

  private val xif = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  /** All rows of `sheet` (default: the workbook's first sheet) as
    * string cell vectors, ragged rows padded with null to the max
    * width. `maxRows` stops the StAX scan as soon as that many rows
    * are complete — a header peek (`maxRows = 1`) touches only the
    * first row's XML and never materializes the rest of a possibly
    * multi-hundred-MB worksheet on the driver. */
  def sheetRows(bytes: Array[Byte],
                sheet: Option[String] = None,
                maxRows: Int = Int.MaxValue): Vector[Vector[String]] = {
    val parts = readParts(bytes, sheet)
    val shared = parts.sharedStrings
    val rows = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[String]]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(parts.sheetXml))
    var cellRef: String = null
    var cellType: String = null
    var inV = false
    var inIsT = false
    var row: mutable.ArrayBuffer[String] = null
    val text = new StringBuilder
    while (rows.length < maxRows && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[String]
            case "c" =>
              cellRef = attr(r, "r")
              cellType = attr(r, "t")
            case "v" => inV = true; text.clear()
            case "t" => inIsT = true; text.clear()
            case _ =>
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inV || inIsT) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "row" => if (row != null) { rows += row; row = null }
            case "c" => cellRef = null; cellType = null
            case "v" =>
              inV = false
              if (row != null) setCell(row, cellRef, cellValue(cellType,
                text.toString, shared))
            case "t" =>
              // inline-string text node (possibly one of several runs)
              if (inIsT && row != null && cellType == "inlineStr")
                appendCell(row, cellRef, text.toString)
              inIsT = false
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    val width = if (rows.isEmpty) 0 else rows.map(_.length).max
    rows.map(rw => (rw ++ Seq.fill(width - rw.length)(null: String)).toVector)
      .toVector
  }

  private def cellValue(t: String, v: String,
                        shared: IndexedSeq[String]): String = t match {
    case "s" => shared(v.trim.toInt)
    case "b" => if (v.trim == "1") "TRUE" else "FALSE"
    case _ => v // "str", numbers, dates-as-serials: verbatim text
  }

  private def setCell(row: mutable.ArrayBuffer[String], ref: String,
                      value: String): Unit = {
    val idx = if (ref == null) row.length else colIndex(ref)
    while (row.length <= idx) row += null
    row(idx) = value
  }

  private def appendCell(row: mutable.ArrayBuffer[String], ref: String,
                         value: String): Unit = {
    val idx = if (ref == null) row.length else colIndex(ref)
    while (row.length <= idx) row += null
    row(idx) = if (row(idx) == null) value else row(idx) + value
  }

  /** "B7" → 1; "AA3" → 26. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private final case class Parts(sheetXml: Array[Byte],
                                 sharedStrings: IndexedSeq[String])

  private def attr(r: javax.xml.stream.XMLStreamReader, name: String): String = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return r.getAttributeValue(i)
      i += 1
    }
    null
  }

  /** One sequential pass over the zip: collect the workbook sheet
    * index, the rels map, shared strings, and every worksheet part;
    * then resolve which worksheet `sheet` refers to. */
  private def readParts(bytes: Array[Byte], sheet: Option[String]): Parts = {
    val entries = mutable.Map.empty[String, Array[Byte]]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zis.getNextEntry
    while (e != null) {
      val n = e.getName
      if (n == "xl/workbook.xml" || n == "xl/_rels/workbook.xml.rels" ||
          n == "xl/sharedStrings.xml" || n.startsWith("xl/worksheets/"))
        entries(n) = zis.readAllBytes()
      e = zis.getNextEntry
    }
    zis.close()

    val shared: IndexedSeq[String] =
      entries.get("xl/sharedStrings.xml").map(parseSharedStrings)
        .getOrElse(Vector.empty)

    // workbook: sheet name -> r:id, in declaration order
    val sheets = mutable.ArrayBuffer.empty[(String, String)]
    entries.get("xl/workbook.xml").foreach { wb =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(wb))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "sheet")
          sheets += ((attr(r, "name"), attr(r, "id")))
        ()
      }
      r.close()
    }
    // rels: rId -> worksheet part path
    val rels = mutable.Map.empty[String, String]
    entries.get("xl/_rels/workbook.xml.rels").foreach { rl =>
      val r = xif.createXMLStreamReader(new ByteArrayInputStream(rl))
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship")
          rels(attr(r, "Id")) = attr(r, "Target")
        ()
      }
      r.close()
    }

    val target = sheet match {
      case Some(name) =>
        val rid = sheets.collectFirst { case (n, id) if n == name => id }
          .getOrElse(throw new IllegalArgumentException(
            s"xlsx: no sheet named '$name'; sheets: ${sheets.map(_._1).mkString(", ")}"))
        rels.get(rid).map(t => "xl/" + t.stripPrefix("/xl/").stripPrefix("xl/"))
          .getOrElse(s"xl/worksheets/sheet1.xml")
      case None =>
        sheets.headOption.flatMap { case (_, id) => rels.get(id) }
          .map(t => "xl/" + t.stripPrefix("/xl/").stripPrefix("xl/"))
          .getOrElse("xl/worksheets/sheet1.xml")
    }
    val sheetXml = entries.getOrElse(target,
      throw new IllegalArgumentException(
        s"xlsx: worksheet part '$target' missing; have ${entries.keys.mkString(", ")}"))
    Parts(sheetXml, shared)
  }

  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = xif.createXMLStreamReader(new ByteArrayInputStream(bytes))
    var cur: StringBuilder = null
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si" => cur = new StringBuilder
          case "t" => inT = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT && cur != null) cur.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si" => out += cur.toString; cur = null
          case "t" => inT = false
          case _ =>
        }
        case _ =>
      }
    }
    r.close()
    out.toVector
  }
}
