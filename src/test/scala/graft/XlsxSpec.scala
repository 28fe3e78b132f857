package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import graft.flows.ClinicalMergeFlow
import graft.sources.{Readers, XlsxParse}

/** S7: the Excel manifest scan both big reference flows start from
  * (pedmatch:24, mci:24-37). The fixture is a handwritten minimal
  * SpreadsheetML zip — two sheets, shared strings, inline strings,
  * numeric cells, and a gap cell — written through ZipOutputStream so
  * the test has no library dependency either. */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def entry(z: ZipOutputStream, name: String, content: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(content.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** inline-string cell */
  private def is(ref: String, v: String) =
    s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
  /** shared-string cell */
  private def ss(ref: String, i: Int) = s"""<c r="$ref" t="s"><v>$i</v></c>"""
  /** number cell */
  private def num(ref: String, v: String) = s"""<c r="$ref"><v>$v</v></c>"""

  private def fixtureBytes: Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="manifest" sheetId="1" r:id="rId1"/>
        |<sheet name="genetic_analysis" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
        |<si><t>sample_id</t></si>
        |<si><t>PT1-S1</t></si>
        |<si><r><t>PT2-</t></r><r><t>S1</t></r></si>
        |<si><t>tissue</t></si>
        |</sst>""".stripMargin)
    // manifest sheet: header + 2 rows; C3 (file_name) left as a GAP
    entry(z, "xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1">${ss("A1", 0)}${is("B1", "s3_url")}${is("C1", "file_name")}${is("D1", "md5sum")}${is("E1", "file_size")}${is("F1", "participant_id")}${is("G1", "sample_type")}</row>
         |<row r="2">${ss("A2", 1)}${is("B2", "s3://bkt/f1.json")}${is("C2", "f1.json")}${is("D2", "aaa")}${num("E2", "1234")}${is("F2", "PT1")}${ss("G2", 3)}</row>
         |<row r="3">${ss("A3", 2)}${is("B3", "s3://bkt/f2.json")}${is("D3", "bbb")}${num("E3", "99")}${is("F3", "PT2")}${is("G3", "blood")}</row>
         |</sheetData></worksheet>""".stripMargin)
    // genetic_analysis sheet (mci:24-37 columns subset)
    entry(z, "xl/worksheets/sheet2.xml",
      s"""<?xml version="1.0"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1">${is("A1", "gene_symbol")}${is("B1", "chromosome")}${is("C1", "genomic_source_category")}${is("D1", "status")}${is("E1", "test")}</row>
         |<row r="2">${is("A2", "BRAF")}${is("B2", "chr7")}${is("C2", "Somatic")}${is("D2", "Present")}${is("E2", "panelA")}</row>
         |<row r="3">${is("A3", "KRAS")}${is("B3", "chr12")}${is("C3", "Germline")}${is("D3", "Present")}${is("E3", "panelA")}</row>
         |<row r="4">${is("A4", "TP53")}${is("B4", "chr17")}${is("C4", "Somatic")}${is("D4", "Absent")}${is("E4", "panelA")}</row>
         |</sheetData></worksheet>""".stripMargin)
    z.close()
    buf.toByteArray
  }

  private lazy val fixturePath: String = {
    val dir = java.nio.file.Files.createTempDirectory("xlsx_fixture")
    val f = dir.resolve("manifest.xlsx").toFile
    val out = new FileOutputStream(f)
    out.write(fixtureBytes); out.close()
    f.getAbsolutePath
  }

  test("XlsxParse: shared strings, rich-text runs, inline, numbers, gaps") {
    val rows = XlsxParse.sheetRows(fixtureBytes, Some("manifest"))
    assert(rows.head == Vector("sample_id", "s3_url", "file_name",
      "md5sum", "file_size", "participant_id", "sample_type"))
    assert(rows(1) == Vector("PT1-S1", "s3://bkt/f1.json", "f1.json",
      "aaa", "1234", "PT1", "tissue"))
    // row 3: gap at C, rich-text shared string at A
    assert(rows(2) == Vector("PT2-S1", "s3://bkt/f2.json", null,
      "bbb", "99", "PT2", "blood"))
  }

  test("XlsxParse: sheet selection by name, default = first sheet") {
    val ga = XlsxParse.sheetRows(fixtureBytes, Some("genetic_analysis"))
    assert(ga.head == Vector("gene_symbol", "chromosome",
      "genomic_source_category", "status", "test"))
    assert(XlsxParse.sheetRows(fixtureBytes, None).head.head == "sample_id")
    intercept[IllegalArgumentException] {
      XlsxParse.sheetRows(fixtureBytes, Some("nope"))
    }
  }

  test("XlsxParse: maxRows=1 header peek never scans past the first row") {
    // worksheet whose SECOND row is malformed XML: a full parse throws,
    // but the header peek stops after row 1 and never sees it — proof
    // the driver-side peek doesn't materialize the whole sheet
    val buf = new ByteArrayOutputStream()
    val z = new ZipOutputStream(buf)
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="m" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships><Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry(z, "xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>
         |<row r="1">${is("A1", "col_a")}${is("B1", "col_b")}</row>
         |<row r="2">${num("A2", "1")}</unclosed-garbage>
         |</sheetData></worksheet>""".stripMargin)
    z.close()
    val bytes = buf.toByteArray
    assert(XlsxParse.sheetRows(bytes, None, maxRows = 1) ==
      Vector(Vector("col_a", "col_b")))
    intercept[Exception] { XlsxParse.sheetRows(bytes, None) }
  }

  test("Readers.xlsx: pedmatch manifest start — schema'd scan + validation") {
    val df = Readers.xlsx(spark, fixturePath, Some("manifest"),
      Some(Readers.pedmatchManifestSchema))
    assert(df.schema("file_size").dataType.typeName == "long")
    val got = df.select("sample_id", "file_size", "sample_type")
      .as[(String, Long, String)].collect().toSet
    assert(got == Set(("PT1-S1", 1234L, "tissue"), ("PT2-S1", 99L, "blood")))
    // the flow's first step: constraint validation over the manifest
    // (file_name has a null from the gap cell -> violation reported)
    val violations = graft.operators.Reconcile.constraintViolations(df,
      requiredCols = Seq("sample_id", "s3_url", "file_name", "md5sum"),
      uniqueCols = Seq("sample_id", "file_name"))
      .select("constraint").as[String].collect()
    assert(violations.contains("null:file_name"))
  }

  test("Readers.xlsx: ClinicalMergeFlow start — genetic_analysis sheet") {
    val clinical = Readers.xlsx(spark, fixturePath, Some("genetic_analysis"))
    val prepped = ClinicalMergeFlow.prepClinical(clinical, Seq("panelA"))
    val got = prepped.select("gene_symbol", "chromosome")
      .as[(String, String)].collect().toSet
    assert(got == Set(("BRAF", "7"))) // Somatic+Present+panelA, chr stripped
  }
}
