package graft

import java.nio.file.Files
import graft.sources.Readers

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-fixtures")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("vcf reader: '#' headers skipped, POS typed, sample cols attached") {
    val path = tmpFile("t.vcf",
      """##fileformat=VCFv4.2
        |##contig=<ID=chr1>
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	TUMOR
        |chr1	100	v1	A	T	50	PASS	DP=10	GT:AO:DP	0/1:5:10
        |chr1	200	v2	G	C	99	lowq	DP=3	GT:AO:DP	0/0:0:3
        |""".stripMargin)
    val df = Readers.vcf(spark, path, Seq("TUMOR"))
    assert(df.columns.toSeq ==
      Readers.vcfFixedCols ++ Seq("TUMOR"))
    assert(df.count() == 2)
    assert(df.schema("POS").dataType.typeName == "long")
    assert(df.filter($"FILTER" === "PASS").select("TUMOR")
      .as[String].collect().head == "0/1:5:10")
  }

  test("gtf reader: positional schema, comments skipped") {
    val path = tmpFile("t.gtf",
      """#description: evidence-based annotation
        |chr1	HAVANA	gene	11869	14409	.	+	.	gene_id "ENSG0001"; gene_type "protein_coding"; gene_name "TP53";
        |chr1	HAVANA	exon	11869	12227	.	+	.	gene_id "ENSG0001";
        |""".stripMargin)
    val df = Readers.gtf(spark, path)
    assert(df.count() == 2)
    val gene = df.filter($"feature" === "gene").collect().head
    assert(gene.getAs[Long]("start") == 11869L)
    assert(gene.getAs[String]("attributes").contains("protein_coding"))
  }

  test("cnvSegments: nested JSON explodes to 12-col rows, chr stripped") {
    val path = tmpFile("s.json",
      """{"metadata": {"sample_name": "PT1-SAMPLE1"},
        | "segments": [
        |   {"position": {"chrom": "chr7", "start": 100, "end": 300, "length": 200},
        |    "cnv": {"log2_copy_ratio": 1.5, "cnv_supporting_points": 12,
        |            "cnv_supporting_reads": 40, "log2_pval": 0.01,
        |            "log2_copy_ratio_90per_ci_low": 1.1,
        |            "log2_copy_ratio_90per_ci_high": 1.9}},
        |   {"position": {"chrom": "chrX", "start": 10, "end": 20, "length": 10},
        |    "cnv": {"log2_copy_ratio": -2.0, "cnv_supporting_points": 3,
        |            "cnv_supporting_reads": 9, "log2_pval": 0.2,
        |            "log2_copy_ratio_90per_ci_low": -2.5,
        |            "log2_copy_ratio_90per_ci_high": -1.5}}]}""".stripMargin)
    val df = Readers.cnvSegments(spark, path)
    assert(df.columns.length == 12)
    val rows = df.orderBy("start").collect()
    assert(rows.length == 2)
    assert(rows(1).getAs[String]("participant") == "PT1")
    assert(rows(1).getAs[String]("sample_id") == "PT1-SAMPLE1")
    assert(rows(1).getAs[String]("chrom") == "7")
    assert(rows(1).getAs[Double]("log2ratio") == 1.5)
  }

  test("dumpStats: column and row counts per table from a mysqldump") {
    val path = tmpFile("d.sql",
      """-- MySQL dump
        |USE `cbio`;
        |CREATE TABLE `patient` (
        |  `id` int NOT NULL,
        |  `name` varchar(64),
        |  `stable_id` varchar(64)
        |) ENGINE=InnoDB;
        |INSERT INTO `patient` VALUES
        |(1,'a','p1'),
        |(2,'b','p2');
        |CREATE TABLE `sample` (
        |  `id` int NOT NULL,
        |  `patient_id` int
        |) ENGINE=InnoDB;
        |INSERT INTO `sample` VALUES
        |(10,1);
        |""".stripMargin)
    val got = Readers.dumpStats(spark, path)
      .as[(String, Long, Long)].collect()
      .map { case (k, c, r) => k -> ((c, r)) }.toMap
    assert(got == Map("patient" -> (3L, 2L), "sample" -> (2L, 1L)))
  }

  test("dumpStats on its own sqlDump output: counts right, markers statement-sized") {
    // Writers.sqlDump emits one complete INSERT line per row
    // (--skip-extended-insert). Round 2's dumpStats made every such
    // line a positional marker → full-row-count window. Now complete
    // INSERT lines self-identify and bypass the window entirely.
    val a = (1 to 500).map(i => (i.toLong, s"name$i")).toDF("id", "name")
    val b = (1 to 300).map(i => (i.toLong, i * 2.0, s"x'$i")).toDF("id", "v", "s")
    val dir = Files.createTempDirectory("graft-dump-rt").resolve("out").toString
    graft.sources.Writers.sqlDump(
      Seq("ta" -> a, "tb" -> b), "db", dir, orderBy = Seq("id"))
    val got = Readers.dumpStats(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (k, c, r) => k -> ((c, r)) }.toMap
    assert(got == Map("ta" -> (2L, 500L), "tb" -> (3L, 300L)))
    // 800 data rows, but only the 2 CREATE openers are markers
    assert(Readers.dumpMarkers(spark, dir).count() == 2)
  }

  test("dumpStats: single-line extended INSERTs (mysqldump default grammar)") {
    val path = tmpFile("ext.sql",
      """CREATE TABLE `t1` (
        |  `id` int NOT NULL,
        |  `v` varchar(8)
        |) ENGINE=InnoDB;
        |INSERT INTO `t1` VALUES (1,'a'),(2,'b'),(3,'c');
        |INSERT INTO `t1` VALUES (4,'d'),(5,'e');
        |CREATE TABLE `t2` (
        |  `id` int NOT NULL
        |) ENGINE=InnoDB;
        |""".stripMargin)
    val got = Readers.dumpStats(spark, path)
      .as[(String, Long, Long)].collect()
      .map { case (k, c, r) => k -> ((c, r)) }.toMap
    assert(got == Map("t1" -> (2L, 5L), "t2" -> (1L, 0L)))
    // complete INSERT lines are not positional markers here either
    assert(Readers.dumpMarkers(spark, path).count() == 2)
  }

  test("dumpStats: --complete-insert column lists don't hide or inflate rows") {
    val path = tmpFile("ci.sql",
      """INSERT INTO `t1` (`id`, `v`) VALUES (1,'a'),(2,'b');
        |INSERT INTO `t1` (`id`, `v`) VALUES (3,'c');
        |""".stripMargin)
    val got = Readers.dumpStats(spark, path)
      .as[(String, Long, Long)].collect()
      .map { case (k, c, r) => k -> ((c, r)) }.toMap
    // the (`id`, `v`) column list is neither a tuple (no inflation to
    // 3+2) nor camouflage (rows are found at all)
    assert(got == Map("t1" -> (0L, 3L)))
  }

  test("stripDumpHeaders removes USE/CREATE DATABASE lines") {
    val path = tmpFile("d2.sql",
      "USE `cbio`;\nCREATE DATABASE x;\nINSERT INTO t VALUES (1);\n")
    val kept = Readers.stripDumpHeaders(spark, path).as[String].collect()
    assert(kept.toSeq == Seq("INSERT INTO t VALUES (1);"))
  }

  test("whitespaceSplit parses wc -l style output") {
    val path = tmpFile("wc.txt", "  120 a.vcf\n   33 b.vcf\n")
    val got = Readers.whitespaceSplit(spark, path, Seq("count", "file"))
      .as[(String, String)].collect().toSet
    assert(got == Set(("120", "a.vcf"), ("33", "b.vcf")))
  }
}
