package graft

import org.apache.spark.sql.functions._
import graft.flows.{ClinicalMergeFlow, DbCounter, PedmatchFlow}

class PedmatchFlowSpec extends SparkSpec {
  import spark.implicits._

  private val vcfCols = Seq("CHROM", "POS", "ID", "REF", "ALT", "QUAL",
    "FILTER", "INFO", "FORMAT", "S")

  test("pairPatients keeps exactly 1 tissue + 1 blood, reports the rest") {
    val m = Seq(
      ("p1", "s1", "tissue"), ("p1", "s2", "blood"),
      ("p2", "s3", "tissue"), ("p2", "s4", "tissue"), ("p2", "s5", "blood"),
      ("p3", "s6", "tissue"))
      .toDF("participant_id", "sample_id", "sample_type")
    val (paired, skipped) = PedmatchFlow.pairPatients(m)
    assert(paired.select("participant_id").distinct()
      .as[String].collect().toSeq == Seq("p1"))
    assert(skipped.select("participant_id").as[String].collect().toSet ==
      Set("p2", "p3"))
  }

  test("fusions: pairing + germline subtraction") {
    val t = Seq(
      ("chr22", 100L, "F1_1", "A", "T", "9", "PASS",
        "SVTYPE=Fusion;GENE_NAME=EWSR1;EXON_NUM=7;ANNOTATION=x;READ_COUNT=40", "GT", "0/1"),
      ("chr11", 200L, "F1_2", "A", "T", "9", "PASS",
        "SVTYPE=Fusion;GENE_NAME=FLI1;EXON_NUM=6;ANNOTATION=x;READ_COUNT=40", "GT", "0/1"),
      ("chr9", 300L, "F2_1", "A", "T", "9", "PASS",
        "SVTYPE=Fusion;GENE_NAME=BCR;EXON_NUM=1;ANNOTATION=y;READ_COUNT=10", "GT", "0/1"),
      ("chr22", 400L, "F2_2", "A", "T", "9", "PASS",
        "SVTYPE=Fusion;GENE_NAME=ABL1;EXON_NUM=2;ANNOTATION=y;READ_COUNT=10", "GT", "0/1"))
      .toDF(vcfCols: _*)
    // the normal shares the BCR-ABL1 event → germline, dropped
    val n = t.filter($"ID".startsWith("F2"))
    val got = PedmatchFlow.fusions(t, n, orderCol = "POS")
      .select("site1_gene", "site2_gene").as[(String, String)].collect().toSet
    assert(got == Set(("EWSR1", "FLI1")))
  }

  test("somaticCnv: amplification extract + gene-level germline anti join") {
    val t = Seq(
      ("chr8", 1L, "c1", "A", "<CNV>", "9", "PASS",
        "Amplification;GENE_NAME=MYC;NUMTILES=12;END=500;RAW_CN=8.0", "GT", "0/1"),
      ("chr7", 2L, "c2", "A", "<CNV>", "9", "PASS",
        "Amplification;GENE_NAME=EGFR;NUMTILES=5;END=900;RAW_CN=6.0", "GT", "0/1"),
      ("KI27", 3L, "c3", "A", "<CNV>", "9", "PASS",
        "Amplification;GENE_NAME=JUNK;NUMTILES=1;END=10;RAW_CN=4.0", "GT", "0/1"))
      .toDF(vcfCols: _*)
    val n = t.filter($"ID" === "c2") // EGFR germline
    val got = PedmatchFlow.somaticCnv(t, n)
      .select("Hugo_Symbol", "gistic").as[(String, Int)].collect().toSet
    assert(got == Set(("MYC", 1))) // log2(8/2)=2.0 exactly -> strict >2.0 fails -> bin 1
  }

  test("somaticSnvs end-to-end: split, merge, filter, extract") {
    val t = Seq(
      ("chr1", 100L, "v1", "A", "T,G", "9", "PASS", "DP=20",
        "GT:X:DP", "0/1:z:20"),
      ("chr1", 500L, "v9", "C", "A", "9", "PASS", "DP=9",
        "GT:X:DP", "0/0:z:9")) // ref genotype -> dropped
      .toDF(vcfCols.init :+ "TUM": _*)
    val n = Seq(
      ("chr1", 100L, "v1", "A", "T", "8", "PASS", "DP=18",
        "GT:X:DP", "0/0:z:18"))
      .toDF(vcfCols.init :+ "NOR": _*)
    val got = PedmatchFlow.somaticSnvs(t, n, "TUM", "NOR")
    val rows = got.select("POS", "ALT", "t_GT", "t_DP", "n_GT")
      .as[(Long, String, String, String, String)].collect().toSet
    // v1 splits to T and G; both somatic (tumor 0/1 vs normal 0/0 for T,
    // NA genotype for G side since normal lacks that allele row)
    assert(rows == Set(
      (100L, "T", "0/1", "20", "0/0"),
      (100L, "G", "0/1", "20", "NA")))
  }

  test("gistic boundary in somaticCnv is strict >2.0") {
    // RAW_CN=8 → log2(4)=2.0 exactly → bin 1 (not 2): documented edge
    val t = Seq(("chr8", 1L, "c1", "A", "<CNV>", "9", "PASS",
      "Amplification;GENE_NAME=MYC;NUMTILES=12;END=500;RAW_CN=8.0", "GT", "0/1"))
      .toDF(vcfCols: _*)
    val got = PedmatchFlow.somaticCnv(t, t.limit(0))
      .select("gistic").as[Int].collect().head
    assert(got == 1)
  }

  test("mergeMegaMaf: clinical wins on the variant key") {
    val existing = Seq(
      ("b1", "1", 100L, "A", "T", "old", null.asInstanceOf[String]))
      .toDF("Tumor_Sample_Barcode", "Chromosome", "Start_Position",
        "Reference_Allele", "Tumor_Seq_Allele2", "source",
        "reported_significance")
    val clinical = Seq(
      ("b1", "1", 100L, "A", "T", "clinical", "Pathogenic"),
      ("b2", "2", 300L, "G", "C", "clinical", "Benign"))
      .toDF("Tumor_Sample_Barcode", "Chromosome", "Start_Position",
        "Reference_Allele", "Tumor_Seq_Allele2", "source",
        "reported_significance")
    val got = ClinicalMergeFlow.mergeMegaMaf(existing, clinical,
      Seq("Chromosome", "Start_Position", "Reference_Allele",
        "Tumor_Seq_Allele2"))
      .select("source").as[String].collect().toSeq
    assert(got == Seq("clinical", "clinical"))
  }

  test("DbCounter.reconcile flags mismatches") {
    val dump = Seq(("patient", 3L, 100L), ("sample", 2L, 50L))
      .toDF("table_name", "column_count", "row_count")
    val db = Seq(("patient", 3L, 100L), ("sample", 2L, 49L))
      .toDF("table_name", "column_count", "row_count")
    val got = DbCounter.reconcile(dump, db)
      .select("table_name", "rows_match").as[(String, Boolean)]
      .collect().toMap
    assert(got == Map("patient" -> true, "sample" -> false))
  }
}
