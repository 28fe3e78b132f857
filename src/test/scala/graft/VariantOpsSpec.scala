package graft

import org.apache.spark.sql.functions._
import graft.operators.VariantOps

class VariantOpsSpec extends SparkSpec {
  import spark.implicits._

  test("splitMultiallelic: one row per ALT allele with index") {
    val df = Seq(("chr1", 100L, "A", "T,G"), ("chr1", 200L, "C", "G"))
      .toDF("CHROM", "POS", "REF", "ALT")
    val got = VariantOps.splitMultiallelic(df)
      .select("POS", "allele_idx", "ALT")
      .as[(Long, Int, String)].collect().toSet
    assert(got == Set((100L, 0, "T"), (100L, 1, "G"), (200L, 0, "G")))
  }

  test("splitMultiallelic: GT renumbered per allele (bcftools norm -m -any)") {
    // hand-computed `bcftools norm -m -any` outputs:
    //   site ALT=T,G GT 1/2 -> T row: 1/0, G row: 0/1
    //   site ALT=T,G GT 0|2 -> T row: 0|0, G row: 0|1
    //   site ALT=T,G GT ./1 -> T row: ./1, G row: ./0
    //   biallelic 0/1 unchanged
    val df = Seq(
      ("chr1", 100L, "A", "T,G", "GT:DP", "1/2:13"),
      ("chr1", 200L, "A", "T,G", "GT:DP", "0|2:7"),
      ("chr1", 300L, "A", "T,G", "GT:DP", "./1:5"),
      ("chr1", 400L, "C", "G", "GT:DP", "0/1:9"))
      .toDF("CHROM", "POS", "REF", "ALT", "FORMAT", "S1")
    val got = VariantOps.splitMultiallelic(df, renumberSamples = Seq("S1"))
      .select("POS", "allele_idx", "ALT", "S1")
      .as[(Long, Int, String, String)].collect().toSet
    assert(got == Set(
      (100L, 0, "T", "1/0:13"), (100L, 1, "G", "0/1:13"),
      (200L, 0, "T", "0|0:7"), (200L, 1, "G", "0|1:7"),
      (300L, 0, "T", "./1:5"), (300L, 1, "G", "./0:5"),
      (400L, 0, "G", "0/1:9")))
  }

  test("injectFt appends FT to FORMAT and FILTER to the sample column") {
    val df = Seq(("GT:DP", "0/1:10", "PASS")).toDF("FORMAT", "S1", "FILTER")
    val got = VariantOps.injectFt(df, "S1")
      .select("FORMAT", "S1").as[(String, String)].collect().head
    assert(got == ("GT:DP:FT", "0/1:10:PASS"))
  }

  test("mergeTumorNormal: full outer on variant key, INFO coalesced") {
    val t = Seq(("1", 100L, "A", "T", "v1", "50", "PASS", "TD=1", "GT", "0/1"))
      .toDF("CHROM", "POS", "REF", "ALT", "ID", "QUAL", "FILTER", "INFO", "FORMAT", "S")
    val n = Seq(
      ("1", 100L, "A", "T", "v1", "40", "PASS", "ND=2", "GT", "0/0"),
      ("1", 300L, "G", "C", "v2", "60", "PASS", "ND=3", "GT", "0/1"))
      .toDF("CHROM", "POS", "REF", "ALT", "ID", "QUAL", "FILTER", "INFO", "FORMAT", "S")
    val m = VariantOps.mergeTumorNormal(t, n, "S")
    assert(m.count() == 2)
    val both = m.filter($"POS" === 100).collect().head
    assert(both.getAs[String]("INFO") == "TD=1") // tumor wins
    val only = m.filter($"POS" === 300).collect().head
    assert(only.getAs[String]("INFO") == "ND=3" && only.getAs[String]("tumor_S") == null)
  }

  test("somaticFilter: PASS, non-SV, non-ref, differs from normal") {
    val df = Seq(
      ("PASS", "DP=9", "0/1:5", "0/0:9"),   // somatic: kept
      ("PASS", "DP=9", "0/0:5", "0/0:9"),   // ref genotype: dropped
      ("PASS", "SVTYPE=Fusion", "0/1:5", "0/0:9"), // SV: dropped
      ("lowq", "DP=9", "0/1:5", "0/0:9"),   // not PASS: dropped
      ("PASS", "DP=9", "1/1:5", "1/1:9"))   // same as normal: dropped
      .toDF("tumor_FILTER", "INFO", "tumor_T", "normal_N")
    assert(VariantOps.somaticFilter(df, "T", "N").count() == 1)
  }

  test("pairBreakpoints: rows pair 2-at-a-time in explicit order") {
    val df = Seq(
      ("F1", 1L, "EWSR1", "chr22"), ("F1", 2L, "FLI1", "chr11"),
      ("F2", 3L, "BCR", "chr22"), ("F2", 4L, "ABL1", "chr9"))
      .toDF("FUSION_ID", "line", "gene", "chrom")
    val got = VariantOps.pairBreakpoints(df, "FUSION_ID", "line",
      Seq("gene", "chrom"))
      .select("FUSION_ID", "site1_gene", "site2_gene")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(("F1", "EWSR1", "FLI1"), ("F2", "BCR", "ABL1")))
  }

  test("subtractGermline: anti form drops, indicator form flags") {
    val t = Seq(("g1", 1), ("g2", 2)).toDF("Hugo_Symbol", "v")
    val n = Seq(Tuple1("g1")).toDF("Hugo_Symbol")
    assert(VariantOps.subtractGermlineByGene(t, n)
      .select("Hugo_Symbol").as[String].collect().toSeq == Seq("g2"))
    val flagged = VariantOps.subtractGermline(t, n, Seq("Hugo_Symbol"),
      keepFlag = true)
    assert(flagged.filter($"germline").count() == 1)
  }

  test("addVaf: broadcast lookup, '' when absent, first value on dups") {
    val maf = Seq(("1", 100L, "x"), ("2", 200L, "y"))
      .toDF("Chromosome", "Start_Position", "gene")
    val af = Seq(("1", 100L, "0.25")).toDF("Chromosome", "Start_Position", "AF")
    val got = VariantOps.addVaf(maf, af)
      .select("gene", "t_vaf").as[(String, String)].collect().toSet
    assert(got == Set(("x", "0.25"), ("y", "")))
  }

  test("copyNumberCalls: log2 + gistic") {
    val got = VariantOps.copyNumberCalls(Seq((1L, 8.0)).toDF("id", "cn"), "cn")
      .select("log2r", "gistic").as[(Double, Int)].collect().head
    assert(got == (2.0, 1))
  }
}
