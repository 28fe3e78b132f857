package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColumnFns

/** Variant-calling relational ops (SURVEY.md §2 G2–G4, J5–J8, P3/P5) —
  * the semantics the reference delegates to bcftools subprocesses
  * (pedmatch-clinical-vcf-workflow.py:312-448), re-derived as
  * DataFrame transforms so they distribute.
  */
object VariantOps {

  /** Variant identity key used by merge/germline ops (bcftools
    * `merge -m id` joins on the variant id; pedmatch:361-363). */
  val variantKey: Seq[String] = Seq("CHROM", "POS", "REF", "ALT")

  // ---- P3: PASS filter (pedmatch:69) ----
  def passOnly(vcf: DataFrame): DataFrame =
    vcf.filter(col("FILTER") === "PASS")

  // ---- G3: multiallelic split (bcftools norm -m -any; pedmatch:367) --
  /** ALT "A,T" → one row per allele; 0-based allele index kept.
    * `renumberSamples` are packed genotype columns whose GT (the FIRST
    * `:`-field, per VCF spec) is renumbered per split record the way
    * `bcftools norm -m -any` does: the record's own allele → 1, REF
    * and every other alt allele → 0, missing '.' preserved, phase
    * separators (/ or |) and ploidy preserved. Without renumbering a
    * het-alt site 1/2 would keep GT "1/2" on BOTH split rows and a
    * somatic filter comparing genotypes across rows misclassifies. */
  def splitMultiallelic(vcf: DataFrame,
                        renumberSamples: Seq[String] = Nil): DataFrame = {
    val others = vcf.columns.filterNot(_ == "ALT").map(col).toSeq
    val split0 = vcf.select(others :+
      posexplode(split(col("ALT"), ",")).as(Seq("allele_idx", "ALT")): _*)
    renumberSamples.foldLeft(split0)((d, s) =>
      d.withColumn(s, renumberedSample(col(s), col("allele_idx"))))
  }

  /** Packed sample column with its GT field renumbered for the split
    * record whose (0-based) allele index is `alleleIdx`. Multi-digit
    * allele indices and arbitrary ploidy handled by tokenizing the GT
    * on phase separators with lookaround split. */
  private def renumberedSample(sample: Column, alleleIdx: Column): Column = {
    val parts = split(sample, ":", 2)
    val gt = get(parts, lit(0))
    val rest = get(parts, lit(1))
    val toks = split(gt, "(?=[/|])|(?<=[/|])")
    val own = (alleleIdx + 1).cast("string")
    val newGt = array_join(transform(toks, t =>
      when(t.isin("/", "|", "."), t)
        .when(t === own, "1")
        .otherwise("0")), "")
    when(sample.isNull, sample)
      .otherwise(concat_ws(":", newGt, rest))
  }

  // ---- G4: FT injection (pedmatch:329-351) ----
  /** Append `:FT` to FORMAT and the row FILTER to the packed sample
    * column — the line-machine rewrite, as two column exprs. */
  def injectFt(vcf: DataFrame, sampleCol: String): DataFrame =
    vcf.withColumn("FORMAT", concat(col("FORMAT"), lit(":FT")))
      .withColumn(sampleCol, concat_ws(":", col(sampleCol), col("FILTER")))

  // ---- J8: tumor/normal merge (bcftools merge -m id) ----
  /** Full-outer join on the variant key; EVERY non-key column gets a
    * tumor_/normal_ prefix, and INFO/QUAL are re-exposed unprefixed
    * from whichever side is present (tumor wins when both).
    * `extraKeys` extend the join key for multi-patient frames —
    * joining many patients' variants in ONE distributed merge keyed by
    * (patient, variant) instead of a per-patient driver loop. */
  def mergeTumorNormal(tumor: DataFrame, normal: DataFrame,
                       sampleCol: String,
                       extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = extraKeys ++ variantKey
    def prefixed(df: DataFrame, p: String) =
      df.columns.filterNot(keys.contains)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$p$c"))
    prefixed(tumor, "tumor_").join(prefixed(normal, "normal_"),
        keys, "full")
      .withColumn("INFO", coalesce(col("tumor_INFO"), col("normal_INFO")))
      .withColumn("QUAL", coalesce(col("tumor_QUAL"), col("normal_QUAL")))
  }

  // ---- P5: somatic filter (pedmatch:441) ----
  /** tumor PASS, not an SV, tumor genotype non-ref and ≠ normal's. */
  def somaticFilter(merged: DataFrame, tumorSample: String,
                    normalSample: String): DataFrame = {
    val tGt = ColumnFns.formatField(col(s"tumor_$tumorSample"), 0)
    val nGt = ColumnFns.formatField(col(s"normal_$normalSample"), 0)
    merged.filter(
      col("tumor_FILTER") === "PASS" &&
        !coalesce(col("INFO"), lit("")).contains("SVTYPE") &&
        tGt =!= "0/0" && nGt =!= tGt)
  }

  // ---- FORMAT extracts (F4; pedmatch:378-413) ----
  /** Standard packed-genotype pulls: GT(0), DP(2), FRO(5), FAO(7),
    * AF(8), FT(last) — each "NA" on null input (F12). */
  def extractGenotypeFields(df: DataFrame, sampleCol: String,
                            prefix: String = ""): DataFrame = {
    val s = col(sampleCol)
    df.withColumn(s"${prefix}GT", ColumnFns.formatField(s, 0))
      .withColumn(s"${prefix}DP", ColumnFns.formatField(s, 2))
      .withColumn(s"${prefix}FRO", ColumnFns.formatField(s, 5))
      .withColumn(s"${prefix}FAO", ColumnFns.formatField(s, 7))
      .withColumn(s"${prefix}AF", ColumnFns.formatField(s, 8))
      .withColumn(s"${prefix}FT",
        when(s.isNull, "NA").otherwise(ColumnFns.splitLast(s, ":")))
  }

  // ---- G2: fusion breakpoint pairing (pedmatch:123-151) ----
  /** Within each fusion id, rows pair 2-at-a-time in `orderCol` order
    * (the reference silently uses file order — here the order column
    * is explicit, SURVEY §7.4 item 1): row 2k-1 = site1, row 2k =
    * site2 of one fusion event. */
  def pairBreakpoints(df: DataFrame, fusionIdCol: String,
                      orderCol: String,
                      siteCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(fusionIdCol).orderBy(col(orderCol))
    val withRn = df.withColumn("__rn", row_number().over(w))
    val paired = siteCols.foldLeft(withRn) { (d, c) =>
      d.withColumn(s"site2_$c", lead(col(c), 1).over(w))
    }
    paired.filter(col("__rn") % 2 === 1 && col(s"site2_${siteCols.head}").isNotNull)
      .drop("__rn")
      .withColumnsRenamed(siteCols.map(c => c -> s"site1_$c").toMap)
  }

  // ---- J5/J6: germline subtraction ----
  /** J5 (pedmatch:303): somatic CNV = tumor genes absent from normal. */
  def subtractGermlineByGene(tumor: DataFrame, normal: DataFrame,
                             geneCol: String = "Hugo_Symbol"): DataFrame =
    tumor.join(normal.select(geneCol).distinct(), Seq(geneCol), "left_anti")

  /** J6 (pedmatch:172-179): fusion germline subtraction on an explicit
    * key; `keepFlag=true` returns the annotated frame (indicator form)
    * instead of dropping. */
  def subtractGermline(tumor: DataFrame, normal: DataFrame,
                       keys: Seq[String], keepFlag: Boolean = false): DataFrame =
    if (!keepFlag) tumor.join(normal.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    else tumor.join(
      normal.select(keys.map(col): _*).distinct()
        .withColumn("__germline", lit(true)),
      keys, "left")
      .withColumn("germline", coalesce(col("__germline"), lit(false)))
      .drop("__germline")

  // ---- J7: VAF lookup join (pedmatch:685-686) ----
  /** The reference's O(n·m) per-row scan as a broadcast hash join:
    * first AF value per (Chromosome, Start_Position), '' when absent. */
  def addVaf(maf: DataFrame, af: DataFrame,
             afValueCol: String = "AF"): DataFrame = {
    val keys = Seq("Chromosome", "Start_Position")
    val lookup = af.select((keys.map(col) :+ col(afValueCol)): _*)
      .dropDuplicates(keys)
    maf.join(broadcast(lookup), keys, "left")
      .withColumn("t_vaf", coalesce(col(afValueCol), lit("")))
      .drop(afValueCol)
  }

  // ---- F8 + GISTIC: copy number → log2 → discrete call ----
  def copyNumberCalls(df: DataFrame, cnCol: String): DataFrame =
    df.withColumn("log2r", ColumnFns.log2Ratio(col(cnCol)))
      .withColumn("gistic", ColumnFns.gisticBin(col("log2r")))
}
