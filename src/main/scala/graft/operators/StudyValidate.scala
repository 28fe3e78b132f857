package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Study-level cross-file validation — X9's data core (SURVEY §2).
  *
  * The reference drives cBioPortal's `validateData.py` as a dry-run
  * subprocess before every import (ref
  * `workflows/cbio_dataset_load_remove.py:10-86`; exit code 0 = clean,
  * 3 = warnings, anything else fails the flow). The *data* invariants
  * that dry-run enforces over a study directory are re-expressed here
  * as Spark ops over the study's frames:
  *
  *  - every `meta_*.txt` that names a `data_filename` points at a
  *    file that exists, and all meta files agree on one
  *    `cancer_study_identifier`;
  *  - every sample column of a profile matrix (CNA, expression, ...)
  *    appears in the clinical sample file;
  *  - every sample listed in a `case_lists` roster file appears in
  *    the clinical sample file;
  *  - clinical `SAMPLE_ID`s are unique and carry a `PATIENT_ID`.
  *
  * Scale shape: the clinical frame is the big side (millions of
  * samples in an aggregated portal) and every check is one
  * distinct + left-anti join against it — the referenced sets
  * (matrix headers, case lists) are metadata-sized and broadcast
  * themselves; no check collects the clinical frame.
  */
object StudyValidate {

  /** Parse every `meta_*.txt` under `dir` into long-form
    * (meta_file, key, value) rows — the `key: value` grammar of
    * cBioPortal meta files. One distributed text scan. */
  def metaEntries(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(s"$dir/meta_*.txt")
      .select(element_at(split(input_file_name(), "/"), -1)
        .as("meta_file"),
        explode(split(col("value"), "\n")).as("line"))
      .filter(col("line").contains(":"))
      .select(col("meta_file"),
        trim(substring_index(col("line"), ":", 1)).as("key"),
        trim(expr("substring(line, instr(line, ':') + 1)")).as("value"))

  /** Parse every txt file under `dir`'s `case_lists` into
    * (case_list_file, case_list_id, sample_id) rows — the
    * `case_list_ids:` value is the tab-joined sample roster. */
  def caseListSamples(spark: SparkSession, dir: String): DataFrame = {
    val entries = spark.read.option("wholetext", "true")
      .text(s"$dir/case_lists/*.txt")
      .select(element_at(split(input_file_name(), "/"), -1)
        .as("case_list_file"),
        explode(split(col("value"), "\n")).as("line"))
      .filter(col("line").contains(":"))
      .select(col("case_list_file"),
        trim(substring_index(col("line"), ":", 1)).as("key"),
        trim(expr("substring(line, instr(line, ':') + 1)")).as("value"))
    val ids = entries.filter(col("key") === "case_list_ids")
      .select(col("case_list_file"),
        explode(split(col("value"), "\t")).as("sample_id"))
      .filter(length(trim(col("sample_id"))) > 0)
      .select(col("case_list_file"), trim(col("sample_id")).as("sample_id"))
    val stableId = entries.filter(col("key") === "stable_id")
      .select(col("case_list_file"), col("value").as("case_list_id"))
    ids.join(stableId, Seq("case_list_file"), "left")
      .select("case_list_file", "case_list_id", "sample_id")
  }

  /** Clinical sample frame from the study's
    * `data_clinical_sample.txt` ('#'-prefixed attribute-metadata
    * lines skipped, TSV header row). */
  def clinicalSamples(spark: SparkSession, dir: String,
                      file: String = "data_clinical_sample.txt")
  : DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("comment", "#").csv(s"$dir/$file")

  /** The sample columns of a profile matrix = its header minus the
    * feature columns. Header-only driver read (metadata by
    * construction); the returned single-column frame is
    * broadcast-sized. */
  def matrixSampleColumns(spark: SparkSession, path: String,
                          nonSampleCols: Seq[String] =
                            Seq("Hugo_Symbol", "Entrez_Gene_Id"))
  : DataFrame = {
    import spark.implicits._
    val header = spark.read.option("sep", "\t").option("header", "true")
      .option("comment", "#").csv(path).columns
    header.filterNot(nonSampleCols.contains(_)).toSeq.toDF("sample_id")
  }

  /** One row per coverage check: does every referenced sample appear
    * in the clinical roster? Output (rule, n_referenced, n_missing,
    * pass) — the aggregate form the oracle gate can replay; use
    * [[missingSamples]] for the row-level detail. */
  def coverageReport(checks: Seq[(String, DataFrame, String)],
                     clinical: DataFrame, clinicalIdCol: String)
  : DataFrame = {
    require(checks.nonEmpty, "no coverage checks given")
    val roster = clinical.select(col(clinicalIdCol).as("__cid")).distinct()
    checks.map { case (rule, referenced, idCol) =>
      val refd = referenced.select(col(idCol).as("__rid")).distinct()
      val agg = refd.join(roster, col("__rid") === col("__cid"),
          "left_outer")
        .agg(count(lit(1)).as("n_referenced"),
          coalesce(sum(when(col("__cid").isNull, 1L).otherwise(0L)),
            lit(0L)).as("n_missing"))
      agg.select(lit(rule).as("rule"), col("n_referenced"),
        col("n_missing"), (col("n_missing") === 0).as("pass"))
    }.reduce(_.unionAll(_))
  }

  /** Row-level detail of one coverage check: the referenced sample
    * ids NOT in the clinical roster (distinct, left-anti). */
  def missingSamples(referenced: DataFrame, idCol: String,
                     clinical: DataFrame, clinicalIdCol: String)
  : DataFrame =
    referenced.select(col(idCol).as("sample_id")).distinct()
      .join(clinical.select(col(clinicalIdCol).as("sample_id")).distinct(),
        Seq("sample_id"), "left_anti")

  /** Full study-directory dry-run: parses the directory layout and
    * evaluates every invariant; returns one row per finding —
    * (severity, rule, detail) with severity ERROR/WARNING, empty
    * frame = clean study. Mirrors `validateData.py`'s reporting shape
    * (findings, not a boolean) so callers can map it onto the
    * reference's {0 clean, 3 warnings, else error} exit contract via
    * [[exitCode]]. */
  def validateStudyDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val meta = metaEntries(spark, dir).cache()
    val present = new java.io.File(dir).listFiles()
      .filter(_.isFile).map(_.getName).toSeq.toDF("file_name")

    // meta -> data file agreement (both directions)
    val referencedData = meta.filter(col("key") === "data_filename")
      .select(col("meta_file"), col("value").as("file_name"))
    val missingData = referencedData
      .join(present, Seq("file_name"), "left_anti")
      .select(lit("ERROR").as("severity"),
        lit("meta_data_file_exists").as("rule"),
        concat(col("meta_file"), lit(" -> missing "), col("file_name"))
          .as("detail"))
    val orphanData = present
      .filter(col("file_name").startsWith("data_"))
      .join(referencedData.select("file_name"), Seq("file_name"),
        "left_anti")
      .select(lit("WARNING").as("severity"),
        lit("data_file_has_meta").as("rule"),
        concat(lit("no meta_*.txt references "), col("file_name"))
          .as("detail"))

    // one study id across every meta file
    val idCount = meta.filter(col("key") === "cancer_study_identifier")
      .select("value").distinct()
    val studyIdConflict = idCount
      .agg(count(lit(1)).as("n")).filter(col("n") =!= 1)
      .select(lit("ERROR").as("severity"),
        lit("study_id_consistent").as("rule"),
        concat(lit("distinct cancer_study_identifier values: "),
          col("n")).as("detail"))

    // clinical roster invariants
    val clinical = clinicalSamples(spark, dir).cache()
    val dupSamples = clinical.groupBy("SAMPLE_ID")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .select(lit("ERROR").as("severity"),
        lit("sample_id_unique").as("rule"),
        concat(lit("duplicate SAMPLE_ID "), col("SAMPLE_ID")).as("detail"))
    val noPatient = clinical
      .filter(col("PATIENT_ID").isNull || length(col("PATIENT_ID")) === 0)
      .select(lit("ERROR").as("severity"),
        lit("sample_has_patient").as("rule"),
        concat(lit("SAMPLE_ID "), col("SAMPLE_ID"), lit(" has no PATIENT_ID"))
          .as("detail"))

    // matrix sample columns subset-of clinical roster: every data file a
    // meta marks as a profile matrix (has both data_filename and a
    // genetic_alteration_type that isn't clinical)
    val matrixFiles = meta.filter(col("key") === "genetic_alteration_type" &&
        !col("value").isin("CLINICAL", "CASE_LIST"))
      .select("meta_file")
      .join(referencedData, Seq("meta_file"))
      .select("file_name").as[String].collect()
      // a referenced-but-absent matrix is already an ERROR from the
      // meta_data_file_exists check; only header-read files that exist
      .filter(f => new java.io.File(dir, f).isFile)
    val matrixFindings = matrixFiles.toSeq.map { f =>
      missingSamples(matrixSampleColumns(spark, s"$dir/$f"), "sample_id",
        clinical, "SAMPLE_ID")
        .select(lit("ERROR").as("severity"),
          lit("matrix_samples_in_clinical").as("rule"),
          concat(lit(s"$f column "), col("sample_id"),
            lit(" not in clinical")).as("detail"))
    }

    // case-list rosters subset-of clinical roster
    val caseListDir = new java.io.File(s"$dir/case_lists")
    val caseFindings =
      if (!caseListDir.isDirectory) Seq.empty[DataFrame]
      else Seq(
        missingSamples(caseListSamples(spark, dir), "sample_id",
          clinical, "SAMPLE_ID")
          .select(lit("ERROR").as("severity"),
            lit("case_list_samples_in_clinical").as("rule"),
            concat(lit("case-list sample "), col("sample_id"),
              lit(" not in clinical")).as("detail")))

    (Seq(missingData, orphanData, studyIdConflict, dupSamples,
      noPatient) ++ matrixFindings ++ caseFindings)
      .reduce(_.unionAll(_))
  }

  /** The reference's exit-code contract for a findings frame:
    * 0 clean, 3 warnings only, 1 any error
    * (ref `cbio_dataset_load_remove.py:78-86` treats {0,3} as
    * acceptable). */
  def exitCode(findings: DataFrame): Int = {
    val bySev = findings.groupBy("severity").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (bySev.getOrElse("ERROR", 0L) > 0) 1
    else if (bySev.getOrElse("WARNING", 0L) > 0) 3
    else 0
  }
}
