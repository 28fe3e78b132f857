package graft

import java.nio.file.{Files, Paths}
import graft.operators.StudyValidate

class StudyValidateSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, name: String, content: String): Unit = {
    val p = Paths.get(dir, name)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
    ()
  }

  /** A minimal well-formed study: clinical + CNA matrix + case list. */
  private def writeCleanStudy(dir: String): Unit = {
    write(dir, "meta_study.txt",
      "cancer_study_identifier: study_x\nname: Study X\n")
    write(dir, "meta_clinical_sample.txt",
      "cancer_study_identifier: study_x\n" +
        "genetic_alteration_type: CLINICAL\n" +
        "data_filename: data_clinical_sample.txt\n")
    write(dir, "data_clinical_sample.txt",
      "#Patient ID\tSample ID\n" +
        "PATIENT_ID\tSAMPLE_ID\n" +
        "P1\tS1\nP1\tS2\nP2\tS3\n")
    write(dir, "meta_cna.txt",
      "cancer_study_identifier: study_x\n" +
        "genetic_alteration_type: COPY_NUMBER_ALTERATION\n" +
        "data_filename: data_cna.txt\n")
    write(dir, "data_cna.txt",
      "Hugo_Symbol\tEntrez_Gene_Id\tS1\tS2\tS3\n" +
        "TP53\t7157\t0\t-1\t2\n")
    write(dir, "case_lists/cases_all.txt",
      "cancer_study_identifier: study_x\n" +
        "stable_id: study_x_all\n" +
        "case_list_ids: S1\tS2\tS3\n")
  }

  test("clean study: no findings, exit code 0") {
    val dir = Files.createTempDirectory("study_clean").toString
    writeCleanStudy(dir)
    val findings = StudyValidate.validateStudyDir(spark, dir)
    assert(findings.count() == 0)
    assert(StudyValidate.exitCode(findings) == 0)
  }

  test("broken study: every invariant fires with the right severity") {
    val dir = Files.createTempDirectory("study_broken").toString
    writeCleanStudy(dir)
    // break 1: meta referencing a data file that does not exist
    write(dir, "meta_expression.txt",
      "cancer_study_identifier: study_x\n" +
        "genetic_alteration_type: MRNA_EXPRESSION\n" +
        "data_filename: data_expression.txt\n")
    // break 2: a data file no meta references (warning, not error)
    write(dir, "data_orphan.txt", "a\tb\n1\t2\n")
    // break 3: second study id
    write(dir, "meta_other.txt",
      "cancer_study_identifier: study_y\nname: wrong\n")
    // break 4: matrix column S9 not in clinical; case list adds S8
    write(dir, "data_cna.txt",
      "Hugo_Symbol\tEntrez_Gene_Id\tS1\tS9\n" +
        "TP53\t7157\t0\t2\n")
    write(dir, "case_lists/cases_extra.txt",
      "cancer_study_identifier: study_x\n" +
        "stable_id: study_x_extra\n" +
        "case_list_ids: S1\tS8\n")
    // break 5: duplicate sample + sample with no patient
    write(dir, "data_clinical_sample.txt",
      "#Patient ID\tSample ID\n" +
        "PATIENT_ID\tSAMPLE_ID\n" +
        "P1\tS1\nP1\tS1\nP2\tS3\n\tS2\n")

    val findings = StudyValidate.validateStudyDir(spark, dir)
      .select("severity", "rule", "detail")
      .as[(String, String, String)].collect()
    val byRule = findings.groupBy(_._2)
    assert(byRule("meta_data_file_exists").head._3
      .contains("data_expression.txt"))
    assert(byRule("data_file_has_meta")
      .exists(_._3.contains("data_orphan.txt")))
    assert(byRule("data_file_has_meta").head._1 == "WARNING")
    assert(byRule("study_id_consistent").head._3.endsWith("2"))
    assert(byRule("matrix_samples_in_clinical").map(_._3).toSet ==
      Set("data_cna.txt column S9 not in clinical"))
    assert(byRule("case_list_samples_in_clinical")
      .exists(_._3.contains("S8")))
    assert(byRule("sample_id_unique").exists(_._3.contains("S1")))
    assert(byRule("sample_has_patient").exists(_._3.contains("S2")))
    assert(StudyValidate.exitCode(
      StudyValidate.validateStudyDir(spark, dir)) == 1)
  }

  test("warnings-only study maps to the reference's exit code 3") {
    val dir = Files.createTempDirectory("study_warn").toString
    writeCleanStudy(dir)
    write(dir, "data_orphan.txt", "a\tb\n1\t2\n")
    val findings = StudyValidate.validateStudyDir(spark, dir)
    assert(StudyValidate.exitCode(findings) == 3)
  }

  test("coverageReport: aggregate counts match row-level missing set") {
    val clinical = Seq("S1", "S2", "S3").toDF("sample_id")
    val matrix = Seq("S1", "S9", "S9", "S8").toDF("sample_id")
    val caseList = Seq("S1", "S2").toDF("sample_id")
    val rep = StudyValidate.coverageReport(
      Seq(("matrix", matrix, "sample_id"),
        ("case_list", caseList, "sample_id")),
      clinical, "sample_id")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(rep == Set(("matrix", 3L, 2L, false),
      ("case_list", 2L, 0L, true)))
    val missing = StudyValidate.missingSamples(matrix, "sample_id",
      clinical, "sample_id").as[String].collect().toSet
    assert(missing == Set("S8", "S9"))
  }
}
