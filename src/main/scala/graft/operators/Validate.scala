package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transfer/contract validation (SURVEY.md §5 item 1): the md5 check
  * the reference runs per downloaded file (cnv.py:57-77,124-133;
  * vcf_anno.py:41-61) and the resume work-list derivation
  * (vcf_anno.py:542-639, §2.11 X6) — as distributed ops.
  */
object Validate {

  /** F14: checksum every file under `dir` (distributed binaryFile
    * scan — each file one row, digest computed where the bytes are)
    * and reconcile against the manifest's md5sum by file name.
    * Returns one row per manifest entry with status:
    * OK / MD5_MISMATCH / SIZE_MISMATCH / MISSING. When `sizeCol` is
    * given (the manifest's file_size column — a required manifest
    * field in the reference, cnv.py:33), a byte-count mismatch is
    * reported as the more precise cause (truncated transfer) ahead of
    * the md5 it necessarily also breaks. */
  def md5Check(spark: SparkSession, dir: String, manifest: DataFrame,
               fileNameCol: String = "file_name",
               md5Col: String = "md5sum",
               sizeCol: Option[String] = None): DataFrame = {
    val observed = spark.read.format("binaryFile")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as(fileNameCol),
        md5(col("content")).as("observed_md5"),
        col("length").as("observed_size"))
    val sizeMismatch = sizeCol
      .map(s => col("observed_size") =!= col(s).cast("long"))
      .getOrElse(lit(false))
    manifest.join(observed, Seq(fileNameCol), "left")
      .withColumn("status",
        when(col("observed_md5").isNull, "MISSING")
          .when(sizeMismatch, "SIZE_MISMATCH")
          .when(col("observed_md5") =!= col(md5Col), "MD5_MISMATCH")
          .otherwise("OK"))
  }

  /** X6/A9: resume work-list — expected outputs minus already-produced
    * ones; reruns are exactly the returned rows (idempotent outputs
    * make the subtraction safe). */
  def pendingWork(expected: DataFrame, existing: DataFrame,
                  keys: Seq[String]): DataFrame =
    expected.join(existing.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
}
