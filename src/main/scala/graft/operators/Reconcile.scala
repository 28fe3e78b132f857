package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation / validation operators — the reference's runtime
  * self-checks promoted to first-class library ops (SURVEY.md §5 item
  * 2): expected-vs-observed count matrices (cnv.py:686-711), MAF
  * concat accounting (vcf_anno.py:400-483), dump-vs-DB count
  * reconciliation (restore_db.py:101-124).
  */
object Reconcile {

  /** A1 + J3 + F11 (cnv.py:689-700): count both sides by `keys`,
    * full-outer join, missing→0, flag mismatches. */
  def countMatch(expected: DataFrame, observed: DataFrame,
                 keys: Seq[String]): DataFrame = {
    val e = expected.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("expected_count"))
    val o = observed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("observed_count"))
    e.join(o, keys, "outer")
      .na.fill(0, Seq("expected_count", "observed_count"))
      .withColumn("mismatch", col("expected_count") =!= col("observed_count"))
  }

  /** P8 (cnv.py:32-52): constraint report for a manifest-like frame —
    * per-column null counts and per-key duplicate counts. Returns one
    * row per violated constraint; empty result = valid. */
  def constraintViolations(df: DataFrame, requiredCols: Seq[String],
                           uniqueCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nulls = requiredCols.map { c =>
      df.filter(col(c).isNull)
        .agg(count(lit(1)).as("violations"))
        .select(lit(s"null:$c").as("constraint"), col("violations"))
    }
    val dups = uniqueCols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(coalesce(sum(col("n")), lit(0)).as("violations"))
        .select(lit(s"dup:$c").as("constraint"), col("violations"))
    }
    (nulls ++ dups).reduce(_ unionByName _).filter(col("violations") > 0)
  }

  /** vcf_anno.py:400-483 shape: per-source-file expected line counts
    * vs per-barcode observed rows in the concatenated output, plus a
    * rerun manifest of sources whose rows failed annotation. */
  def concatCheck(manifest: DataFrame, concatenated: DataFrame,
                  fileKey: String, barcodeKey: String,
                  expectedCount: String, failedFlag: Column): DataFrame = {
    val obs = concatenated.groupBy(col(barcodeKey))
      .agg(count(lit(1)).as("observed_rows"),
        sum(when(failedFlag, 1).otherwise(0)).as("failed_rows"))
    manifest.join(obs, manifest(fileKey) === obs(barcodeKey), "left")
      .na.fill(0, Seq("observed_rows", "failed_rows"))
      .withColumn("needs_rerun",
        col("observed_rows") =!= col(expectedCount) || col("failed_rows") > 0)
  }
}
