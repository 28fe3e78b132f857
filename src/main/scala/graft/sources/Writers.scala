package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sinks replicating the reference's file products (SURVEY.md §2.1
  * S14) including the cBioPortal null-rendering conventions (§1.3):
  * `"NA"` in continuous matrices, `0` in discrete matrices, `''` in
  * MAF integer columns — applied HERE, in the writers, so engine-side
  * columns keep real types and real nulls end to end.
  */
object Writers {

  /** Render nulls per-format before writing: every column is cast to
    * string with `nullAs` substituted. Int-typed doubles print without
    * pandas' `.0` artifacts because the types are true ints. */
  def renderNulls(df: DataFrame, nullAs: String): DataFrame =
    df.select(df.schema.fields.map { f =>
      coalesce(col(f.name).cast("string"), lit(nullAs)).as(f.name)
    }.toSeq: _*)

  /** S14: TSV sink. `single=true` reproduces the reference's one-file
    * products (driver-side coalesce — only for outputs small enough to
    * be a single file by contract; matrices at scale should keep their
    * partitioning and be published as a directory). */
  def tsv(df: DataFrame, path: String, nullAs: String = "",
          single: Boolean = false): Unit = {
    val rendered = renderNulls(df, nullAs)
    val out = if (single) rendered.coalesce(1) else rendered
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("emptyValue", "").option("nullValue", nullAs)
      .csv(path)
  }

  /** MAF sink: TSV with the standard `#version` comment line the
    * downstream cBio tooling expects; '' for null ints (SURVEY §1.3). */
  def maf(df: DataFrame, path: String,
          version: String = "#version 2.4"): Unit = {
    import org.apache.spark.sql.functions.concat_ws
    val rendered = renderNulls(df, "")
    val header = version + "\n" + df.columns.mkString("\t")
    val spark = df.sparkSession
    import spark.implicits._
    val body = rendered.select(
      concat_ws("\t", rendered.columns.map(col): _*).as("value"))
    // single ordered file: the csv reader treats the first line of
    // EVERY file as the header, so header+body must share one file
    Seq(header).toDF("value").union(body).coalesce(1)
      .write.mode("overwrite").text(path)
  }

  /** VCF sink: `##` meta lines + `#CHROM...` header, tab-joined body.
    * (The reference treats VCF headers as opaque line blocks —
    * pedmatch:329-351 — so the writer does too.) */
  def vcf(df: DataFrame, path: String,
          metaLines: Seq[String] = Seq("##fileformat=VCFv4.2")): Unit = {
    import org.apache.spark.sql.functions.concat_ws
    val spark = df.sparkSession
    import spark.implicits._
    val header = (metaLines :+ df.columns.mkString("#", "\t", ""))
      .mkString("\n")
    val rendered = renderNulls(df, ".")
    val body = rendered.select(
      concat_ws("\t", rendered.columns.map(col): _*).as("value"))
    Seq(header).toDF("value").union(body).coalesce(1)
      .write.mode("overwrite").text(path)
  }

  /** Continuous CNA matrix: nulls → "NA" (cnv.py:659). */
  def cnaContinuous(df: DataFrame, path: String): Unit =
    tsv(df, path, nullAs = "NA")

  /** Discrete CNA matrix: nulls → 0, all ints (cnv.py:675). */
  def cnaDiscrete(df: DataFrame, path: String): Unit =
    tsv(df, path, nullAs = "0")
}
