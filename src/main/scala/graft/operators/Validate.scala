package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // ---- declarative expectations (generalizing the reference's P8
  // input-contract checks, cnv.py:32-52 / pedmatch:26-46, into a
  // rule-driven report instead of hand-placed asserts) ----

  /** A row-level rule: `violatedWhen` flags the bad rows. */
  def notNull(c: String): (String, Column) =
    (s"not_null($c)", col(c).isNull)
  def inRange(c: String, lo: Double, hi: Double): (String, Column) =
    (s"in_range($c)", col(c).isNull || col(c) < lo || col(c) > hi)
  def inSet(c: String, values: Seq[String]): (String, Column) =
    (s"in_set($c)", col(c).isNull || !col(c).isin(values: _*))
  def matches(c: String, regex: String): (String, Column) =
    (s"matches($c)", col(c).isNull || !col(c).rlike(regex))

  /** Evaluate a declarative expectation suite in ONE aggregation pass
    * (all row-level rules share a single scan; each violation counter
    * is a conditional sum with map-side partial aggregation), plus one
    * key-shuffle per uniqueness rule — never a per-rule table scan.
    *
    * Returns one row per rule: `rule`, `violations`, `total`, `pass`.
    * Uniqueness counts every row whose key tuple occurs more than
    * once (both copies of a duplicate are violations).
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)],
                   unique: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rules.nonEmpty || unique.nonEmpty, "empty expectation suite")
    val rowPart: Option[DataFrame] = if (rules.isEmpty) None else {
      val aggCols = count(lit(1)).as("__total") +:
        rules.zipWithIndex.map { case ((_, pred), i) =>
          coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L)).as(s"__v$i")
        }
      val one = df.agg(aggCols.head, aggCols.tail: _*)
      val entries = rules.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("rule"), col(s"__v$i").as("violations"),
          col("__total").as("total"))
      }
      Some(one.select(explode(array(entries: _*)).as("e"))
        .select(col("e.rule"), col("e.violations"), col("e.total")))
    }
    val uniqueParts = unique.map { case (n, keys) =>
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(coalesce(sum(when(col("__n") > 1, col("__n"))), lit(0L))
          .as("violations"),
          coalesce(sum(col("__n")), lit(0L)).as("total"))
        .select(lit(n).as("rule"), col("violations"), col("total"))
    }
    (rowPart.toSeq ++ uniqueParts).reduce(_ unionByName _)
      .withColumn("pass", (col("violations") === 0L).cast("int"))
  }

  /** Referential-integrity report for declared FK edges: for each
    * (name, child, childKey, parent, parentKey), the child row count
    * and the orphan count (child keys with no parent — a LEFT ANTI
    * join, null FKs counted separately since SQL null never matches).
    * The per-edge scans are independent aggregations unioned into one
    * report frame; AQE broadcasts the smaller side of each anti. */
  def fkReport(edges: Seq[(String, DataFrame, String, DataFrame, String)])
  : DataFrame = {
    require(edges.nonEmpty, "fkReport: no edges")
    edges.map { case (name, child, ck, parent, pk) =>
      val nonNull = child.filter(col(ck).isNotNull)
      val orphans = nonNull.join(
        parent.select(col(pk).as(ck)).distinct(), Seq(ck), "left_anti")
      val nulls = child.filter(col(ck).isNull)
        .agg(count(lit(1)).as("__nn"))
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .crossJoin(nulls)
        .select(lit(name).as("fk"), col("n_child"), col("n_orphans"),
          col("__nn").as("n_null"))
    }.reduce(_ unionByName _)
  }

  /** k-anonymity census over a quasi-identifier combination — the
    * re-identification screen run before releasing or training on
    * user-adjacent data: every row whose QID equivalence class has
    * fewer than `k` members is individually distinguishable. Reports
    * the class-SIZE distribution (one row per observed size, with the
    * class and row counts carried and a violation flag), which is both
    * the audit artifact and the input to suppression decisions. Null
    * QID values form their own class (same as SQL GROUP BY). Two hash
    * aggregations, the second over class sizes — cardinality ≤
    * distinct sizes, effectively metadata. Output: (class_size,
    * n_classes, n_rows, violates). */
  def kAnonymity(df: DataFrame, qidCols: Seq[String], k: Int): DataFrame = {
    require(qidCols.nonEmpty && k > 0, s"need QID cols and k > 0, got $k")
    df.groupBy(qidCols.map(col): _*).agg(count(lit(1)).as("class_size"))
      .groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .withColumn("violates",
        when(col("class_size") < k, 1).otherwise(0))
  }
}
