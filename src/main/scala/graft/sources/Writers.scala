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

  /** Backtick-quoted reference: cBio column names contain dots
    * (`loc.start`, `seg.mean`) which a bare col() would read as a
    * struct path. */
  private def qcol(name: String): Column = col(s"`$name`")

  /** Render nulls per-format before writing: every column is cast to
    * string with `nullAs` substituted. Int-typed doubles print without
    * pandas' `.0` artifacts because the types are true ints. */
  def renderNulls(df: DataFrame, nullAs: String): DataFrame =
    df.select(df.schema.fields.map { f =>
      coalesce(qcol(f.name).cast("string"), lit(nullAs)).as(f.name)
    }.toSeq: _*)

  /** S14: TSV sink. `single=true` reproduces the reference's one-file
    * products (driver-side coalesce — only for outputs small enough to
    * be a single file by contract; matrices at scale should keep their
    * partitioning and be published as a directory). */
  def tsv(df: DataFrame, path: String, nullAs: String = "",
          single: Boolean = false, compression: String = "none"): Unit = {
    val rendered = renderNulls(df, nullAs)
    val out = if (single) rendered.coalesce(1) else rendered
    out.write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      .option("emptyValue", "").option("nullValue", nullAs)
      .option("compression", compression)
      .csv(path)
  }

  /** MAF sink: TSV with the standard `#version` comment line the
    * downstream cBio tooling expects; '' for null ints (SURVEY §1.3). */
  def maf(df: DataFrame, path: String,
          version: String = "#version 2.4",
          compression: String = "none"): Unit = {
    import org.apache.spark.sql.functions.concat_ws
    val rendered = renderNulls(df, "")
    val header = version + "\n" + df.columns.mkString("\t")
    val spark = df.sparkSession
    import spark.implicits._
    val body = rendered.select(
      concat_ws("\t", rendered.columns.toSeq.map(qcol): _*).as("value"))
    // single ordered file: the csv reader treats the first line of
    // EVERY file as the header, so header+body must share one file.
    // compression="gzip" reproduces the reference's gzipped MAF
    // product (vcf_anno.py:667-687); gzip-transparent readers (S9)
    // round-trip it.
    Seq(header).toDF("value").union(body).coalesce(1)
      .write.mode("overwrite").option("compression", compression)
      .text(path)
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
      concat_ws("\t", rendered.columns.toSeq.map(qcol): _*).as("value"))
    Seq(header).toDF("value").union(body).coalesce(1)
      .write.mode("overwrite").text(path)
  }

  /** S15: JDBC sink (the write half the reference delegates to a
    * `mysql` restore pipe, src/utils.py:238-298). Partitioned batch
    * inserts — `batchSize` rows per statement, parallelism = input
    * partitions; cap with `numPartitions` so a 1000-task write doesn't
    * open 1000 connections against one database. */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties = new java.util.Properties(),
           mode: String = "overwrite", batchSize: Int = 1000,
           numPartitions: Int = 8): Unit =
    df.coalesce(math.min(numPartitions, df.rdd.getNumPartitions).max(1))
      .write.mode(mode)
      .option("batchsize", batchSize)
      .jdbc(url, table, props)

  /** MySQL-ish type rendering for the dump snapshot's CREATE block. */
  private def sqlType(dt: org.apache.spark.sql.types.DataType): String =
    dt match {
      case LongType => "BIGINT"
      case IntegerType | ShortType | ByteType => "INT"
      case DoubleType | FloatType => "DOUBLE"
      case BooleanType => "TINYINT"
      case TimestampType => "DATETIME"
      case DateType => "DATE"
      case _ => "TEXT"
    }

  /** One row rendered as a SQL value tuple: strings quoted with
    * doubled-''-escaping (ANSI; NO_BACKSLASH_ESCAPES-compatible),
    * nulls as NULL, numerics verbatim. A control character (\n/\r) in
    * a string value would tear the one-statement-per-line grammar the
    * dump promises (and `Readers.dumpStats` counts) — that is a LOUD
    * error at render time (`raise_error`, no extra scan, the write
    * job aborts uncommitted), not a silently corrupt dump; scrub or
    * encode such values upstream. */
  private def sqlTuple(df: DataFrame): Column =
    concat_ws(",", df.schema.fields.map { f =>
      f.dataType match {
        case StringType | TimestampType | DateType =>
          when(qcol(f.name).isNull, lit("NULL"))
            .when(qcol(f.name).cast("string").rlike("[\\n\\r]"),
              raise_error(concat(
                lit(s"sqlDump: control character in `${f.name}` value: "),
                qcol(f.name).cast("string"))))
            .otherwise(concat(lit("'"),
              regexp_replace(qcol(f.name).cast("string"), "'", "''"),
              lit("'")))
        case BooleanType =>
          when(qcol(f.name).isNull, lit("NULL"))
            .otherwise(when(qcol(f.name), "1").otherwise("0"))
        case _ => coalesce(qcol(f.name).cast("string"), lit("NULL"))
      }
    }.toSeq: _*)

  /** S16: SQL-dump snapshot sink (the export half of
    * src/utils.py:151-211, minus the mysqldump subprocess): one
    * `CREATE DATABASE`/`USE` header, then per table a CREATE block and
    * one single-row `INSERT INTO ... VALUES (...);` line per row
    * (mysqldump --skip-extended-insert format — valid executable SQL,
    * renderable in parallel with no last-row special case, and exactly
    * the grammar Readers.dumpStats counts). Row order within a table
    * follows `orderBy` when given — dumps are reconciliation artifacts,
    * determinism beats speed here. One file by contract (like the
    * reference's dump); body rendering is distributed, only the final
    * concat is single-stream. */
  def sqlDump(tables: Seq[(String, DataFrame)], dbName: String,
              path: String, orderBy: Seq[String] = Nil): Unit = {
    require(tables.nonEmpty, "sqlDump: no tables")
    val spark = tables.head._2.sparkSession
    import spark.implicits._
    def lines(ls: Seq[String]): DataFrame = ls.toDF("value")
    val header = lines(Seq(
      "-- graft SQL dump",
      s"CREATE DATABASE `$dbName`;",
      s"USE `$dbName`;"))
    val parts = tables.map { case (name, df) =>
      val create = lines(
        s"CREATE TABLE `$name` (" +:
          df.schema.fields.map(f => s"  `${f.name}` ${sqlType(f.dataType)},")
            .toSeq :+ ");")
      val ordered =
        if (orderBy.nonEmpty && orderBy.forall(df.columns.contains))
          df.orderBy(orderBy.map(col): _*)
        else df
      val body = ordered.select(
        concat(lit(s"INSERT INTO `$name` VALUES ("), sqlTuple(df), lit(");"))
          .as("value"))
      create.union(body)
    }
    parts.foldLeft(header)(_ union _)
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Continuous CNA matrix: nulls → "NA" (cnv.py:659). */
  def cnaContinuous(df: DataFrame, path: String): Unit =
    tsv(df, path, nullAs = "NA")

  /** Discrete CNA matrix: nulls → 0, all ints (cnv.py:675). */
  def cnaDiscrete(df: DataFrame, path: String): Unit =
    tsv(df, path, nullAs = "0")
}
