package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema'd readers for the reference's file formats (SURVEY.md §2.1
  * S1–S10). All are schema-on-read (`spark.read.schema(...)`) — the
  * pandas-era post-hoc casts and `.0`-repair hacks (SURVEY §1.3) are
  * unnecessary once types are declared up front. Gzip inputs are
  * transparent (S9): Spark's text/csv readers decompress by extension.
  */
object Readers {

  // ---- S1/S2: TSV / CSV with header ----

  def tsv(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("sep", "\t").option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema)
      .csv(path)
  }

  def csv(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  // ---- manifests (SURVEY §1.2; cnv.py:33, pedmatch:27, vcf_anno:496) --

  val cnvManifestSchema: StructType = StructType(Seq(
    StructField("sample_id", StringType),
    StructField("s3_url", StringType),
    StructField("file_name", StringType),
    StructField("md5sum", StringType),
    StructField("file_size", LongType)))

  val pedmatchManifestSchema: StructType =
    StructType(cnvManifestSchema.fields ++ Seq(
      StructField("participant_id", StringType),
      StructField("sample_type", StringType)))

  val vcfAnnoManifestSchema: StructType = StructType(Seq(
    StructField("sample", StringType),
    StructField("md5sum", StringType),
    StructField("file_url", StringType)))

  // ---- S3: VCF (comment '#' skip, injected names, trailing samples) --

  val vcfFixedCols: Seq[String] =
    Seq("CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT")

  /** VCF body as a DataFrame: 9 fixed columns + one string column per
    * genotype sample (names supplied by the caller, as the reference
    * does at pedmatch:66). POS is typed long; everything else string
    * (INFO/FORMAT stay packed for the extractors in ColumnFns). */
  def vcf(spark: SparkSession, path: String,
          sampleCols: Seq[String]): DataFrame = {
    val fields =
      StructField("CHROM", StringType) +: StructField("POS", LongType) +:
        vcfFixedCols.drop(2).map(StructField(_, StringType)) ++:
        sampleCols.map(StructField(_, StringType))
    spark.read
      .option("sep", "\t").option("comment", "#").option("header", "false")
      .schema(StructType(fields.toArray))
      .csv(path)
  }

  // ---- S4: MAF (TSV, '#' comments, header line) ----

  def maf(spark: SparkSession, path: String,
          schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("sep", "\t").option("comment", "#").option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  // ---- S5: GTF (headerless 9 positional cols, '#' comments) ----

  val gtfCols: Seq[String] = Seq("chrom", "source", "feature", "start",
    "end", "score", "strand", "frame", "attributes")

  def gtf(spark: SparkSession, path: String): DataFrame = {
    val fields = gtfCols.map {
      case c @ ("start" | "end") => StructField(c, LongType)
      case c => StructField(c, StringType)
    }
    spark.read
      .option("sep", "\t").option("comment", "#").option("header", "false")
      .schema(StructType(fields)).csv(path)
  }

  // ---- BED (0-based half-open; cnv.py:380-385) ----

  def bed(spark: SparkSession, path: String,
          extraCols: Seq[String] = Seq("name")): DataFrame = {
    val fields = Seq(StructField("chrom", StringType),
      StructField("start", LongType), StructField("end", LongType)) ++
      extraCols.map(StructField(_, StringType))
    spark.read.option("sep", "\t").option("header", "false")
      .schema(StructType(fields)).csv(path)
  }

  // ---- SEG (cBio; cnv.py:288-306) ----

  val segSchema: StructType = StructType(Seq(
    StructField("ID", StringType), StructField("chrom", StringType),
    StructField("loc.start", LongType), StructField("loc.end", LongType),
    StructField("num.mark", LongType), StructField("seg.mean", DoubleType)))

  // ---- S6: nested CNV JSON (cnv.py:198-217) → long segment table ----

  val cnvJsonSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("sample_name", StringType)))),
    StructField("segments", ArrayType(StructType(Seq(
      StructField("position", StructType(Seq(
        StructField("chrom", StringType), StructField("start", LongType),
        StructField("end", LongType), StructField("length", LongType)))),
      StructField("cnv", StructType(Seq(
        StructField("log2_copy_ratio", DoubleType),
        StructField("cnv_supporting_points", LongType),
        StructField("cnv_supporting_reads", LongType),
        StructField("log2_pval", DoubleType),
        StructField("log2_copy_ratio_90per_ci_low", DoubleType),
        StructField("log2_copy_ratio_90per_ci_high", DoubleType))))))))))

  /** One JSON document per sample (multiLine) → exploded 12-col segment
    * rows (G1; SEGMENT_COLUMNS_COUNT at cnv.py:16). participant/sample
    * split follows cnv.py:204-205 (sample_name = 'PARTICIPANT-SAMPLE').
    * chrom arrives 'chrN' and is stripped as at cnv.py:282. */
  def cnvSegments(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(cnvJsonSchema).option("multiLine", "true").json(path)
      .select(col("metadata.sample_name").as("sample_name"),
        explode(col("segments")).as("seg"))
      .select(
        split(col("sample_name"), "-").getItem(0).as("participant"),
        col("sample_name").as("sample_id"),
        regexp_replace(col("seg.position.chrom"), "^chr", "").as("chrom"),
        col("seg.position.start").as("start"),
        col("seg.position.end").as("end"),
        col("seg.position.length").as("length"),
        col("seg.cnv.log2_copy_ratio").as("log2ratio"),
        col("seg.cnv.cnv_supporting_points").as("num_points"),
        col("seg.cnv.cnv_supporting_reads").as("num_reads"),
        col("seg.cnv.log2_pval").as("log2_p_value"),
        col("seg.cnv.log2_copy_ratio_90per_ci_low").as("log2_ci_low"),
        col("seg.cnv.log2_copy_ratio_90per_ci_high").as("log2_ci_high"))

  // ---- S7: Excel scan (pedmatch:24; mci:24-37 sheet_name=...) ----

  /** Excel manifest scan: header row = column names, every cell read
    * as string (xlsx stores numbers as decimal text), optional `schema`
    * casts columns by name afterwards — same shape discipline as the
    * other schema'd readers. The parse itself (sources.XlsxParse, no
    * external lib) runs inside `mapPartitions` over a `binaryFile`
    * scan, so a directory of workbook files fans out across the
    * cluster; only the header peek (one file, one sheet) runs on the
    * driver. Empty-string cells become nulls (pandas-NaN analog). */
  def xlsx(spark: SparkSession, path: String,
           sheet: Option[String] = None,
           schema: Option[StructType] = None): DataFrame = {
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val firstFile =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".xlsx")).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(
            s"xlsx: no .xlsx files under $path"))
      else p
    val headerBytes = {
      val in = fs.open(firstFile)
      try in.readAllBytes() finally in.close()
    }
    val header = XlsxParse.sheetRows(headerBytes, sheet, maxRows = 1).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"xlsx: empty sheet in $firstFile"))
      .map(h => if (h == null) "" else h)
    val n = header.length
    val outSchema = StructType(header.map(StructField(_, StringType)))

    import org.apache.spark.sql.{Encoders, Row}
    val raw = spark.read.format("binaryFile").load(path)
      .select("content")
    val parsed = raw.mapPartitions { files =>
      files.flatMap { r =>
        XlsxParse.sheetRows(r.getAs[Array[Byte]](0), sheet)
          .drop(1) // per-file header row
          .map { cells =>
            val padded = cells.padTo(n, null: String).take(n)
              .map(c => if (c == null || c.isEmpty) null else c)
            Row.fromSeq(padded)
          }
      }
    }(Encoders.row(outSchema))
    schema.fold(parsed) { s =>
      parsed.select(s.fields.map(f =>
        col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    }
  }

  // ---- S8: whitespace-split scan (wc -l output; pedmatch:485) ----

  def whitespaceSplit(spark: SparkSession, path: String,
                      names: Seq[String]): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    spark.read.text(path).select(
      names.zipWithIndex.map { case (n, i) => parts.getItem(i).as(n) }: _*)
  }

  // ---- S10: mysqldump statistics scan (src/utils.py:326-394) ----

  /** Count of value-tuples on one line: "),(" separators + 1. */
  private def tupleCount(c: Column): Column =
    size(split(c, "\\),\\s*\\("))

  /** The positional markers of a dump — the ONLY lines whose table
    * association is line-position state: `CREATE TABLE` openers and
    * bare `INSERT INTO ... VALUES` headers whose tuples continue on
    * following lines. Complete `INSERT INTO t VALUES (...);` lines are
    * NOT markers — they self-identify (see dumpStats). Public so tests
    * can assert the marker set stays statement-sized, not row-sized. */
  def dumpMarkers(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .select(col("value"), monotonically_increasing_id().as("off"))
    lines
      .withColumn("create_tbl",
        regexp_extract(col("value"), "^CREATE TABLE `([^`]+)`", 1))
      .withColumn("insert_tbl",
        when(col("value").rlike("^INSERT INTO `[^`]+`.*VALUES\\s*$"),
          regexp_extract(col("value"), "^INSERT INTO `([^`]+)`", 1))
          .otherwise(""))
      .filter(col("create_tbl") =!= "" || col("insert_tbl") =!= "")
      .select(col("off").as("start_off"),
        when(col("create_tbl") =!= "", col("create_tbl"))
          .otherwise(col("insert_tbl")).as("tbl"),
        (col("create_tbl") =!= "").as("is_create"))
  }

  /** Two facts per table from a SQL dump (src/utils.py:326-394):
    * column counts from `CREATE TABLE` blocks, row counts from INSERT
    * value rows.
    *
    * Scale design: complete `INSERT INTO t VALUES (...);` lines —
    * which is EVERY data row in a --skip-extended-insert dump such as
    * `Writers.sqlDump`'s own output — self-identify their table, so
    * they are counted with a plain hash aggregation: no ordering, no
    * window, no join. Positional carry (a global sort + broadcast
    * range join on `monotonically_increasing_id`, which is
    * file-ordered because a single file's partitions are
    * offset-ordered) is reserved for lines that genuinely need it:
    * column definitions inside CREATE blocks and `(...)` continuation
    * lines under a bare multi-line INSERT header. Both marker kinds
    * are statement-sized (one per table / one per extended statement),
    * so the window frame stays tiny no matter how many rows the dump
    * holds.
    */
  def dumpStats(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = spark.read.text(path)
      .select(col("value"), monotonically_increasing_id().as("off"))

    // Self-identifying complete INSERT lines: direct groupBy, scales
    // with file size (the 100 TB path). `.*?` admits an optional
    // column list (--complete-insert form: INSERT INTO `t` (a,b)
    // VALUES ...); tuples are counted in the VALUES part only, so a
    // column list never inflates the row count.
    val direct = lines
      .select(regexp_extract(col("value"),
        "^INSERT INTO `([^`]+)`.*?VALUES\\s*\\(", 1).as("tbl"),
        regexp_extract(col("value"), "VALUES\\s*(\\(.*)", 1).as("vals"))
      .filter(col("tbl") =!= "")
      .groupBy("tbl")
      .agg(sum(tupleCount(col("vals"))).as("direct_rows"))

    // Position-carried lines: column defs + tuple continuations only.
    val markers = dumpMarkers(spark, path)
    val w = Window.orderBy("start_off") // tiny frame: markers only
    val ranges = markers.withColumn("end_off",
      coalesce(lead(col("start_off"), 1).over(w), lit(Long.MaxValue)))
    val carried = lines
      .filter(col("value").rlike("^\\s+`[^`]+`") ||
        col("value").startsWith("("))
      .join(broadcast(ranges),
        col("off") >= col("start_off") && col("off") < col("end_off"))
      .groupBy("tbl")
      .agg(
        sum(when(col("is_create") &&
          col("value").rlike("^\\s+`[^`]+`"), 1).otherwise(0))
          .as("column_count"),
        sum(when(!col("is_create") && col("value").startsWith("("),
          tupleCount(col("value"))).otherwise(0)).as("carried_rows"))

    carried.join(direct, Seq("tbl"), "full_outer")
      .select(col("tbl").as("table_name"),
        coalesce(col("column_count"), lit(0L)).as("column_count"),
        (coalesce(col("carried_rows"), lit(0L)) +
          coalesce(col("direct_rows"), lit(0L))).as("row_count"))
  }

  // ---- S17: line-filtered copy (strip USE/CREATE DATABASE) ----

  def stripDumpHeaders(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .filter(!col("value").rlike("^USE |^CREATE DATABASE "))
}
