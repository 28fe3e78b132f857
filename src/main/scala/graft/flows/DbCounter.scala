package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Readers

/** Dump-vs-database count reconciliation (SURVEY.md §3 tail,
  * restore_db.py:101-124 + src/utils.py:301-448): table/column/row
  * count matrices from a mysqldump (distributed text scan) and from a
  * live DB (JDBC), inner-joined on table_name with match flags (J4).
  */
object DbCounter {

  /** S10: stats straight from the dump file. */
  def dumpCounts(spark: SparkSession, dumpPath: String): DataFrame =
    Readers.dumpStats(spark, dumpPath)

  /** S11: stats from a live database over JDBC. Catalog tables via
    * JDBC metadata; per-table COUNT(*) pushed down as subqueries. */
  def dbCounts(spark: SparkSession, url: String, props: java.util.Properties,
               tables: Seq[String]): DataFrame = {
    import spark.implicits._
    tables.map { t =>
      // "AS q" alias form parses in MySQL and Derby alike; COUNT(*)
      // surfaces as INT or BIGINT depending on dialect
      val n = spark.read.jdbc(url, s"(SELECT COUNT(*) AS n FROM $t) AS q", props)
        .collect()(0).getAs[Number](0).longValue()
      val cols = spark.read.jdbc(url, t, props).schema.length.toLong
      (t, cols, n)
    }.toDF("table_name", "column_count", "row_count")
  }

  /** J4 + F11 (restore_db.py:115-117). */
  def reconcile(dump: DataFrame, db: DataFrame): DataFrame =
    dump.withColumnsRenamed(Map(
        "column_count" -> "dump_columns", "row_count" -> "dump_rows"))
      .join(db.withColumnsRenamed(Map(
        "column_count" -> "db_columns", "row_count" -> "db_rows")),
        Seq("table_name"), "inner")
      .withColumn("columns_match", col("dump_columns") === col("db_columns"))
      .withColumn("rows_match", col("dump_rows") === col("db_rows"))
}
