package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed/partitioned storage helpers (SURVEY.md §4 "partitioning /
  * shuffle"): pre-shuffle tables ONCE at write time so every later
  * join/aggregation on the bucket keys runs exchange-free.
  *
  * The 100 TB layout for the genomic tables: partition by chrom
  * (partition pruning for per-chromosome queries), bucket by sample_id
  * (co-located sample-keyed joins and pivots). Parquet + explicit
  * bucket counts sized so a bucket ≈ one task's memory budget.
  */
object Storage {

  /** Write `df` bucketed by `bucketKeys` (sorted within buckets) as a
    * catalog table backed by parquet at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketKeys: Seq[String], buckets: Int,
                    sortKeys: Seq[String] = Seq.empty,
                    partitionKeys: Seq[String] = Seq.empty): Unit = {
    var w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path)
      .bucketBy(buckets, bucketKeys.head, bucketKeys.tail: _*)
    if (sortKeys.nonEmpty) w = w.sortBy(sortKeys.head, sortKeys.tail: _*)
    if (partitionKeys.nonEmpty) w = w.partitionBy(partitionKeys: _*)
    w.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
