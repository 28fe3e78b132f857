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

  /** Plain partitioned-parquet write (no catalog table): one directory
    * per partition value, so reads filtered on `partitionKeys` prune
    * whole directories before any I/O (`PartitionFilters` in the scan,
    * verified in StorageSpec). The corpus layout knob: partition by
    * low-cardinality routing columns (date, lang, source shard), never
    * by high-cardinality ones — a million tiny directories is the
    * small-file problem with extra steps. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionKeys: Seq[String]): Unit = {
    require(partitionKeys.nonEmpty, "no partition keys")
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionKeys: _*).parquet(path)
  }

  /** Compact a frame to ≈`targetBytes` output files using the plan's
    * own size estimate (no driver collect; the estimate is coarse —
    * parquet encoding typically shrinks it further, so treat
    * `targetBytes` as a lower bound on file size). The answer to the
    * small-file problem a streaming or per-batch ingest leaves behind:
    * read the fragments, write back ceil(bytes/target) files. */
  def compact(df: DataFrame, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // BigInt-safe: stats default to huge sentinels for sources without
    // real estimates — cap BEFORE toInt (a raw toInt wraps negative /
    // to 1 and either throws or un-compacts); 65536 tasks of
    // targetBytes is past any single compaction job's sane size
    val parts = ((bytes + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(65536)).toInt
    df.repartition(parts).write.mode(SaveMode.Overwrite).parquet(path)
  }
}
