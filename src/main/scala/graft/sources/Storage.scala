package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** Append `df` into an existing bucketed table under the TABLE'S OWN
    * bucket spec (keys, count, sort) read from the catalog — the
    * ingest leg of a store lifecycle: write once with
    * [[writeBucketed]], then fold each accepted batch in without
    * rewriting the corpus. Each append adds ≤ (writing tasks ×
    * buckets) files — the batch is NOT re-shuffled to bucket-align
    * (that would put a shuffle on the ingest hot path), so every
    * writing task opens a file per bucket it sees; measured: 4 gens ×
    * 32 tasks × 32 buckets = 4096 files on the sf10-store fixture,
    * which [[compactBucketed]] collapsed back to 32 in 2.6 s. Reads
    * stay bucketed (a bucket's files are one scan partition),
    * so probe joins on the bucket keys remain exchange-free across
    * generations. After many small batches, reclaim the file count
    * with [[compactBucketed]]. The spec is taken from the catalog
    * rather than caller arguments so a drifted caller cannot corrupt
    * the table's co-location contract — Spark itself re-verifies the
    * spec on append. */
  def appendBucketed(spark: SparkSession, df: DataFrame, table: String): Unit = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed; appendBucketed requires a bucketed table"))
    var w = df.write.mode(SaveMode.Append).format("parquet")
      .bucketBy(spec.numBuckets,
        spec.bucketColumnNames.head, spec.bucketColumnNames.tail: _*)
    if (spec.sortColumnNames.nonEmpty)
      w = w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    // the catalog's PARTITION columns ride along too — without them
    // Spark rejects the append on a partitioned+bucketed table
    // ("specified partitioning does not match the existing table")
    if (meta.partitionColumnNames.nonEmpty)
      w = w.partitionBy(meta.partitionColumnNames: _*)
    w.saveAsTable(table)
  }

  /** Compact a bucketed table accumulated by [[appendBucketed]] back
    * to ONE file per bucket, preserving the bucket spec (probe plans
    * are invariant — pinned in StorageSpec), with ZERO shuffle: the
    * bucketed scan already yields exactly one partition per bucket,
    * so the bucketed re-write opens exactly one file per task. The
    * only subtlety is `autoBucketedScan`: with nothing downstream
    * "needing" the distribution, the planner would decompose the scan
    * into file splits (and an explicit repartition is elided BEFORE
    * that decision, measured — 13 files out of a 4-bucket rewrite),
    * so bucketed scanning is forced ON for the duration. The new
    * generation lands at `newPath` as a temp table, then swaps names
    * — never an in-place overwrite, so the old files stay readable
    * until the swap commits. Returns the OLD generation's directory
    * for deferred deletion by the caller's retention policy.
    * A maintenance op run every N batches, never on the query path. */
  def compactBucketed(spark: SparkSession, table: String,
                      newPath: String): String = {
    val cat = spark.sessionState.catalog
    val meta = cat.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"table $table is not bucketed; compactBucketed requires a bucketed table"))
    val oldPath = meta.location.toString
    val tmp = table + "_compacting"
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    try {
      spark.conf.set(auto, "false")
      // partition columns preserved — dropping them here would
      // silently cost the new generation its directory pruning
      writeBucketed(spark.table(table), tmp, newPath,
        spec.bucketColumnNames, spec.numBuckets, spec.sortColumnNames,
        meta.partitionColumnNames)
    } finally spark.conf.set(auto, prev)
    spark.sql(s"DROP TABLE `$table`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    oldPath
  }

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
