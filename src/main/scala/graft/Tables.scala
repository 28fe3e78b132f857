package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf*`. All engine
  * queries read through here so schema expectations live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) (which Spark's
    // parquet reader rejects unless read as epoch-nanos long) in some
    // generator versions and TIMESTAMP(MICROS) in others. The engine
    // contract is `ts: epoch-nanos long` either way — the DuckDB
    // oracle side uses epoch_ns(ts) for the same value.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case LongType => df // physical INT64 nanos, already the contract
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // wall-clock micros; the harness pins the session to UTC, so
        // the plain cast reads the same instant the oracle's epoch_ns
        // sees (both treat the value as UTC wall time)
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        sys.error(s"unexpected events.ts type $other in $dir")
    }
  }

  /** Register every table as a temp view so `spark.sql` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
