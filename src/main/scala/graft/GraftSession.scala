package graft

import org.apache.spark.sql.SparkSession

/** Front door: a SparkSession builder pre-wired with the engine's
  * recommended configuration. Local runs get the test profile
  * (local[n], n shuffle partitions); cluster deployments inherit
  * whatever master/resource config spark-submit provides and only the
  * SQL-level settings below.
  *
  * Scale rationale (SURVEY.md §4): AQE on for runtime coalescing and
  * skew-join splitting; shuffle partitions sized to cores locally but
  * left to AQE + `spark.sql.shuffle.partitions` tuning on a cluster;
  * 128 MB file split targets; the graft SQL functions registered via
  * extensions.
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      // events-style nanos timestamps read as epoch-nanos longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // object-store wiring from the environment when present (the
      // reference's LOCALSTACK_ENDPOINT_URL switch, utils.py:83-148)
      .configIfSet("spark.hadoop.fs.s3a.endpoint",
        sys.env.get("GRAFT_S3_ENDPOINT"))

  /** Local test/bench profile. */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  private implicit class RichBuilder(val b: SparkSession.Builder)
    extends AnyVal {
    def configIfSet(key: String, value: Option[String]): SparkSession.Builder =
      value.fold(b)(v => b.config(key, v))
  }
}
