package graft.sources

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S12: object-store I/O (the reference's boto3 file/folder
  * upload-download helpers, `src/utils.py:83-236`, and its
  * localstack endpoint switch, `utils.py:21-35`) — re-expressed over
  * the Hadoop `FileSystem` API, which is exactly where `s3a://`
  * plugs into Spark in production.
  *
  * Scheme-agnostic by design: the SAME code path serves `file://`
  * (tested here), `hdfs://`, and `s3a://` — an S3 deployment differs
  * only in configuration (`s3aConfig`) plus the `hadoop-aws` +
  * `aws-sdk` jars on the classpath. This sandbox ships neither jar
  * and has no egress, so the s3a scheme itself cannot be
  * instantiated here; `ObjectStoreSpec` pins that boundary
  * explicitly (the facade logic is fully exercised over `file://`,
  * the s3a leg is config + classpath, not code).
  *
  * Scale note: these are control-plane ops (manifests, study dirs,
  * single products) — data-plane reads/writes go through
  * `spark.read`/`df.write` directly against the store URI and
  * parallelize per object/split as usual.
  */
object ObjectStore {

  private def fs(spark: SparkSession, uri: String): FileSystem =
    FileSystem.get(new URI(uri), spark.sparkContext.hadoopConfiguration)

  /** The localstack/minio-style endpoint wiring of the reference's
    * `set_s3_resource` (utils.py:21-35), applied to a LIVE session's
    * Hadoop configuration: custom endpoint, path-style access (the
    * form localstack/minio require), plain credentials. Returns the
    * session for chaining. */
  def s3aConfig(spark: SparkSession, endpoint: String,
                accessKey: String, secretKey: String,
                pathStyle: Boolean = true): SparkSession = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.path.style.access", pathStyle.toString)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.connection.ssl.enabled",
      endpoint.startsWith("https").toString)
    spark
  }

  /** `file_ul` (utils.py:151-236): one local file to one object key. */
  def upload(spark: SparkSession, localFile: String, destUri: String)
  : Unit = {
    val dst = new Path(destUri)
    fs(spark, destUri).copyFromLocalFile(false, true,
      new Path(localFile), dst)
  }

  /** `file_dl` (utils.py:83-110): one object to a local file. */
  def download(spark: SparkSession, srcUri: String, localFile: String)
  : Unit =
    fs(spark, srcUri).copyToLocalFile(false, new Path(srcUri),
      new Path(localFile), true)

  /** `folder_dl` (utils.py:112-148): every object under the prefix,
    * recreating the key structure locally; key-ending-in-'/' marker
    * objects skipped (same rule as the reference). */
  def downloadPrefix(spark: SparkSession, prefixUri: String,
                     localDir: String): Unit = {
    val f = fs(spark, prefixUri)
    val root = new Path(prefixUri)
    val it = f.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !st.getPath.getName.isEmpty) {
        val rel = root.toUri.relativize(st.getPath.toUri).getPath
        val local = new java.io.File(localDir, rel)
        Option(local.getParentFile).foreach(_.mkdirs())
        f.copyToLocalFile(false, st.getPath,
          new Path(local.getAbsolutePath), true)
      }
    }
  }

  /** Object listing as a frame: (key, size, mtime_ms) — the
    * `objects.filter(Prefix=...)` census the reference iterates. */
  def list(spark: SparkSession, prefixUri: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, prefixUri)
    val root = new Path(prefixUri)
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val it = f.listFiles(root, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile)
        buf += ((root.toUri.relativize(st.getPath.toUri).getPath,
          st.getLen, st.getModificationTime))
    }
    buf.toSeq.toDF("key", "size", "mtime_ms")
  }

  def exists(spark: SparkSession, uri: String): Boolean =
    fs(spark, uri).exists(new Path(uri))

  def delete(spark: SparkSession, uri: String,
             recursive: Boolean = false): Boolean =
    fs(spark, uri).delete(new Path(uri), recursive)
}
