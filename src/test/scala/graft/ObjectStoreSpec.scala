package graft

import java.nio.file.Files
import graft.sources.ObjectStore

/** S12. The facade runs the same Hadoop FileSystem code path an
  * `s3a://` deployment uses; here it is exercised over `file://`
  * (this sandbox ships no hadoop-aws/aws-sdk jars and has no
  * egress — the final test PINS that boundary so the limitation is
  * explicit, not silent).
  */
class ObjectStoreSpec extends SparkSpec {

  private def touch(dir: java.nio.file.Path, rel: String,
                    content: String): Unit = {
    val p = dir.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes("UTF-8"))
    ()
  }

  test("upload/download/exists/delete round-trip over file://") {
    val local = Files.createTempDirectory("os_local")
    val store = Files.createTempDirectory("os_store")
    touch(local, "manifest.tsv", "a\tb\n1\t2\n")
    val dest = s"file://$store/bucket/manifest.tsv"
    assert(!ObjectStore.exists(spark, dest))
    ObjectStore.upload(spark, s"$local/manifest.tsv", dest)
    assert(ObjectStore.exists(spark, dest))
    val back = local.resolve("back.tsv").toString
    ObjectStore.download(spark, dest, back)
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(back)),
      "UTF-8") == "a\tb\n1\t2\n")
    assert(ObjectStore.delete(spark, dest))
    assert(!ObjectStore.exists(spark, dest))
  }

  test("downloadPrefix recreates the key structure (folder_dl)") {
    val store = Files.createTempDirectory("os_prefix")
    touch(store, "study/meta_study.txt", "cancer_study_identifier: x\n")
    touch(store, "study/case_lists/cases_all.txt", "stable_id: all\n")
    val out = Files.createTempDirectory("os_out")
    ObjectStore.downloadPrefix(spark, s"file://$store/study",
      out.toString)
    assert(Files.exists(out.resolve("meta_study.txt")))
    assert(Files.exists(out.resolve("case_lists/cases_all.txt")))
    val listed = ObjectStore.list(spark, s"file://$store/study")
      .collect().map(_.getString(0)).toSet
    assert(listed == Set("meta_study.txt", "case_lists/cases_all.txt"))
  }

  test("s3aConfig lands endpoint + path-style + creds in hadoopConf") {
    ObjectStore.s3aConfig(spark, "http://localhost:9000", "ak", "sk")
    val c = spark.sparkContext.hadoopConfiguration
    assert(c.get("fs.s3a.endpoint") == "http://localhost:9000")
    assert(c.get("fs.s3a.path.style.access") == "true")
    assert(c.get("fs.s3a.access.key") == "ak")
    assert(c.get("fs.s3a.secret.key") == "sk")
    assert(c.get("fs.s3a.connection.ssl.enabled") == "false")
  }

  test("sandbox boundary: the s3a scheme itself is not instantiable " +
    "here (no hadoop-aws jar, no egress) — config+classpath, not code") {
    val loadable =
      try { Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem"); true }
      catch { case _: ClassNotFoundException => false }
    // If a future environment ships the jar, this assert flips and the
    // round-trip below should be promoted to a live minio/localstack
    // test; until then the boundary is pinned, not silently skipped.
    assert(!loadable,
      "hadoop-aws appeared on the classpath: promote S12 to a live test")
  }
}
