package graft

import java.nio.file.Files
import graft.operators.Validate

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("md5Check: OK / MD5_MISMATCH / MISSING statuses") {
    val dir = Files.createTempDirectory("graft-md5")
    Files.write(dir.resolve("a.json"), "hello".getBytes)
    Files.write(dir.resolve("b.json"), "world".getBytes)
    val md5hello = "5d41402abc4b2a76b9719d911017c592"
    val manifest = Seq(
      ("s1", "a.json", md5hello),       // correct
      ("s2", "b.json", "deadbeef"),     // wrong digest
      ("s3", "c.json", "cafebabe"))     // file absent
      .toDF("sample_id", "file_name", "md5sum")
    val got = Validate.md5Check(spark, dir.toString, manifest)
      .select("file_name", "status").as[(String, String)].collect().toMap
    assert(got == Map("a.json" -> "OK", "b.json" -> "MD5_MISMATCH",
      "c.json" -> "MISSING"))
  }

  test("md5Check with sizeCol: truncation reported as SIZE_MISMATCH") {
    val dir = Files.createTempDirectory("graft-md5-size")
    Files.write(dir.resolve("a.json"), "hello".getBytes)
    Files.write(dir.resolve("b.json"), "wor".getBytes) // truncated
    val md5hello = "5d41402abc4b2a76b9719d911017c592"
    val md5world = "7d793037a0760186574b0282f2f435e7"
    val manifest = Seq(
      ("s1", "a.json", md5hello, 5L),  // correct
      ("s2", "b.json", md5world, 5L),  // wrong size AND digest -> SIZE
      ("s3", "a.json2", md5hello, 5L)) // absent
      .toDF("sample_id", "file_name", "md5sum", "file_size")
    val got = Validate.md5Check(spark, dir.toString, manifest,
      sizeCol = Some("file_size"))
      .select("file_name", "status").as[(String, String)].collect().toMap
    assert(got == Map("a.json" -> "OK", "b.json" -> "SIZE_MISMATCH",
      "a.json2" -> "MISSING"))
  }

  test("pendingWork: expected minus existing on the key") {
    val expected = Seq(("f1", 1), ("f2", 2), ("f3", 3)).toDF("file", "n")
    val existing = Seq(Tuple1("f2")).toDF("file")
    val got = Validate.pendingWork(expected, existing, Seq("file"))
      .select("file").as[String].collect().toSet
    assert(got == Set("f1", "f3"))
  }

  test("GraftSession.local applies the engine profile") {
    // the shared test session already exists; builder must still
    // produce the configured settings object without erroring
    val b = GraftSession.builder("probe")
    assert(b != null)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }
}
