package graft

import java.nio.file.Files
import org.apache.spark.sql.functions.col
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

  test("expectations: one pass of row rules + uniqueness, pass flags") {
    val df = Seq(
      (1L, Some("a@x.io"), 10.0, "O"),
      (2L, None: Option[String], 20.0, "O"),   // null email
      (2L, Some("c@x.io"), -5.0, "F"),         // dup key + out of range
      (3L, Some("nope"), 30.0, "Z")            // bad regex + bad set
    ).toDF("k", "email", "bal", "status")
    val got = Validate.expectations(df,
      rules = Seq(
        Validate.notNull("email"),
        Validate.inRange("bal", 0.0, 100.0),
        Validate.inSet("status", Seq("O", "F")),
        Validate.matches("email", "^[^@]+@[^@]+$")),
      unique = Seq(("unique(k)", Seq("k"))))
      .select("rule", "violations", "total", "pass")
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      "not_null(email)" -> ((1L, 4L, 0)),
      "in_range(bal)" -> ((1L, 4L, 0)),
      "in_set(status)" -> ((1L, 4L, 0)),
      // null email counts as a regex violation too (can't match)
      "matches(email)" -> ((2L, 4L, 0)),
      "unique(k)" -> ((2L, 4L, 0))))
  }

  test("expectations: clean table passes every rule; empty table is 0/0 pass") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val r1 = Validate.expectations(clean,
      Seq(Validate.notNull("v")), Seq(("u", Seq("k"))))
      .select("pass").as[Int].collect()
    assert(r1.forall(_ == 1))
    val empty = clean.filter(col("k") < 0)
    val r2 = Validate.expectations(empty, Seq(Validate.notNull("v")))
      .select("violations", "total", "pass").as[(Long, Long, Int)].collect()
    assert(r2.toSeq == Seq((0L, 0L, 1)))
  }

  test("GraftSession.local applies the engine profile") {
    // the shared test session already exists; builder must still
    // produce the configured settings object without erroring
    val b = GraftSession.builder("probe")
    assert(b != null)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("fkReport: orphans and null FKs counted separately") {
    val parent = Seq((1L, "a"), (2L, "b")).toDF("pk", "x")
    val child = Seq(
      (10L, Some(1L)), (11L, Some(1L)), (12L, Some(9L)),  // 9 = orphan
      (13L, None)).toDF("id", "fk_col")
    val got = graft.operators.Validate.fkReport(Seq(
      ("c_p", child, "fk_col", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("c_p", 4L, 1L, 1L)))
  }

  test("kAnonymity: class-size census flags classes under k") {
    // QID (a,b): class (1,x) has 3 rows, (2,x) has 1, (2,y) has 1,
    // (null,x) has 2 — nulls form their own class
    val df = Seq(
      (Some(1), "x"), (Some(1), "x"), (Some(1), "x"),
      (Some(2), "x"), (Some(2), "y"),
      (None, "x"), (None, "x")).toDF("a", "b")
    val got = graft.operators.Validate.kAnonymity(df, Seq("a", "b"), k = 2)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L, 1)))  // two singletons, violating
    assert(got(2L) == ((1L, 2L, 0)))  // the null class, k-safe
    assert(got(3L) == ((1L, 3L, 0)))
  }
}
