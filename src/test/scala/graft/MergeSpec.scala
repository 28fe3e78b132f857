package graft

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, Some("a"), 10.0),
    (2L, Some("b"), 20.0),
    (3L, None: Option[String], 30.0)
  ).toDF("k", "name", "bal")

  private lazy val updates = Seq(
    (2L, Some("b2"), 21.0),               // changed
    (3L, None: Option[String], 30.0),     // identical (null attr, null-safe)
    (4L, Some("d"), 40.0)                 // new
  ).toDF("k", "name", "bal")

  test("upsert: replace, append, keep") {
    val got = Merge.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, Some("a"), 10.0),   // untouched
      (2L, Some("b2"), 21.0),  // replaced
      (3L, None, 30.0),        // replaced with identical
      (4L, Some("d"), 40.0)))  // appended
  }

  test("cdcDiff: all four classes, null-safe compare") {
    val got = Merge.cdcDiff(base, updates, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "delete",       // missing from updates
      2L -> "update",
      3L -> "unchanged",    // null name on both sides
      4L -> "insert"))
  }
}
