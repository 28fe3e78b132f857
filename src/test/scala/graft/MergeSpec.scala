package graft

import org.apache.spark.sql.functions.col
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

  // ---- scd2 ----

  test("scd2: change compression, validity chain, is_current") {
    val log = Seq(
      (1L, 10L, 100L, "gold"),
      (1L, 20L, 101L, "gold"),   // same state: compressed away
      (1L, 30L, 102L, "silver"), // change
      (1L, 40L, 103L, "gold"),   // back to gold: NEW version, not merged
      (2L, 10L, 104L, "bronze")
    ).toDF("k", "ts", "seq", "tier")
    val got = Merge.scd2(log, Seq("k"), "ts", tieBreak = Seq("seq"))
      .select("k", "tier", "effective_from", "effective_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "gold", 10L, Some(30L), false),
      (1L, "silver", 30L, Some(40L), false),
      (1L, "gold", 40L, None, true),
      (2L, "bronze", 10L, None, true)))
  }

  test("scd2: same-ts observations stay deterministic via tieBreak") {
    val log = Seq(
      (1L, 10L, 1L, "a"),
      (1L, 10L, 2L, "b"), // same ts, later seq: separate version AFTER 'a'
      (1L, 20L, 3L, "b")
    ).toDF("k", "ts", "seq", "v")
    val got = Merge.scd2(log, Seq("k"), "ts", tieBreak = Seq("seq"))
      .select("v", "effective_from", "is_current")
      .as[(String, Long, Boolean)].collect().toSet
    assert(got == Set(("a", 10L, false), ("b", 10L, true)))
  }

  test("scd2: null attributes compare null-safe (no phantom versions)") {
    val log = Seq(
      (1L, 10L, None: Option[String]),
      (1L, 20L, None: Option[String]),
      (1L, 30L, Some("x"))
    ).toDF("k", "ts", "v")
    val got = Merge.scd2(log, Seq("k"), "ts")
      .select("v", "effective_from").as[(Option[String], Long)]
      .collect().toSet
    assert(got == Set((None, 10L), (Some("x"), 30L)))
  }

  // ---- goldenRecord ----

  test("goldenRecord: attributes survive from different members by priority") {
    val dupes = Seq(
      // cluster 1: freshest (ts 30) lacks email; ts 20 lacks phone
      (1L, 30L, None: Option[String], Some("555-1")),
      (1L, 20L, Some("a@x.io"), None: Option[String]),
      (1L, 10L, Some("old@x.io"), Some("555-old")),
      // cluster 2: single member, nulls stay null
      (2L, 10L, None: Option[String], Some("555-2"))
    ).toDF("cluster", "ts", "email", "phone")
    val got = Merge.goldenRecord(dupes, "cluster",
      Seq(col("ts").desc))
      .select("cluster", "email", "phone", "n_members")
      .as[(Long, Option[String], Option[String], Long)].collect().toSet
    assert(got == Set(
      (1L, Some("a@x.io"), Some("555-1"), 3L), // email from #2, phone from #1
      (2L, None, Some("555-2"), 1L)))
  }

  test("goldenRecord: all-null attribute stays null; ts itself survives") {
    val dupes = Seq(
      (1L, 2L, None: Option[String]),
      (1L, 1L, None: Option[String])
    ).toDF("cluster", "ts", "v")
    val got = Merge.goldenRecord(dupes, "cluster", Seq(col("ts").desc))
      .select("cluster", "ts", "v")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set((1L, 2L, None)))
  }

  // ---- incrementalAgg ----

  private lazy val state = Seq(
    (1L, 2L, 300L), // two rows summing 300
    (2L, 1L, 50L)
  ).toDF("k", "cnt", "sum_v")

  test("incrementalAgg: insert, delete, key birth and key death") {
    val delta = Seq(
      (1L, "I", 100L),  // k1 grows
      (2L, "D", 50L),   // k2 count hits zero: disappears
      (3L, "I", 7L)     // new key
    ).toDF("k", "op", "v")
    val got = Merge.incrementalAgg(state, delta, Seq("k"), "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 400L), (3L, 1L, 7L)))
  }

  test("incrementalAgg: update as delete+insert pair, untouched keys kept") {
    val delta = Seq((1L, "D", 200L), (1L, "I", 250L)).toDF("k", "op", "v")
    val got = Merge.incrementalAgg(state, delta, Seq("k"), "v")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 350L), (2L, 1L, 50L)))
  }

  test("incrementalAgg equals full recompute on a replayed partition") {
    val rows = (1L to 200L).map(i => (i % 7, i))
    val full = rows.toDF("k", "v")
    val baseRows = rows.filter(_._2 % 3 != 0)
    val baseAgg = baseRows.toDF("k", "v").groupBy("k")
      .agg(org.apache.spark.sql.functions.count("*").as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
    val delta = rows.filter(_._2 % 3 == 0).map { case (k, v) => (k, "I", v) }
      .toDF("k", "op", "v")
    val got = Merge.incrementalAgg(baseAgg, delta, Seq("k"), "v")
      .as[(Long, Long, Long)].collect().toSet
    val expect = full.groupBy("k")
      .agg(org.apache.spark.sql.functions.count("*").as("cnt"),
        org.apache.spark.sql.functions.sum("v").as("sum_v"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect)
  }
}
