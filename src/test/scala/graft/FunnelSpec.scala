package graft

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  // u1: full ordered funnel; u2: purchase BEFORE click (step 3 must
  // not count — no purchase after the click); u3: view only;
  // u4: starts at click (never views -> 0); u5: re-purchase after a
  // later click counts via first-touch chain
  private lazy val events = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 10L, "view"), (2L, 30L, "click"), (2L, 20L, "purchase"),
    (3L, 10L, "view"),
    (4L, 10L, "click"), (4L, 20L, "purchase"),
    (5L, 10L, "view"), (5L, 20L, "purchase"), (5L, 30L, "click"),
    (5L, 40L, "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("reached: strict first-touch ordering") {
    val got = Funnel.reached(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0, 5L -> 3))
  }

  test("same-timestamp step does NOT advance (strictly-after rule)") {
    val tie = Seq((9L, 10L, "view"), (9L, 10L, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.reached(tie, "user_id", "ts", "event_type",
      Seq("view", "click")).as[(Long, Int)].collect().toMap
    assert(got == Map(9L -> 1))
  }

  test("retention: cohort triangle from first-activity buckets") {
    // u1 first in bucket 0, active 0 and 2; u2 first in 1, active 1
    val ev = Seq((1L, 5L), (1L, 25L), (2L, 15L), (1L, 7L))
      .toDF("user_id", "ts")
    val got = graft.operators.Funnel.retention(ev, "user_id", "ts", bucket = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("counts: decreasing per-step user totals") {
    val got = Funnel.counts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._3).sameElements(Array(4L, 3L, 2L)))
    assert(got.map(_._2).sameElements(Array("view", "click", "purchase")))
  }

  test("newVsReturning: first bucket is new, later active buckets return") {
    val df = Seq(
      (1L, 0L), (1L, 5L),      // u1: new in bucket 0, same bucket twice
      (1L, 10L),               // u1: returning in bucket 1
      (2L, 10L),               // u2: new in bucket 1
      (2L, 25L))               // u2: returning in bucket 2
      .toDF("user_id", "ts")
    val got = Funnel.newVsReturning(df, "user_id", "ts", bucket = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 0L), (1L, 1L, 1L), (2L, 0L, 1L)))
  }

  test("reachedWithin: late conversions fall out of the window") {
    val df = Seq(
      // u1 converts view->click->purchase all within the window
      (1L, 0L, "view"), (1L, 5L, "click"), (1L, 9L, "purchase"),
      // u2 clicks too late (gap 50 > 10) -> stuck at step 1
      (2L, 0L, "view"), (2L, 50L, "click"),
      // u3: click in window, purchase outside it -> step 2; the
      // unconstrained funnel would credit 3
      (3L, 0L, "view"), (3L, 8L, "click"), (3L, 100L, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val got = Funnel.reachedWithin(df, "user_id", "ts", "event_type",
        steps, maxGapNs = 10L)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2))
    // the unconstrained funnel credits u2 and u3 fully
    val loose = Funnel.reached(df, "user_id", "ts", "event_type", steps)
      .as[(Long, Int)].collect().toMap
    assert(loose == Map(1L -> 3, 2L -> 2, 3L -> 3))
  }
}
