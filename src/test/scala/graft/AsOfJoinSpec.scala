package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Features}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // left probes at t=5,10,20 for key a; right snapshots at t=1,10,15
  private lazy val left = Seq(
    ("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 20L, "l3"),
    ("b", 7L, "l4") // key with no right rows at all
  ).toDF("k", "ts", "lval")
  private lazy val right = Seq(
    ("a", 1L, "r1"), ("a", 10L, "r2"), ("a", 15L, "r3")
  ).toDF("k", "ts", "rval")

  test("backward inclusive: latest right at-or-before each left ts") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rval"))
      .select("k", "ts", "lval", "rval")
      .as[(String, Long, String, String)].collect().toSet
    assert(got == Set(
      ("a", 5L, "l1", "r1"),
      ("a", 10L, "l2", "r2"), // equal ts matches
      ("a", 20L, "l3", "r3"),
      ("b", 7L, "l4", null))) // left-outer
  }

  test("backward strict: equal timestamps do NOT match") {
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rval"),
      strict = true)
      .select("ts", "rval").as[(Long, String)].collect().toMap
    assert(got(10L) == "r1") // r2@10 excluded, falls back to r1@1
  }

  test("forward inclusive and strict") {
    val inc = AsOfJoin.forward(left, right, Seq("k"), "ts", Seq("rval"))
      .select("ts", "rval").as[(Long, String)].collect().toMap
    assert(inc(5L) == "r2" && inc(10L) == "r2" && inc(20L) == null)
    val str = AsOfJoin.forward(left, right, Seq("k"), "ts", Seq("rval"),
      strict = true)
      .select("ts", "rval").as[(Long, String)].collect().toMap
    assert(str(10L) == "r3") // r2@10 excluded under strict
  }

  test("single shuffle: exactly one hash exchange in the plan") {
    val plan = AsOfJoin.backward(left, right, Seq("k"), "ts", Seq("rval"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected one exchange:\n$plan")
  }

  test("payload name collision with left is rejected") {
    intercept[IllegalArgumentException](
      AsOfJoin.backward(left, right.withColumnRenamed("rval", "lval"),
        Seq("k"), "ts", Seq("lval")))
    // all four forms share the normalize-time require (forward lacked
    // it pre-review: the clash surfaced as an ambiguous-column
    // analysis error far from the call)
    intercept[IllegalArgumentException](
      AsOfJoin.forward(left, right.withColumnRenamed("rval", "lval"),
        Seq("k"), "ts", Seq("lval")))
    intercept[IllegalArgumentException](
      AsOfJoin.backwardByRange(left, right.withColumnRenamed("rval", "lval"),
        Seq("k"), "ts", Seq("lval")))
    intercept[IllegalArgumentException](
      AsOfJoin.forwardByRange(left, right.withColumnRenamed("rval", "lval"),
        Seq("k"), "ts", Seq("lval")))
  }

  test("byRange twins: fixture parity incl. no-right key and equal ts") {
    try for (strict <- Seq(false, true); parts <- Seq(1, 3, 7)) {
      val pb = AsOfJoin.backward(left, right, Seq("k"), "ts",
        Seq("rval"), strict).collect().toSet
      val rb = AsOfJoin.backwardByRange(left, right, Seq("k"), "ts",
        Seq("rval"), strict, numPartitions = parts).collect().toSet
      assert(rb == pb, s"backward strict=$strict parts=$parts")
      val pf = AsOfJoin.forward(left, right, Seq("k"), "ts",
        Seq("rval"), strict).collect().toSet
      val rf = AsOfJoin.forwardByRange(left, right, Seq("k"), "ts",
        Seq("rval"), strict, numPartitions = parts).collect().toSet
      assert(rf == pf, s"forward strict=$strict parts=$parts")
    } finally graft.operators.Batching.releasePins()
  }

  test("service pin hygiene: storage returns to baseline after releasePins") {
    // the long-lived-service contract (README "Embedding graft in a
    // long-lived service"): skeleton pins are session-global and live
    // until releasePins — after the drain, NO pinned storage remains
    spark.catalog.clearCache()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    val out = AsOfJoin.backwardByRange(left, right, Seq("k"), "ts",
      Seq("rval"), numPartitions = 3)
    out.count() // materialize: the pins now back live blocks
    assert(spark.sparkContext.getPersistentRDDs.size > baseline,
      "twin did not pin its partitioning")
    graft.operators.Batching.releasePins()
    assert(spark.sparkContext.getPersistentRDDs.size == baseline,
      "releasePins left pinned storage behind")
  }

  test("byRange twins: randomized parity — per-column null " +
    "fall-through, duplicate left ts, null keys, cross-partition carry") {
    val rnd = new scala.util.Random(42)
    // 3 low-cardinality keys (incl. null) so each key spans many of
    // the 11 range partitions — the carry path is the point
    val keyVals = Seq[java.lang.Integer](1, 2, null)
    val l = (0 until 400).map { i =>
      (keyVals(rnd.nextInt(3)), (rnd.nextInt(180) * 5).toLong, s"l$i")
    }.toDF("k", "ts", "lval")
    // right ts unique per key (the as-of precondition); payloads with
    // INDEPENDENT per-column nulls so a fill can mix right rows
    val seen = scala.collection.mutable.Set.empty[(Integer, Long)]
    val r = (0 until 300).flatMap { i =>
      val k = keyVals(rnd.nextInt(3))
      val ts = (rnd.nextInt(300) * 3 + 1).toLong
      if (seen.add((k, ts)))
        Some((k, ts,
          if (rnd.nextInt(3) == 0) null else s"a$i",
          if (rnd.nextInt(3) == 0) null else java.lang.Long.valueOf(i)))
      else None
    }.toDF("k", "ts", "pa", "pb")
    try for (strict <- Seq(false, true)) {
      val pb = AsOfJoin.backward(l, r, Seq("k"), "ts",
        Seq("pa", "pb"), strict).collect().toSet
      val rb = AsOfJoin.backwardByRange(l, r, Seq("k"), "ts",
        Seq("pa", "pb"), strict, numPartitions = 11).collect().toSet
      assert(rb == pb, s"backward strict=$strict")
      val pf = AsOfJoin.forward(l, r, Seq("k"), "ts",
        Seq("pa", "pb"), strict).collect().toSet
      val rf = AsOfJoin.forwardByRange(l, r, Seq("k"), "ts",
        Seq("pa", "pb"), strict, numPartitions = 11).collect().toSet
      assert(rf == pf, s"forward strict=$strict")
    } finally graft.operators.Batching.releasePins()
  }

  test("rollingStats + lagFeatures: frame fills, head pads with null") {
    val df = Seq(("u", 1L, 1.0), ("u", 2L, 2.0), ("u", 3L, 3.0),
      ("u", 4L, 4.0)).toDF("k", "ts", "value")
    val got = Features.lagFeatures(
      Features.rollingStats(df, Seq("k"), "ts", "value", k = 3),
      Seq("k"), "ts", "value", Seq(1, 2))
      .select("ts", "roll_n", "roll_sum", "roll_avg", "lag_1", "lag_2")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got(0) == ((1L, 1L, 1.0, 1.0, None, None)))
    assert(got(2) == ((3L, 3L, 6.0, 2.0, Some(2.0), Some(1.0))))
    assert(got(3) == ((4L, 3L, 9.0, 3.0, Some(3.0), Some(2.0)))) // slides
  }

  test("fillGaps: densifies each key's own range, fills with default") {
    import org.apache.spark.sql.functions.lit
    val df = Seq(("a", 1L, 10L), ("a", 4L, 40L), ("b", 7L, 70L))
      .toDF("k", "bucket", "n")
    val got = graft.operators.Features
      .fillGaps(df, Seq("k"), "bucket", step = 1L, Map("n" -> lit(0L)))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 10L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 40L),
      ("b", 7L, 70L))) // b's range is just [7,7] — no bleed from a
  }

  test("fillGaps: off-grid original rows survive with their values") {
    import org.apache.spark.sql.functions.lit
    // step=5 grid from min 0 is {0,5}; the row at 7 (which defines
    // __hi) is off-grid and must keep its value, not vanish
    val df = Seq(("a", 0L, 1L), ("a", 7L, 7L)).toDF("k", "bucket", "n")
    val got = graft.operators.Features
      .fillGaps(df, Seq("k"), "bucket", step = 5L, Map("n" -> lit(0L)))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 0L, 1L), ("a", 5L, 0L), ("a", 7L, 7L)))
  }

  test("percentRank: endpoints 0 and 1, singleton group 0") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 30.0),
      ("b", 4L, 5.0)).toDF("k", "id", "value")
    val got = graft.operators.Features
      .percentRank(df, Seq("k"), "value", Seq(col("id")))
      .select("id", "prank").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0, 4L -> 0.0))
  }

  test("autocorrelation: trending series near +1, alternating near -1") {
    val trend = (1 to 50).map(i => ("up", i.toLong, i.toLong, i.toDouble))
    val alt = (1 to 50).map(i =>
      ("alt", i.toLong, i.toLong, if (i % 2 == 0) 1.0 else -1.0))
    val const = (1 to 10).map(i => ("const", i.toLong, i.toLong, 7.0))
    val df = (trend ++ alt ++ const).toDF("k", "ts", "id", "value")
    val got = graft.operators.Features
      .autocorrelation(df, Seq("k"), "ts", "value", Seq(col("id")))
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got("up").get > 0.99)
    assert(got("alt").get < -0.99)
    assert(got("const").isEmpty) // zero variance → null
  }

  test("targetEncode: shrinks small categories toward the global mean") {
    val df = (Seq.fill(100)(("big", 10.0)) :+ (("rare", 1000.0)))
      .toDF("cat", "value")
    val got = graft.operators.Features
      .targetEncode(df, Seq("cat"), "value", m = 10.0)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // global mean ≈ 19.8; rare's raw mean is 1000 but n=1, m=10 →
    // enc pulled heavily toward the global mean
    assert(got("rare") < 200.0 && got("rare") > got("big"))
    assert(math.abs(got("big") - 10.0) < 1.5)
  }

  test("embargoSplit: strict boundaries, embargo band excluded from both") {
    val df = Seq((1L, 0L), (2L, 89L), (3L, 90L), (4L, 100L), (5L, 101L))
      .toDF("id", "ts")
    val got = graft.operators.Features
      .embargoSplit(df, "ts", splitTs = 100L, embargoNs = 10L)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "train", 2L -> "train", 3L -> "embargo",
      4L -> "embargo", 5L -> "test"))
  }

  test("decayedSum: half-life weighting, hand-computed micro-unit sum") {
    val df = Seq(
      ("u1", 100L, 8.0),   // age 0 at ref=100: weight 1
      ("u1", 90L, 8.0),    // age 10 = one half-life: weight 0.5
      ("u2", 80L, 4.0))    // age 20 = two half-lives: weight 0.25
      .toDF("user_id", "ts", "value")
    val got = graft.operators.Features
      .decayedSum(df, Seq("user_id"), "ts", "value",
        halfLife = 10L, refTs = 100L)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    def micro(v: Double, age: Long) = Math.round(
      v * math.exp(-math.log(2.0) * age.toDouble / 10.0) * 1e6)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("u1") == ((2L, r4((micro(8.0, 0) + micro(8.0, 10)).toDouble / 1e6))))
    assert(got("u2") == ((1L, r4(micro(4.0, 20).toDouble / 1e6))))
    assert(got("u1")._2 == 12.0 && got("u2")._2 == 1.0)
  }

  test("ohlcBars: open/close by (ts, tie) order, one bar per key-bucket") {
    // bucket=10: key a rows at ts 1,9,9 (tie broken by id: close is
    // id 3's value), second bucket single row; key b separate bar
    val df = Seq(
      ("a", 1L, 1L, 5.0), ("a", 9L, 2L, 9.0), ("a", 9L, 3L, 2.0),
      ("a", 15L, 4L, 7.0),
      ("b", 3L, 5L, 4.0))
      .toDF("k", "ts", "id", "value")
    val got = graft.operators.Features
      .ohlcBars(df, Seq("k"), "ts", "id", "value", bucket = 10L)
      .select("k", "bucket", "open", "high", "low", "close", "n")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(got(("a", 0L)) == (("a", 0L, 5.0, 9.0, 2.0, 2.0, 3L)))
    assert(got(("a", 1L)) == (("a", 1L, 7.0, 7.0, 7.0, 7.0, 1L)))
    assert(got(("b", 0L)) == (("b", 0L, 4.0, 4.0, 4.0, 4.0, 1L)))
  }
}
