package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** The halo/ghost-row skeleton (`Batching.withOrderedHalo`) and its
  * Features twins must be BITWISE equivalent to the plain per-key
  * window forms — the whole point is changing the task topology, not
  * the answer. Partition counts are forced small so group spans cross
  * many range-partition boundaries, which is exactly where a missing
  * or misplaced ghost row would show.
  */
class HaloScanSpec extends SparkSpec {
  import spark.implicits._

  // 3 keys × 400 rows: every key spans several of the 8 range
  // partitions; values collide (ties) so the tiebreak matters
  private def series = {
    val rng = new scala.util.Random(11)
    (for (k <- Seq("a", "b", "c"); i <- 0 until 400) yield
      (k, i.toLong * 1000 + rng.nextInt(3), i.toLong,
        math.rint(rng.nextGaussian() * 50) / 10.0 + (if (k == "b" && i >= 200) 40.0 else 0.0)))
      .toDF("k", "ts", "id", "value")
  }

  test("autocorrelationByRange == autocorrelation (8 forced partitions)") {
    val df = series
    val plain = Features.autocorrelation(df, Seq("k"), "ts", "value",
      Seq(col("id"))).orderBy("k").collect().toSeq
    val halo = Features.autocorrelationByRange(df, Seq("k"), "ts", "value",
      Seq(col("id")), numPartitions = 8).orderBy("k").collect().toSeq
    assert(halo == plain)
  }

  test("meanShiftPointsByRange == meanShiftPoints, incl. the step flag") {
    val df = series
    val plain = Features.meanShiftPoints(df, Seq("k"), "ts", "value",
      k = 8, thresholdMilli = 20000L, tiebreak = Seq(col("id")))
      .orderBy("k", "ts").collect().toSeq
    val halo = Features.meanShiftPointsByRange(df, Seq("k"), "ts", "value",
      k = 8, thresholdMilli = 20000L, tiebreak = Seq(col("id")),
      numPartitions = 8).orderBy("k", "ts").collect().toSeq
    assert(halo == plain)
    assert(plain.exists(_.getInt(5) == 1)) // the b-key step is detected
  }

  test("rollingStatsByRange == rollingStats (8 forced partitions)") {
    val df = series
    val cols = Seq("k", "ts", "id", "value",
      "roll_n", "roll_sum", "roll_avg", "roll_min", "roll_max")
    val plain = Features.rollingStats(df, Seq("k"), "ts", "value", k = 7)
      .select(cols.map(col): _*).orderBy("k", "ts").collect().toSeq
    val halo = Features.rollingStatsByRange(df, Seq("k"), "ts", "value",
      k = 7, numPartitions = 8)
      .select(cols.map(col): _*).orderBy("k", "ts").collect().toSeq
    assert(halo == plain)
  }

  test("lagFeaturesByRange == lagFeatures (8 forced partitions, multi-lag)") {
    val df = series
    val cols = Seq("k", "ts", "id", "value", "lag_1", "lag_3", "lag_5")
    val plain = Features.lagFeatures(df, Seq("k"), "ts", "value",
      Seq(1, 3, 5))
      .select(cols.map(col): _*).orderBy("k", "ts").collect().toSeq
    val halo = Features.lagFeaturesByRange(df, Seq("k"), "ts", "value",
      Seq(1, 3, 5), numPartitions = 8)
      .select(cols.map(col): _*).orderBy("k", "ts").collect().toSeq
    assert(halo == plain)
  }

  test("percentRankByRange == percentRank (ties broken by id)") {
    val df = series.withColumn("value", round(col("value"))) // force ties
    val plain = Features.percentRank(df, Seq("k"), "value", Seq(col("id")))
      .select("k", "id", "prank").orderBy("k", "id").collect().toSeq
    val halo = Features.percentRankByRange(df, "k", "value", Seq(col("id")),
      numPartitions = 8)
      .select("k", "id", "prank").orderBy("k", "id").collect().toSeq
    assert(halo == plain)
  }

  test("thin partitions merge into neighbor buckets until every bucket >= halo") {
    // 12 rows over 8 partitions -> ~1-2 rows each, far thinner than
    // halo=5: the skeleton must coarsen (merge) rather than drop rows
    val tiny = (0 until 12).map(i => ("x", i.toLong, i.toLong, i.toDouble))
      .toDF("k", "ts", "id", "value")
    val plain = Features.meanShiftPoints(tiny, Seq("k"), "ts", "value",
      k = 5, thresholdMilli = 1L, tiebreak = Seq(col("id")))
      .orderBy("ts").collect().toSeq
    val halo = Features.meanShiftPointsByRange(tiny, Seq("k"), "ts", "value",
      k = 5, thresholdMilli = 1L, tiebreak = Seq(col("id")),
      numPartitions = 8).orderBy("ts").collect().toSeq
    assert(halo == plain && plain.nonEmpty)
  }

  test("thin buckets merge LOCALLY — parallelism exceeds the halving floor") {
    // 22 rows over 5 forced partitions (~4-5 rows each, halo=5): the
    // pre-round-11 halving retry re-partitioned the WHOLE frame down
    // to 2 partitions off the thin ranges; the greedy neighbor merge
    // closes a bucket as soon as it holds >= halo rows, so ~9-row
    // buckets survive — at least 3 of them — and every bucket >= halo
    val df22 = (0 until 22).map(i => ("x", i.toLong, i.toLong, i.toDouble))
      .toDF("k", "ts", "id", "value")
    val out = Batching.withOrderedHalo(df22, Seq(col("k")),
      Seq(col("ts"), col("id")), halo = 5, numPartitions = 5)
      .persist()
    try {
      val homeCounts = out.filter(col("__home")).groupBy("__hpid").count()
        .collect().map(_.getLong(1))
      assert(homeCounts.length >= 3,
        s"merge collapsed to halving floor: ${homeCounts.length} buckets")
      assert(homeCounts.forall(_ >= 5L), homeCounts.mkString(","))
      // and the skeleton output stays bitwise-equal to the window form
      val plain = Features.autocorrelation(df22, Seq("k"), "ts", "value",
        Seq(col("id"))).collect().toSeq
      val halo = Features.autocorrelationByRange(df22, Seq("k"), "ts", "value",
        Seq(col("id")), numPartitions = 5).collect().toSeq
      assert(halo == plain)
    } finally out.unpersist()
  }

  test("null group keys survive the skeleton (never sent to the driver)") {
    val withNull = series.withColumn("k",
      when(col("id") % 7 === 0, lit(null)).otherwise(col("k")))
    val plain = Features.autocorrelation(withNull, Seq("k"), "ts", "value",
      Seq(col("id"))).orderBy(col("k").asc_nulls_first).collect().toSeq
    val halo = Features.autocorrelationByRange(withNull, Seq("k"), "ts",
      "value", Seq(col("id")), numPartitions = 8)
      .orderBy(col("k").asc_nulls_first).collect().toSeq
    assert(halo == plain)
  }

  test("multi-column group keys: composite-key autocorr equals the window form") {
    val df = series.withColumn("k2", (col("id") % 2).cast("string"))
    val plain = Features.autocorrelation(df, Seq("k", "k2"), "ts", "value",
      Seq(col("id"))).orderBy("k", "k2").collect().toSeq
    val halo = Features.autocorrelationByRange(df, Seq("k", "k2"), "ts",
      "value", Seq(col("id")), numPartitions = 8)
      .orderBy("k", "k2").collect().toSeq
    assert(halo == plain && plain.length == 6)
  }

  test("degenerate inputs: empty frame and single row survive the skeleton") {
    val empty = series.filter(col("id") < 0)
    assert(Features.autocorrelationByRange(empty, Seq("k"), "ts", "value",
      Seq(col("id")), numPartitions = 4).count() == 0)
    val one = series.filter(col("k") === "a" && col("id") === 0)
    assert(Features.meanShiftPointsByRange(one, Seq("k"), "ts", "value",
      k = 3, thresholdMilli = 1L, tiebreak = Seq(col("id")),
      numPartitions = 4).count() == 0) // no full frames -> no rows, no crash
    val oneAc = Features.autocorrelationByRange(one, Seq("k"), "ts", "value",
      Seq(col("id")), numPartitions = 4).collect()
    assert(oneAc.isEmpty) // zero pairs -> no group row, matching the batch op
  }

  test("withOrderedHalo: ghosts are marked, homes partition-disjoint") {
    val halod = Batching.withOrderedHalo(series, Seq(col("k")),
      Seq(col("ts"), col("id")), halo = 3, numPartitions = 8)
    val homes = halod.filter(col("__home")).count()
    assert(homes == 1200) // every input row exactly once as home
    val ghosts = halod.filter(!col("__home")).count()
    assert(ghosts > 0 && ghosts <= 2L * 3 * 8) // <= 2*halo per partition
  }
}
