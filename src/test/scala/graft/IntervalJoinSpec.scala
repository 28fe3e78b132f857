package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.IntervalJoin

/** J1 semantics at the documented boundaries (SURVEY.md §2.3 J1):
  * bedtools `-f 0.5` is a >= test on the A-interval length; `-wo`
  * emits the overlap length; intervals are half-open.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def genes = Seq(
    // (id, chrom, start, end)
    (1L, "chr1", 100L, 200L), // len 100
    (2L, "chr1", 300L, 400L),
    (3L, "chr2", 100L, 200L)  // same coords, other chrom
  ).toDF("g_id", "chrom", "g_start", "g_end")

  private def segs = Seq(
    (10L, "chr1", 150L, 350L), // overlaps g1 by 50 (=50%), g2 by 50 (=50%)
    (11L, "chr1", 199L, 500L), // overlaps g1 by 1, g2 fully
    (12L, "chr1", 200L, 300L), // touches g1 at the half-open boundary: no overlap
    (13L, "chr2", 0L, 1000L)   // covers g3
  ).toDF("s_id", "chrom", "s_start", "s_end")

  private def run(frac: Double, binned: Boolean) = {
    val r =
      if (binned) IntervalJoin.overlapBinned(genes, segs, Seq("chrom"),
        "g_start", "g_end", "s_start", "s_end", frac, binWidth = 64)
      else IntervalJoin.overlap(genes, segs, Seq("chrom"),
        "g_start", "g_end", "s_start", "s_end", frac)
    r.select("g_id", "s_id", "overlap_len").as[(Long, Long, Long)]
      .collect().toSet
  }

  test("any-overlap join (frac=0): half-open boundary excluded") {
    val got = run(0.0, binned = false)
    assert(got == Set(
      (1L, 10L, 50L), (1L, 11L, 1L),
      (2L, 10L, 50L), (2L, 11L, 100L),
      (3L, 13L, 100L)))
  }

  test("frac=0.5 keeps overlap exactly 50% of A (>= semantics)") {
    val got = run(0.5, binned = false)
    assert(got == Set(
      (1L, 10L, 50L), (2L, 10L, 50L), (2L, 11L, 100L), (3L, 13L, 100L)))
  }

  test("binned join emits each pair exactly once and matches naive") {
    for (frac <- Seq(0.0, 0.5))
      assert(run(frac, binned = true) == run(frac, binned = false))
  }

  test("fractionFilter: -F (B fraction) and -e (either) modes") {
    import graft.operators.IntervalJoin.fractionFilter
    // A len 100, B len 1000, overlap 50: 50% of A, 5% of B
    val joined = IntervalJoin.overlap(
      Seq((1L, "c", 100L, 200L)).toDF("g_id", "chrom", "g_start", "g_end"),
      Seq((2L, "c", 150L, 1150L)).toDF("s_id", "chrom", "s_start", "s_end"),
      Seq("chrom"), "g_start", "g_end", "s_start", "s_end")
    assert(fractionFilter(joined, "g_start", "g_end", "s_start", "s_end",
      fracA = 0.5).count() == 1)
    assert(fractionFilter(joined, "g_start", "g_end", "s_start", "s_end",
      fracB = 0.5).count() == 0)
    assert(fractionFilter(joined, "g_start", "g_end", "s_start", "s_end",
      fracA = 0.5, fracB = 0.5, either = true).count() == 1)
    assert(fractionFilter(joined, "g_start", "g_end", "s_start", "s_end",
      fracA = 0.5, fracB = 0.5).count() == 0)
  }

  test("binned join with intervals spanning many bins still dedups") {
    val a = Seq((1L, "c", 0L, 1000L)).toDF("g_id", "chrom", "g_start", "g_end")
    val b = Seq((2L, "c", 500L, 2000L)).toDF("s_id", "chrom", "s_start", "s_end")
    val r = IntervalJoin.overlapBinned(a, b, Seq("chrom"),
      "g_start", "g_end", "s_start", "s_end", frac = 0.0, binWidth = 10)
      .select("g_id", "s_id", "overlap_len").collect()
    assert(r.toSeq == Seq(Row(1L, 2L, 500L)))
  }

  // ---- Intervals.mergeOverlaps (bedtools merge semantics) ----

  private def islands = Seq(
    ("c1", 100L, 200L), // overlaps next
    ("c1", 150L, 250L),
    ("c1", 250L, 300L), // bookended: merges at minGap=0
    ("c1", 320L, 340L), // gap 20: separate at minGap=0, merged at minGap>=20
    ("c1", 330L, 335L), // nested inside previous
    ("c2", 100L, 200L)  // other key untouched
  ).toDF("chrom", "s_start", "s_end")

  test("mergeOverlaps: overlap + bookend merge, gaps split, per key") {
    val got = graft.operators.Intervals
      .mergeOverlaps(islands, Seq("chrom"), "s_start", "s_end")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("c1", 100L, 300L, 3L),
      ("c1", 320L, 340L, 2L),
      ("c2", 100L, 200L, 1L)))
  }

  test("mergeOverlaps: minGap bridges small gaps (bedtools -d)") {
    val got = graft.operators.Intervals
      .mergeOverlaps(islands, Seq("chrom"), "s_start", "s_end", minGap = 20L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("c1", 100L, 340L, 5L), ("c2", 100L, 200L, 1L)))
  }

  test("mergeOverlaps: an interval covering everything yields one island") {
    val df = Seq(("c", 0L, 1000L), ("c", 10L, 20L), ("c", 500L, 600L))
      .toDF("chrom", "s_start", "s_end")
    val got = graft.operators.Intervals
      .mergeOverlaps(df, Seq("chrom"), "s_start", "s_end")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("c", 0L, 1000L, 3L)))
  }

  // ---- Intervals.coverageDepth (sweep-line) ----

  test("coverageDepth: constant-depth segments, coincident events collapse") {
    val df = Seq(
      ("c", 100L, 300L),
      ("c", 200L, 400L), // depth 2 on [200,300)
      ("c", 300L, 400L), // end of 1st + start of 3rd coincide at 300
      ("d", 0L, 10L)
    ).toDF("chrom", "s_start", "s_end")
    val got = graft.operators.Intervals
      .coverageDepth(df, Seq("chrom"), "s_start", "s_end")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("c", 100L, 200L, 1L),
      ("c", 200L, 300L, 2L),
      ("c", 300L, 400L, 2L),
      ("d", 0L, 10L, 1L)))
  }

  test("coverageDepth: depth returns to zero between islands (gap emitted as nothing)") {
    val df = Seq(("c", 0L, 10L), ("c", 20L, 30L)).toDF("k", "a", "b")
    val got = graft.operators.Intervals.coverageDepth(df, Seq("k"), "a", "b")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("c", 0L, 10L, 1L), ("c", 20L, 30L, 1L)))
  }

  // ---- Intervals.subtract (bedtools subtract) ----

  test("subtract: between-fragments, tail, full-cover vanishes, untouched survives") {
    val a = Seq(
      (1L, "c", 100L, 200L), // two holes -> three fragments
      (2L, "c", 300L, 320L), // fully covered -> vanishes
      (3L, "c", 500L, 600L), // tail covered -> head fragment
      (4L, "d", 0L, 50L)     // no B on d -> whole
    ).toDF("g_id", "chrom", "g_start", "g_end")
    val b = Seq(
      ("c", 120L, 140L), ("c", 160L, 170L),
      ("c", 290L, 330L),
      ("c", 550L, 650L)
    ).toDF("chrom", "s_start", "s_end")
    val got = graft.operators.Intervals.subtract(a, b, Seq("chrom"),
      "g_id", "g_start", "g_end", "s_start", "s_end")
      .select("g_id", "sub_start", "sub_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 100L, 120L), (1L, 140L, 160L), (1L, 170L, 200L),
      (3L, 500L, 550L),
      (4L, 0L, 50L)))
  }

  test("subtract: overlapping B inputs merge before carving") {
    val a = Seq((1L, "c", 0L, 100L)).toDF("g_id", "chrom", "g_start", "g_end")
    val b = Seq(("c", 10L, 30L), ("c", 20L, 40L), ("c", 40L, 50L))
      .toDF("chrom", "s_start", "s_end") // one island [10,50)
    val got = graft.operators.Intervals.subtract(a, b, Seq("chrom"),
      "g_id", "g_start", "g_end", "s_start", "s_end")
      .select("g_id", "sub_start", "sub_end")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 10L), (1L, 50L, 100L)))
  }

  // ---- Intervals.closest (bedtools closest) ----

  test("closest: overlap wins at 0, gaps measured, adjacency is 0, ties to min id") {
    val a = Seq(
      (1L, "c", 100L, 200L), // overlaps b10
      (2L, "c", 300L, 310L), // between b10(end 220) and b11(start 400): dists 80 vs 90
      (3L, "c", 220L, 230L), // bookended after b10 -> dist 0
      (4L, "e", 0L, 10L)     // no B on key e -> null
    ).toDF("g_id", "chrom", "g_start", "g_end")
    val b = Seq(
      (10L, "c", 150L, 220L),
      (11L, "c", 400L, 500L),
      (12L, "c", 400L, 500L)  // same span as 11: tie resolves to 11
    ).toDF("s_id", "chrom", "s_start", "s_end")
    val got = graft.operators.Intervals.closest(a, b, Seq("chrom"),
      "g_id", "g_start", "g_end", "s_id", "s_start", "s_end")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, Some(10L), Some(0L)),
      (2L, Some(10L), Some(80L)),
      (3L, Some(10L), Some(0L)),
      (4L, None, None)))
    // pure forward tie: A before both twins
    val a2 = Seq((5L, "c", 0L, 10L)).toDF("g_id", "chrom", "g_start", "g_end")
    val t = graft.operators.Intervals.closest(a2, b, Seq("chrom"),
      "g_id", "g_start", "g_end", "s_id", "s_start", "s_end")
      .as[(Long, Option[Long], Option[Long])].head()
    assert(t == ((5L, Some(10L), Some(140L))))
  }

  test("closestByRange: randomized parity with closest — low-cardinality " +
    "keys spanning many range partitions, overlaps, gaps, empty keys") {
    val rnd = new scala.util.Random(7)
    // 3 keys over an 11-partition range split: each key's as-of legs
    // must cross partition boundaries (the carry path is the point)
    val keys = Seq("c1", "c2", "c3")
    val a = (0 until 300).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, keys(rnd.nextInt(3)), s, s + 1 + rnd.nextInt(200))
    }.toDF("g_id", "chrom", "g_start", "g_end")
    // B absent entirely on c3 (null-neighbor leg)
    val b = (0 until 200).map { i =>
      val s = rnd.nextInt(5000).toLong
      (i.toLong, keys(rnd.nextInt(2)), s, s + 1 + rnd.nextInt(300))
    }.toDF("s_id", "chrom", "s_start", "s_end")
    try {
      val plain = graft.operators.Intervals.closest(a, b, Seq("chrom"),
        "g_id", "g_start", "g_end", "s_id", "s_start", "s_end",
        binWidth = 500).collect().toSet
      val ranged = graft.operators.Intervals.closestByRange(a, b,
        Seq("chrom"), "g_id", "g_start", "g_end", "s_id", "s_start",
        "s_end", binWidth = 500, numPartitions = 11).collect().toSet
      assert(ranged == plain)
    } finally graft.operators.Batching.releasePins()
  }

  test("coverageDepth total base-depth equals sum of interval lengths") {
    val df = segs // reuse the join fixture
    val total = graft.operators.Intervals
      .coverageDepth(df, Seq("chrom"), "s_start", "s_end")
      .select(sum((col("d_end") - col("d_start")) * col("depth")))
      .as[Long].head()
    val expect = segs.select(sum(col("s_end") - col("s_start")))
      .as[Long].head()
    assert(total == expect)
  }

  test("complement: gaps between islands, bounded by observed span") {
    val iv = Seq(("c1", 0L, 10L), ("c1", 5L, 15L), ("c1", 30L, 40L),
      ("c1", 50L, 60L), ("c2", 0L, 5L)).toDF("chrom", "s", "e")
    val got = graft.operators.Intervals
      .complement(iv, Seq("chrom"), "s", "e")
      .as[(String, Long, Long)].collect().toSet
    // c1 islands: [0,15) [30,40) [50,60) -> gaps [15,30) [40,50);
    // c2 has one island -> no gap (nothing outside the span)
    assert(got == Set(("c1", 15L, 30L), ("c1", 40L, 50L)))
  }

  test("intervalJaccard: hand bp arithmetic, one-sided keys zero out") {
    val a = Seq(("c1", 0L, 10L), ("c1", 20L, 30L), ("c3", 0L, 5L))
      .toDF("chrom", "s", "e")
    val b = Seq(("c1", 5L, 25L), ("c2", 0L, 7L)).toDF("chrom", "s", "e")
    val got = graft.operators.Intervals
      .intervalJaccard(a, b, Seq("chrom"), "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // c1: bp_a 20, bp_b 20, inter = [5,10)+[20,25) = 10, union 30
    assert(got("c1") == ((20L, 20L, 10L, 30L, 333333L)))
    assert(got("c2") == ((0L, 7L, 0L, 7L, 0L)))
    assert(got("c3") == ((5L, 0L, 0L, 5L, 0L)))
  }

  // ---- ByRange twins: bitwise parity with the plain per-key forms
  // under a partitioning that forces every key across many partitions
  // (the scale shape: #partitions >> #keys) ----

  private def sweepFixture = {
    // 3 keys with very different densities: nested runs, bookends,
    // duplicates, coincident starts/ends, a singleton key — the
    // shapes where a wrong island flag or depth offset shows up
    val rnd = new scala.util.Random(20260815)
    val dense = (0 until 400).map { i =>
      val s = rnd.nextInt(2000).toLong
      ("chrA", s, s + 1 + rnd.nextInt(120).toLong)
    }
    val sparse = (0 until 60).map { i =>
      val s = (i * 97 + rnd.nextInt(9)).toLong
      ("chrB", s, s + 1 + rnd.nextInt(6).toLong)
    }
    val edge = Seq(
      ("chrC", 0L, 10L), ("chrC", 10L, 20L),  // bookend pair
      ("chrC", 0L, 10L),                      // exact duplicate
      ("chrC", 5L, 6L), ("chrC", 100L, 101L)) // nested + far island
    (dense ++ sparse ++ edge).toDF("chrom", "s_start", "s_end")
  }

  test("coverageDepthByRange == coverageDepth bitwise, keys span partitions") {
    val df = sweepFixture
    for (np <- Seq(1, 7, 32)) {
      val want = graft.operators.Intervals
        .coverageDepth(df, Seq("chrom"), "s_start", "s_end")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      val got = graft.operators.Intervals
        .coverageDepthByRange(df, Seq("chrom"), "s_start", "s_end",
          numPartitions = np)
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"np=$np")
    }
    spark.catalog.clearCache()
  }

  test("mergeOverlapsByRange == mergeOverlaps bitwise, incl. minGap") {
    val df = sweepFixture
    for (np <- Seq(1, 7, 32); gap <- Seq(0L, 15L)) {
      val want = graft.operators.Intervals
        .mergeOverlaps(df, Seq("chrom"), "s_start", "s_end", minGap = gap)
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      val got = graft.operators.Intervals
        .mergeOverlapsByRange(df, Seq("chrom"), "s_start", "s_end",
          minGap = gap, numPartitions = np)
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(got == want, s"np=$np gap=$gap")
    }
    spark.catalog.clearCache()
  }

  test("ByRange twins: single-key and single-row degenerate inputs") {
    val one = Seq(("k", 5L, 9L)).toDF("chrom", "s_start", "s_end")
    val gotD = graft.operators.Intervals
      .coverageDepthByRange(one, Seq("chrom"), "s_start", "s_end",
        numPartitions = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gotD == Seq(("k", 5L, 9L, 1L)))
    val gotM = graft.operators.Intervals
      .mergeOverlapsByRange(one, Seq("chrom"), "s_start", "s_end",
        numPartitions = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(gotM == Seq(("k", 5L, 9L, 1L)))
    spark.catalog.clearCache()
  }
}
