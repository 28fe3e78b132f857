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
}
