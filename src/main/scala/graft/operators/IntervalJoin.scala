package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the reference's centerpiece operator
  * (`bedtools intersect -a genes -b segments -wo -f 0.5`,
  * workflows/cnv.py:413-436, cmd at :430), re-expressed relationally.
  *
  * Semantics replicated exactly:
  *   - intervals are half-open [start, end)
  *   - a pair is emitted when overlap >= frac * (aEnd - aStart)
  *     (bedtools -f is a >= test against the A-interval length)
  *   - the emitted row carries both sides plus the overlap length (-wo)
  *
  * Two physical strategies:
  *   - `overlap`: equi-join on the partition key (chrom) + range
  *     predicate. Catalyst runs this as a SortMergeJoin on the key with
  *     the range as a post-join filter — fine when per-key groups are
  *     small relative to executor memory.
  *   - `overlapBinned`: the 100 TB path. Both sides explode into
  *     fixed-width genomic bins, the join becomes equi on (key, bin)
  *     — a plain shuffled hash join with bounded per-task fan-out —
  *     and each pair is deduplicated for free by keeping only the bin
  *     containing the overlap start (no distinct/shuffle needed).
  */
object IntervalJoin {

  private def overlapLen(aStart: Column, aEnd: Column,
                         bStart: Column, bEnd: Column): Column =
    least(aEnd, bEnd) - greatest(aStart, bStart)

  /** Naive (Catalyst-planned) overlap join.
    *
    * @param keys equi keys present on both sides (e.g. chrom)
    * @param frac minimum overlap as a fraction of the A interval
    *             (bedtools -f; 0.0 keeps any 1bp overlap)
    */
  def overlap(a: DataFrame, b: DataFrame, keys: Seq[String],
              aStart: String, aEnd: String, bStart: String, bEnd: String,
              frac: Double = 0.0, overlapCol: String = "overlap_len"): DataFrame = {
    val cond = keys.map(k => a(k) === b(k)).reduce(_ && _) &&
      a(aStart) < b(bEnd) && b(bStart) < a(aEnd)
    val joined = a.join(b, cond)
      .withColumn(overlapCol, overlapLen(a(aStart), a(aEnd), b(bStart), b(bEnd)))
    if (frac <= 0.0) joined
    else joined.filter(col(overlapCol) >= lit(frac) * (a(aEnd) - a(aStart)))
  }

  /** Binned overlap join for scale: shuffle is equi on (keys, bin) so
    * work distributes across `chrom x bin` instead of one task per
    * chromosome. Pairs spanning several shared bins are emitted once:
    * only the bin that contains greatest(aStart,bStart) survives.
    */
  def overlapBinned(a: DataFrame, b: DataFrame, keys: Seq[String],
                    aStart: String, aEnd: String, bStart: String, bEnd: String,
                    frac: Double = 0.0, binWidth: Long = 1000000L,
                    overlapCol: String = "overlap_len"): DataFrame = {
    val w = lit(binWidth)
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn("__bin",
        explode(sequence(floor(col(s) / w), floor((col(e) - 1) / w))))
    val ab = binned(a, aStart, aEnd)
    val bb = binned(b, bStart, bEnd)
    val cond = (keys.map(k => ab(k) === bb(k)) :+
      (ab("__bin") === bb("__bin"))).reduce(_ && _) &&
      ab(aStart) < bb(bEnd) && bb(bStart) < ab(aEnd)
    val joined = ab.join(bb, cond)
      // emit each (a,b) pair exactly once: in the bin of the overlap start
      .filter(ab("__bin") === floor(greatest(ab(aStart), bb(bStart)) / w))
      .withColumn(overlapCol,
        overlapLen(ab(aStart), ab(aEnd), bb(bStart), bb(bEnd)))
      .drop("__bin")
    if (frac <= 0.0) joined
    else joined.filter(col(overlapCol) >= lit(frac) * (ab(aEnd) - ab(aStart)))
  }

  /** bedtools' other fraction modes on top of either physical form:
    * `-F` (fraction of B), and `-e` (EITHER side satisfies its
    * fraction) vs the default BOTH-when-two-fractions-given.
    * `joined` must carry the original start/end columns + overlapCol.
    */
  def fractionFilter(joined: DataFrame,
                     aStart: String, aEnd: String,
                     bStart: String, bEnd: String,
                     fracA: Double = 0.0, fracB: Double = 0.0,
                     either: Boolean = false,
                     overlapCol: String = "overlap_len"): DataFrame = {
    val passA = col(overlapCol) >= lit(fracA) * (col(aEnd) - col(aStart))
    val passB = col(overlapCol) >= lit(fracB) * (col(bEnd) - col(bStart))
    (fracA > 0.0, fracB > 0.0) match {
      case (false, false) => joined
      case (true, false) => joined.filter(passA)
      case (false, true) => joined.filter(passB)
      case (true, true) =>
        joined.filter(if (either) passA || passB else passA && passB)
    }
  }
}
