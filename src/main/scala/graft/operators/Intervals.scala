package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval *algebra* beyond the overlap join: island merging and
  * sweep-line coverage depth — the relational re-derivations of
  * `bedtools merge` / `bedtools genomecov`, the natural companions of
  * the reference's `bedtools intersect` centerpiece
  * (workflows/cnv.py:413-436).
  *
  * Conventions shared with [[IntervalJoin]]: intervals are half-open
  * [start, end); *bookended* intervals ([10,20) + [20,30)) merge, as
  * bedtools merge does by default.
  *
  * Scale: both ops are one shuffle (the per-key window sort); work
  * parallelizes across keys (chrom × sample in genomics, domain in a
  * corpus). Each key's pass is a streaming O(n) running max / running
  * sum inside one sorted partition — no self-join, no O(n²) expansion.
  * For a degenerate corpus with one giant key, pre-split the key by a
  * coarse position bin, merge locally, and re-run on the (tiny) set of
  * islands that touch a bin boundary.
  */
object Intervals {

  /** Merge overlapping or near-adjacent intervals per key into islands.
    *
    * An interval starts a new island when it begins more than `minGap`
    * after everything seen so far ends: `start > runningMax(end) +
    * minGap`. `minGap = 0` merges overlapping AND bookended intervals
    * (bedtools merge default); `minGap = d` replicates `-d d`.
    *
    * Output: keys + `<start>` (island min start), `<end>` (island max
    * end), `n_intervals` (merged count) — column names reuse the input
    * start/end names.
    */
  def mergeOverlaps(df: DataFrame, keys: Seq[String],
                    start: String, end: String,
                    minGap: Long = 0L): DataFrame = {
    val byPos = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(start), col(end))
    val prevMax = max(col(end)).over(
      byPos.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("__new_island",
      when(prevMax.isNull || col(start) > prevMax + lit(minGap), 1L)
        .otherwise(0L))
    val islands = flagged.withColumn("__island",
      sum(col("__new_island")).over(
        byPos.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(start)).as(start), max(col(end)).as(end),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Sweep-line coverage depth: for each key, the segments of constant
    * positive depth (how many intervals cover each base).
    *
    * Physical shape: intervals become ±1 events; coincident events
    * collapse in a partial-aggregating groupBy (so a million reads
    * starting at one hotspot position cost one row in the window sort,
    * not a million); one per-key window computes the running depth and
    * each segment's extent to the next event.
    *
    * Output: keys + `d_start`, `d_end`, `depth` (> 0 only; zero-depth
    * gaps are the complement and carry no information at corpus scale).
    */
  def coverageDepth(df: DataFrame, keys: Seq[String],
                    start: String, end: String): DataFrame = {
    val kc = keys.map(col)
    val events =
      df.select((kc :+ col(start).as("__pos") :+ lit(1L).as("__delta")): _*)
        .unionByName(
          df.select((kc :+ col(end).as("__pos") :+ lit(-1L).as("__delta")): _*))
    val collapsed = events.groupBy((kc :+ col("__pos")): _*)
      .agg(sum(col("__delta")).as("__d"))
    val byPos = Window.partitionBy(kc: _*).orderBy(col("__pos"))
    collapsed
      .withColumn("depth", sum(col("__d"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__next", lead(col("__pos"), 1).over(byPos))
      .filter(col("__next").isNotNull && col("depth") > 0)
      .select((kc :+ col("__pos").as("d_start") :+
        col("__next").as("d_end") :+ col("depth")): _*)
  }
}
