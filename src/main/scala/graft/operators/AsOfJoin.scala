package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single most recent right row
  * at or before the left row's time, per key — the temporal-alignment
  * primitive (sensor readings → latest calibration, trades → latest
  * quote, events → latest profile snapshot).
  *
  * Spark has no native as-of join; the naive encodings either explode
  * (range-condition theta join → O(n·m) per key) or collapse to a
  * single task (global sort). This implementation is the scalable
  * union-sort form:
  *
  *   1. tag left/right rows and union them into one frame,
  *   2. one hash-partition by key + in-partition sort by (ts, side),
  *   3. `last(payload, ignoreNulls)` over the running window fills
  *      each left row with the latest preceding right payload,
  *   4. keep the left rows.
  *
  * ONE shuffle of n+m rows total, no join product, no per-key
  * quadratic leg — the shape that survives 100 TB (skewed keys hit
  * the same guardrails as any window op; salt upstream if one key
  * dominates). The DuckDB oracle replays it with a NATIVE `ASOF JOIN`
  * — an independent implementation, not a mirrored algorithm.
  *
  * Semantics: inclusive (`right.ts <= left.ts`) by default; `strict`
  * excludes equal timestamps (`<`). Left rows with no prior right row
  * keep null payloads (left-outer). Right timestamps must be unique
  * per key (the usual as-of precondition); add a tiebreaker column to
  * `tsCol` ordering upstream if yours are not.
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               strict: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "no right payload columns")
    val clash = payloadCols.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right payload collides with left: $clash")
    val extraLeft =
      left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val lNorm = left.withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col(tsCol), col("__side")) ++
        extraLeft.map(col) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rNorm = right.withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col(tsCol), col("__side")) ++
        extraLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)
    // inclusive: right sorts BEFORE left at equal ts (side 0 < 1) so
    // the running last() sees it; strict flips the pair order instead
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(lNorm.unionByName(rNorm)) {
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Forward variant: the EARLIEST right row at or after left's time
    * (strict: after). Same single-shuffle shape, reversed ordering. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, payloadCols: Seq[String],
              strict: Boolean = false): DataFrame = {
    require(payloadCols.nonEmpty, "no right payload columns")
    val extraLeft =
      left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val lNorm = left.withColumn("__side", lit(1))
      .select(keys.map(col) ++ Seq(col(tsCol), col("__side")) ++
        extraLeft.map(col) ++
        payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val rNorm = right.withColumn("__side", lit(0))
      .select(keys.map(col) ++ Seq(col(tsCol), col("__side")) ++
        extraLeft.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)
    // same pair-ordering rule as backward: at equal ts the right row
    // sorts first iff the match is inclusive
    val sideOrd = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc, sideOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(lNorm.unionByName(rNorm)) {
      (d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }
}
