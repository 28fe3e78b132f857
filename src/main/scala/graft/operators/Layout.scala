package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for scan pruning: Z-order (Morton)
  * interleaving maps a multi-column predicate space onto one sort key
  * so that parquet row-group min/max statistics prune on EVERY
  * participating column, not just the leading sort column — the
  * standard layout trick (Delta/Iceberg `OPTIMIZE ZORDER BY`) for
  * 100 TB tables queried on several independent keys.
  *
  * The z-value is pure Column arithmetic (shift/mask/add on longs —
  * codegen'd, ANSI-safe: every intermediate fits a long), so the
  * whole pass is scan → project → range shuffle → sorted write.
  */
object Layout {

  /** Interleave the low `bits` of two non-negative long columns:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zvalue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Min/max-normalize a numeric column into [0, 2^bits) given its
    * observed range — the quantization step ahead of interleaving.
    * Exact for ranges up to 2^52/2^bits (double mantissa). */
  def normalize(c: Column, minV: Long, maxV: Long, bits: Int): Column =
    floor((c - lit(minV)) * lit((1L << bits).toDouble) /
      lit((maxV - minV + 1).toDouble)).cast("long")

  /** Z-value over two numeric columns with self-computed ranges (one
    * metadata-sized min/max aggregate). Adds `zCol`. */
  def withZValue(df: DataFrame, colA: String, colB: String,
                 bits: Int = 16, zCol: String = "zval"): DataFrame = {
    val r = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    require(!r.anyNull, "z-order range aggregate saw an empty or all-null input")
    val (aMin, aMax, bMin, bMax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn(zCol, zvalue2(
      normalize(col(colA).cast("long"), aMin, aMax, bits),
      normalize(col(colB).cast("long"), bMin, bMax, bits), bits))
  }

  /** Cluster rows for writing: range-partition + in-partition sort on
    * the z-value, so row groups cover compact z-ranges and min/max
    * stats stay tight on BOTH columns. Follow with `.write` — the
    * sort survives into the files. */
  def zorderBy(df: DataFrame, colA: String, colB: String,
               bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val z = withZValue(df, colA, colB, bits)
    val parts =
      if (numPartitions > 0) z.repartitionByRange(numPartitions, col("zval"))
      else z.repartitionByRange(col("zval"))
    parts.sortWithinPartitions("zval")
  }
}
