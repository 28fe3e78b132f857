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

  /** Shared tagged-union normalization: left rows `__side = 1` with
    * null payload slots, right rows `__side = 0` with null extra-left
    * slots — one schema, so every form's running-last fill rides a
    * single union. Validates the payload/left collision up front (a
    * clash would otherwise surface as an ambiguous-column analysis
    * error far from the call). */
  private def normalize(left: DataFrame, right: DataFrame,
                        keys: Seq[String], tsCol: String,
                        payloadCols: Seq[String]): (DataFrame, DataFrame) = {
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
    (lNorm, rNorm)
  }

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               strict: Boolean = false): DataFrame = {
    val (lNorm, rNorm) = normalize(left, right, keys, tsCol, payloadCols)
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

  /** Range-partitioned twin of [[backward]] for LOW-CARDINALITY keys —
    * the quotes/trades wall: the plain union-sort form windows by key,
    * so 23 chromosomes (or 11 ticker symbols) cap the sort at 23 tasks
    * no matter how many executors the cluster has. This twin
    * partitions the union by RANGE over (keys, ts) instead, so
    * parallelism tracks the partition count:
    *
    *   1. range-partition the tagged union on (keys…, ts, side-order)
    *      and PIN it (partition ids must be bit-stable across the two
    *      jobs below — `repartitionByRange` re-samples boundaries per
    *      job, the [[Batching.partitionOffsets]] license),
    *   2. census: per (partition, key), the latest non-null right
    *      payload in that partition — ≤ #partitions × #keys rows,
    *   3. carry-in: per key, a running `last` over the census in
    *      partition order gives each partition the latest right
    *      payload from all EARLIER partitions (metadata-sized window),
    *   4. broadcast the carry back; each (partition, key) window runs
    *      the plain running-`last` and left rows with no in-partition
    *      predecessor coalesce to the carry.
    *
    * Identical results to [[backward]] (AsOfJoinSpec pins equality,
    * including per-column null fall-through, strict mode, null keys,
    * and keys with no right rows). Costs one extra pass (range
    * partition + pinned cache) over the plain form — the price of
    * key-count-independent parallelism; at ≥ #threads keys prefer
    * [[backward]]. The broadcast is #partitions × #keys rows: the
    * low-cardinality-key contract, same as `groupedRankByRange`.
    * Payload columns must be orderable types (the census max rides a
    * struct comparison). The pinned partitioning is released by
    * [[Batching.releasePins]] / `clearCache()` between batches. */
  def backwardByRange(left: DataFrame, right: DataFrame,
                      keys: Seq[String], tsCol: String,
                      payloadCols: Seq[String], strict: Boolean = false,
                      numPartitions: Int = 0): DataFrame =
    byRange(left, right, keys, tsCol, payloadCols, strict,
      fwd = false, numPartitions)

  /** Range-partitioned twin of [[forward]] — see [[backwardByRange]]. */
  def forwardByRange(left: DataFrame, right: DataFrame,
                     keys: Seq[String], tsCol: String,
                     payloadCols: Seq[String], strict: Boolean = false,
                     numPartitions: Int = 0): DataFrame =
    byRange(left, right, keys, tsCol, payloadCols, strict,
      fwd = true, numPartitions)

  private def byRange(left: DataFrame, right: DataFrame,
                      keys: Seq[String], tsCol: String,
                      payloadCols: Seq[String], strict: Boolean,
                      fwd: Boolean, numPartitions: Int): DataFrame = {
    val (lNorm, rNorm) = normalize(left, right, keys, tsCol, payloadCols)
    // same pair-ordering rule as the plain forms, encoded ascending:
    // inclusive sorts the right row first at equal ts, strict the left
    val unioned = lNorm.unionByName(rNorm).withColumn("__sord",
      if (strict) lit(1) - col("__side") else col("__side"))
    val tsOrd = if (fwd) col(tsCol).desc else col(tsCol).asc
    val sortCols = keys.map(col) ++ Seq(tsOrd, col("__sord").asc)
    val ranged =
      if (numPartitions > 0)
        unioned.repartitionByRange(numPartitions, sortCols: _*)
      else unioned.repartitionByRange(sortCols: _*)
    val withPid = Batching.pin(ranged
      .withColumn("__apid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // census: per (partition, key, payload column) the non-null value
    // at the last scan position — only right rows carry non-null
    // payloads, and right ts are unique per key (the as-of
    // precondition), so the struct extreme is total
    def boundary(c: String): Column = {
      val tagged = when(col(c).isNotNull,
        struct(col(tsCol).as("__t"), col(c).as("__v")))
      (if (fwd) min(tagged) else max(tagged)).getField("__v").as(c)
    }
    val cen = withPid
      .groupBy((col("__apid") +: keys.map(col)): _*)
      .agg(boundary(payloadCols.head),
        payloadCols.tail.map(boundary): _*)
    // carry-in per (partition, key): latest non-null census value from
    // STRICTLY earlier partitions (partition ranges are contiguous in
    // (key, ts) order, so partition order IS time order within a key)
    val cw = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__apid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = cen.select(
      col("__apid").as("__capid") +:
        keys.map(k => col(k).as(s"__ck_$k")) ++:
        payloadCols.map(c =>
          last(col(c), ignoreNulls = true).over(cw).as(s"__carry_$c")): _*)
    val joinCond = ((col("__apid") === col("__capid")) +:
      keys.map(k => col(k) <=> col(s"__ck_$k"))).reduce(_ && _)
    val joined = withPid.join(broadcast(carry), joinCond)
    val w = Window.partitionBy((col("__apid") +: keys.map(col)): _*)
      .orderBy(tsOrd, col("__sord").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(joined) { (d, c) =>
      d.withColumn(c,
        coalesce(last(col(c), ignoreNulls = true).over(w),
          col(s"__carry_$c")))
    }
    filled.filter(col("__side") === 1)
      .drop("__side", "__sord", "__apid", "__capid")
      .drop(keys.map(k => s"__ck_$k"): _*)
      .drop(payloadCols.map(c => s"__carry_$c"): _*)
  }

  /** Forward variant: the EARLIEST right row at or after left's time
    * (strict: after). Same single-shuffle shape, reversed ordering. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              tsCol: String, payloadCols: Seq[String],
              strict: Boolean = false): DataFrame = {
    val (lNorm, rNorm) = normalize(left, right, keys, tsCol, payloadCols)
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
