package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P9: deterministic batching (SURVEY.md §2.2 — the reference's
  * `df.iloc[i:i+batch]` slicing, cnv.py:555, vcf_anno.py:595,
  * pedmatch:757, mci:350).
  *
  * `ntile(k) OVER (ORDER BY ...)` with no partition key moves the
  * whole table through ONE task — fine as exact replay at fixture
  * scale, fatal at 100 TB. `ntileByRange` computes the identical
  * assignment scalably: range-repartition on the order key, count per
  * partition (a partition-count-sized driver collect — metadata, not
  * data), then global rank = partition offset + local row_number and
  * the closed-form ntile bucket from the rank. Two narrow passes, no
  * global shuffle to a single task, every partition windows only its
  * own range.
  */
object Batching {

  /** Exact-replay global ntile (single-task window — opt-in only). */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], n: Int): DataFrame =
    df.withColumn("batch", ntile(n).over(Window.orderBy(orderCols: _*)))

  /** ntile(n) bucket from a 1-based global rank, closed form:
    * the first `total % n` buckets get `total/n + 1` rows, the rest
    * `total/n` — exactly SQL ntile. */
  private def ntileFromRank(rank: Column, total: Long, n: Int): Column = {
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1)
    if (base == 0) rank.cast("int") // fewer rows than buckets: bucket = rank
    else when(rank <= cut, floor((rank - 1) / (base + 1)) + 1)
      .otherwise(floor((rank - cut - 1) / base) + 1 + rem)
      .cast("int")
  }

  /** Token-budget sequence packing — the batch-construction step of a
    * pretraining pipeline: walk the corpus in `orderCol` order and cut
    * a new pack every time the running `weightCol` total (token count,
    * byte size) passes `budget`. A row whose weight spans a boundary
    * stays whole in its starting pack (no splitting; packs overflow by
    * at most one row's weight — the standard contiguous-packing
    * approximation).
    *
    * Same scalable skeleton as `ntileByRange`: range-repartition on
    * the order key, per-partition weight totals collected (one row per
    * partition — metadata), global running sum = partition offset +
    * in-partition window, pack id = floor((cumsum − weight)/budget).
    * No single-task window; the oracle is the plain one-window SQL. */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
                   budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
    val withPid = parts.withColumn("__pid", spark_partition_id())
    val sums = withPid.groupBy("__pid")
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) =>
      val o = (pid, acc); acc += s; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid", "__woffset")
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__cum",
        col("__woffset") + sum(col(weightCol).cast("long")).over(w))
      .withColumn("pack",
        floor((col("__cum") - col(weightCol)) / budget))
      .drop("__pid", "__woffset", "__cum")
  }

  /** Scalable twin of `globalNtile`: identical `batch` column, no
    * single-task window. `orderCol` must be a total order (unique) for
    * a deterministic result — same caveat as any rank-based batching.
    * `numPartitions` bounds the per-partition window size; the driver
    * collect is one row per partition (offsets), never data. */
  def ntileByRange(df: DataFrame, orderCol: String, n: Int,
                   numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol))
    val withPid = parts.withColumn("__pid", spark_partition_id())
    // metadata-sized: one (pid, count) row per partition
    val counts = withPid.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val o = (pid, acc); acc += c; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toSeq.toDF("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
    withPid
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__rank", col("__offset") + row_number().over(w))
      .withColumn("batch", ntileFromRank(col("__rank"), total, n))
      .drop("__pid", "__offset", "__rank")
  }
}
