package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling — the validate-before-ingest surface (reference
  * analog: the row-count/column assertions scattered through the
  * flows, e.g. dbCounts and the clinical merge pre-checks; here it is
  * one reusable operator the way a 100 TB intake pipeline wants it).
  *
  * `numeric` computes every measure for every column in ONE
  * aggregation pass (a single scan, one reduce to a 1-row frame on
  * the driver-side result — no per-column jobs), then unpivots the
  * 1×(7·n) row to n rows with a zero-cost explode. Exact
  * `count(distinct)` adds an Expand of (n_cols+1)× the scan rows —
  * acceptable for profiling runs; at full-corpus scale swap
  * `approxDistinct = true` for one-pass HLL (not oracle-exact, which
  * is why the checked query keeps the exact form).
  *
  * Medians are exact (sort-based percentile) and order-independent;
  * means are rounded to 4 dp so distributed partial-sum ordering
  * cannot leak into the last digit.
  */
object Profile {

  /** Long-format numeric profile: one row per column —
    * (column, n, n_null, n_distinct, min_v, max_v, mean_v, median_v). */
  def numeric(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"${c}__distinct"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__mean"),
        // exact sort-based percentile: order-independent, oracle-exact;
        // swap for percentile_approx at full-corpus scale
        round(expr(s"percentile($c, 0.5D)"), 6).as(s"${c}__median"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").cast("long").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"),
        col(s"${c}__median").as("median_v"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Top-k most frequent values per column (mode census), long format:
    * (column, value, cnt, rank). One shuffle — the per-column unpivot
    * happens in the projection (explode), the groupBy partially
    * aggregates map-side, and ties rank deterministically by value. */
  def frequentValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && k > 0)
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
      .as("p")).select("p.*")
    val counts = pairs.groupBy("column", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("column")
      .orderBy(col("cnt").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
