package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation — the feature-cleaning step between
  * profiling (which finds the nulls) and model input (which can't eat
  * them). Group-aware: a null fills from ITS group's statistic
  * (per-cohort biology, per-user behavior), falling back to the global
  * statistic when the whole group is null.
  *
  * Shape: group statistics ride a whole-partition window (one hash
  * shuffle, no sort, no join-back). The global MEAN fallback is a
  * 1-row broadcast cross-join; the global MEDIAN fallback runs the
  * radix order-statistic engine EAGERLY at call time (four
  * bounded-state scans, histogram-sized driver collects — never the
  * single-reducer `percentile` value buffer) and enters as a literal.
  * The median path therefore inherits the engine's input license
  * (bit-identical data across its scans): `fillFromGroup` passes
  * `pin = true`, which makes the engine's four internal rank scans
  * mutually consistent at the cost of one released-before-return
  * cache of the value column. NOTE the pin protects ONLY the engine's
  * internal refinement: the eagerly-computed global-median literal
  * can still desync from what the main plan re-scans later (the
  * grouped window and output rows re-evaluate `df` unpinned). Over a
  * truly volatile source, pin/snapshot `df` itself before calling
  * `fillFromGroup` — unlike the crossJoin form this replaced, the
  * call is no longer one plan. */
object Impute {

  /** Fill nulls in `valueCol` with the per-group mean (`"mean"`) or
    * exact median (`"median"`), global statistic as fallback. Adds
    * `<valueCol>_filled` (rounded to 4 dp — group aggregation order
    * must not leak) and `<valueCol>_imputed` (1 when filled).
    *
    * Engine-portability caveat on MEAN mode (found by the sf10
    * DuckDB spot-gate): a float mean can land exactly on the 4-dp
    * rounding tie (….xxxx5), where engines legitimately disagree —
    * Spark's round is HALF_UP over the double's shortest decimal
    * representation, DuckDB rounds the scaled double — so replaying
    * the fill in another engine can differ by 1e-4 on tie rows. No
    * summation fix removes a presentation-rounding tie; present
    * exact integer units if cross-engine byte-equality is required.
    * MEDIAN mode is tie-free on fixed-point inputs (medians of 2-dp
    * data are 0.005-quantized, so the 4-dp round never decides). */
  def fillFromGroup(df: DataFrame, keys: Seq[String], valueCol: String,
                    stat: String = "mean"): DataFrame = {
    def statOf(c: String, over: Option[Seq[String]]): Column = {
      val base = stat match {
        case "mean"   => avg(col(c))
        case "median" => expr(s"percentile($c, 0.5D)")
        case other => throw new IllegalArgumentException(
          s"stat must be mean or median, got $other")
      }
      over.fold(base)(ks =>
        base.over(Window.partitionBy(ks.map(col): _*)))
    }
    val g = df.withColumn("__gstat", statOf(valueCol, Some(keys)))
    // global fallback: the exact GLOBAL median must not ride
    // `percentile` (its final merge holds every distinct value on one
    // reducer — the radix engine computes the same value in four
    // bounded-state scans, eagerly, entering as a literal); the
    // grouped stat stays a window — group size is the caller's
    // contract, as with every per-key window in this repo
    // pin = true: df is caller-supplied with arbitrary lineage; the
    // engine's four scans must see bit-identical data (the crossJoin
    // form this replaced was one plan and could not desync). The pin
    // is a projected single-column cache, released before returning.
    val withGlobal =
      if (stat == "median")
        g.withColumn("__allstat",
          Quantiles.exactQuantiles(df, Seq(valueCol -> Seq(0.5)),
            pin = true)(valueCol)
            .head.map(lit).getOrElse(lit(null).cast("double")))
      else g.crossJoin(broadcast(
        df.agg(statOf(valueCol, None).as("__allstat"))))
    withGlobal
      .withColumn(s"${valueCol}_filled",
        round(coalesce(col(valueCol), col("__gstat"), col("__allstat")), 4))
      .withColumn(s"${valueCol}_imputed",
        when(col(valueCol).isNull, 1).otherwise(0))
      .drop("__gstat", "__allstat")
  }
}
