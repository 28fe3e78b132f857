package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far each user progresses through a
  * sequence of event types, where step i counts only if it happens
  * STRICTLY AFTER the user's first completion of step i−1
  * (first-touch semantics — the standard product-analytics funnel).
  *
  * Relational composition, one `min` aggregation per step joined on
  * the user key: every shuffle hashes the same key, so the exchanges
  * line up (and the per-step frames are one row per qualifying user —
  * they broadcast under AQE against the event scan at any scale).
  * A k-step funnel is k scans of the (type-filtered, column-pruned)
  * event table — at 100 TB each scan pushes `event_type = step` into
  * the parquet filter, so the passes touch only matching row groups.
  */
object Funnel {

  /** Per-user furthest step: 0 (never entered) … steps.length.
    * Returns (userCol, steps_completed). */
  def reached(df: DataFrame, userCol: String, tsCol: String,
              typeCol: String, steps: Seq[String]): DataFrame =
    reachedCascade(df, userCol, tsCol, typeCol, steps, maxGapNs = None)

  /** The shared k-scan cascade behind [[reached]] / [[reachedWithin]]:
    * step i's qualified time is the MIN event time strictly after step
    * i−1's (and, when `maxGapNs` is set, within that window of it). */
  private def reachedCascade(df: DataFrame, userCol: String,
                             tsCol: String, typeCol: String,
                             steps: Seq[String],
                             maxGapNs: Option[Long]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val users = df.select(col(userCol)).distinct()
    var prev: Option[DataFrame] = None
    val stepFrames = steps.zipWithIndex.map { case (st, i) =>
      val ev = df.filter(col(typeCol) === st).select(col(userCol), col(tsCol))
      val cur = prev match {
        case None =>
          ev.groupBy(userCol).agg(min(col(tsCol)).as(s"__t$i"))
        case Some(p) =>
          val after = col(tsCol) > col(s"__t${i - 1}")
          val inWindow = maxGapNs.fold(after)(g =>
            after && col(tsCol) <= col(s"__t${i - 1}") + g)
          ev.join(p, Seq(userCol))
            .filter(inWindow)
            .groupBy(userCol).agg(min(col(tsCol)).as(s"__t$i"))
      }
      prev = Some(cur)
      cur
    }
    val joined = stepFrames.foldLeft(users)(
      (acc, f) => acc.join(f, Seq(userCol), "left"))
    val stepsDone = steps.indices.reverse.foldLeft(Option.empty[Column]) {
      case (acc, i) =>
        val cond = col(s"__t$i").isNotNull
        Some(acc.fold(when(cond, lit(i + 1)))(_.when(cond, lit(i + 1))))
    }.fold(lit(0): Column)(_.otherwise(lit(0)))
    joined.select(col(userCol), stepsDone.as("steps_completed"))
  }

  /** [[reached]] with a conversion window: step i counts only when it
    * happens within `maxGapNs` of the previous step's qualified time
    * — "purchased within a day of clicking", the form product funnels
    * actually ship (an unconstrained funnel credits a purchase months
    * later). Same k-scan relational cascade; the window is one extra
    * pushdown-friendly predicate per step. */
  def reachedWithin(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    maxGapNs: Long): DataFrame = {
    require(maxGapNs > 0, s"maxGapNs must be positive, got $maxGapNs")
    reachedCascade(df, userCol, tsCol, typeCol, steps, Some(maxGapNs))
  }

  /** Conversion-lag distribution per funnel transition: users who
    * complete step i → i+1 (same strict-sequence semantics as
    * `reached`: each step's FIRST occurrence after the previous
    * step's qualified time) contribute t_{i+1} − t_i. Output one row
    * per transition: `n_converted`, `p25`/`p50`/`p90` lag.
    *
    * Pass timestamps in ms (the q_e_gaps determinism recipe: divide
    * to coarse integer units BEFORE the percentile, so interpolated
    * values stay within the 6-dp rounding's exact range). One
    * aggregation per step plus a per-transition join of user-sized
    * frames — no windows, no event-level joins. */
  def stepLags(df: DataFrame, userCol: String, tsCol: String,
               typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "need at least one transition")
    var prev: Option[DataFrame] = None
    val stepFrames = steps.zipWithIndex.map { case (st, i) =>
      val ev = df.filter(col(typeCol) === st).select(col(userCol), col(tsCol))
      val cur = prev match {
        case None =>
          ev.groupBy(userCol).agg(min(col(tsCol)).as(s"__t$i"))
        case Some(p) =>
          ev.join(p, Seq(userCol))
            .filter(col(tsCol) > col(s"__t${i - 1}"))
            .groupBy(userCol).agg(min(col(tsCol)).as(s"__t$i"))
      }
      prev = Some(cur)
      cur
    }
    val lags = steps.indices.tail.map { i =>
      stepFrames(i).join(stepFrames(i - 1), Seq(userCol))
        .select(lit(s"${steps(i - 1)}->${steps(i)}").as("transition"),
          (col(s"__t$i") - col(s"__t${i - 1}")).as("lag_ms"))
    }.reduce(_.unionAll(_))
    lags.groupBy("transition").agg(
      count(lit(1)).as("n_converted"),
      round(expr("percentile(lag_ms, 0.25D)"), 6).as("p25"),
      round(expr("percentile(lag_ms, 0.5D)"), 6).as("p50"),
      round(expr("percentile(lag_ms, 0.9D)"), 6).as("p90"))
  }

  /** Cohort retention: bucket each user by their FIRST activity
    * period (`cohort`), then count distinct users active again at
    * each later offset — the classic retention triangle. `bucket`
    * is the period width in the units of `tsCol` (e.g. 7·86400·10⁹
    * ns for weekly cohorts over epoch-nanos). Two hash aggregations
    * and one user-keyed join (broadcast under AQE when the cohort
    * frame fits); integer floor-division bucketing, so the result is
    * engine-exact. */
  def retention(df: DataFrame, userCol: String, tsCol: String,
                bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val wk = expr(s"`$tsCol` div $bucket")
    val first = df.groupBy(userCol).agg(min(wk).as("cohort"))
    val active = df.select(col(userCol), wk.as("__wk")).distinct()
    active.join(first, Seq(userCol))
      .groupBy(col("cohort"), (col("__wk") - col("cohort")).as("offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** New-vs-returning split per time bucket — the growth dashboard's
    * first chart: a user is "new" in the bucket of their first-ever
    * activity, "returning" in every later active bucket. Two
    * aggregations over distinct (user, bucket) rows plus a join on
    * the user key; all integers. */
  def newVsReturning(df: DataFrame, userCol: String, tsCol: String,
                     bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val bk = expr(s"`$tsCol` div $bucket")
    val first = df.groupBy(userCol).agg(min(bk).as("__first"))
    val active = df.select(col(userCol), bk.as("bucket")).distinct()
    active.join(first, Seq(userCol))
      .groupBy("bucket")
      .agg(sum(when(col("bucket") === col("__first"), 1L).otherwise(0L))
          .as("n_new"),
        sum(when(col("bucket") =!= col("__first"), 1L).otherwise(0L))
          .as("n_returning"))
  }

  /** Funnel summary: users reaching at least each step (the classic
    * decreasing bar chart), from one `reached` pass. */
  def counts(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    val r = reached(df, userCol, tsCol, typeCol, steps)
    val total = Seq.tabulate(steps.length) { i =>
      coalesce(sum(when(col("steps_completed") >= i + 1, 1L).otherwise(0L)),
        lit(0L)).as(s"__s$i") // empty input: 0 users, not an NPE
    }
    val agg = r.agg(total.head, total.tail: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val row = agg.head()
    steps.zipWithIndex.map { case (st, i) =>
      (i + 1, st, row.getLong(i))
    }.toDF("step", "event_type", "users_reached")
  }
}
