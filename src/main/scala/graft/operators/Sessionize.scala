package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (north-star op; the
  * reference is batch-only — SURVEY.md §2.10 — so this is the
  * batch/streaming-parallel extension point for the `events` table).
  *
  * Batch form: two windows over (user, time) — a lag to flag gaps and
  * a running sum to assign session ids. One shuffle on the user key;
  * both windows share the same partitioning so Catalyst plans a single
  * exchange. The streaming twin (mapGroupsWithState) lives in
  * graft.streaming.
  */
object Sessionize {

  /** Assign `session_id` per `userCol`: a new session starts when the
    * gap to the previous event exceeds `gapNs`. `tiebreak` must make
    * the per-user order total (e.g. the event id).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 gapNs: Long, tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol) +: tiebreak: _*)
    val gap = col(tsCol) - lag(col(tsCol), 1).over(w)
    df.withColumn("__new", when(gap.isNull || gap > gapNs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Per-session stats: event count + [start, end] timestamps. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String,
                   gapNs: Long, tiebreak: Seq[Column]): DataFrame =
    sessionize(df, userCol, tsCol, gapNs, tiebreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"),
        max(col(tsCol)).as("t_end"))

  /** Market-basket association rules with sessions as baskets and
    * event types as items: for every unordered item pair, support
    * (baskets containing both), per-direction confidence
    * (supp(a,b)/supp(a)), and lift (confidence over the consequent's
    * base rate). The exactness discipline: counts stay integers until
    * the final divisions, rounded to 6 dp.
    *
    * Scale shape: distinct (basket, item) first (within-basket
    * repeats must not inflate support), pair generation is an
    * in-basket self-join on the basket key (bounded by items² per
    * basket, not corpus²), item marginals ride back as a broadcast.
    * `minSupport` prunes the tail before the join-back. */
  def basketRules(df: DataFrame, userCol: String, tsCol: String,
                  itemCol: String, gapNs: Long, tiebreak: Seq[Column],
                  minSupport: Long = 2L): DataFrame = {
    val baskets = sessionize(df, userCol, tsCol, gapNs, tiebreak)
      .select(col(userCol).cast("string").as("__u"),
        col("session_id"), col(itemCol).as("item"))
      .select(concat_ws("#", col("__u"), col("session_id")).as("basket"),
        col("item")).distinct()
    val nBaskets = baskets.select("basket").distinct()
      .agg(count(lit(1)).as("__nb"))
    val itemSupp = baskets.groupBy("item").agg(count(lit(1)).as("__si"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.basket") === col("b.basket") &&
          col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(broadcast(itemSupp.select(col("item").as("item_a"),
        col("__si").as("__sa"))), Seq("item_a"))
      .join(broadcast(itemSupp.select(col("item").as("item_b"),
        col("__si").as("__sb"))), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("support"),
        round(col("support").cast("double") / col("__sa"), 6)
          .as("conf_a_b"),
        round(col("support").cast("double") / col("__sb"), 6)
          .as("conf_b_a"),
        round(col("support").cast("double") * col("__nb") /
          (col("__sa").cast("double") * col("__sb")), 6).as("lift"))
  }

  /** Throttle-dedup ("debounce") for telemetry streams: keep an
    * event only when the PREVIOUS event with the same keys is at
    * least `minGapNs` older (or absent) — the double-click / retry /
    * duplicate-beacon filter. Lag form, not a recursive debounce:
    * the survivor set is a pure function of each row and its
    * predecessor, so it replays identically everywhere. One shuffle
    * on the keys; the window reuses that partitioning. */
  def debounce(df: DataFrame, keys: Seq[String], tsCol: String,
               tiebreak: Seq[Column], minGapNs: Long): DataFrame = {
    require(minGapNs > 0, s"minGapNs must be positive, got $minGapNs")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol) +: tiebreak: _*)
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNull ||
        col(tsCol) - col("__prev") > minGapNs)
      .drop("__prev")
  }

  /** Top ordered event-type paths — the "what do sessions actually
    * do" report (the path/flow analysis sitting one level above
    * funnels: funnels check a FIXED sequence, paths surface the
    * sequences that exist). Each session's path is its event types
    * joined in (ts, tiebreak) order; paths are ranked by session
    * count, ties by path string.
    *
    * Scale shape: the per-session path rides the session window's
    * existing user-key partitioning (collect_list + array_sort over
    * session-sized structs — no second shuffle beyond the path
    * count), and the final top-k is a rank-filter window over the
    * path-count table (WindowGroupLimit). */
  def topPaths(df: DataFrame, userCol: String, tsCol: String,
               typeCol: String, gapNs: Long, tiebreak: Seq[Column],
               k: Int = 10): DataFrame = {
    val perSession = sessionize(df, userCol, tsCol, gapNs, tiebreak)
      .groupBy(col(userCol), col("session_id"))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col(tsCol) +: tiebreak :+
          col(typeCol).as("__t"): _*))),
        e => e.getField("__t"))).as("path"))
    // top-k via TakeOrdered before ranking: the path frame is
    // data-sized (one row per distinct session path), so a bare
    // global window here would single-task the whole corpus
    perSession.groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))))
  }

  /** First-order Markov transition model of the event stream: for
    * each (src → dst) consecutive event-type pair within a user's
    * (ts, tiebreak)-ordered history, the transition count and its
    * probability P(dst | src) in integer PPM — the user-journey model
    * (next-step prediction, funnel leak diagnosis, synthetic-session
    * generation all start from this table).
    *
    * Scale shape: one lead() window over the per-user partitioning
    * plus one (src, dst) count aggregation; the per-src totals for
    * the conditional come from a window over the count table (src-
    * keyed — table is |types|², metadata-sized, but the window form
    * keeps it distributed if a high-cardinality type column shows
    * up). PPM is the repo's ttr_ppm recipe: round(n·1e6/total) as
    * long — exact cross-engine compare, no low-order double bits.
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol) +: tiebreak: _*)
    val steps = df
      .withColumn("__dst", lead(col(typeCol), 1).over(w))
      .filter(col("__dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("__dst").as("dst"))
      .agg(count(lit(1)).as("n"))
    steps
      .withColumn("__tot", sum(col("n")).over(Window.partitionBy("src")))
      .select(col("src"), col("dst"), col("n"),
        round(col("n").cast("double") * 1e6 / col("__tot"))
          .cast("long").as("p_ppm"))
  }
}
