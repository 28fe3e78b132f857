package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental-merge operators: key-based upsert and CDC diff — the
  * "apply today's extract to yesterday's snapshot" step every
  * repeatedly-ingested table needs (the reference's re-run flows
  * overwrite whole tables; at 100 TB only the delta is affordable).
  *
  * Both are single-shuffle relational compositions: upsert is
  * updates ∪ (base ⟕̸ update-keys) — the anti join prunes with AQE
  * (and composes with `BloomJoin.antiJoin` when update keys are huge);
  * cdcDiff is one full-outer join with null-safe column compares, no
  * row hashing, so it is type-exact (doubles compare as values, not
  * as rendered strings).
  */
object Merge {

  /** Replace base rows whose key appears in `updates`, append new
    * keys, keep the rest. Schemas must align by name (unionByName). */
  def upsert(base: DataFrame, updates: DataFrame,
             keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val untouched = base.join(
      updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
    updates.unionByName(untouched)
  }

  /** Per-key change classification between a base snapshot and an
    * updated extract: `insert` (key only in updates), `delete` (key
    * only in base), `update` (both, any non-key column differing,
    * null-safe), `unchanged`. Returns key columns + `change_type`. */
  def cdcDiff(base: DataFrame, updates: DataFrame,
              keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "cdcDiff needs at least one key column")
    val attrs = base.columns.filterNot(keys.contains).toSeq
    val b = base.withColumn("__in_b", lit(1))
    val u = attrs.foldLeft(updates) { (df, a) =>
      df.withColumnRenamed(a, s"__u_$a")
    }.withColumn("__in_u", lit(1))
    val joined = b.join(u, keys, "full_outer")
    val differs = attrs.map(a => !(col(a) <=> col(s"__u_$a")))
      .reduceOption(_ || _).getOrElse(lit(false))
    joined.select(keys.map(col) :+
      when(col("__in_u").isNull, "delete")
        .when(col("__in_b").isNull, "insert")
        .when(differs, "update")
        .otherwise("unchanged").as("change_type"): _*)
  }

  /** Slowly-changing-dimension Type 2: collapse an observed change log
    * into versioned rows with validity ranges.
    *
    * Input: one row per observation — keys + `ts` (+ `tieBreak`
    * columns making the per-key order total) + attribute columns
    * (everything else). Consecutive observations with identical
    * attributes compress into one version (change compression);
    * each version carries `effective_from` (first observation),
    * `effective_to` (next version's from; null while current) and
    * `is_current`.
    *
    * One shuffle (the per-key window); the collapse groupBy reuses the
    * same key partitioning. Version ordering is anchored on the first
    * row's position (`row_number`), not on min(ts) alone, so same-ts
    * observations with different attributes still produce a
    * deterministic version chain.
    */
  def scd2(changes: DataFrame, keys: Seq[String], ts: String,
           tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val attrs = changes.columns
      .filterNot(c => keys.contains(c) || c == ts || tieBreak.contains(c))
      .toSeq
    require(attrs.nonEmpty, "scd2 needs at least one attribute column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col(ts) +: tieBreak.map(col)): _*)
    val differs = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val rn = row_number().over(w)
    val runs = changes
      .withColumn("__rn", rn)
      .withColumn("__new", when(col("__rn") === 1 || differs, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val versions = runs.groupBy((keys.map(col) :+ col("__run")): _*)
      .agg(min(col(ts)).as("effective_from"),
        min(col("__rn")).as("__from_rn") +:
          attrs.map(a => min(col(a)).as(a)): _*) // attrs constant per run
    val wk = Window.partitionBy(keys.map(col): _*).orderBy(col("__from_rn"))
    versions
      .withColumn("effective_to", lead(col("effective_from"), 1).over(wk))
      .withColumn("is_current", col("effective_to").isNull)
      .drop("__run", "__from_rn")
  }

  /** Golden-record survivorship: collapse each duplicate cluster to
    * ONE record where every attribute takes its first NON-NULL value
    * in priority order (`orderCols` — e.g. freshest source first).
    * This is the merge step after entity resolution (`Dedup`'s
    * clustering produces the clusters; this op writes the master
    * record), and the attribute-level fill is what a plain keep-first
    * dedup cannot do: the surviving record may combine fields from
    * DIFFERENT members.
    *
    * One shuffle (the cluster window); every attribute is a
    * first-ignore-nulls over the same sorted frame, so all attributes
    * resolve in a single Window operator. Returns one row per cluster:
    * clusterCol + attributes + `n_members`.
    */
  def goldenRecord(df: DataFrame, clusterCol: String,
                   orderCols: Seq[Column]): DataFrame = {
    require(orderCols.nonEmpty, "goldenRecord needs a priority order")
    val attrs = df.columns.filterNot(_ == clusterCol).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(clusterCol)).orderBy(orderCols: _*)
    val whole = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val resolved = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(whole))
    // ALL first() projections in ONE select against the unreplaced
    // frame: a withColumn-per-attribute fold would overwrite any
    // attribute that also appears in orderCols with its cluster
    // constant, silently re-ordering every LATER attribute's window
    val golden = resolved.select(
      col(clusterCol) +:
        attrs.map(a => first(col(a), ignoreNulls = true).over(whole).as(a)) :+
        col("__rn") :+ col("__n").as("n_members"): _*)
    golden.filter(col("__rn") === 1).drop("__rn")
  }

  /** Incremental aggregate maintenance: apply a CDC delta to a
    * pre-aggregated per-key (count, sum) state WITHOUT rescanning the
    * base table — the only affordable way to keep a 100 TB rollup
    * fresh. An update is modeled as delete(old) + insert(new).
    *
    * `baseAgg` carries keys + `cnt` + `sum_v`; `delta` carries keys +
    * `opCol` ('I'/'D') + `valueCol`. The delta collapses map-side to
    * one row per touched key, then one broadcast-or-shuffle join
    * against the state; keys whose count reaches zero disappear.
    * Exactness: use an integer-scaled value column (e.g. cents) when
    * bit-identical maintenance across engines matters.
    */
  def incrementalAgg(baseAgg: DataFrame, delta: DataFrame,
                     keys: Seq[String], valueCol: String,
                     opCol: String = "op"): DataFrame = {
    val sign = when(col(opCol) === "I", lit(1L)).otherwise(lit(-1L))
    val d = delta.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dcnt"),
        sum(sign * col(valueCol)).as("__dsum"))
    baseAgg.join(d, keys, "full_outer")
      .select(keys.map(col) :+
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("__dcnt"), lit(0L)))
          .as("cnt") :+
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dsum"), lit(0L)))
          .as("sum_v"): _*)
      .filter(col("cnt") > 0)
  }
}
