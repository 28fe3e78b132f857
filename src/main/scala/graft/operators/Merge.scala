package graft.operators

import org.apache.spark.sql.DataFrame
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
}
