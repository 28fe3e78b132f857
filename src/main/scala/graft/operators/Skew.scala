package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi joins (SURVEY.md §4: absent in
  * the single-process reference, mandatory at 100 TB — genomic keys
  * like chromosome are inherently skewed: chr1 carries ~8% of the
  * genome, a uniform hash partitioner puts 8% of the data in one task).
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); explicit
  * salting below is for when the skew is in the KEY DISTRIBUTION
  * itself (one key's group exceeds a single task even after AQE
  * splits, e.g. a degenerate join key) or when AQE is unavailable
  * (streaming joins).
  */
object Skew {

  /** Salted equi join: the skewed side gets a deterministic per-row
    * salt (hash of the whole row MIXED with a partition-stable row id
    * — stable across task retries, unlike rand(); the row id keeps
    * bit-identical duplicate rows from all hashing into one salt
    * bucket and recreating the hotspot the salt exists to break); the
    * other side is replicated once per salt. Shuffle keys become
    * (keys..., salt) so one hot key spreads over `numSalts` tasks.
    * Replication cost: `other` is materialized numSalts× — use for
    * dimension-vs-fact skew, keep numSalts modest (8–32).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 numSalts: Int, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    // `other` is replicated numSalts×: join types that preserve
    // unmatched rows of the replicated side would surface numSalts
    // duplicates per unmatched row — refuse them
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: joinType '$joinType' would emit duplicate rows for " +
        "unmatched rows of the replicated side; use inner/left/semi/anti")
    val salted = skewed.withColumn("__salt", rowSalt(skewed, numSalts))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** The per-row salt `saltedJoin` assigns, exposed for spread
    * inspection. monotonically_increasing_id = (partitionId << 33) +
    * row offset: a retried task recomputes its partition in the same
    * order, so the salt is retry-stable (unlike rand()), while the row
    * id keeps bit-identical duplicate rows out of a single bucket. The
    * join result never depends on WHICH salt a row lands in — only
    * that the replicated side carries all of them. */
  def rowSalt(df: DataFrame, numSalts: Int): Column =
    pmod(xxhash64(struct(df.columns.toSeq.map(col): _*),
      monotonically_increasing_id()), lit(numSalts)).cast("int")

  /** Outer joins that preserve unmatched rows of the REPLICATED side
    * (full/right) can't ride `saltedJoin` directly — each unmatched
    * replica would null-extend once per salt. Decompose instead:
    * inner part salted as usual, plus the unmatched rows of each
    * preserved side recovered with a salted ANTI join against the
    * other side's distinct keys (distinct is a partial-aggregated
    * groupBy — skew-safe — and its output is keyspace-sized, so the
    * anti's replicated side stays small). Null keys never match, so
    * they surface null-extended from their own side — plain SQL outer
    * semantics. Tumor/normal full-outer merges on chrom-skewed keys
    * (J8) are the reference-shaped workload this serves. */
  def saltedOuterJoin(skewed: DataFrame, other: DataFrame,
                      keys: Seq[String], numSalts: Int,
                      joinType: String = "full_outer"): DataFrame = {
    val jt = joinType.toLowerCase.replace(" ", "").replace("_", "")
    require(Set("full", "fullouter", "outer", "right", "rightouter")
      .contains(jt),
      s"saltedOuterJoin: use saltedJoin for '$joinType' (it preserves " +
        "only the per-row-salted side, which needs no decomposition)")
    // typed-null extension for the columns the anti legs lack
    def nullExtend(df: DataFrame, like: DataFrame): DataFrame =
      df.select(df.columns.map(col).toSeq ++
        like.schema.fields.filterNot(f => keys.contains(f.name))
          .map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val inner = saltedJoin(skewed, other, keys, numSalts, "inner")
    val rightOnly = nullExtend(
      saltedJoin(other, skewed.select(keys.map(col): _*).distinct(),
        keys, numSalts, "left_anti"), skewed)
    if (jt.startsWith("right")) inner.unionByName(rightOnly)
    else {
      val leftOnly = nullExtend(
        saltedJoin(skewed, other.select(keys.map(col): _*).distinct(),
          keys, numSalts, "left_anti"), other)
      inner.unionByName(leftOnly).unionByName(rightOnly)
    }
  }

  /** Key-frequency report to decide WHETHER to salt: top-k heaviest
    * keys with their share of the total. One scan of `df`: the total
    * comes from re-aggregating the (keyspace-sized) count relation,
    * whose shuffle Spark reuses (ReusedExchange) rather than
    * rescanning the input — the old `df.count()` pre-pass was a
    * second full scan. */
  def keySkewReport(df: DataFrame, keys: Seq[String], topK: Int = 20): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("rows"))
    counts.crossJoin(broadcast(counts.agg(sum("rows").as("__total"))))
      .withColumn("share", round(col("rows") / col("__total"), 6))
      .drop("__total")
      .orderBy(col("rows").desc)
      .limit(topK)
  }
}
