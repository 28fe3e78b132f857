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
    * salt (hash of the whole row — stable across task retries, unlike
    * rand()); the other side is replicated once per salt. Shuffle keys
    * become (keys..., salt) so one hot key spreads over `numSalts`
    * tasks. Replication cost: `other` is materialized numSalts× —
    * use for dimension-vs-fact skew, keep numSalts modest (8–32).
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
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toSeq.map(col): _*)), lit(numSalts))
        .cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Key-frequency report to decide WHETHER to salt: top-k heaviest
    * keys with their share of the total. */
  def keySkewReport(df: DataFrame, keys: Seq[String], topK: Int = 20): DataFrame = {
    val total = df.count()
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("rows"))
      .withColumn("share", round(col("rows") / lit(total.toDouble), 6))
      .orderBy(col("rows").desc)
      .limit(topK)
  }
}
