package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): candidate pairs must
  * share a cheap blocking key (first token, prefix, phonetic code…),
  * then exact Levenshtein confirms within `maxDist` — the classic
  * blocking-then-verify shape that turns an O(n²) string comparison
  * into per-block work. Levenshtein runs only INSIDE blocks, and the
  * self-join shuffles on the block key, so skew is governed by block
  * sizing (pick keys like the LSH buckets: small, many, reported —
  * compose with `Skew.keySkewReport` on the block column to audit).
  */
object FuzzyJoin {

  /** Self-pairs of `df` with equal block keys, id_a < id_b, distinct
    * strings, edit distance ≤ `maxDist`. `block` builds the blocking
    * key from the string column. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val p = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("blk", block(col("s")))
    // cheap guards run before the DP: |len diff| bounds the distance,
    // and the threshold form early-exits its banded computation
    // (returns −1 past maxDist) — computed ONCE, reused as the output
    p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist &&
          col("a.s") =!= col("b.s"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"), col("dist"))
  }

  /** The scale path for heavy-duplicate columns: compare DISTINCT
    * values only, carrying multiplicities. A 100 TB column with a
    * bounded vocabulary (names, labels, categories) collapses to its
    * value histogram in one aggregation; the quadratic leg then runs
    * over distinct values per block — row count stops mattering
    * entirely. `n_pairs` = cnt_a·cnt_b is the row-pair multiplicity
    * the id-level join would have produced. Pairs are value-ordered
    * (s_a < s_b). */
  def valuePairs(df: DataFrame, strCol: String,
                 block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val v = df.groupBy(col(strCol).as("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("blk", block(col("s")))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a.s"), col("b.s"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"),
        (col("a.cnt") * col("b.cnt")).as("n_pairs"), col("dist"))
  }
}
