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
    p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .filter(col("a.s") =!= col("b.s") &&
        levenshtein(col("a.s"), col("b.s")) <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
  }
}
