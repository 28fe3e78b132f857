package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: fixed-size frequency summaries for heavy-hitter
  * queries over key spaces too large to count exactly — the approx
  * side of the reference's count-reconciliation ops (A10), sized for
  * a 100 TB stream of keys.
  *
  * The sketch is a (depth × width) grid of counters kept as a long
  * DataFrame (j, b, c): row j holds counters for hash_j. Build is ONE
  * hash aggregation over the depth-exploded keys (map-side partial
  * aggregation collapses each partition's contribution before the
  * shuffle, so the exchange carries at most depth·width rows per
  * partition — the sketch property that makes it mergeable is exactly
  * what makes it cheap to build distributed). Estimates are the
  * classic min over rows; they only ever OVERcount (collisions add).
  *
  * Hashes are md5-derived (like Sampling/Dedup), so a SQL oracle
  * reproduces the sketch bit-for-bit and sketches built by different
  * engines merge correctly.
  */
object Sketch {

  /** Hash-row j's bucket for a key: 60-bit md5 prefix mod width. */
  def cmBucket(key: Column, j: Int, width: Int, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(j.toString), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long") % width

  private def expanded(df: DataFrame, keyCol: String, depth: Int,
                       width: Int, salt: String) = {
    require(depth > 0 && width > 0, s"depth=$depth width=$width")
    val entries = (0 until depth).map(j =>
      struct(lit(j).as("j"), cmBucket(col(keyCol), j, width, salt).as("b")))
    df.select(col(keyCol), explode(array(entries: _*)).as("e"))
      .select(col(keyCol), col("e.j").as("j"), col("e.b").as("b"))
  }

  /** Build the sketch: (j, b, c) counter rows. Zero counters are not
    * materialized (the grid is sparse until the corpus fills it). */
  def countMin(df: DataFrame, keyCol: String, depth: Int = 4,
               width: Int = 1024, salt: String = "cms"): DataFrame =
    expanded(df, keyCol, depth, width, salt)
      .groupBy("j", "b").agg(count(lit(1)).as("c"))

  /** Merge sketches built with the same (depth, width, salt):
    * counters add. This is how per-day / per-shard sketches roll up
    * without revisiting the data. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("j", "b").agg(sum(col("c")).as("c"))

  /** Point estimates for the keys of `queries`: min over the key's
    * depth counters (0 when a counter row is absent). Returns keyCol +
    * `est`. The sketch side is depth·width rows at most — broadcast. */
  def estimate(sketch: DataFrame, queries: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024,
               salt: String = "cms"): DataFrame =
    expanded(queries, keyCol, depth, width, salt)
      .join(broadcast(sketch), Seq("j", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
}
