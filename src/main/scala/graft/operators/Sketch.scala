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

  /** Hash-row j's bucket for a key: 60-bit md5 prefix mod width —
    * the composable/spec form; the hot path below uses the compiled
    * kernel (bit-identical, SketchSpec parity). */
  def cmBucket(key: Column, j: Int, width: Int, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(j.toString), lit(":"),
      key.cast("string"))), 1, 15), 16, 10).cast("long") % width

  private def expanded(df: DataFrame, keyCol: String, depth: Int,
                       width: Int, salt: String) = {
    require(depth > 0 && width > 0, s"depth=$depth width=$width")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val buckets = ColumnBridge.column(graft.plans.CmsBuckets(
      ColumnBridge.expression(col(keyCol).cast("string")),
      depth, width, salt))
    df.select(col(keyCol), posexplode(buckets).as(Seq("j", "b")))
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

  // ---- KMV (k-minimum-values) distinct-count sketch ----

  private val H60_SPACE = 1152921504606846976.0 // 2^60

  /** Build a KMV sketch of `keyCol`'s distinct count: the k smallest
    * DISTINCT 60-bit md5 hashes, as a k-row frame (`hv`).
    *
    * Mergeable (union → re-take k smallest) and engine-portable (md5
    * hashes, so shards sketched by different systems combine). The
    * build is a distinct aggregation + TakeOrdered; the shuffle
    * carries one row per distinct hash. When a coarse upper bound on
    * the true count is known, pass `prefilterBound` = k/D_lower ·
    * 2^60: hashes above it cannot be among the k minima, and the
    * filter prunes them BEFORE the shuffle (the 100 TB lever).
    */
  def kmv(df: DataFrame, keyCol: String, k: Int = 256,
          salt: String = "kmv",
          prefilterBound: Option[Long] = None): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hv = graft.functions.ColumnFns
      .hash60(concat(lit(salt), col(keyCol).cast("string"))).as("hv")
    val hashes = df.select(hv)
    val pruned = prefilterBound
      .map(b => hashes.filter(col("hv") < b)).getOrElse(hashes)
    pruned.distinct().orderBy(col("hv").asc).limit(k)
  }

  /** Per-GROUP KMV sketches: the k smallest distinct hashes within
    * each group — one distinct pass plus a rank window that rides the
    * group partitioning (WindowGroupLimit bounds per-partition
    * state). Same salt/merge contract as the global sketch. */
  def kmvGrouped(df: DataFrame, groupCol: String, keyCol: String,
                 k: Int = 256, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val hv = graft.functions.ColumnFns
      .hash60(concat(lit(salt), col(keyCol).cast("string"))).as("hv")
    df.select(col(groupCol).as("grp"), hv).distinct()
      .withColumn("__rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("hv").asc)))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Per-group distinct-count estimates from `kmvGrouped` output. */
  def kmvEstimateGrouped(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.groupBy("grp")
      .agg(count(lit(1)).as("n"), max(col("hv")).as("kth"))
      .select(col("grp"), col("n"), col("kth"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * H60_SPACE / col("kth")), 2)
          .as("est"))

  /** Merge KMV sketches built with the same salt: k smallest of the
    * union of survivors. */
  def kmvMerge(a: DataFrame, b: DataFrame, k: Int = 256): DataFrame =
    a.unionByName(b).distinct().orderBy(col("hv").asc).limit(k)

  /** Distinct-count estimate from a KMV sketch: exact (= n) while the
    * sketch holds fewer than k hashes (every distinct value is in it);
    * otherwise the classic (k−1) / (kth-min / 2^60). One row:
    * (n, kth, est). */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.agg(count(lit(1)).as("n"), max(col("hv")).as("kth"))
      .select(col("n"), col("kth"),
        round(when(col("n") < k, col("n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * H60_SPACE / col("kth")), 2)
          .as("est"))
}
