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

  /** Pairwise set-overlap estimates between group sketches — the
    * "how much do these corpora share" question WITHOUT joining the
    * raw data (the exact form is `Dedup.sourceOverlap`; this is its
    * sketch-scale path: each source is k longs, so S sources compare
    * in S²·k sketch work no matter how big the corpora are).
    *
    * Standard KMV Jaccard: for each group pair, U = the k smallest
    * distinct hashes of the two sketches' union; c = members of U
    * present in BOTH sketches; jaccard ≈ c/|U| (exact when both sets
    * fit their sketches), est_inter = jaccard · est_union. Hashes are
    * deterministic (hash60), so the estimates replay bit-for-bit.
    *
    * Output per (grp_a < grp_b): `n_u`, `theta` (k-th union min),
    * `c_both`, `jaccard_micro`, `est_union`, `est_inter` (2 dp). */
  def kmvJaccardGrouped(sketch: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val groups = sketch.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("grp_a"))
      .crossJoin(groups.select(col("grp").as("grp_b")))
      .filter(col("grp_a") < col("grp_b"))
    val fromA = pairs.join(
      sketch.select(col("grp").as("grp_a"), col("hv")), Seq("grp_a"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val fromB = pairs.join(
      sketch.select(col("grp").as("grp_b"), col("hv")), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("hv"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val perHash = fromA.unionAll(fromB)
      .groupBy("grp_a", "grp_b", "hv")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val ranked = perHash.withColumn("__rn", row_number().over(
        Window.partitionBy("grp_a", "grp_b").orderBy(col("hv").asc)))
      .filter(col("__rn") <= k)
    val agg = ranked.groupBy("grp_a", "grp_b")
      .agg(count(lit(1)).as("n_u"), max(col("hv")).as("theta"),
        sum((col("in_a") * col("in_b")).cast("long")).as("c_both"))
    val estU = when(col("n_u") < k, col("n_u").cast("double"))
      .otherwise(lit((k - 1).toDouble) * H60_SPACE / col("theta"))
    agg.select(col("grp_a"), col("grp_b"), col("n_u"), col("theta"),
      col("c_both"),
      round(col("c_both").cast("double") / col("n_u").cast("double")
        * 1e6).cast("long").as("jaccard_micro"),
      round(estU, 2).as("est_union"),
      round(estU * (col("c_both").cast("double") /
        col("n_u").cast("double")), 2).as("est_inter"))
  }

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

  // ---- HyperLogLog distinct-count sketch ----

  /** Per-group HyperLogLog registers: for each group, the 2^p register
    * maxima of "leading-zero rank" over the hashed key stream — the
    * INDUSTRY-standard distinct sketch (constant 2^p longs per group
    * vs KMV's k hashes; registers merge by max, so per-shard / per-day
    * sketches roll up without revisiting data).
    *
    * Hash is the repo-standard 60-bit md5 prefix: the top p bits pick
    * the register `j`, and the rank is the number of leading zeros in
    * the remaining (60−p)-bit field plus one. The rank is computed
    * with INTEGER/STRING ops only — `(60−p) − length(bin(rem)) + 1`,
    * where `bin` renders the value without leading zeros — so a SQL
    * oracle reproduces every register exactly and sketches from
    * different engines merge bit-for-bit (the same portability
    * contract as count-min / KMV; a float log2 would not survive the
    * cross-engine hash compare).
    *
    * Build is one hash aggregation: map-side partial max collapses
    * each partition to ≤ groups·2^p rows before the shuffle — the
    * mergeability that makes the sketch cheap is what bounds the
    * exchange. Registers no key hashed into are absent (sparse);
    * estimators must treat missing registers as zero.
    */
  def hllRegisters(df: DataFrame, grpCol: String, keyCol: String,
                   p: Int = 9, salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val restBits = 60 - p
    val restSpace = 1L << restBits
    val h = graft.functions.ColumnFns
      .hash60(concat(lit(salt), col(keyCol).cast("string")))
    val rem = h % restSpace
    df.filter(col(keyCol).isNotNull)
      .select(col(grpCol).as("grp"), shiftright(h, restBits).as("j"),
        when(rem === 0, lit(restBits + 1))
          .otherwise(lit(restBits) - length(bin(rem)) + 1)
          .cast("long").as("rank"))
      .groupBy("grp", "j").agg(max(col("rank")).as("r"))
  }

  /** Merge register frames built with the same (p, salt): max wins. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("grp", "j").agg(max(col("r")).as("r"))

  /** The rolling-HLL numerator constant alpha·m²·2^(61−p) — exposed so
    * oracle SQL can embed the bit-identical double literal. */
  def hllRollNum(p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * java.lang.Math.pow(2.0, 61 - p)
  }

  /** Rolling-window distinct actors via HLL register merge — the
    * documented SCALE path for `Features.rollingActive` (and the
    * state swap for `StreamOps.rollingActiveStream`): per-bucket
    * registers build in one aggregation, each bucket's registers
    * fan out to the `window` bucket-ends they influence (constant
    * fan-out over ≤ 2^p rows per bucket — SKETCHES explode, never
    * events), merge by max, and the estimate reads off the merged
    * registers. A year of daily WAU over 10¹² events touches the
    * event stream exactly once.
    *
    * Determinism contract: the harmonic denominator accumulates as
    * the EXACT long Σ2^(maxRank−r) (every term a power of two, sum
    * < 2^62 at p ≥ 4), so the one float division per bucket sees
    * identical operands in every engine; the estimate is emitted in
    * micro-units from that single expression. Branches mirror
    * `hllEstimate` (linear counting below 2.5·m with empties left).
    * Output: (bucket, n_present, est_micro), observed buckets only. */
  def rollingDistinctHll(df: DataFrame, tsCol: String, actorCol: String,
                         bucketNs: Long, window: Int, p: Int = 9,
                         salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    require(bucketNs > 0 && window > 0,
      s"need positive bucketNs/window, got $bucketNs/$window")
    val restBits = 60 - p
    val restSpace = 1L << restBits
    val maxRank = restBits + 1
    val m = 1 << p
    val h = graft.functions.ColumnFns
      .hash60(concat(lit(salt), col(actorCol).cast("string")))
    val rem = h % restSpace
    val regs = df.filter(col(actorCol).isNotNull)
      .select(expr(s"`$tsCol` div $bucketNs").as("__b"),
        shiftright(h, restBits).as("j"),
        when(rem === 0, lit(maxRank))
          .otherwise(lit(restBits) - length(bin(rem)) + 1)
          .cast("long").as("rank"))
      .groupBy("__b", "j").agg(max(col("rank")).as("r"))
    val observed = regs.select(col("__b").as("bucket")).distinct()
    val merged = regs
      .withColumn("bucket",
        explode(sequence(col("__b"), col("__b") + (window - 1))))
      .join(observed, Seq("bucket"), "left_semi")
      .groupBy("bucket", "j").agg(max(col("r")).as("r"))
    // numerator constant alpha·m²·2^maxRank, computed ONCE here; the
    // oracle embeds the identical double literal via [[hllRollNum]]
    val num = hllRollNum(p)
    merged.groupBy("bucket")
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST($maxRank - r AS INT))"))
          .as("__s"))
      .withColumn("__denom",
        (col("__s") + (lit(m.toLong) - col("n_present")) *
          lit(1L << maxRank)).cast("double"))
      .withColumn("__raw", lit(num) / col("__denom"))
      .withColumn("est_micro",
        round(when(col("__raw") <= 2.5 * m && col("n_present") < m,
          lit(m.toDouble) *
            log(lit(m.toDouble) / (lit(m.toLong) - col("n_present"))))
          .otherwise(col("__raw")) * 1e6).cast("long"))
      .select(col("bucket"), col("n_present"), col("est_micro"))
  }

  /** Per-group cardinality estimates from `hllRegisters` output:
    * the classic alpha_m·m²/Σ2^−M harmonic mean, with the standard
    * linear-counting correction (m·ln(m/V)) when the estimate is
    * small and empty registers remain. Double-valued — for callers,
    * not for cross-engine hash gates (the registers themselves are
    * the portable artifact). */
  def hllEstimate(registers: DataFrame, p: Int = 9): DataFrame = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy("grp")
      .agg(count(lit(1)).as("__present"),
        sum(pow(lit(2.0), -col("r"))).as("__sum"))
      .select(col("grp"), col("__present"),
        // absent registers contribute 2^0 = 1 each to the harmonic sum
        (lit(alpha * m.toDouble * m.toDouble) /
          (col("__sum") + (lit(m.toLong) - col("__present")))).as("__raw"))
      .select(col("grp"),
        round(when(col("__raw") <= 2.5 * m && col("__present") < m,
          lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("__present"))))
          .otherwise(col("__raw")), 2).as("est"))
  }
}
