package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key ordered feature engineering (north-star extension): rolling
  * windows and lag features — the standard transforms a training-data
  * pipeline derives from event streams before model input.
  *
  * All window frames are ROWS-bounded per key: one hash shuffle on the
  * key, an in-partition sort, and a single pass — no self-joins, no
  * global sort. Sums/averages are rounded (4 dp) where exposed so
  * sliding-frame summation order (Spark's per-frame accumulation vs an
  * oracle's segment tree) cannot leak into comparisons.
  */
object Features {

  /** Rolling count/sum/avg/min/max of `valueCol` over the last `k`
    * rows per key, ordered by `orderCol`. */
  def rollingStats(df: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, k: Int): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(-(k - 1), Window.currentRow)
    df.withColumn("roll_n", count(col(valueCol)).over(w))
      .withColumn("roll_sum", round(sum(col(valueCol)).over(w), 4))
      .withColumn("roll_avg", round(avg(col(valueCol)).over(w), 4))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
  }

  /** Scalable twin of `rollingStats` for LOW-CARDINALITY keys: the
    * trailing k-row frame rides `Batching.withOrderedHalo` with a
    * (k−1)-row ghost margin, windowed on the dense partition id
    * instead of the #keys-task group key. Identical output (ghost
    * rows let positions near a partition edge see their full trailing
    * frame; ghosts themselves are dropped by `__home`). */
  def rollingStatsByRange(df: DataFrame, keys: Seq[String],
                          orderCol: String, valueCol: String, k: Int,
                          numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    if (k == 1) return rollingStats(df, keys, orderCol, valueCol, k)
    val halod = Batching.withOrderedHalo(df, keys.map(col),
      Seq(col(orderCol).asc), halo = k - 1, numPartitions)
    val w = Window.partitionBy(col("__hpid") +: keys.map(col): _*)
      .orderBy(col(orderCol).asc)
      .rowsBetween(-(k - 1), Window.currentRow)
    halod
      .withColumn("roll_n", count(col(valueCol)).over(w))
      .withColumn("roll_sum", round(sum(col(valueCol)).over(w), 4))
      .withColumn("roll_avg", round(avg(col(valueCol)).over(w), 4))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
      .filter(col("__home"))
      .drop("__hpid", "__home")
  }

  /** Per-group z-score standardization: (x − μ_g) / σ_g over a
    * whole-partition window (one shuffle, no sort), population σ.
    * Constant groups (σ = 0) standardize to 0 rather than NaN. Output
    * rounded to 4 dp — both μ and σ are distributed sums whose
    * accumulation order must not leak into comparisons.
    *
    * Keys are high-cardinality by contract (user/entity ids): the
    * whole-partition window buffers each key's rows in one task. A
    * LOW-cardinality caller (5 classes over the corpus) should
    * compute the (μ, σ) frame with groupBy + broadcast-join it back —
    * the aggregate parallelizes; only the window form walls. */
  def standardize(df: DataFrame, keys: Seq[String],
                  valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val mu = avg(col(valueCol)).over(w)
    val sigma = stddev_pop(col(valueCol)).over(w)
    df.withColumn(s"${valueCol}_z",
      when(sigma === 0.0 || sigma.isNull, 0.0)
        .otherwise(round((col(valueCol) - mu) / sigma, 4)))
  }

  /** `lag_<n>` columns of `valueCol` for each requested offset —
    * null-padded at each key's head, all from ONE window spec (a
    * single sort serves every lag). */
  def lagFeatures(df: DataFrame, keys: Seq[String], orderCol: String,
                  valueCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"bad lags $lags")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    lags.foldLeft(df)((d, n) =>
      d.withColumn(s"lag_$n", lag(col(valueCol), n).over(w)))
  }

  /** Scalable twin of `lagFeatures` for LOW-CARDINALITY keys: all
    * lags ride one `Batching.withOrderedHalo` pass with a
    * max(lags)-row ghost margin (one window spec serves every lag,
    * same as the plain form). Identical output. */
  def lagFeaturesByRange(df: DataFrame, keys: Seq[String],
                         orderCol: String, valueCol: String,
                         lags: Seq[Int],
                         numPartitions: Int = 0): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), s"bad lags $lags")
    val halod = Batching.withOrderedHalo(df, keys.map(col),
      Seq(col(orderCol).asc), halo = lags.max, numPartitions)
    val w = Window.partitionBy(col("__hpid") +: keys.map(col): _*)
      .orderBy(col(orderCol).asc)
    lags.foldLeft(halod)((d, n) =>
        d.withColumn(s"lag_$n", lag(col(valueCol), n).over(w)))
      .filter(col("__home"))
      .drop("__hpid", "__home")
  }

  /** Time-series gap filling: densify a per-key bucketed frame so
    * every key covers its OWN [min, max] bucket range at `step`
    * spacing, with `fills` defaults on inserted rows — the resample
    * step before rolling windows (a gap would silently shrink a
    * moving average's denominator). The spine is generated per key
    * from a 2-value aggregate (no driver collect, no global range):
    * spine size = span/step rows per key, joined back on
    * (key, bucket) — one shuffle each side. */
  def fillGaps(df: DataFrame, keys: Seq[String], bucketCol: String,
               step: Long, fills: Map[String, Column]): DataFrame = {
    require(step > 0, s"step must be positive, got $step")
    // union the generated grid with the ACTUAL buckets: an off-grid
    // original row (bucket not ≡ min mod step) must survive, not be
    // dropped or zero-filled. Null-safe join keys for the same reason
    // — a null group key's real row must not be replaced by the fill.
    val grid = df.groupBy(keys.map(col): _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .withColumn(bucketCol,
        explode(sequence(col("__lo"), col("__hi"), lit(step))))
      .drop("__lo", "__hi")
    val spine = grid.unionByName(
      df.select((keys :+ bucketCol).map(col): _*)).distinct()
    val joinCols = keys :+ bucketCol
    val cond = joinCols.map(c => col(s"__sp.$c") <=> col(s"__df.$c"))
      .reduce(_ && _)
    val joined = spine.as("__sp").join(df.as("__df"), cond, "left")
      .select(joinCols.map(c => col(s"__sp.$c")) ++
        df.columns.filterNot(joinCols.contains)
          .map(c => col(s"__df.$c")): _*)
    fills.foldLeft(joined) { case (acc, (c, d)) =>
      acc.withColumn(c, coalesce(col(c), d))
    }
  }

  /** Quantile normalization — the cross-sample distribution aligner of
    * expression-matrix pipelines (the cBio matrices this engine's
    * pivots build are exactly its input shape): rank values within
    * each sample, average each rank across samples, substitute the
    * rank mean back. Deterministic variant: ranks are a TOTAL order
    * via the `idCol` tie-break (classic tie-averaging is a documented
    * departure point), and the rank mean is an exact integer sum ÷
    * count when `valueCol` is integral — engine-exact; float inputs
    * carry the usual last-ulp-then-round(6) caveat.
    *
    * Shapes: one window per sample (keyed shuffle), one rank-keyed
    * aggregation (cardinality = genes-per-sample), one skew-free join
    * back on the rank. Samples missing some ranks contribute to the
    * means they have — document-or-impute upstream if the matrix is
    * ragged. Output: input columns + `qn_rank`, `qn_value`.
    */
  def quantileNormalize(df: DataFrame, sampleCol: String, idCol: String,
                        valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(sampleCol))
      .orderBy(col(valueCol).asc, col(idCol).asc)
    val ranked = df.withColumn("qn_rank", row_number().over(w))
    val rankMeans = ranked.groupBy("qn_rank")
      .agg(round(sum(col(valueCol)) * lit(1.0) / count(lit(1)), 6)
        .as("qn_value"))
    ranked.join(rankMeans, Seq("qn_rank"))
  }

  /** Exponentially time-decayed sum per key — the recency-weighted
    * engagement/importance score (half-life semantics: a value
    * `halfLife` old counts half). Each row's weighted value is
    * rounded to integer micro-units BEFORE the sum, so the aggregate
    * is exact long arithmetic — order-independent across partitions
    * and engines — and one division restores the scale. One hash
    * aggregation with map-side partials; `refTs` is an explicit
    * constant (never wall-clock) so reruns are reproducible. */
  def decayedSum(df: DataFrame, keys: Seq[String], orderCol: String,
                 valueCol: String, halfLife: Long, refTs: Long): DataFrame = {
    require(halfLife > 0, s"halfLife must be positive, got $halfLife")
    val age = (lit(refTs) - col(orderCol).cast("long")).cast("double")
    val w = exp(lit(-math.log(2.0)) * age / lit(halfLife.toDouble))
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valueCol) * w * 1e6).cast("long")).as("__s"))
      .select(keys.map(col) :+ col("n") :+
        round(col("__s").cast("double") / 1e6, 4).as("decayed_sum"): _*)
  }

  /** Per-group percent-rank transform — rank-normalize a column to
    * [0, 1] within each group (the uniform-marginal feature
    * transform; also the copula trick's first step). Exact rational
    * (rank−1)/(n−1) on integer window ranks, ties broken by
    * `tiebreak` so the rank is total; single-member groups map to
    * 0.0. One shuffle on the keys. */
  def percentRank(df: DataFrame, keys: Seq[String], valueCol: String,
                  tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(valueCol) +: tiebreak: _*)
    val n = count(lit(1)).over(Window.partitionBy(keys.map(col): _*))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", n)
      .withColumn("prank",
        when(col("__n") === 1, 0.0)
          .otherwise(round((col("__rk") - 1).cast("double") /
            (col("__n") - 1), 6)))
      .drop("__rk", "__n")
  }

  /** Scalable twin of `percentRank` for LOW-CARDINALITY keys: the
    * per-group rank rides `Batching.groupedRankByRange` (a huge group
    * spans many range partitions; driver sees only per-partition
    * counts) and the per-group size joins back from a #groups-row
    * aggregate — no #keys-task window anywhere. Identical output
    * contract: every input column plus `prank`. */
  def percentRankByRange(df: DataFrame, key: String, valueCol: String,
                         tiebreak: Seq[Column],
                         numPartitions: Int = 0): DataFrame = {
    val ranked = Batching.groupedRankByRange(df, key,
      col(valueCol) +: tiebreak, numPartitions)
    val sizes = df.groupBy(col(key)).agg(count(lit(1)).as("__gn"))
    ranked.join(broadcast(sizes), Seq(key))
      .withColumn("prank",
        when(col("__gn") === 1, 0.0)
          .otherwise(round((col("__grank") - 1).cast("double") /
            (col("__gn") - 1), 6)))
      .drop("__grank", "__gn")
  }

  /** Per-key inter-arrival gaps: (keys…, gap) rows for every
    * consecutive event pair in (order, tiebreak) sequence — feed to
    * `Profile.groupedPercentiles` for the gap distribution that
    * justifies a sessionization threshold, or to anomaly screens for
    * dead/bursty sources. One shuffle on the keys. */
  def interArrival(df: DataFrame, keys: Seq[String], orderCol: String,
                   tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol) +: tiebreak: _*)
    df.withColumn("gap",
        col(orderCol).cast("long") -
          lag(col(orderCol).cast("long"), 1).over(w))
      .filter(col("gap").isNotNull)
      .select(keys.map(col) :+ col("gap"): _*)
  }

  /** Lag-1 autocorrelation per key — the "is this series momentum or
    * noise" screen (seasonality/trend detection, anomaly-model
    * selection). Pearson r between consecutive (xₜ, xₜ₋₁) pairs in
    * (order, tiebreak) sequence. Values go to integer MILLI-units so
    * every moment sum is exact long arithmetic (products ~1e11 ·
    * rows — exact to ~1e7 rows per key; scale the unit down past
    * that); the closed-form r is then identical IEEE doubles in both
    * engines, rounded to 6 dp with −0.0 canonicalized. One shuffle:
    * the lag window and the aggregation share the key partitioning.
    * Keys with < 3 pairs or a constant side return null r. */
  def autocorrelation(df: DataFrame, keys: Seq[String], orderCol: String,
                      valueCol: String,
                      tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol) +: tiebreak: _*)
    val y = round(col(valueCol) * 1e3).cast("long")
    val paired = df.withColumn("__y", y)
      .withColumn("__yl", lag(col("__y"), 1).over(w))
      .filter(col("__yl").isNotNull)
    val n = count(lit(1))
    paired.groupBy(keys.map(col): _*)
      .agg(n.as("n_pairs"),
        sum(col("__y")).as("__sx"), sum(col("__yl")).as("__sy"),
        sum(col("__y") * col("__yl")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__sxx"),
        sum(col("__yl") * col("__yl")).as("__syy"))
      .select(keys.map(col) :+ col("n_pairs") :+ {
        val num = col("n_pairs").cast("double") * col("__sxy") -
          col("__sx").cast("double") * col("__sy")
        val dx = col("n_pairs").cast("double") * col("__sxx") -
          col("__sx").cast("double") * col("__sx")
        val dy = col("n_pairs").cast("double") * col("__syy") -
          col("__sy").cast("double") * col("__sy")
        when(col("n_pairs") < 3 || dx <= 0.0 || dy <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(num / sqrt(dx * dy), 6) + lit(0.0))
          .as("r1")
      }: _*)
  }

  /** Scalable twin of `autocorrelation` for LOW-CARDINALITY keys: the
    * lag-1 pairing rides `Batching.withOrderedHalo` (each partition
    * borrows ONE ghost row from its left neighbor, so the lag window
    * keys on the dense partition id instead of the #keys-task group
    * key); the moment sums are the same exact-long aggregation, which
    * parallelizes by itself. Identical output. */
  def autocorrelationByRange(df: DataFrame, keys: Seq[String],
                             orderCol: String, valueCol: String,
                             tiebreak: Seq[Column],
                             numPartitions: Int = 0): DataFrame = {
    val ord = col(orderCol) +: tiebreak
    val halod = Batching.withOrderedHalo(df.withColumn("__y",
        round(col(valueCol) * 1e3).cast("long")),
      keys.map(col), ord, halo = 1, numPartitions)
    val w = Window.partitionBy(col("__hpid") +: keys.map(col): _*)
      .orderBy(ord: _*)
    val paired = halod
      .withColumn("__yl", lag(col("__y"), 1).over(w))
      .filter(col("__home") && col("__yl").isNotNull)
    paired.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__y")).as("__sx"), sum(col("__yl")).as("__sy"),
        sum(col("__y") * col("__yl")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__sxx"),
        sum(col("__yl") * col("__yl")).as("__syy"))
      .select(keys.map(col) :+ col("n_pairs") :+ {
        val num = col("n_pairs").cast("double") * col("__sxy") -
          col("__sx").cast("double") * col("__sy")
        val dx = col("n_pairs").cast("double") * col("__sxx") -
          col("__sx").cast("double") * col("__sx")
        val dy = col("n_pairs").cast("double") * col("__syy") -
          col("__sy").cast("double") * col("__sy")
        when(col("n_pairs") < 3 || dx <= 0.0 || dy <= 0.0,
          lit(null).cast("double"))
          .otherwise(round(num / sqrt(dx * dy), 6) + lit(0.0))
          .as("r1")
      }: _*)
  }

  /** Scalable twin of `meanShiftPoints` for LOW-CARDINALITY keys:
    * both ±k ROWS frames ride `Batching.withOrderedHalo` with a
    * k-row ghost margin, windowed on the dense partition id — no
    * #keys-task wall. Identical output (the full-frames filter plays
    * the same role; ghost rows guarantee interior positions near a
    * partition edge still see both full windows). */
  def meanShiftPointsByRange(df: DataFrame, keys: Seq[String],
                             orderCol: String, valueCol: String,
                             k: Int, thresholdMilli: Long,
                             tiebreak: Seq[Column],
                             numPartitions: Int = 0): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    val ord = col(orderCol) +: tiebreak
    val halod = Batching.withOrderedHalo(df.withColumn("__y",
        round(col(valueCol) * 1e3).cast("long")),
      keys.map(col), ord, halo = k, numPartitions)
    val base = Window.partitionBy(col("__hpid") +: keys.map(col): _*)
      .orderBy(ord: _*)
    val left = base.rowsBetween(-k, -1)
    val right = base.rowsBetween(Window.currentRow, k - 1)
    halod
      .withColumn("__ln", count(col("__y")).over(left))
      .withColumn("__lsum", sum(col("__y")).over(left))
      .withColumn("__rn", count(col("__y")).over(right))
      .withColumn("__rsum", sum(col("__y")).over(right))
      .filter(col("__home") && col("__ln") === k && col("__rn") === k)
      .select(
        (keys.map(col) :+ col(orderCol)) ++ Seq(
          col("__lsum").as("lsum_milli"),
          col("__rsum").as("rsum_milli"),
          (round((col("__rsum") - col("__lsum")).cast("double") / k)
            .cast("long")).as("shift_milli"),
          (abs(col("__rsum") - col("__lsum")) > lit(thresholdMilli) * k)
            .cast("int").as("is_shift")): _*)
  }

  /** Smoothed target encoding — the categorical featurization that
    * replaces a category with its target mean, shrunk toward the
    * global mean by pseudo-count `m` (the leakage-prone op done
    * right: explicit smoothing, no per-row leave-one-out here — fit
    * on train, apply elsewhere): enc = (Σy + m·μ)/(n + m). Per-row
    * micro-unit target rounding keeps every sum exact; the global
    * mean rides as a broadcast 1-row frame. Output: (category cols…,
    * n, enc 6 dp). */
  def targetEncode(df: DataFrame, cats: Seq[String], targetCol: String,
                   m: Double = 10.0): DataFrame = {
    val y = round(col(targetCol) * 1e6).cast("long")
    val per = df.groupBy(cats.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(y).as("__s"))
    val glob = df.agg(count(lit(1)).as("__gn"), sum(y).as("__gs"))
    per.crossJoin(broadcast(glob))
      .select(cats.map(col) :+ col("n") :+
        round((col("__s").cast("double") +
          lit(m) * (col("__gs").cast("double") / col("__gn"))) /
          (col("n") + m) / 1e6, 6).as("enc"): _*)
  }

  /** Time-ordered train/test split with an EMBARGO gap — the
    * leakage-safe temporal split: train strictly before `splitTs −
    * embargo`, test strictly after `splitTs`, the embargo band
    * in between excluded so boundary-straddling windows can't leak
    * future information into training features. Map-only labeling. */
  def embargoSplit(df: DataFrame, tsCol: String, splitTs: Long,
                   embargoNs: Long): DataFrame = {
    require(embargoNs >= 0, s"embargo must be >= 0, got $embargoNs")
    val ts = col(tsCol).cast("long")
    df.withColumn("split",
      when(ts < splitTs - embargoNs, "train")
        .when(ts > splitTs, "test")
        .otherwise("embargo"))
  }

  /** OHLC downsampling bars — the time-series compaction pass
    * (finance candles, metric rollups): per key and time bucket,
    * the first (open) / max (high) / min (low) / last (close) value
    * plus the row count.
    *
    * Open/close ride struct-ordered min/max aggregates — (order,
    * tiebreak, value) tuples compared lexicographically — so the
    * whole bar is ONE hash aggregation with map-side partials: no
    * window, no sort, one shuffle on (key, bucket). `tieCol` makes
    * same-timestamp opens/closes deterministic; raw row values (not
    * sums) mean no float-order concerns. */
  def ohlcBars(df: DataFrame, keys: Seq[String], orderCol: String,
               tieCol: String, valueCol: String, bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    val v = col(valueCol)
    // `div`, not `/`: Column./ on longs is DOUBLE division, and
    // nanosecond timestamps exceed 2^53 — floor(double) would bucket
    // wrong. Backquotes keep arbitrary column names safe in the expr.
    val tagged = df.withColumn("__bucket",
      expr(s"`$orderCol` div $bucket"))
    tagged.groupBy(col("__bucket").as("bucket") +:
        keys.map(col): _*)
      .agg(
        min(struct(col(orderCol), col(tieCol), v)).getField(valueCol)
          .as("open"),
        max(v).as("high"),
        min(v).as("low"),
        max(struct(col(orderCol), col(tieCol), v)).getField(valueCol)
          .as("close"),
        count(lit(1)).as("n"))
  }

  /** Sliding mean-shift change-point detection: at each position the
    * trailing window (k rows before) is compared to the leading
    * window (this row + k−1 after); a level shift flags where the
    * means differ by more than `thresholdMilli` (milli-units of the
    * value). The window-pair scan is the classic segmentation
    * pre-pass (regime changes in metrics, drift onsets in data-quality
    * series); CUSUM-style recurrences need a sequential scan — this
    * windowed form is the shape that distributes.
    *
    * Determinism: values go to integer milli-units; both window sums
    * are exact longs, and the flag compares cross-multiplied integers
    * (|rSum−lSum| > threshold·k) — no division anywhere. Only
    * positions with BOTH windows full are emitted (partial-window
    * edges are where false shifts live). One shuffle: both windows
    * share the (keys, order) partitioning.
    *
    * Output: keys and orderCol, then `lsum_milli`, `rsum_milli`
    * (the two window sums), `shift_milli` = (rSum−lSum)/k rounded to
    * a long, `is_shift` int flag. The tiebreak columns only order the
    * scan; they are not emitted.
    */
  def meanShiftPoints(df: DataFrame, keys: Seq[String], orderCol: String,
                      valueCol: String, k: Int, thresholdMilli: Long,
                      tiebreak: Seq[Column]): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    val ord = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol) +: tiebreak: _*)
    val left = ord.rowsBetween(-k, -1)
    val right = ord.rowsBetween(Window.currentRow, k - 1)
    val y = round(col(valueCol) * 1e3).cast("long")
    df.withColumn("__y", y)
      .withColumn("__ln", count(col("__y")).over(left))
      .withColumn("__lsum", sum(col("__y")).over(left))
      .withColumn("__rn", count(col("__y")).over(right))
      .withColumn("__rsum", sum(col("__y")).over(right))
      .filter(col("__ln") === k && col("__rn") === k)
      .select(
        (keys.map(col) :+ col(orderCol)) ++ Seq(
          col("__lsum").as("lsum_milli"),
          col("__rsum").as("rsum_milli"),
          (round((col("__rsum") - col("__lsum")).cast("double") / k)
            .cast("long")).as("shift_milli"),
          (abs(col("__rsum") - col("__lsum")) > lit(thresholdMilli) * k)
            .cast("int").as("is_shift")): _*)
  }

  /** 2-D skyline (weak Pareto front) per group: keep rows not
    * STRICTLY dominated — dominated means some other row in the group
    * has `minCol` strictly smaller AND `maxCol` strictly larger (the
    * quality-vs-cost frontier of corpus curation: cheapest documents
    * at each quality level, best checkpoint per budget, …).
    *
    * Scale shape: ONE window per group — order by `minCol` with a
    * RANGE frame ending at −1 (all rows with strictly smaller value;
    * a ROW frame could not express the strictness under ties), take
    * the running max of `maxCol`; a row survives iff no strictly-
    * cheaper row beats its `maxCol`. The O(n²) dominance test
    * becomes one sort + one scan; the NOT-EXISTS form is the oracle.
    *
    * `minCol` must be an INTEGRAL column (enforced): the −1 frame
    * boundary means "strictly smaller" only on integer domains — on
    * a fractional column a dominator within (cur−1, cur) would fall
    * outside the frame and dominated rows would survive. Convert
    * money/floats to fixed-point units first (the `price_cents`
    * pattern). */
  def skyline2D(df: DataFrame, keys: Seq[String], minCol: String,
                maxCol: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(minCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"skyline2D: minCol '$minCol' must be integral (got " +
        s"${dt.simpleString}) — the RANGE -1 boundary is only a strict " +
        "predecessor on integer domains; convert to fixed-point units first")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(minCol).asc)
      .rangeBetween(Window.unboundedPreceding, -1)
    df.withColumn("__dommax", max(col(maxCol)).over(w))
      .filter(col("__dommax").isNull || col(maxCol) >= col("__dommax"))
      .drop("__dommax")
  }

  /** Rolling-window distinct actors (the WAU/MAU primitive): for each
    * bucket (day) with any activity, the number of DISTINCT `actorCol`
    * values active in the trailing `window` buckets [d-window+1, d].
    *
    * Scale shape: dedup to (actor, bucket) FIRST (one hash agg — the
    * only pass over the raw corpus), then each active (actor, bucket)
    * explodes to the `window` bucket-ends it contributes to (constant
    * fan-out, map-side), then one count-distinct per bucket-end. No
    * global window, no per-day rescans — the classic "count distinct
    * over a sliding window" trap (one full scan per day) never
    * appears. Emitted buckets are restricted to buckets that actually
    * occur in the data (a semi join against the distinct-bucket
    * frame), so an idle gap yields no row rather than a fabricated
    * zero. Output: (bucket, n_active). */
  def rollingActive(df: DataFrame, tsCol: String, actorCol: String,
                    bucketNs: Long, window: Int): DataFrame = {
    require(bucketNs > 0 && window > 0,
      s"need positive bucketNs/window, got $bucketNs/$window")
    val active = df.select(col(actorCol).as("__actor"),
        expr(s"`$tsCol` div $bucketNs").as("__b"))
      .distinct()
    val observed = active.select(col("__b").as("bucket")).distinct()
    active
      .withColumn("bucket",
        explode(sequence(col("__b"), col("__b") + (window - 1))))
      .join(observed, Seq("bucket"), "left_semi")
      .groupBy("bucket")
      .agg(countDistinct(col("__actor")).as("n_active"))
  }

  /** Theil–Sen robust trend: per group, the MEDIAN of the pairwise
    * slopes (y_j − y_i)/(x_j − x_i) over all point pairs with
    * x_i < x_j. The estimator an anomaly-tolerant pipeline monitor
    * uses where OLS would chase one bad day.
    *
    * O(n²) pairs per group by construction — this is the documented
    * EXACT leg, guarded by `maxPoints` (default 1000 ⇒ ≤ ~500k pairs
    * per group): callers with long series pre-aggregate to coarser
    * buckets first (the same license as the exact dedup baselines).
    * The pair join shuffles both sides on the group key only.
    * Output: (keys..., n_points, n_pairs, slope_micro) with the
    * median slope in integer micro-units (one rounding, no float
    * composition). */
  def theilSen(df: DataFrame, keys: Seq[String], xCol: String,
               yCol: String, maxPoints: Int = 1000): DataFrame = {
    val a = df.select(keys.map(col) :+ col(xCol).as("__x1") :+
      col(yCol).as("__y1"): _*)
    val b = df.select(keys.map(col) :+ col(xCol).as("__x2") :+
      col(yCol).as("__y2"): _*)
    val sizes = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_points"))
    val guarded = sizes.filter(col("n_points") <= maxPoints)
    val pairs = a.join(guarded.select(keys.map(col): _*), keys)
      .join(b, keys)
      .filter(col("__x1") < col("__x2"))
      .withColumn("__slope",
        (col("__y2") - col("__y1")).cast("double") /
          (col("__x2") - col("__x1")).cast("double"))
    pairs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(__slope, 0.5)") * 1e6).cast("long")
          .as("slope_micro"))
      .join(sizes, keys)
      .select(keys.map(col) :+ col("n_points") :+ col("n_pairs") :+
        col("slope_micro"): _*)
  }

  /** Per-group ordinary-least-squares trend over integer-valued
    * series: slope, intercept and r² from the five exact long sums
    * (n, Σx, Σy, Σxy, Σx², Σy²) — ONE hash aggregation, no window,
    * no second pass. x and y must be integral and small enough that
    * Σxy fits a long (day indices × counts always are); the float
    * math happens once per group on exact integers, so the result is
    * bit-stable across partitionings and engines after micro
    * rounding. Degenerate x-variance groups emit null slope/r².
    * Output: (keys..., n, slope_micro, intercept_micro, r2_micro). */
  def olsTrend(df: DataFrame, keys: Seq[String], xCol: String,
               yCol: String): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .withColumn("__dx", (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double"))
      .withColumn("__dy", (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double"))
      .withColumn("__cov", (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double"))
      .withColumn("slope_micro", when(col("__dx") > 0,
        round(col("__cov") / col("__dx") * 1e6).cast("long")))
      .withColumn("intercept_micro", when(col("__dx") > 0,
        round((col("sy").cast("double") - col("__cov") / col("__dx") *
          col("sx")) / col("n") * 1e6).cast("long")))
      .withColumn("r2_micro", when(col("__dx") > 0 && col("__dy") > 0,
        round(col("__cov") * col("__cov") / (col("__dx") * col("__dy")) * 1e6)
          .cast("long")))
      .select(keys.map(col) :+ col("n") :+ col("slope_micro") :+
        col("intercept_micro") :+ col("r2_micro"): _*)
  }

  /** Cross-correlation function between two integer-valued columns of
    * one aligned series: Pearson r of (x_t, y_{t+lag}) for each lag in
    * [0, maxLag]. Lead/lag detection between pipeline metrics ("errors
    * rise 2 hours after deploys") without ever sorting globally: the
    * lag alignment is an equi-join of the series against itself shifted
    * by each lag (the lag set is a tiny literal explode), so the whole
    * CCF is one join + one aggregation, both shuffled on the time key.
    * All five moment sums are exact longs (integral inputs enforced by
    * cast); r is computed once per lag from the exact sums.
    * Output: (lag, n, r_micro) — r_micro null when either side is
    * constant over the overlap. */
  def crossCorrelation(df: DataFrame, tCol: String, xCol: String,
                       yCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val base = df.select(col(tCol).cast("long").as("__t"),
      col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
    val lagged = base.select(explode(sequence(lit(0), lit(maxLag))).as("lag"),
        col("__t"), col("__x"))
      .withColumn("__tj", col("__t") + col("lag"))
    val joined = lagged.join(
      base.select(col("__t").as("__tj"), col("__y")), Seq("__tj"))
    joined.groupBy("lag")
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"), sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
      .withColumn("__dx", (col("n") * col("sxx") - col("sx") * col("sx"))
        .cast("double"))
      .withColumn("__dy", (col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double"))
      .withColumn("r_micro", when(col("__dx") > 0 && col("__dy") > 0,
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(col("__dx") * col("__dy")) * 1e6).cast("long")))
      .select("lag", "n", "r_micro")
  }

  /** Time-weighted average (TWAP) per actor over irregularly sampled
    * values: each value holds from its event until the next one, so
    * the mean weights by holding duration, not by sample count — the
    * correct average for unevenly sampled series (a metric sampled
    * 100× during an incident must not dominate the day). Exact
    * arithmetic end to end: values in micro longs, durations in ms
    * longs, the Σ(v·Δt) accumulator decimal(38,0) (a HUGEINT-exact
    * sum for the oracle), one division at the end. One per-actor lead
    * window + one aggregation. Output: (actorCol, n_segments,
    * span_ms, twap_micro); actors with <2 events emit nothing. */
  def twap(df: DataFrame, actorCol: String, tsCol: String,
           valueCol: String, tieCols: Seq[String] = Seq.empty)
  : DataFrame = {
    val base = df
      .withColumn("__ms", expr(s"`$tsCol` div 1000000"))
      .withColumn("__vm", round(col(valueCol) * 1e6).cast("long"))
    val w = Window.partitionBy(actorCol)
      .orderBy((col("__ms") +: tieCols.map(col)): _*)
    base.withColumn("__nms", lead(col("__ms"), 1).over(w))
      .filter(col("__nms").isNotNull)
      .withColumn("__gap", col("__nms") - col("__ms"))
      .groupBy(col(actorCol))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__gap")).as("span_ms"),
        // gap casts to decimal BEFORE the multiply — a month-long gap
        // times a large micro value overflows a long per-term
        sum((col("__gap").cast("decimal(38,0)") * col("__vm"))
          .cast("decimal(38,0)")).as("__s"))
      .select(col(actorCol), col("n_segments"), col("span_ms"),
        when(col("span_ms") > 0,
          round(col("__s").cast("double") / col("span_ms")).cast("long"))
          .as("twap_micro"))
  }

  /** Seasonality-aware anomaly flags: each (key, period, position)
    * bucket count compared against ITS OWN position's profile from
    * [[seasonalProfile]] — "is 3 a.m. traffic high for 3 a.m.", not
    * "is it high overall" (plain z-scores fire every rush hour).
    * Residual = (count − mean)·1000/σ in milli-units, computed from
    * the same exact integer sums as the profile; zero-variance
    * positions (every period identical) by construction never
    * deviate and emit nothing. One count cascade + a positions-sized
    * join. Output: (keys..., period, position, c, resid_milli) for
    * buckets with |resid| ≥ thresholdMilli. */
  def seasonalAnomalies(df: DataFrame, keys: Seq[String], tsCol: String,
                        positionNs: Long, periodNs: Long,
                        thresholdMilli: Long): DataFrame = {
    val perPeriod = periodPositionCounts(df, keys, tsCol, positionNs,
      periodNs).withColumnRenamed("__c", "c")
    val prof = perPeriod
      .groupBy(keys.map(col) :+ col("position"): _*)
      .agg(count(lit(1)).as("__np"), sum(col("c")).as("__tot"),
        sum(col("c") * col("c")).as("__cc"))
      .withColumn("__mean",
        col("__tot").cast("double") / col("__np"))
      .withColumn("__var",
        (col("__cc").cast("double") -
          col("__tot").cast("double") * col("__tot") / col("__np")) /
          col("__np"))
    perPeriod.join(prof, keys :+ "position")
      .withColumn("resid_milli",
        when(col("__var") > 0,
          round((col("c") - col("__mean")) /
            sqrt(col("__var")) * 1000).cast("long")))
      .filter(col("resid_milli").isNotNull &&
        abs(col("resid_milli")) >= thresholdMilli)
      .select(keys.map(col) :+ col("period") :+ col("position") :+
        col("c") :+ col("resid_milli"): _*)
  }

  /** Inter-arrival burstiness per actor: coefficient of variation of
    * the gaps between consecutive events — CV ≈ 1 is Poisson, ≫ 1 is
    * bursty (bot bursts, batch ingests), ≪ 1 is metronomic (cron).
    * Gaps are exact epoch-ms longs from one per-actor lag window; the
    * Σg² accumulator is decimal(38,0) (a month-long gap squares to
    * ~7·10¹⁸ — past a long), so the moments are exact at any history
    * length and the float math happens once per actor. Output:
    * (actorCol, n_gaps, mean_gap_ms_micro, cv_micro); cv null for
    * actors with <2 gaps or zero mean. */
  def burstiness(df: DataFrame, actorCol: String, tsCol: String,
                 tieCols: Seq[String] = Seq.empty): DataFrame = {
    val gaps = df
      .withColumn("__ms", expr(s"`$tsCol` div 1000000"))
      .withColumn("__gap", col("__ms") - lag(col("__ms"), 1).over(
        Window.partitionBy(actorCol)
          .orderBy((col("__ms") +: tieCols.map(col)): _*)))
      .filter(col("__gap").isNotNull)
    gaps.groupBy(col(actorCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("__gap")).as("__s1"),
        // square in decimal — a >35-day ms gap squared wraps a long
        sum((col("__gap").cast("decimal(38,0)") * col("__gap"))
          .cast("decimal(38,0)")).as("__s2"))
      .select(col(actorCol), col("n_gaps"),
        round(col("__s1").cast("double") / col("n_gaps") * 1e6)
          .cast("long").as("mean_gap_ms_micro"),
        when(col("n_gaps") > 1 && col("__s1") > 0,
          round(sqrt((col("__s2").cast("double") -
            col("__s1").cast("double") * col("__s1") / col("n_gaps")) /
            col("n_gaps")) /
            (col("__s1").cast("double") / col("n_gaps")) * 1e6)
            .cast("long")).as("cv_micro"))
  }

  /** Seasonal (bucket-of-period) profile of an event stream: bucket
    * counts by (key, period position) — e.g. hour-of-day — with the
    * per-position mean and population variance of the per-period
    * counts, from exact integer sums in one aggregation cascade
    * (counts per (key, period, position), then moments per (key,
    * position)). Positions a key never fires in produce no row (no
    * fabricated zeros). The profile is what seasonality-aware anomaly
    * detection compares a live hour against. Output: (keys...,
    * position, n_periods, total, mean_micro, var_micro). */
  /** Shared (key, period, position) count cascade — the single
    * definition both [[seasonalProfile]] and [[seasonalAnomalies]]
    * build on, so the profile and the detector that compares against
    * it can never drift apart. */
  private def periodPositionCounts(df: DataFrame, keys: Seq[String],
                                   tsCol: String, positionNs: Long,
                                   periodNs: Long): DataFrame = {
    require(positionNs > 0 && periodNs > positionNs,
      s"need 0 < positionNs < periodNs, got $positionNs/$periodNs")
    df.withColumn("period", expr(s"`$tsCol` div $periodNs"))
      .withColumn("position",
        expr(s"(`$tsCol` % $periodNs) div $positionNs"))
      .groupBy(keys.map(col) :+ col("period") :+ col("position"): _*)
      .agg(count(lit(1)).as("__c"))
  }

  def seasonalProfile(df: DataFrame, keys: Seq[String], tsCol: String,
                      positionNs: Long, periodNs: Long): DataFrame = {
    val perPeriod = periodPositionCounts(df, keys, tsCol, positionNs,
      periodNs)
    perPeriod.groupBy(keys.map(col) :+ col("position"): _*)
      .agg(count(lit(1)).as("n_periods"), sum(col("__c")).as("total"),
        sum(col("__c") * col("__c")).as("__cc"))
      .withColumn("mean_micro",
        round(col("total").cast("double") / col("n_periods") * 1e6)
          .cast("long"))
      .withColumn("var_micro",
        round((col("__cc").cast("double") -
          col("total").cast("double") * col("total") / col("n_periods")) /
          col("n_periods") * 1e6).cast("long"))
      .drop("__cc")
  }
}
