package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column profiling — the validate-before-ingest surface (reference
  * analog: the row-count/column assertions scattered through the
  * flows, e.g. dbCounts and the clinical merge pre-checks; here it is
  * one reusable operator the way a 100 TB intake pipeline wants it).
  *
  * `numeric` computes every measure for every column in ONE
  * aggregation pass (a single scan, one reduce to a 1-row frame on
  * the driver-side result — no per-column jobs), then unpivots the
  * 1×(7·n) row to n rows with a zero-cost explode. Exact
  * `count(distinct)` adds an Expand of (n_cols+1)× the scan rows —
  * acceptable for profiling runs; at full-corpus scale swap
  * `approxDistinct = true` for one-pass HLL (not oracle-exact, which
  * is why the checked query keeps the exact form).
  *
  * Medians are exact (sort-based percentile) and order-independent;
  * means are rounded to 4 dp so distributed partial-sum ordering
  * cannot leak into the last digit.
  */
object Profile {

  /** Long-format numeric profile: one row per column —
    * (column, n, n_null, n_distinct, min_v, max_v, mean_v, median_v).
    *
    * Split passes over just the profiled columns, NOT one combined
    * aggregate: `countDistinct` plans an Expand of (n_cols+1)× the
    * input, so it runs alone over a narrow projection; the
    * count/null/min/max/mean stats are one codegen-planned agg. The
    * 1-row results cross-join (both driver-sized) and unpivot.
    *
    * Exact medians come from `Quantiles.exactQuantiles` — the radix
    * order-statistic engine: four bounded-state histogram scans shared
    * by ALL profiled columns, replacing `percentile`'s per-partition
    * distinct-value buffers and its single-task final merge-sort
    * (near-unique columns buffered whole partitions; measured
    * q_x_profile 15.7 s → ~5 s at sf10). Branch-for-branch
    * `percentile` interpolation parity is pinned by QuantilesSpec, so
    * the checked output is unchanged. This makes the exact form EAGER
    * (the histogram jobs run when `numeric` is called — the psi
    * contract). `approxMedian`/`approxDistinct` remain the one-scan
    * sketch forms (not oracle-exact — which is why the checked query
    * keeps the exact forms). */
  def numeric(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false,
              approxMedian: Boolean = false,
              rsd: Double = 0.05,
              accuracy: Int = 1000): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val narrow0 = df.select(cols.map(col): _*)
    // exact medians: radix order-statistic search (bounded state, four
    // shared scans) — runs eagerly; the values enter the agg as
    // foldable literals
    val exactMedians: Map[String, Column] =
      if (approxMedian) Map.empty
      else Quantiles.exactQuantiles(narrow0, cols.map(c => c -> Seq(0.5)))
        .map { case (c, vs) =>
          c -> vs.head.map(lit).getOrElse(lit(null).cast("double")) }
    val basicAggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__mean"),
        round((if (approxMedian)
          expr(s"approx_percentile($c, 0.5D, $accuracy)").cast("double")
        else exactMedians(c)), 6).as(s"${c}__median"))
    }
    // rsd/accuracy reach the sketches they parameterize (ADVICE r11:
    // a gate band computed from arguments the sketch never saw would
    // check a contract that never ran); both default to Spark's own
    // defaults so the exact forms and existing callers are unchanged
    val distinctAggs = cols.map { c =>
      (if (approxDistinct) approx_count_distinct(col(c), rsd)
       else countDistinct(col(c))).as(s"${c}__distinct")
    }
    val narrow = narrow0
    // the two-pass split exists because EXACT countDistinct plans an
    // Expand of (n_cols+1)× the input; approx_count_distinct is a
    // plain HLL aggregate with no Expand, so the fully-approx profile
    // collapses to ONE scan
    val wide =
      if (approxDistinct && approxMedian)
        narrow.agg((basicAggs ++ distinctAggs).head,
          (basicAggs ++ distinctAggs).tail: _*)
      else narrow.agg(basicAggs.head, basicAggs.tail: _*)
        .crossJoin(narrow.agg(distinctAggs.head, distinctAggs.tail: _*))
    val structs = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__n").as("n"),
        col(s"${c}__nulls").as("n_null"),
        col(s"${c}__distinct").cast("long").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"),
        col(s"${c}__median").as("median_v"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Oracle-gateable validation of the approx-profile path: runs the
    * ONE-scan HLL + quantile-summary profile (the 100 TB cheap twin of
    * the exact `numeric`) and checks each approx measure against its
    * documented error contract relative to the exact profile:
    *
    *  - HLL distinct: |est − exact| ≤ ceil(3·rsd·exact) + 1 — the 3σ
    *    band of `approx_count_distinct`'s relative-standard-deviation
    *    contract (Spark default rsd = 0.05; rsd IS one σ, and the
    *    realized HLL++ bias at mid-range cardinalities measurably
    *    exceeds 2σ on some value sets — 1115 vs 1000 exact in the
    *    spec's probe — so 2σ would gate on statistical noise while 3σ
    *    still catches any implementation regression), +1 so tiny
    *    cardinalities where the band rounds to zero admit the
    *    sketch's ±1;
    *  - quantile-summary median: the returned value's RANK must lie
    *    within n/accuracy (+1 tie slack) of n/2 — the
    *    `approx_percentile(…, accuracy)` rank-error guarantee, checked
    *    rank-wise so the engine-specific estimate value itself never
    *    reaches the gate.
    *
    * Output is one row per column: the EXACT anchors (n, n_null,
    * n_distinct, min/max/mean/median — byte-identical to `numeric`'s
    * checked form) plus the two booleans. Fully deterministic, so a
    * SQL oracle replays the exact anchors and emits literal TRUEs.
    * Cost: the approx sketch scan + the exact profile's two passes +
    * one rank-census scan — this is the GATE query; the cheap-twin
    * throughput claim is measured on the bare approx `numeric`
    * (see BASELINE.md sf10 records: 4.7 s approx vs 18 s exact).
    *
    * The sketch scan computes the SAME expressions `numeric`'s approx
    * form plans — `approx_percentile(c, 0.5, accuracy)` and
    * `approx_count_distinct(c, rsd)` — but UNROUNDED: the rank census
    * must probe the value the sketch actually returned, not its 6-dp
    * presentation rounding, or data with mass within 1e-6 of the
    * estimate could shift __lt/__le past the ±1 tie slack and
    * spuriously flip `median_ok` (ADVICE r11). */
  def approxProfileCheck(df: DataFrame, cols: Seq[String],
                         rsd: Double = 0.05,
                         accuracy: Int = 1000): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val exact = numeric(df, cols)
    // 1-row wide frame of the UNROUNDED approx estimates (one value
    // pair per profiled column) — one scan, the same single-scan
    // bounded-state shape as numeric's fully-approx form
    val awAggs = cols.flatMap { c =>
      Seq(
        expr(s"approx_percentile($c, 0.5D, $accuracy)").cast("double")
          .as(s"${c}__amed"),
        approx_count_distinct(col(c), rsd).cast("long").as(s"${c}__and"))
    }
    val aw = df.select(cols.map(col): _*).agg(awAggs.head, awAggs.tail: _*)
    // one rank-census scan: how many rows sit strictly below / at-or-
    // below each approx median (the rank contract is checked against
    // these two exact counts, never against the estimate's value)
    val rankAggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c) < col(s"${c}__amed"), 1L).otherwise(0L)).as(s"${c}__lt"),
        sum(when(col(c) <= col(s"${c}__amed"), 1L).otherwise(0L)).as(s"${c}__le"))
    }
    val ranks = df.select(cols.map(col): _*).crossJoin(broadcast(aw))
      .agg(rankAggs.head, rankAggs.tail: _*)
      .select(cols.flatMap(c => Seq(col(s"${c}__lt"), col(s"${c}__le"))): _*)
    def pick(suffix: String): Column =
      cols.tail.foldLeft(
        when(col("column") === cols.head, col(s"${cols.head}$suffix"))) {
        (acc, c) => acc.when(col("column") === c, col(s"$c$suffix"))
      }
    val eps = 1.0 / accuracy
    exact.crossJoin(broadcast(aw)).crossJoin(broadcast(ranks))
      .withColumn("__approx_nd", pick("__and"))
      .withColumn("__lt", pick("__lt"))
      .withColumn("__le", pick("__le"))
      .withColumn("distinct_ok",
        abs(col("__approx_nd") - col("n_distinct")) <=
          ceil(lit(3.0 * rsd) * col("n_distinct")) + lit(1L))
      .withColumn("median_ok",
        (col("__lt") <= ceil((lit(0.5) + lit(eps)) * col("n")) + lit(1L)) &&
          (col("__le") >= floor((lit(0.5) - lit(eps)) * col("n")) - lit(1L)))
      .select(col("column"), col("n"), col("n_null"), col("n_distinct"),
        col("min_v"), col("max_v"), col("mean_v"), col("median_v"),
        col("distinct_ok"), col("median_ok"))
  }

  /** Oracle-gateable validation of the APPROX DRIFT path — the same
    * error-contract gate as [[approxProfileCheck]], applied per
    * snapshot side: each side runs the one-scan HLL + quantile-summary
    * sketches AND the exact profile, checks the sketches against their
    * documented bounds (HLL 3σ-rsd band; approx-percentile rank within
    * n/accuracy of n/2), and the drift deltas are computed from the
    * EXACT anchors — fully deterministic, so a SQL oracle replays the
    * exact drift report and emits literal TRUEs for the four booleans.
    * A sketch drifting outside its contract on either side flips its
    * boolean and hash-mismatches the gate.
    *
    * This is the GATE query for the approx-drift monitor path; the
    * cheap-twin THROUGHPUT claim is measured on the bare
    * `drift(..., approx = true)` (a bench-only row — its estimate
    * values are engine-specific sketch outputs, which is exactly why
    * the checkable surface here is the error contract, the
    * `q_s_recall` pattern). Output: one row per column — the exact
    * drift columns of [[drift]]'s exact form, plus
    * distinct_ok_ref / median_ok_ref / distinct_ok_cur /
    * median_ok_cur. */
  def approxDriftCheck(ref: DataFrame, cur: DataFrame, cols: Seq[String],
                       rsd: Double = 0.05,
                       accuracy: Int = 1000): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      approxProfileCheck(df, cols, rsd, accuracy).select(
        col("column"), col("n").as(s"n_$tag"),
        col("n_null").as(s"null_$tag"),
        col("n_distinct").as(s"distinct_$tag"),
        col("mean_v").as(s"mean_$tag"),
        col("median_v").as(s"median_$tag"),
        col("distinct_ok").as(s"distinct_ok_$tag"),
        col("median_ok").as(s"median_ok_$tag"))
    side(ref, "ref").join(side(cur, "cur"), "column")
      .withColumn("mean_delta", round(col("mean_cur") - col("mean_ref"), 4))
      .withColumn("median_delta",
        round(col("median_cur") - col("median_ref"), 6))
      .withColumn("rel_mean_shift_micro",
        round((col("mean_cur") - col("mean_ref")) /
          greatest(abs(col("mean_ref")), lit(1e-9)) * 1e6).cast("long"))
      .select(col("column"),
        col("n_ref"), col("null_ref"), col("distinct_ref"),
        col("mean_ref"), col("median_ref"),
        col("n_cur"), col("null_cur"), col("distinct_cur"),
        col("mean_cur"), col("median_cur"),
        col("mean_delta"), col("median_delta"),
        col("rel_mean_shift_micro"),
        col("distinct_ok_ref"), col("median_ok_ref"),
        col("distinct_ok_cur"), col("median_ok_cur"))
  }

  /** Winsorize: clip `valueCol` into its global [loQ, hiQ] exact
    * quantiles (rounded to 6 dp so the bounds are engine-portable) —
    * the outlier treatment between profiling and features. Quantiles
    * ride a 1-row broadcast; the clip is a codegen'd projection.
    * Adds `<valueCol>_wins`. */
  def winsorize(df: DataFrame, valueCol: String,
                loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ, s"bad quantiles $loQ/$hiQ")
    // radix order-statistic search (Quantiles scaladoc): both clip
    // bounds from the same four bounded-state scans, entering the
    // projection as foldable literals — no percentile buffer, no
    // crossJoin (eager, like the profile's exact median)
    val qs = Quantiles.exactQuantiles(df, Seq(valueCol -> Seq(loQ, hiQ)))
    val Seq(loV, hiV) = qs(valueCol).map(
      _.map(lit).getOrElse(lit(null).cast("double")))
    df.withColumn(s"${valueCol}_wins",
      least(greatest(col(valueCol), round(loV, 6)), round(hiV, 6)))
  }

  /** Per-group exact percentile summary (the p50/p95/p99 latency
    * table). Exact, order-independent, and engine-portable (agrees
    * with quantile_cont; see the winsorize note) under BOTH engines:
    *
    *  - `"buffer"` (default): the classic one-pass hash-agg
    *    `percentile` — per-(group, partition) distinct-value buffers.
    *    The MEASURED winner while those buffers fit: solo one-band
    *    q_e_pctl twins, sf10 1.45 s / sf100 3.99 s vs radix
    *    6.80 / 32.3 (~10⁶ distincts per group is comfortably inside
    *    the buffer regime). Also right for MANY small groups
    *    (per-user multisets) and for expensive-to-re-scan lineage
    *    (one scan, not four).
    *  - `"radix"`: `Quantiles.groupedExactQuantiles` — four
    *    bounded-state histogram scans shared by all fractions, rank
    *    refinement as joins, NO per-group value buffers. The
    *    memory-safety knob once per-group distinct counts reach the
    *    regime where percentile buffers (and their single-object
    *    merges) break — ~10⁷+ distincts per group — where "swap to
    *    approx" used to be the only exit; now exactness survives.
    *    Eager (the psi contract); inherits the radix input license +
    *    the groups×fractions broadcast license.
    *
    * Identical values either way (parity pinned in QuantilesSpec;
    * both engine rows carried in the bench — the q_j13/q_j13_br
    * adoption-contract discipline). */
  def groupedPercentiles(df: DataFrame, groupCols: Seq[String],
                         valueCol: String,
                         ps: Seq[Double] = Seq(0.5, 0.95, 0.99),
                         engine: String = "buffer"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles out of [0,1]: $ps")
    // p50 / p95 / p99_5 — fractional percentiles keep their digits so
    // labels never collide (0.995 and 0.999 must not both be "p100")
    def label(p: Double): String = {
      val s = BigDecimal(p * 100)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString
      "p" + s.replace(".", "_")
    }
    val names = ps.map(label)
    require(names.distinct.size == names.size, s"duplicate labels: $names")
    engine match {
      case "radix" =>
        Quantiles.groupedExactQuantiles(df, groupCols, valueCol,
            names.zip(ps))
          .select(groupCols.map(col) ++
            names.map(n => round(col(n), 6).as(n)): _*)
      case "buffer" =>
        val aggs = ps.zip(names).map { case (p, n) =>
          round(expr(s"percentile($valueCol, ${p}D)"), 6).as(n)
        }
        df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
      case other => throw new IllegalArgumentException(
        s"engine must be radix or buffer, got $other")
    }
  }

  /** Population Stability Index between a reference and a current
    * sample of one numeric column — the standard distribution-drift
    * gate (PSI > 0.2 ⇒ investigate) run between corpus versions or
    * train/serving windows. Bins are equi-width over the REFERENCE
    * range (current values clamp into the edge bins, so new outliers
    * surface as edge-bin mass); fractions are Laplace-smoothed
    * ((n+1)/(N+bins)) so empty bins never produce ln(0). Long
    * format: one row per bin with both counts and the PSI term —
    * `sum(psi_term)` is the headline number, the per-bin rows are
    * the diagnosis. Two aggregations + a bins-sized spine join: the
    * samples are never joined row-to-row.
    *
    * EAGER: the result is pinned via `localCheckpoint()` at call time
    * (so the two binned-count caches can be released immediately —
    * same discipline as `dupClusters`), which means both samples are
    * scanned HERE, not when the caller first acts on the returned
    * frame, and the bins-sized checkpoint blocks are not recomputable
    * after executor loss — re-call `psi` in that case. Callers
    * composing lazy plans should call this last. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val spark = ref.sparkSession
    val b = ref.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    def binned(df: DataFrame): DataFrame =
      df.filter(col(valueCol).isNotNull).crossJoin(broadcast(b))
        .select(when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(greatest(least(
            floor((col(valueCol) - col("__lo")) * bins / (col("__hi") - col("__lo"))),
            lit(bins - 1L)), lit(0L))).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    // totals stay relational (bins-sized 1-row aggregates cross-joined
    // back, exactly like the oracle's tr/tc CTEs): no driver action,
    // no second scan of either sample, and an empty/all-null sample
    // degrades to smoothing-only fractions instead of an NPE
    val nr = binned(ref).withColumnRenamed("n", "n_ref")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nc = binned(cur).withColumnRenamed("n", "n_cur")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tr = nr.agg(coalesce(sum("n_ref"), lit(0L)).cast("double").as("__tr"))
    val tc = nc.agg(coalesce(sum("n_cur"), lit(0L)).cast("double").as("__tc"))
    val spine = spark.range(bins).toDF("bin")
    val ra = (col("n_ref") + 1.0) / (col("__tr") + bins)
    val rc = (col("n_cur") + 1.0) / (col("__tc") + bins)
    val out = spine.join(nr, Seq("bin"), "left").join(nc, Seq("bin"), "left")
      .crossJoin(broadcast(tr)).crossJoin(broadcast(tc))
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_cur", coalesce(col("n_cur"), lit(0L)))
      .withColumn("psi_term", round((ra - rc) * log(ra / rc), 6))
      .drop("__tr", "__tc")
    // pin the bins-sized result, then release the binned-count caches
    // (same discipline as dupClusters: a persist with no unpersist
    // accumulates across a long multi-query session)
    val pinned = out.localCheckpoint()
    nr.unpersist(); nc.unpersist()
    pinned
  }

  /** The reference side of `psi` as driver metadata — (lo, hi,
    * per-bin counts), bins-sized — for consumers that score MANY
    * current samples against ONE fixed reference (the streaming drift
    * gate `StreamOps.psiStream`): the reference scan runs once, and
    * what ships is bins longs, not data. Same bin formula as `psi`
    * (equi-width over the reference range). The reference must be
    * non-empty — a drift gate against nothing is a config error, not
    * a degradable input. */
  def psiReference(ref: DataFrame, valueCol: String,
                   bins: Int = 10): (Double, Double, Array[Long]) = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val nonNull = ref.filter(col(valueCol).isNotNull)
    val b = nonNull.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi")).collect()(0)
    require(!b.isNullAt(0), "psiReference: empty reference sample")
    val (lo, hi) = (b.getDouble(0), b.getDouble(1))
    val counts = new Array[Long](bins)
    nonNull
      .select(when(lit(hi) === lit(lo), lit(0L))
        .otherwise(greatest(least(
          floor((col(valueCol) - lit(lo)) * bins / (lit(hi) - lit(lo))),
          lit(bins - 1L)), lit(0L))).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    (lo, hi, counts)
  }

  /** Equi-depth histogram: bucket by QUANTILE boundaries instead of
    * width, so every bin holds ~n/bins rows regardless of skew (the
    * histogram a query optimizer or drift monitor actually wants on
    * heavy-tailed columns). Boundaries are exact percentiles rounded
    * to 6 dp (engine-portable, same convention as winsorize); a
    * value lands in bin = number of boundaries strictly below it, so
    * duplicate boundaries on skewed data yield empty bins rather
    * than misassignment. All bins−1 boundaries come from the SAME
    * four radix order-statistic scans (Quantiles scaladoc) and enter
    * the binning projection as foldable literals — no percentile
    * buffer, no broadcast (eager, like the profile's exact median;
    * the old array-percentile form buffered the whole column and
    * merge-sorted it on one task). */
  def equiDepthHistogram(df: DataFrame, valueCol: String,
                         bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val qs = Quantiles.exactQuantiles(df,
      Seq(valueCol -> (1 until bins).map(i => i.toDouble / bins)))
    val bin = qs(valueCol).map { b =>
      val bc = b.map(lit).getOrElse(lit(null).cast("double"))
      when(col(valueCol) > round(bc, 6), 1L).otherwise(0L) }
      .reduce(_ + _)
    df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Equi-width histogram of `valueCol`: `bins` buckets over the
    * observed [min, max], bucket = floor((x − min)/width) clamped so
    * max lands in the last bin. Bounds ride a 1-row broadcast; one
    * aggregation. Empty bins are absent (join a spine if you need
    * zeros). */
  /** Shared equi-width bin expression — histogram / quantile /
    * calibration operators (and their oracles) must keep IDENTICAL
    * edge semantics; this is the single definition. Degenerate range
    * (hi == lo) maps everything to bin 0. */
  private[operators] def equiWidthBin(v: Column, lo: Column, hi: Column,
                                      bins: Int): Column =
    when(hi === lo, lit(0L))
      .otherwise(least(floor((v - lo) * bins / (hi - lo)),
        lit(bins - 1L)))

  def histogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0)
    // histogram of OBSERVED values: null rows are excluded up front
    // (least()/floor() would otherwise silently fold them into a bin —
    // track null counts with `numeric`, not here)
    val nonNull = df.filter(col(valueCol).isNotNull)
    val b = nonNull.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    nonNull.crossJoin(broadcast(b))
      .withColumn("bin",
        equiWidthBin(col(valueCol), col("__lo"), col("__hi"), bins))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** One-pass approximate quantiles from a MERGEABLE equi-width
    * histogram — the 100 TB quantile path where the exact
    * array-percentile buffer (`q_x_eqdepth`) no longer fits: bin
    * counts merge by addition across shards/days, and any quantile
    * interpolates from the cumulative counts at read time. Error is
    * bounded by one bin width — honest, fixed, and documented, unlike
    * a sampled estimate. Two cheap passes (extrema, bin counts); the
    * cumulative walk runs over the BINS-sized table (metadata — the
    * single-partition window is over ≤ `bins` rows). Estimate:
    * lo + (bin + (target − cumBefore)/binCount) · width, target =
    * p·N. Output per requested p: (p_ppm, n, est_micro). */
  def histQuantiles(df: DataFrame, valueCol: String, bins: Int,
                    ps: Seq[Double]): DataFrame = {
    require(bins > 0 && ps.nonEmpty, "need bins > 0 and quantiles")
    val nonNull = df.filter(col(valueCol).isNotNull)
    val b = nonNull.agg(min(col(valueCol)).cast("double").as("__lo"),
      max(col(valueCol)).cast("double").as("__hi"))
    val binned = nonNull.crossJoin(broadcast(b))
      .withColumn("bin",
        equiWidthBin(col(valueCol), col("__lo"), col("__hi"), bins))
      .groupBy("bin").agg(count(lit(1)).as("__c"))
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__cumBefore", col("__cum") - col("__c"))
    val tot = binned.agg(sum(col("__c")).as("__n"))
    val pframe = df.sparkSession.range(1)
      .select(explode(array(ps.map(lit(_)): _*)).as("__p"))
    pframe.crossJoin(broadcast(tot)).crossJoin(broadcast(b))
      .withColumn("__t", col("__p") * col("__n"))
      .join(broadcast(cum),
        col("__cumBefore") < col("__t") && col("__cum") >= col("__t"))
      .select(round(col("__p") * 1e6).cast("long").as("p_ppm"),
        col("__n").as("n"),
        round((col("__lo") + (col("bin") +
          (col("__t") - col("__cumBefore")) / col("__c")) *
          (col("__hi") - col("__lo")) / bins) * 1e6).cast("long")
          .as("est_micro"))
  }

  /** Pairwise Pearson correlations of `cols` in ONE aggregation pass,
    * long format (col_a, col_b, corr) for a < b pairs — rounded to
    * 4 dp (corr is a ratio of distributed sums; accumulation order
    * must not leak). */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    // positional aliases: name-derived ones (a__b) collide when column
    // names themselves contain the separator
    val aggs = pairs.zipWithIndex.map { case ((a, b), i) =>
      round(corr(col(a), col(b)), 4).as(s"__corr$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__corr$i").as("corr"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Top-k most frequent values per column (mode census), long format:
    * (column, value, cnt, rank). One shuffle — the per-column unpivot
    * happens in the projection (explode), the groupBy partially
    * aggregates map-side, and ties rank deterministically by value. */
  def frequentValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(cols.nonEmpty && k > 0)
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"), col(c).cast("string").as("value"))): _*))
      .as("p")).select("p.*")
    val counts = pairs.groupBy("column", "value").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("column")
      .orderBy(col("cnt").desc, col("value").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Chi-square test of independence for two categorical columns —
    * the "is source independent of language" check behind stratified
    * sampling decisions. Observed counts are one exact aggregation;
    * expected = row·col/n from broadcast marginals; the statistic
    * Σ(o−e)²/e is identical IEEE doubles on identical integers in
    * both engines. Output: one row (n, dof, chi2 6 dp) — compare
    * chi2 against the critical value for dof externally (no p-value:
    * the CDF is not engine-portable). */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    // nulls recode to a sentinel CATEGORY before aggregating: SQL null
    // never equals null, so a null-category row would keep its
    // marginal contribution while the grid left-join zeroed its
    // observed count (inflating chi2), and countDistinct would skip it
    // in dof. As a category it participates consistently in all three.
    val obs = df.groupBy(
        coalesce(col(colA).cast("string"), lit("__null__")).as("a"),
        coalesce(col(colB).cast("string"), lit("__null__")).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("a").agg(sum(col("o")).as("__ra"))
    val rb = obs.groupBy("b").agg(sum(col("o")).as("__rb"))
    val tot = obs.agg(sum(col("o")).as("__n"),
      countDistinct(col("a")).as("__ka"),
      countDistinct(col("b")).as("__kb"))
    // densify: ZERO cells belong in the statistic ((0−e)²/e is not
    // zero) — build the ka×kb grid from the marginals, left-join the
    // observed counts onto it
    ra.crossJoin(rb)
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__e",
        col("__ra").cast("double") * col("__rb") / col("__n"))
      .withColumn("__t", round(
        (col("o") - col("__e")) * (col("o") - col("__e")) / col("__e")
          * 1e6).cast("long"))
      .agg(max(col("__n")).as("n"),
        max((col("__ka") - 1) * (col("__kb") - 1)).as("dof"),
        round(sum(col("__t")).cast("double") / 1e6, 6).as("chi2"))
  }

  /** Per-GROUP mergeable histogram quantiles — [[histQuantiles]] with
    * a group key: bin edges come from each group's own extrema (one
    * grouped extrema pass broadcast back), counts aggregate per
    * (group, bin), and the cumulative walk windows over the
    * BINS-sized frame per group (≤ `bins` rows each — metadata, not
    * the single-task trap: the heavy work is the two corpus passes).
    * Output per (group, p): (group, p_ppm, n, est_micro). */
  def histQuantilesByGroup(df: DataFrame, grpCol: String,
                           valueCol: String, bins: Int,
                           ps: Seq[Double]): DataFrame = {
    require(bins > 0 && ps.nonEmpty, "need bins > 0 and quantiles")
    val nonNull = df.filter(col(valueCol).isNotNull)
      .select(col(grpCol).as("grp"), col(valueCol).as("__v"))
    val b = nonNull.groupBy("grp")
      .agg(min(col("__v")).cast("double").as("__lo"),
        max(col("__v")).cast("double").as("__hi"))
    val binned = nonNull.join(broadcast(b), Seq("grp"))
      .withColumn("bin",
        equiWidthBin(col("__v"), col("__lo"), col("__hi"), bins))
      .groupBy("grp", "bin").agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy("grp").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned.withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__cumBefore", col("__cum") - col("__c"))
    val tot = binned.groupBy("grp").agg(sum(col("__c")).as("__n"))
    val pframe = df.sparkSession.range(1)
      .select(explode(array(ps.map(lit(_)): _*)).as("__p"))
    pframe.crossJoin(tot).join(b, Seq("grp"))
      .withColumn("__t", col("__p") * col("__n"))
      .join(cum, Seq("grp"))
      .filter(col("__cumBefore") < col("__t") && col("__cum") >= col("__t"))
      .select(col("grp").as(grpCol),
        round(col("__p") * 1e6).cast("long").as("p_ppm"),
        col("__n").as("n"),
        round((col("__lo") + (col("bin") +
          (col("__t") - col("__cumBefore")) / col("__c")) *
          (col("__hi") - col("__lo")) / bins) * 1e6).cast("long")
          .as("est_micro"))
  }

  /** Per-cell standardized residuals of the [[chiSquare]] grid —
    * which cells DRIVE the dependence: (o−e)/√e in milli-units, with
    * the expected count alongside. Same densified grid and null
    * recoding as the statistic; |resid| ≳ 2 flags a cell. Output:
    * (a, b, o, expected 6 dp, resid_milli). */
  def chiSquareResiduals(df: DataFrame, colA: String,
                         colB: String): DataFrame = {
    val obs = df.groupBy(
        coalesce(col(colA).cast("string"), lit("__null__")).as("a"),
        coalesce(col(colB).cast("string"), lit("__null__")).as("b"))
      .agg(count(lit(1)).as("o"))
    val ra = obs.groupBy("a").agg(sum(col("o")).as("__ra"))
    val rb = obs.groupBy("b").agg(sum(col("o")).as("__rb"))
    val tot = obs.agg(sum(col("o")).as("__n"))
    ra.crossJoin(rb)
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("__e",
        col("__ra").cast("double") * col("__rb") / col("__n"))
      .select(col("a"), col("b"), col("o"),
        round(col("__e"), 6).as("expected"),
        round((col("o") - col("__e")) / sqrt(col("__e")) * 1000)
          .cast("long").as("resid_milli"))
  }

  /** Textbook equi-join cardinality estimate vs ground truth — the
    * CBO-stats primitive (|A ⋈ B| ≈ n_A·n_B/max(d_A,d_B) under
    * containment) that decides broadcast-vs-shuffle and join order
    * before any data moves. Three aggregations; the actual join runs
    * only because this operator REPORTS estimator error — production
    * callers use the estimate alone. Output: one row (n_a, d_a, n_b,
    * d_b, est_rows, actual_rows). */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame,
                       bKey: String): DataFrame = {
    val sa = a.agg(count(col(aKey)).as("n_a"),
      countDistinct(col(aKey)).as("d_a"))
    val sb = b.agg(count(col(bKey)).as("n_b"),
      countDistinct(col(bKey)).as("d_b"))
    val actual = a.select(col(aKey).as("__k"))
      .join(b.select(col(bKey).as("__k")), Seq("__k"))
      .agg(count(lit(1)).as("actual_rows"))
    sa.crossJoin(sb).crossJoin(actual)
      .select(col("n_a"), col("d_a"), col("n_b"), col("d_b"),
        round(col("n_a").cast("double") * col("n_b") /
          greatest(col("d_a"), col("d_b"))).cast("long").as("est_rows"),
        col("actual_rows"))
  }

  /** Per-source freshness audit: latest event time and staleness lag
    * against the corpus-wide maximum — the "which feed died" monitor.
    * One grouped aggregation + a broadcast 1-row global. Output:
    * (groupCol, n, latest_ns, lag_ms). */
  def freshness(df: DataFrame, groupCol: String,
                tsCol: String): DataFrame = {
    val glob = df.agg(max(col(tsCol)).as("__gmax"))
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), max(col(tsCol)).as("latest_ns"))
      .crossJoin(broadcast(glob))
      .select(col(groupCol), col("n"), col("latest_ns"),
        expr("(__gmax - latest_ns) div 1000000").as("lag_ms"))
  }

  /** Robust per-group dispersion: exact median and MAD (median
    * absolute deviation) — the outlier scale that a few wild values
    * cannot drag the way stddev-based z-scores can. Both stats round
    * to 6 dp so they are engine-comparable; deviations are taken
    * against the ROUNDED median on both engines (identical output).
    * Output: (groups..., n, median, mad); rows whose group key is
    * null drop at the broadcast-back join (both engines).
    *
    *  - `"buffer"` (default): two grouped exact-percentile
    *    aggregations — per-group distinct-value buffers, one scan
    *    each; the measured-winner regime (see
    *    [[groupedPercentiles]]'s contract).
    *  - `"radix"`: two `Quantiles.groupedExactQuantiles` invocations
    *    (values, then deviations) — EIGHT bounded-state scans total,
    *    no per-group buffers; the ≫10⁷-distincts-per-group
    *    memory-safety knob. Eager; radix input license applies. */
  def madStats(df: DataFrame, groupCols: Seq[String],
               valueCol: String, engine: String = "buffer"): DataFrame =
    engine match {
      case "buffer" =>
        val med = df.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n"),
            round(expr(s"percentile($valueCol, 0.5D)"), 6).as("median"))
        df.join(broadcast(med), groupCols)
          .withColumn("__dev", abs(col(valueCol) - col("median")))
          .groupBy(groupCols.map(col): _*)
          .agg(max(col("n")).as("n"), max(col("median")).as("median"),
            round(expr("percentile(__dev, 0.5D)"), 6).as("mad"))
      case "radix" =>
        val med = Quantiles
          .groupedExactQuantiles(df, groupCols, valueCol,
            Seq("median" -> 0.5))
          .select(groupCols.map(col) :+
            round(col("median"), 6).as("median"): _*)
        val n = df.groupBy(groupCols.map(col): _*)
          .agg(count(lit(1)).as("n"))
        val dev = df.join(broadcast(med), groupCols)
          .withColumn("__dev", abs(col(valueCol) - col("median")))
        val mad = Quantiles
          .groupedExactQuantiles(dev, groupCols, "__dev",
            Seq("mad" -> 0.5))
          .select(groupCols.map(col) :+ round(col("mad"), 6).as("mad"): _*)
        // inner usingColumns joins: null-key groups drop, exactly as
        // the buffer path's broadcast-back join drops them
        n.join(med, groupCols).join(mad, groupCols)
          .select(groupCols.map(col) ++
            Seq(col("n"), col("median"), col("mad")): _*)
      case other => throw new IllegalArgumentException(
        s"engine must be buffer or radix, got $other")
    }

  /** Column-level drift report between a reference snapshot and the
    * current frame — the train/serve-skew and pipeline-regression
    * screen (PSI answers "did ONE column's distribution move"; this
    * answers "which columns moved at all, and how" across the table).
    * Joins the two `numeric` profiles by column name and reports both
    * sides plus deltas; `rel_mean_shift_micro` is the mean delta over
    * the reference MAD-free scale max(|mean_ref|, 1e-9) in micro
    * units — a unit-free sortable severity.
    *
    * The EXACT form profiles both snapshots over ONE tagged union:
    * every scan (the basic aggregates, the countDistinct Expand, the
    * four radix order-statistic passes) covers ref AND cur at once via
    * side-masked virtual columns `when(side = s, c)` — `count`/`min`/
    * `avg`/`countDistinct` skip nulls, so a masked column aggregates
    * exactly its own side, and null counts condition on the side tag
    * explicitly. Values are identical to joining two `numeric`
    * profiles (sums are exact decimal/long; the radix medians are
    * partition-order-free), at HALF the passes: 12 aggregation jobs
    * become 6 (the union's branches still each scan their snapshot,
    * so bytes read only drop when the snapshots are separate tables —
    * the job-count halving is what shows up when both sides filter
    * one table, 9.4 → 7.3 s at sf10).
    *
    * `approx = true` instead routes two one-scan HLL +
    * quantile-summary profiles (the 100 TB MONITOR path — no Expand,
    * no percentile state; sketches stay per-snapshot because
    * `approx_percentile`'s summary is merge-order-sensitive and the
    * twin is throughput-gated anyway). Deltas then carry sketch
    * noise, so the oracle-checked query keeps the exact default. */
  def drift(ref: DataFrame, cur: DataFrame, cols: Seq[String],
            approx: Boolean = false,
            rsd: Double = 0.05, accuracy: Int = 1000): DataFrame = {
    val joined = if (approx) {
      def prof(df: DataFrame) = numeric(df, cols,
        approxDistinct = true, approxMedian = true,
        rsd = rsd, accuracy = accuracy)
      val r = prof(ref).select(
        col("column"), col("n").as("n_ref"),
        col("n_null").as("null_ref"), col("n_distinct").as("distinct_ref"),
        col("mean_v").as("mean_ref"), col("median_v").as("median_ref"))
      val c = prof(cur).select(
        col("column"), col("n").as("n_cur"),
        col("n_null").as("null_cur"), col("n_distinct").as("distinct_cur"),
        col("mean_v").as("mean_cur"), col("median_v").as("median_cur"))
      r.join(c, "column")
    } else {
      val kc = cols.map(col)
      val u = ref.select(kc: _*).withColumn("__side", lit(0))
        .unionByName(cur.select(kc: _*).withColumn("__side", lit(1)))
      def side(c: String, s: Int) = when(col("__side") === s, col(c))
      val virt = for { c <- cols; s <- 0 to 1 } yield s"${c}__$s"
      val uv = u.select((for { c <- cols; s <- 0 to 1 }
        yield side(c, s).as(s"${c}__$s")): _*)
      val medians = Quantiles.exactQuantiles(uv, virt.map(_ -> Seq(0.5)))
        .map { case (cs, vs) =>
          cs -> vs.head.map(lit).getOrElse(lit(null).cast("double")) }
      val basicAggs = for {
        c <- cols; s <- 0 to 1
        a <- Seq(
          count(side(c, s)).as(s"${c}__${s}__n"),
          sum(when(col("__side") === s && col(c).isNull, 1L)
            .otherwise(0L)).as(s"${c}__${s}__nulls"),
          round(avg(side(c, s)), 4).as(s"${c}__${s}__mean"),
          round(medians(s"${c}__$s"), 6).as(s"${c}__${s}__median"))
      } yield a
      val distinctAggs = for { c <- cols; s <- 0 to 1 }
        yield countDistinct(side(c, s)).as(s"${c}__${s}__distinct")
      // per-side row counts: an EMPTY snapshot must report null (not
      // 0) null counts — SQL's sum over no rows, as the per-frame
      // profile form does — while the masked sum above sees the other
      // side's rows and would report 0
      val sideCounts = (0 to 1).map(s =>
        count(when(col("__side") === s, lit(1))).as(s"__cnt_$s"))
      val wide = u.agg((basicAggs ++ sideCounts).head,
          (basicAggs ++ sideCounts).tail: _*)
        .crossJoin(u.agg(distinctAggs.head, distinctAggs.tail: _*))
      def nulls(c: String, s: Int) =
        when(col(s"__cnt_$s") === 0, lit(null).cast("long"))
          .otherwise(col(s"${c}__${s}__nulls"))
      val structs = cols.map { c =>
        struct(lit(c).as("column"),
          col(s"${c}__0__n").as("n_ref"),
          nulls(c, 0).as("null_ref"),
          col(s"${c}__0__distinct").cast("long").as("distinct_ref"),
          col(s"${c}__0__mean").as("mean_ref"),
          col(s"${c}__0__median").as("median_ref"),
          col(s"${c}__1__n").as("n_cur"),
          nulls(c, 1).as("null_cur"),
          col(s"${c}__1__distinct").cast("long").as("distinct_cur"),
          col(s"${c}__1__mean").as("mean_cur"),
          col(s"${c}__1__median").as("median_cur"))
      }
      wide.select(explode(array(structs: _*)).as("p")).select("p.*")
    }
    joined
      .withColumn("mean_delta", round(col("mean_cur") - col("mean_ref"), 4))
      .withColumn("median_delta",
        round(col("median_cur") - col("median_ref"), 6))
      .withColumn("rel_mean_shift_micro",
        round((col("mean_cur") - col("mean_ref")) /
          greatest(abs(col("mean_ref")), lit(1e-9)) * 1e6).cast("long"))
  }

  /** Functional-dependency discovery for candidate column pairs:
    * does lhs → rhs hold, and if not, how badly? For each (lhs, rhs)
    * pair: `n_lhs` distinct lhs values, `n_violating` lhs values
    * mapping to >1 distinct rhs, and `max_rhs_per_lhs` — the schema-
    * inference / key-detection primitive of a data profiler (the
    * reference eyeballs these invariants manually when reconciling
    * dump counts, `src/utils.py` dump statistics).
    *
    * Scale shape: per pair ONE (lhs, rhs) distinct + one lhs
    * aggregation — both shuffles on the lhs key; pairs are
    * independent (a caller probing k candidate FDs unions k cheap
    * frames, each pruned to its two columns at the scan). */
  def fdReport(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    pairs.map { case (lhs, rhs) =>
      df.select(col(lhs).as("__l"), col(rhs).as("__r")).distinct()
        .groupBy("__l").agg(count(lit(1)).as("__k"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("__k") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("__k")).as("max_rhs_per_lhs"))
        .select(lit(lhs).as("lhs"), lit(rhs).as("rhs"),
          col("n_lhs"), col("n_violating"), col("max_rhs_per_lhs"),
          (col("n_violating") === 0).cast("int").as("holds"))
    }.reduce(_.unionAll(_))

  /** Information gain of a categorical feature against a label —
    * the feature-usefulness screen of a training-data profiler
    * (which metadata columns actually predict the target?).
    *
    * IG = H(label) − H(label | feature), computed from exact cell
    * counts with the micro-nat determinism recipe: each cell's
    * ln(c_cell / c_group) is rounded to integer micro-nats FIRST,
    * the count-weighted sums are then exact longs (order- and
    * engine-independent), and the single final division by N is one
    * IEEE op. Two hash aggregations ((feature,label) cells, then
    * label marginals) — no window, no driver data.
    *
    * Output one row: feature name, `n`, `h_label_micro`,
    * `h_cond_micro`, `ig_micro` (all non-negative micro-nats). */
  def infoGain(df: DataFrame, featureCol: String,
               labelCol: String): DataFrame = {
    val cells = df.filter(col(featureCol).isNotNull &&
        col(labelCol).isNotNull)
      .groupBy(col(featureCol).as("__f"), col(labelCol).as("__l"))
      .agg(count(lit(1)).as("__c"))
    val n1 = cells.agg(sum(col("__c")).as("__n"))
    // conditional: Σ_cells c · round(ln(c / c_feature)·1e6)
    val fTot = cells.groupBy("__f").agg(sum(col("__c")).as("__cf"))
    val cond = cells.join(fTot, "__f")
      .select((col("__c") *
        round(log(col("__c").cast("double") /
          col("__cf").cast("double")) * 1e6).cast("long")).as("__t"))
      .agg(sum(col("__t")).as("__s_cond"))
    // label marginal: Σ_l c_l · round(ln(c_l / N)·1e6)
    val lTot = cells.groupBy("__l").agg(sum(col("__c")).as("__cl"))
    val lab = lTot.crossJoin(broadcast(n1))
      .select((col("__cl") *
        round(log(col("__cl").cast("double") /
          col("__n").cast("double")) * 1e6).cast("long")).as("__t"))
      .agg(sum(col("__t")).as("__s_lab"))
    lab.crossJoin(cond).crossJoin(broadcast(n1))
      .select(lit(featureCol).as("feature"), col("__n").as("n"),
        round(-col("__s_lab").cast("double") / col("__n").cast("double"))
          .cast("long").as("h_label_micro"),
        round(-col("__s_cond").cast("double") / col("__n").cast("double"))
          .cast("long").as("h_cond_micro"))
      .withColumn("ig_micro", col("h_label_micro") - col("h_cond_micro"))
  }

  /** Benford first-digit profile of a positive numeric column: the
    * observed share of leading digits 1-9 (of the integer part,
    * values < 1 excluded) against the Benford expectation
    * log10(1+1/d) — the classic fabricated-data / unit-mixing screen.
    * Counts are exact longs; expected shares are micro-units of the
    * closed-form constant (identical IEEE doubles in any engine);
    * the per-digit deviation is reported in micro-units.
    *
    * One aggregation on a 9-value key; the digit extraction is a
    * string head on the already-truncated integer part (no float
    * formatting — `CAST(floor(x))` then first character — so both
    * engines parse the same digits). */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol)
    val digit = substring(
      floor(abs(x)).cast("long").cast("string"), 1, 1).cast("int")
    val counts = df.filter(x.isNotNull && abs(x) >= 1)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__total").cast("double")
          * 1e6).cast("long").as("obs_micro"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          * 1e6).cast("long").as("benford_micro"))
      .withColumn("dev_micro",
        col("obs_micro") - col("benford_micro"))
  }
}
