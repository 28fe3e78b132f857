package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / mixing for training-data
  * pipelines (north-star extension; reference analog: the cohort
  * partitioning in pedmatch.py — but here the contract is the one a
  * 100 TB corpus job needs: STABLE under re-runs, partitioning, and
  * incremental appends).
  *
  * Every operator keys off the first 8 hex chars of `md5(salt || id)`
  * compared lexicographically against a precomputed threshold string:
  *   - no RNG, no `rand()` — adding executors, retrying a stage, or
  *     re-running the job yields the SAME sample (Spark's `sample()`
  *     is seed-stable only for identical partitioning);
  *   - a row's fate depends only on (salt, its own id) — appending new
  *     data never reshuffles old rows across splits, which is what
  *     keeps train/test contamination-free across corpus versions;
  *   - md5 is portable, so a SQL oracle reproduces the exact row set
  *     (same trick as Dedup's hash60 family);
  *   - pure `Column` expressions: the filter is codegen'd and pushes
  *     into the scan like any other predicate — a sample of a 100 TB
  *     table reads all rows but shuffles NONE (no window, no agg).
  *
  * Salts namespace independent draws: sampling at 0.25 with salt "a"
  * and 0.25 with salt "b" gives two ~6.25%-overlapping subsets, while
  * nested fractions with the SAME salt are subsets of each other
  * (0.1 ⊂ 0.25) — both properties are load-bearing for corpus
  * ablation studies, so they are tested.
  */
object Sampling {

  /** Threshold string for `fraction` over the 32-bit hex-prefix space.
    * Lexicographic compare of fixed-width lowercase hex == numeric
    * compare, and "g" sorts after every hex digit, so fraction 1.0
    * keeps everything. Exposed so oracle SQL embeds the identical
    * literal. */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val t = math.round(fraction * 4294967296.0) // 2^32
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** The sampling key: first 8 hex chars of md5(salt || id). Uniform
    * on [0, 2^32) for distinct ids; deterministic everywhere. */
  def sampleKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt), id.cast("string"))), 1, 8)

  /** Keep a deterministic `fraction` of rows keyed by `idCol`. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = ""): DataFrame =
    df.filter(sampleKey(col(idCol), salt) < lit(thresholdHex(fraction)))

  /** Temperature-scaled source mixing (the mT5 recipe): resample so
    * source i contributes in proportion to n_i^alpha — alpha < 1
    * upweights the tail sources a raw-proportional mix would drown.
    * Keep rate_i = min(1, target · w_i / Σw / n_i) with
    * w_i = round(n_i^alpha · 1e6) — integer weights so the Σw
    * accumulation is exact long arithmetic (a double sum would be
    * partition-order dependent and break the cross-engine replay).
    * The per-doc gate is the same deterministic md5 threshold as
    * `hashSample`, compared numerically against the per-source
    * 2^32-scaled rate. Source cardinality is metadata-sized: rates
    * ride a broadcast join, the corpus never shuffles. alpha = 0.5
    * routes through sqrt (correctly-rounded IEEE in every engine;
    * pow's last-ulp freedom could flip a boundary doc). */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double, targetTotal: Long,
                     salt: String = ""): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetTotal > 0, s"targetTotal must be positive, got $targetTotal")
    applyMixRates(df, idCol, sourceCol,
      temperatureRates(
        df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n")),
        sourceCol, alpha, targetTotal),
      salt)
  }

  /** The rate-building half of [[temperatureMix]]: from a per-source
    * count frame (`sourceCol`, `__n`) to a broadcastable
    * (`sourceCol`, `__thr`) table of 2^32-scaled keep thresholds.
    * Split out so a STREAMING ingest can apply rates learned from a
    * batch census snapshot — the apply side is a stateless filter. */
  def temperatureRates(counts: DataFrame, sourceCol: String,
                       alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(targetTotal > 0, s"targetTotal must be positive, got $targetTotal")
    val nd = col("__n").cast("double")
    val pw = if (alpha == 0.5) sqrt(nd) else pow(nd, alpha)
    val weighted = counts.withColumn("__w", round(pw * 1e6).cast("long"))
    val z = weighted.agg(sum(col("__w")).as("__z"))
    weighted.crossJoin(broadcast(z))
      .withColumn("__rate", least(lit(1.0),
        lit(targetTotal.toDouble) * col("__w") / col("__z") / col("__n")))
      .withColumn("__thr", round(col("__rate") * 4294967296.0).cast("long"))
      .select(col(sourceCol), col("__thr"))
  }

  /** The apply half of [[temperatureMix]]: a stateless per-row hash
    * gate against broadcast per-source thresholds — streaming-safe
    * (no aggregation, no state; the same row always gets the same
    * verdict, append-stable across batches). */
  def applyMixRates(df: DataFrame, idCol: String, sourceCol: String,
                    rates: DataFrame, salt: String = ""): DataFrame =
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(conv(sampleKey(col(idCol), salt), 16, 10).cast("long") <
        col("__thr"))
      .drop("__thr")

  /** Assign every row to exactly one named split (train/val/test…) by
    * cumulative threshold. Fractions must sum to 1 (±1e-9); the last
    * split absorbs the hex-rounding remainder so no row is unassigned.
    * Adds `splitCol`; rows keep their assignment forever (append-safe).
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], salt: String = "",
                  splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "no splits given")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val key = sampleKey(col(idCol), salt)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    // every key < "g" ⇒ the last WHEN always catches the remainder
    val assigned = splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = key < lit(thresholdHex(c))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }.fold(lit(splits.head._1))(_.otherwise(lit(splits.last._1)))
    df.withColumn(splitCol, assigned)
  }

  /** Learning-curve census: row/weight totals of the NESTED hash
    * subsets at each rate — the scaling-law experiment plan ("train
    * at 10/20/40/80% of the corpus") sized in ONE scan. Nesting is
    * the [[hashSample]] property: the same salt means every lower
    * rate's subset is contained in every higher rate's, so curve
    * points differ only by data volume, never by data identity. All
    * rates evaluate as conditional sums over one pass. Output per
    * rate: (rate_ppm, n_rows, weight_sum). */
  def learningCurve(df: DataFrame, idCol: String, rates: Seq[Double],
                    weightCol: Option[String] = None,
                    salt: String = ""): DataFrame = {
    require(rates.nonEmpty, "learningCurve: no rates")
    val key = sampleKey(col(idCol), salt)
    val wcol = weightCol.map(c => col(c).cast("long"))
      .getOrElse(lit(1L))
    val aggs = rates.zipWithIndex.flatMap { case (r, i) =>
      val in = key < lit(thresholdHex(r))
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"__n$i"),
        sum(when(in, wcol).otherwise(0L)).as(s"__w$i"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = rates.zipWithIndex.map { case (r, i) =>
      struct(lit(math.round(r * 1e6)).as("rate_ppm"),
        col(s"__n$i").as("n_rows"), col(s"__w$i").as("weight_sum"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Class-balanced undersampling: keep the first `n_min` rows of
    * EVERY class in deterministic hash order, where n_min is the
    * minority class size — the baseline rebalance before training a
    * classifier on skewed labels. The hash order makes the kept set
    * engine-stable and append-stable (same rows survive a re-run).
    * The per-class rank runs on `Batching.groupedRankByRange` — NOT a
    * `Window.partitionBy(class)`, which would collapse a 5-class
    * 10¹²-row table into 5 tasks; the range-partitioned form spreads
    * every class across the cluster and collects only (partition,
    * class) offset metadata. Plus a broadcast 1-row minimum.
    * Output: the kept rows (idCol, classCol). */
  def balanceClasses(df: DataFrame, idCol: String, classCol: String,
                     salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(classCol))
      .agg(count(lit(1)).as("__cnt"))
    val nmin = counts.agg(min(col("__cnt")).as("__nmin"))
    val ranked = Batching.groupedRankByRange(
      df.select(col(idCol), col(classCol))
        .withColumn("__key", sampleKey(col(idCol), salt)),
      classCol, Seq(col("__key"), col(idCol)))
    ranked.crossJoin(broadcast(nmin))
      .filter(col("__grank") <= col("__nmin"))
      .select(col(idCol), col(classCol))
  }

  /** Group-aware split: like [[assignSplit]] but keyed on a GROUP
    * column instead of the row id, so every row of a group (all docs
    * from one source, all events of one user) lands in the SAME split
    * — the leakage guard for train/test separation when near-duplicate
    * or correlated rows cluster within groups. Fractions apply to the
    * GROUP hash space, so splits are proportional in groups, not rows
    * — skewed group sizes skew row counts (that is the price of zero
    * leakage; re-weight downstream if row balance matters). Null
    * groups fall into the last split (null hash fails every
    * threshold), matching the SQL CASE. Map-only — no shuffle at
    * all. */
  def groupAwareSplit(df: DataFrame, groupCol: String,
                      splits: Seq[(String, Double)], salt: String = "",
                      splitCol: String = "split"): DataFrame =
    assignSplit(df, groupCol, splits, salt, splitCol)

  /** Per-stratum sampling rates (dataset mixing / rebalancing): keep
    * each row with its stratum's rate, `defaultRate` for strata not in
    * the map. `rates` is config-sized (a when-chain, not a join) —
    * for a million-stratum table use a broadcast-join variant instead.
    * Same salt ⇒ a stratum's sample at a lower rate is a subset of its
    * sample at a higher rate (nested, like hashSample). */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = ""): DataFrame = {
    val key = sampleKey(col(idCol), salt)
    val thr = rates.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (v, r)) =>
        val c = col(stratumCol) === v
        Some(acc.fold(when(c, lit(thresholdHex(r))))(
          _.when(c, lit(thresholdHex(r)))))
    }.fold(lit(thresholdHex(defaultRate)): Column)(
      _.otherwise(lit(thresholdHex(defaultRate))))
    df.filter(key < thr)
  }

  /** Deterministic oversampling for dataset-mixing ratios (the
    * "Wikipedia ×2.3" knob): every row appears floor(factor) times,
    * plus once more when its (salt, id) hash falls under the
    * fractional part — so epochs are reproducible and the realized
    * mix converges to the requested ratio. Emits a `copy` index
    * (1-based) for downstream shuffling/interleaving. Factor < 1
    * degrades to `hashSample`; factor 0 empties. */
  def oversample(df: DataFrame, idCol: String, factor: Double,
                 salt: String = ""): DataFrame = {
    require(factor >= 0.0, s"factor $factor")
    val base = math.floor(factor).toLong
    val frac = factor - base
    val copies = lit(base) +
      when(sampleKey(col(idCol), salt) < lit(thresholdHex(frac)), 1L)
        .otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic global shuffle: a total `shuffle_rank` ordering by
    * (hash, id) — the reproducible row permutation a training run
    * reads the corpus in. Same scalable skeleton as
    * `Batching.ntileByRange`: range-repartition on the hash key,
    * per-partition counts collected (metadata), rank = offset +
    * in-partition row_number — no single-task global window. Change
    * `salt` to reshuffle between epochs. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           salt: String = "",
                           numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__sk", sampleKey(col(idCol), salt))
    val (withPid, offsetDf, _) = Batching.partitionOffsets(keyed,
      Seq(col("__sk"), col(idCol)), count(lit(1)), numPartitions)
    val w = Window.partitionBy("__pid")
      .orderBy(col("__sk").asc, col(idCol).asc)
    withPid.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("shuffle_rank", col("__offset") + row_number().over(w))
      .drop("__pid", "__offset", "__sk")
  }

  /** Domain-weighted token-budget selection — the "mixture" step of a
    * pretraining data recipe ("20 B tokens of web, 5 B of code…"):
    * within each domain, walk rows in deterministic (salt, id)-hash
    * order and keep them until the domain's token budget fills; the
    * row that crosses the boundary stays whole (budgets overflow by
    * at most one row — same convention as `Batching.packByBudget`).
    * Deterministic, append-stable (a row's position in its domain's
    * hash order never changes), and re-salting draws a fresh epoch.
    *
    * Scale shape: range-repartition on (domain, hash, id), collect
    * per-(partition, domain) token sums (metadata — partitions ×
    * domains rows, never data), then per-partition windows + the
    * broadcast offsets. A domain larger than one partition never
    * funnels through a single task — the same skeleton as
    * `ntileByRange`, generalized to grouped offsets. `domainCol` must
    * be a string column; `budgets` is config-sized (a when-chain). */
  def tokenBudget(df: DataFrame, idCol: String, domainCol: String,
                  tokenCol: String, budgets: Map[String, Long],
                  defaultBudget: Long, salt: String = "",
                  numPartitions: Int = 0): DataFrame = {
    require(defaultBudget >= 0L && budgets.values.forall(_ >= 0L),
      "budgets must be non-negative")
    val wcol = coalesce(col(tokenCol).cast("long"), lit(0L))
    val keyed = df.withColumn("__sk", sampleKey(col(idCol), salt))
    val sortCols = Seq(col(domainCol), col("__sk"), col(idCol))
    val parts =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, sortCols: _*)
      else keyed.repartitionByRange(sortCols: _*)
    // pin the partitioning — same reasoning as Batching.partitionOffsets;
    // registered so Batching.releasePins covers this skeleton too
    val withPid = Batching.pin(parts.withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sums = withPid
      .groupBy(col("__pid"), col(domainCol).cast("string").as("__dom"))
      .agg(coalesce(sum(wcol), lit(0L)).as("__v"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = sums.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._1).map { case (pid, dom, v) =>
        val o = (pid, dom, acc); acc += v; o
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", "__dom", "__offset")
    val budgetCol = budgets.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (dom, b)) =>
        val c = col(domainCol) === dom
        Some(acc.fold(when(c, lit(b)))(_.when(c, lit(b))))
    }.fold(lit(defaultBudget): Column)(_.otherwise(lit(defaultBudget)))
    val w = Window.partitionBy(col("__pid"), col(domainCol))
      .orderBy(col("__sk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsetDf),
        withPid("__pid") === offsetDf("__pid") &&
          withPid(domainCol).cast("string") <=> offsetDf("__dom"), "inner")
      .drop(offsetDf("__pid")).drop("__dom")
      .withColumn("__cum", col("__offset") + coalesce(sum(wcol).over(w), lit(0L)))
      .filter(col("__cum") - wcol < budgetCol)
      .drop("__sk", "__pid", "__offset", "__cum")
  }

  /** Exactly `k` rows per key group (or all, if the group is smaller),
    * chosen uniformly and deterministically — the distributed stand-in
    * for per-group reservoir sampling. One shuffle (the window
    * partition); ties cannot happen because `idCol` breaks them. */
  def samplePerKey(df: DataFrame, keyCols: Seq[String], idCol: String,
                   k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(sampleKey(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__srn", row_number().over(w))
      .filter(col("__srn") <= k).drop("__srn")
  }

  /** Efraimidis–Spirakis key for weighted sampling without
    * replacement: rank = ln(u) / w with u = (hash32+1)/(2^32+1) — the
    * top-k rows by this key are a weight-proportional sample. Rounded
    * to 9 dp BEFORE ranking (ln is not IEEE-correctly-rounded; the
    * unrounded last ulp must not decide membership) with `idCol` as
    * the tie-break. Deterministic in (salt, id, weight) like every
    * Sampling op, so appends/retries/engines agree on the draw. */
  def esKey(id: Column, weight: Column, salt: String): Column =
    round(log((conv(sampleKey(id, salt), 16, 10).cast("long") + 1)
      .cast("double") / 4294967297.0) / weight, 9)

  /** Weighted sample WITHOUT replacement: the `k` rows with the
    * largest ES keys. Rows with weight <= 0 or null are excluded
    * (probability zero). Physically a TakeOrderedAndProject — per-
    * partition top-k then a k-sized merge on the driver side of the
    * exchange; no global sort, no single-task window. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__es", esKey(col(idCol), col(weightCol), salt))
      .orderBy(col("__es").desc, col(idCol).asc)
      .limit(k)
      .drop("__es")
  }

  /** Per-group weighted sample: `k` rows per key group by ES key (one
    * window shuffle; groups smaller than k keep everything). */
  def weightedSamplePerKey(df: DataFrame, keyCols: Seq[String],
                           idCol: String, weightCol: String, k: Int,
                           salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(esKey(col(idCol), col(weightCol), salt).desc, col(idCol).asc)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wrn", row_number().over(w))
      .filter(col("__wrn") <= k).drop("__wrn")
  }

  /** Proportional source interleave — the curriculum/mixing read
    * order: every domain spreads evenly through the epoch instead of
    * clumping (a size-biased round-robin). Each row gets its
    * deterministic hash rank r within its group (count c), and the
    * global order key is the INTEGER midpoint fraction
    * ((2r−1)·10^12) div (2c) — rank r of a group of c sits at
    * progress (r−½)/c, so groups of any size interleave
    * proportionally; ties break by (group, id).
    *
    * Scale shape: one group-partitioned rank window + a broadcast of
    * group counts; NO global window — the key is sort-ready for a
    * range-partitioned write (same skeleton as deterministicShuffle).
    * Re-salt for a fresh epoch. */
  def interleaveByGroup(df: DataFrame, idCol: String, groupCol: String,
                        salt: String = ""): DataFrame = {
    val w = Window.partitionBy(groupCol)
      .orderBy(sampleKey(col(idCol), salt).asc, col(idCol).asc)
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__c"))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .join(broadcast(counts), Seq(groupCol))
      .withColumn("progress_micro",
        expr("((2 * rank_in_group - 1) * 1000000000000) div (2 * __c)"))
      .drop("__c")
  }
}
