package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P9: deterministic batching (SURVEY.md §2.2 — the reference's
  * `df.iloc[i:i+batch]` slicing, cnv.py:555, vcf_anno.py:595,
  * pedmatch:757, mci:350).
  *
  * `ntile(k) OVER (ORDER BY ...)` with no partition key moves the
  * whole table through ONE task — fine as exact replay at fixture
  * scale, fatal at 100 TB. `ntileByRange` computes the identical
  * assignment scalably: range-repartition on the order key, count per
  * partition (a partition-count-sized driver collect — metadata, not
  * data), then global rank = partition offset + local row_number and
  * the closed-form ntile bucket from the rank. Two narrow passes, no
  * global shuffle to a single task, every partition windows only its
  * own range.
  */
object Batching {

  /** Registry of the partitioning pins created by the range-partition
    * skeletons (`partitionOffsets`, `withOrderedHalo`,
    * `Sampling.tokenBudget`): each pins its range-repartitioned input
    * with persist, and the pin backs the RETURNED lazy frame — it
    * cannot be released inside the call. Callers that are done with a
    * skeleton's results release the pins with [[releasePins]] instead
    * of the blunt `spark.catalog.clearCache()` (which would also evict
    * frames the caller cached on purpose). Strong references by
    * design: Spark's CacheManager holds the cached plan regardless of
    * whether this wrapper is reachable, so a weak reference would not
    * let the blocks die with the wrapper — it would only lose the
    * handle needed to unpersist them. The queue is drained (and the
    * references dropped) on every [[releasePins]]. */
  private val pins =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  private[operators] def pin(df: DataFrame): DataFrame = {
    pins.add(df)
    df
  }

  /** Unpersist every partitioning pin created by the skeletons since
    * the last release (non-blocking). Call ONLY once the skeleton
    * results are fully materialized and will not be re-computed:
    * re-materializing a still-referenced result after release re-runs
    * `repartitionByRange`, whose boundary sampling varies per job
    * (see [[partitionOffsets]]) — rows could land in different `__pid`
    * buckets than the collected offsets were built from, silently
    * misaligning ranks. The registry is session-global, so in a
    * concurrent session drain it only at batch boundaries when no
    * skeleton call is in flight. */
  def releasePins(): Unit = {
    var df = pins.poll()
    while (df != null) {
      df.unpersist(false)
      df = pins.poll()
    }
  }

  /** Exact-replay global ntile (single-task window — opt-in only). */
  def globalNtile(df: DataFrame, orderCols: Seq[Column], n: Int): DataFrame =
    df.withColumn("batch", ntile(n).over(Window.orderBy(orderCols: _*)))

  /** Shared scalable-rank skeleton (ntileByRange / packByBudget /
    * Sampling.deterministicShuffle): range-repartition by `sortCols`
    * and PIN the partitioning with persist — the per-partition
    * aggregate below is collected in a SEPARATE job from the caller's
    * final plan, and without pinning the two executions could sample
    * different range boundaries (reservoir seed varies per job) or be
    * AQE-coalesced differently, silently misaligning rows against the
    * collected offsets. Returns the pinned frame (with `__pid`), the
    * broadcastable (__pid, __offset) running-offset frame accumulated
    * from `perPartition` (one row per partition — metadata, never
    * data), and the grand total. MEMORY_AND_DISK: a big input spills
    * instead of recomputing. */
  private[operators] def partitionOffsets(
      df: DataFrame, sortCols: Seq[Column], perPartition: Column,
      numPartitions: Int): (DataFrame, DataFrame, Long) = {
    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    val withPid = pin(parts.withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = withPid.groupBy("__pid").agg(perPartition.as("__v"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, v) =>
      val o = (pid, acc); acc += v; o
    }
    val spark = df.sparkSession
    import spark.implicits._
    (withPid, offsets.toSeq.toDF("__pid", "__offset"), acc)
  }

  /** ntile(n) bucket from a 1-based global rank, closed form:
    * the first `total % n` buckets get `total/n + 1` rows, the rest
    * `total/n` — exactly SQL ntile. */
  private def ntileFromRank(rank: Column, total: Long, n: Int): Column = {
    val base = total / n
    val rem = total % n
    val cut = rem * (base + 1)
    if (base == 0) rank.cast("int") // fewer rows than buckets: bucket = rank
    else when(rank <= cut, floor((rank - 1) / (base + 1)) + 1)
      .otherwise(floor((rank - cut - 1) / base) + 1 + rem)
      .cast("int")
  }

  /** Token-budget sequence packing — the batch-construction step of a
    * pretraining pipeline: walk the corpus in `orderCol` order and cut
    * a new pack every time the running `weightCol` total (token count,
    * byte size) passes `budget`. A row whose weight spans a boundary
    * stays whole in its starting pack (no splitting; packs overflow by
    * at most one row's weight — the standard contiguous-packing
    * approximation).
    *
    * Same scalable skeleton as `ntileByRange`: range-repartition on
    * the order key, per-partition weight totals collected (one row per
    * partition — metadata), global running sum = partition offset +
    * in-partition window, pack id = floor((cumsum − weight)/budget).
    * No single-task window; the oracle is the plain one-window SQL. */
  def packByBudget(df: DataFrame, orderCol: String, weightCol: String,
                   budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // null weights advance the budget by 0 (row still gets a pack)
    val wcol = coalesce(col(weightCol).cast("long"), lit(0L))
    val (withPid, offsetDf, _) = partitionOffsets(df, Seq(col(orderCol)),
      coalesce(sum(wcol), lit(0L)), numPartitions)
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withPid
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__cum", col("__offset") + coalesce(sum(wcol).over(w), lit(0L)))
      .withColumn("pack", floor((col("__cum") - wcol) / budget))
      .drop("__pid", "__offset", "__cum")
  }

  /** GPT-style EXACT sequence packing — the pretraining batch
    * construction that `packByBudget` approximates: the corpus is one
    * virtual token stream in `orderCol` order, cut every `seqLen`
    * tokens, and a document that spans a cut is SPLIT across the
    * adjacent sequences (no padding, no overflow). Emits one row per
    * (document, sequence) span: `seq_id`, the doc-local token range
    * [`span_start`, `span_end`) that lands there, and `seq_off` — the
    * write offset inside the sequence. Zero/null-weight rows emit
    * nothing.
    *
    * Scale shape: the same range-repartition + per-partition-offsets
    * skeleton (driver collect is one row per partition); the span
    * explode is inference-safe and bounded by ceil(w/seqLen)+1 rows
    * per document. The oracle is the plain one-window cumsum. */
  def packExact(df: DataFrame, orderCol: String, weightCol: String,
                seqLen: Long, numPartitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val wcol = coalesce(col(weightCol).cast("long"), lit(0L))
    val (withPid, offsetDf, _) = partitionOffsets(df, Seq(col(orderCol)),
      coalesce(sum(wcol), lit(0L)), numPartitions)
    val w = Window.partitionBy("__pid").orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val based = withPid
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__cum",
        col("__offset") + coalesce(sum(wcol).over(w), lit(0L)))
      .filter(wcol > 0)
      .withColumn("__start", col("__cum") - wcol)
    Explodes.nonEmpty(based,
        sequence(expr(s"__start div $seqLen"),
          expr(s"(__cum - 1) div $seqLen")), "seq_id",
        col(orderCol), wcol.as("n_tokens"), col("__start"))
      .select(col(orderCol), col("n_tokens"), col("seq_id"),
        greatest(col("seq_id") * seqLen - col("__start"), lit(0L))
          .as("span_start"),
        (least((col("seq_id") + 1) * seqLen,
          col("__start") + col("n_tokens")) - col("__start"))
          .as("span_end"),
        greatest(col("__start") - col("seq_id") * seqLen, lit(0L))
          .as("seq_off"))
  }

  /** Scalable PER-GROUP rank: the grouped sibling of the
    * `partitionOffsets` skeleton. A `Window.partitionBy(group)` rank
    * collapses to #groups tasks — with 5 classes over 10¹² rows that
    * is 5 tasks doing everything. Here the data range-repartitions on
    * (group, orderCols), so a huge group SPANS many partitions; the
    * driver collects one (partition, group) count row per span
    * (metadata — ranges mean each partition holds few groups), turns
    * them into per-group running offsets, and the final rank is
    * offset + an in-partition window keyed by (partition, group).
    * Null groups rank under the sentinel key `"\u0000null"` — the
    * leading NUL sorts before any real group string AND cannot appear
    * in one (a literal group named "null" stays distinct), which is
    * what makes the coalesce collision-proof. Adds `__grank` (1-based
    * within each group, ordered by `orderCols`).
    *
    * Cache discipline: the repartitioned input persists
    * (MEMORY_AND_DISK) because the offsets collect and the returned
    * frame must see the SAME range boundaries — the `partitionOffsets`
    * contract. The pin backs the returned lazy frame and cannot be
    * released here; a long-lived session making many calls releases
    * finished pins with [[Batching.releasePins]] (or the blunter
    * `spark.catalog.clearCache()`) between batches — the same license
    * every partitionOffsets caller carries. */
  def groupedRankByRange(df: DataFrame, grpCol: String,
                         orderCols: Seq[Column],
                         numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "groupedRankByRange: no order columns")
    val keyed = df.withColumn("__grp",
      coalesce(col(grpCol).cast("string"), lit("\u0000null")))
    val sortCols = col("__grp") +: orderCols
    val parts =
      if (numPartitions > 0)
        keyed.repartitionByRange(numPartitions, sortCols: _*)
      else keyed.repartitionByRange(sortCols: _*)
    val withPid = pin(parts.withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = withPid.groupBy("__pid", "__grp")
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val offsets = counts.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      var acc = 0L
      rows.sortBy(_._1).map { case (pid, _, c) =>
        val o = (pid, g, acc); acc += c; o
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = offsets.toDF("__pid", "__grp", "__offset")
    val w = Window.partitionBy("__pid", "__grp").orderBy(orderCols: _*)
    withPid.join(broadcast(offsetDf), Seq("__pid", "__grp"))
      .withColumn("__grank", col("__offset") + row_number().over(w))
      .drop("__pid", "__grp", "__offset")
  }

  /** Halo/ghost-row skeleton for per-key ORDERED SCANS (lag, lead,
    * ±k sliding frames) whose keys are low-cardinality: a
    * `Window.partitionBy(key)` collapses to #keys tasks — 5 event
    * types over 10¹² rows is 5 tasks doing everything. Here the data
    * range-repartitions on (grpCols, orderCols) so each key SPANS
    * many partitions, and every partition's first/last `halo` rows
    * are COPIED to the neighboring partition (ghost rows, the
    * stencil-halo trick): a ROWS frame bounded by ±halo then never
    * reaches past what its partition holds, so the caller windows by
    * `(col("__hpid"), grpCols…)` instead of the bare key and filters
    * `__home` to drop the ghosts from the output.
    *
    * Driver traffic is one COUNT per partition (metadata) — used to
    * chain halo targets across empty partitions and to verify every
    * bucket holds ≥ halo rows (a bucket thinner than the halo would
    * need ghosts from 2+ buckets away; thin range partitions are
    * MERGED into a neighbor bucket by a driver-side relabel of the
    * census — `__hpid` is a logical bucket id both downstream windows
    * shuffle on, so no re-partition pass runs and one sparse tail
    * range can never collapse the whole dataset's parallelism — at
    * toy scale total < halo still means ONE bucket, which is exactly
    * the plain window).
    * Ghost rows of a key absent from the target partition are inert:
    * the window partitions by the key, the ghosts rank among
    * themselves, and `__home` filters them. Null group keys are fine
    * — no key value ever reaches the driver.
    *
    * Cost and license: the skeleton moves the data three times (the
    * range partition, a pid-keyed window for edge-row numbering — its
    * per-pid totals ride the broadcast neighbor frame, not a second
    * aggregate — and the caller's final (pid, key) window) versus ONE
    * shuffle for the plain per-key window — ~0.3–1 s fixed at toy SFs, the price of
    * key-cardinality-independent parallelism; every pass is linear
    * and fully parallel. The pinned range partitioning persists and
    * is NOT released here (the returned lazy frame depends on it) —
    * the `partitionOffsets` license: long-lived sessions call
    * [[Batching.releasePins]] (or `clearCache()`) between batches. */
  def withOrderedHalo(df: DataFrame, grpCols: Seq[Column],
                      orderCols: Seq[Column], halo: Int,
                      numPartitions: Int = 0): DataFrame = {
    require(halo > 0, s"halo must be positive, got $halo")
    require(orderCols.nonEmpty, "withOrderedHalo: no order columns")
    val sortCols = grpCols ++ orderCols
    val spark = df.sparkSession
    import spark.implicits._

    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    val withPid = pin(parts.withColumn("__hpid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // groupBy only yields pids that HOLD rows, so this is already
    // the nonempty-partition census — empty ranges simply have no
    // row here, and the neighbor map hops across them
    val counts = withPid.groupBy("__hpid").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // A bucket thinner than the halo can't donate a full ghost set to
    // its neighbor, so MERGE thin range partitions into a neighbor
    // bucket: greedy left-to-right over the census (contiguous in
    // sort order), a bucket closes once it holds >= halo rows, and a
    // thin final bucket folds back into its predecessor. This is a
    // driver-side relabel of metadata-sized counts — no re-partition
    // pass — so one sparse tail range costs one merged bucket, not a
    // repartition retry that could halve the whole dataset's
    // parallelism (the pre-round-11 behavior).
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Array[Int], Long)]
    val open = scala.collection.mutable.ArrayBuffer.empty[Int]
    var openN = 0L
    for ((p, n) <- counts) {
      open += p; openN += n
      if (openN >= halo) { merged += ((open.toArray, openN)); open.clear(); openN = 0L }
    }
    if (open.nonEmpty) {
      if (merged.nonEmpty) {
        val (ps, n) = merged.remove(merged.length - 1)
        merged += ((ps ++ open, n + openN))
      } else merged += ((open.toArray, openN))
    }
    if (merged.length < counts.length)
      System.err.println(s"[withOrderedHalo] halo=$halo: merged " +
        s"${counts.length} nonempty range partitions into ${merged.length} " +
        "buckets (thin-partition floor)")
    val base =
      if (merged.length == counts.length) withPid
      else {
        val relabel = merged.iterator.flatMap { case (ps, _) =>
          ps.iterator.map(p => (p, ps.head))
        }.toSeq.toDF("__hpid", "__gpid")
        withPid.join(broadcast(relabel), Seq("__hpid"))
          .withColumn("__hpid", col("__gpid")).drop("__gpid")
      }
    // the per-bucket total rides the broadcast neighbor frame — the
    // driver already holds it, so no second window pass over the
    // data just to find tail rows
    val groups = merged.map { case (ps, n) => (ps.head, n) }
    val gpids = groups.map(_._1)
    val nbr = groups.zipWithIndex.map { case ((p, n), i) =>
      (p, n,
        if (i > 0) gpids(i - 1) else -1,
        if (i < groups.length - 1) gpids(i + 1) else -1)
    }.toSeq.toDF("__hpid", "__n", "__prev", "__next")
    val w = Window.partitionBy("__hpid").orderBy(sortCols: _*)
    val edged = base
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(nbr), Seq("__hpid"))
    val heads = edged
      .filter(col("__rn") <= halo && col("__prev") >= 0)
      .withColumn("__hpid", col("__prev"))
    val tails = edged
      .filter(col("__n") - col("__rn") < halo && col("__next") >= 0)
      .withColumn("__hpid", col("__next"))
    edged.withColumn("__home", lit(true))
      .unionByName(heads.withColumn("__home", lit(false)))
      .unionByName(tails.withColumn("__home", lit(false)))
      .drop("__rn", "__n", "__prev", "__next")
  }

  /** Scalable twin of `globalNtile`: identical `batch` column, no
    * single-task window. `orderCol` must be a total order (unique) for
    * a deterministic result — same caveat as any rank-based batching.
    * `numPartitions` bounds the per-partition window size; the driver
    * collect is one row per partition (offsets), never data. */
  def ntileByRange(df: DataFrame, orderCol: String, n: Int,
                   numPartitions: Int = 0): DataFrame =
    ntileByRange(df, Seq(col(orderCol)), n, numPartitions)

  /** Multi-column form (descending keys allowed — repartitionByRange
    * honors the sort direction); `orderCols` together must be a total
    * order. */
  def ntileByRange(df: DataFrame, orderCols: Seq[Column], n: Int,
                   numPartitions: Int): DataFrame = {
    val (withPid, offsetDf, total) = partitionOffsets(df,
      orderCols, count(lit(1)), numPartitions)
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    withPid
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__rank", col("__offset") + row_number().over(w))
      .withColumn("batch", ntileFromRank(col("__rank"), total, n))
      .drop("__pid", "__offset", "__rank")
  }
}
