package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Interval *algebra* beyond the overlap join: island merging and
  * sweep-line coverage depth — the relational re-derivations of
  * `bedtools merge` / `bedtools genomecov`, the natural companions of
  * the reference's `bedtools intersect` centerpiece
  * (workflows/cnv.py:413-436).
  *
  * Conventions shared with [[IntervalJoin]]: intervals are half-open
  * [start, end); *bookended* intervals ([10,20) + [20,30)) merge, as
  * bedtools merge does by default.
  *
  * Scale: both ops are one shuffle (the per-key window sort); work
  * parallelizes across keys (chrom × sample in genomics, domain in a
  * corpus). Each key's pass is a streaming O(n) running max / running
  * sum inside one sorted partition — no self-join, no O(n²) expansion.
  * For a degenerate corpus with one giant key, pre-split the key by a
  * coarse position bin, merge locally, and re-run on the (tiny) set of
  * islands that touch a bin boundary.
  */
object Intervals {

  /** Merge overlapping or near-adjacent intervals per key into islands.
    *
    * An interval starts a new island when it begins more than `minGap`
    * after everything seen so far ends: `start > runningMax(end) +
    * minGap`. `minGap = 0` merges overlapping AND bookended intervals
    * (bedtools merge default); `minGap = d` replicates `-d d`.
    *
    * Output: keys + `<start>` (island min start), `<end>` (island max
    * end), `n_intervals` (merged count) — column names reuse the input
    * start/end names.
    */
  def mergeOverlaps(df: DataFrame, keys: Seq[String],
                    start: String, end: String,
                    minGap: Long = 0L): DataFrame = {
    val byPos = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(start), col(end))
    val prevMax = max(col(end)).over(
      byPos.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = df.withColumn("__new_island",
      when(prevMax.isNull || col(start) > prevMax + lit(minGap), 1L)
        .otherwise(0L))
    val islands = flagged.withColumn("__island",
      sum(col("__new_island")).over(
        byPos.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(min(col(start)).as(start), max(col(end)).as(end),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

  /** Interval complement (`bedtools complement`): the gaps BETWEEN
    * merged islands per key, bounded by the key's own span (no
    * genome-file universe: the first/last covered positions bound the
    * report, so no gap is invented outside observed coverage).
    * Collapse to islands, then one lead() per key — the gap between
    * an island's end and the next island's start. Zero-length gaps
    * (bookending islands cannot occur post-merge) are impossible by
    * construction.
    *
    * Output: keys, `gap_start` (= island end, half-open), `gap_end`
    * (= next island start). */
  def complement(df: DataFrame, keys: Seq[String],
                 start: String, end: String): DataFrame = {
    val islands = mergeOverlaps(df, keys, start, end)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(start))
    islands
      .withColumn("__next_start", lead(col(start), 1).over(w))
      .filter(col("__next_start").isNotNull)
      .select(keys.map(col) :+ col(end).as("gap_start") :+
        col("__next_start").as("gap_end"): _*)
  }

  /** Interval-set similarity (`bedtools jaccard`): intersection bp /
    * union bp between two interval sets, per key. Both sides collapse
    * to islands first; intersection bp comes from one overlap join of
    * islands, union bp = bpA + bpB − intersection. All exact longs;
    * the single ratio is one division in micro-units.
    *
    * Output per key: `bp_a`, `bp_b`, `bp_inter`, `bp_union`,
    * `jaccard_micro`. Keys present in only one side report zero
    * intersection. */
  def intervalJaccard(a: DataFrame, b: DataFrame, keys: Seq[String],
                      start: String, end: String): DataFrame = {
    val ia = mergeOverlaps(a, keys, start, end)
    val ib = mergeOverlaps(b, keys, start, end)
    def bp(df: DataFrame, name: String) =
      df.groupBy(keys.map(col): _*)
        .agg(sum(col(end) - col(start)).as(name))
    val bpA = bp(ia, "bp_a")
    val bpB = bp(ib, "bp_b")
    val ja = ia.select(keys.map(col) :+ col(start).as("__sa") :+
      col(end).as("__ea"): _*)
    val jb = ib.select(keys.map(col) :+ col(start).as("__sb") :+
      col(end).as("__eb"): _*)
    val inter = ja.join(jb, keys)
      .filter(col("__sa") < col("__eb") && col("__sb") < col("__ea"))
      .select(keys.map(col) :+
        (least(col("__ea"), col("__eb")) -
          greatest(col("__sa"), col("__sb"))).as("__bp"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__bp")).as("bp_inter"))
    bpA.join(bpB, keys.toSeq, "full_outer")
      .join(inter, keys.toSeq, "left")
      .select(keys.map(col) :+
        coalesce(col("bp_a"), lit(0L)).as("bp_a") :+
        coalesce(col("bp_b"), lit(0L)).as("bp_b") :+
        coalesce(col("bp_inter"), lit(0L)).as("bp_inter"): _*)
      .withColumn("bp_union",
        col("bp_a") + col("bp_b") - col("bp_inter"))
      .withColumn("jaccard_micro",
        when(col("bp_union") === 0, lit(0L)).otherwise(
          round(col("bp_inter").cast("double") /
            col("bp_union").cast("double") * 1e6).cast("long")))
  }

  /** Interval subtraction (`bedtools subtract`): the fragments of each
    * A interval left after carving out everything B covers.
    *
    * B is first collapsed to disjoint islands (so fragments are
    * computed against at most one covering run at a time), then one
    * overlap join + one per-A window produce the between-island
    * fragments, a groupBy produces each A's tail fragment, and an
    * anti join passes untouched A rows through whole. A rows fully
    * covered by B vanish. `aId` must identify A rows uniquely.
    *
    * Output: aId + keys + `sub_start`, `sub_end`.
    */
  def subtract(a: DataFrame, b: DataFrame, keys: Seq[String], aId: String,
               aStart: String, aEnd: String,
               bStart: String, bEnd: String): DataFrame = {
    val kc = keys.map(col)
    // island keys renamed so the join output has ONE copy of each key
    val islands = mergeOverlaps(b, keys, bStart, bEnd)
      .select(keys.map(k => col(k).as(s"__k_$k")) :+
        col(bStart).as("__is") :+ col(bEnd).as("__ie"): _*)
    val cond = (keys.map(k => a(k) === islands(s"__k_$k")) :+
      (a(aStart) < islands("__ie")) :+
      (islands("__is") < a(aEnd))).reduce(_ && _)
    val pairs = a.join(islands, cond)
      .select(a.columns.map(a(_)).toSeq :+
        islands("__is") :+ islands("__ie"): _*)
    val w = Window.partitionBy(col(aId)).orderBy(col("__is"))
    val seq = pairs.withColumn("__prev", lag(col("__ie"), 1).over(w))
    val between = seq.select(col(aId) +: kc :+
        greatest(col(aStart), coalesce(col("__prev"), col(aStart)))
          .as("sub_start") :+
        least(col(aEnd), col("__is")).as("sub_end"): _*)
      .filter(col("sub_start") < col("sub_end"))
    val tails = seq.groupBy(col(aId) +: kc :+ col(aStart) :+ col(aEnd): _*)
      .agg(max(col("__ie")).as("__last"))
      .select(col(aId) +: kc :+
        greatest(col(aStart), col("__last")).as("sub_start") :+
        col(aEnd).as("sub_end"): _*)
      .filter(col("sub_start") < col("sub_end"))
    val untouched = a.join(islands, cond, "left_anti")
      .select(col(aId) +: kc :+ col(aStart).as("sub_start") :+
        col(aEnd).as("sub_end"): _*)
    between.unionByName(tails).unionByName(untouched)
  }

  /** Closest B interval per A interval (`bedtools closest`): distance
    * 0 for overlap or bookended adjacency, else the gap length; ties
    * break to the smallest B id. Left-outer: A rows whose key has no
    * B at all keep a null neighbor.
    *
    * Scale shape: NOT a per-key cross join. The two disjoint
    * directions each reduce to an as-of alignment (nearest preceding
    * B end / nearest following B start — one shuffle each, state one
    * row per key in the union-sort form). The overlap leg is the
    * BINNED join (work distributes over key×bin, not one task per
    * key) and collapses to min(bId) per A row in the same stage —
    * partial aggregation eats the pair fan-out map-side, so no
    * enumerated pair ever crosses a shuffle. The final pick is a
    * lexicographic `min(struct(dist, bid))` hash aggregation over at
    * most three candidate rows per A — no row_number window, no
    * per-partition sort of the pair explosion (at 10× SF the old
    * window form single-threaded a TimSort over ~10⁸ pairs).
    * Equal-boundary B rows are pre-reduced to their smallest id so
    * every leg is deterministic.
    */
  def closest(a: DataFrame, b: DataFrame, keys: Seq[String],
              aId: String, aStart: String, aEnd: String,
              bId: String, bStart: String, bEnd: String,
              binWidth: Long = 1000000L): DataFrame =
    closestImpl(a, b, keys, aId, aStart, aEnd, bId, bStart, bEnd,
      binWidth,
      (l, r, k, t, p) => AsOfJoin.backward(l, r, k, t, p),
      (l, r, k, t, p) => AsOfJoin.forward(l, r, k, t, p))

  /** Range-partitioned twin of [[closest]] for LOW-CARDINALITY keys:
    * the overlap leg already distributes over key×bin, but the two
    * as-of legs window by key, so 23 chromosomes cap their sorts at 23
    * tasks regardless of cluster size — at sf100 the as-of legs are
    * the row's bottleneck. This twin routes them through
    * [[AsOfJoin.backwardByRange]]/[[AsOfJoin.forwardByRange]]
    * (parallelism tracks the partition count, not #keys). Identical
    * output (the twins are bitwise parity-pinned in AsOfJoinSpec;
    * IntervalJoinSpec's randomized closestByRange parity test pins
    * this composition against [[closest]]). Costs
    * two pinned caches — release via [[Batching.releasePins]] between
    * batches; at ≥ #threads keys prefer [[closest]]. */
  def closestByRange(a: DataFrame, b: DataFrame, keys: Seq[String],
                     aId: String, aStart: String, aEnd: String,
                     bId: String, bStart: String, bEnd: String,
                     binWidth: Long = 1000000L,
                     numPartitions: Int = 0): DataFrame =
    closestImpl(a, b, keys, aId, aStart, aEnd, bId, bStart, bEnd,
      binWidth,
      (l, r, k, t, p) =>
        AsOfJoin.backwardByRange(l, r, k, t, p, numPartitions = numPartitions),
      (l, r, k, t, p) =>
        AsOfJoin.forwardByRange(l, r, k, t, p, numPartitions = numPartitions))

  private def closestImpl(
      a: DataFrame, b: DataFrame, keys: Seq[String],
      aId: String, aStart: String, aEnd: String,
      bId: String, bStart: String, bEnd: String, binWidth: Long,
      asofBack: (DataFrame, DataFrame, Seq[String], String, Seq[String]) => DataFrame,
      asofFwd: (DataFrame, DataFrame, Seq[String], String, Seq[String]) => DataFrame)
      : DataFrame = {
    val kc = keys.map(col)
    val overlapLeg = IntervalJoin.overlapBinned(a, b, keys,
      aStart, aEnd, bStart, bEnd, binWidth = binWidth)
      .groupBy(col(aId))
      .agg(min(col(bId)).as("__bid"))
      .select(col(aId), col("__bid"), lit(0L).as("dist"))
    // nearest preceding: max bEnd <= aStart. Equal-boundary B rows
    // collapse to min bId BEFORE the as-of so the pick is total; the
    // boundary rides along as payload for the distance arithmetic.
    val bBack = b.groupBy((kc :+ col(bEnd).as("__t")): _*)
      .agg(min(col(bId)).as("__bid_r"))
      .withColumn("__bt_r", col("__t"))
    val back = asofBack(
      a.select((kc :+ col(aId) :+ col(aStart).as("__t")): _*),
      bBack, keys, "__t", Seq("__bid_r", "__bt_r"))
      .filter(col("__bid_r").isNotNull)
      .select(col(aId), col("__bid_r").as("__bid"),
        (col("__t") - col("__bt_r")).as("dist"))
    // nearest following: min bStart >= aEnd
    val bFwd = b.groupBy((kc :+ col(bStart).as("__t")): _*)
      .agg(min(col(bId)).as("__bid_r"))
      .withColumn("__bt_r", col("__t"))
    val fwd = asofFwd(
      a.select((kc :+ col(aId) :+ col(aEnd).as("__t")): _*),
      bFwd, keys, "__t", Seq("__bid_r", "__bt_r"))
      .filter(col("__bid_r").isNotNull)
      .select(col(aId), col("__bid_r").as("__bid"),
        (col("__bt_r") - col("__t")).as("dist"))
    val legs = overlapLeg.unionByName(back).unionByName(fwd)
    // struct min = (dist asc, bid asc) lexicographic — the tie-break,
    // as one partially-aggregating hash agg instead of a sort window
    val best = legs.groupBy(col(aId))
      .agg(min(struct(col("dist"), col("__bid"))).as("__best"))
      .select(col(aId), col("__best").getField("__bid").as("closest_id"),
        col("__best").getField("dist").as("dist"))
    a.select(col(aId)).join(best, Seq(aId), "left")
  }

  /** Sweep-line coverage depth: for each key, the segments of constant
    * positive depth (how many intervals cover each base).
    *
    * Physical shape: intervals become ±1 events; coincident events
    * collapse in a partial-aggregating groupBy (so a million reads
    * starting at one hotspot position cost one row in the window sort,
    * not a million); one per-key window computes the running depth and
    * each segment's extent to the next event.
    *
    * Output: keys + `d_start`, `d_end`, `depth` (> 0 only; zero-depth
    * gaps are the complement and carry no information at corpus scale).
    */
  def coverageDepth(df: DataFrame, keys: Seq[String],
                    start: String, end: String): DataFrame = {
    val kc = keys.map(col)
    val events =
      df.select((kc :+ col(start).as("__pos") :+ lit(1L).as("__delta")): _*)
        .unionByName(
          df.select((kc :+ col(end).as("__pos") :+ lit(-1L).as("__delta")): _*))
    val collapsed = events.groupBy((kc :+ col("__pos")): _*)
      .agg(sum(col("__delta")).as("__d"))
    val byPos = Window.partitionBy(kc: _*).orderBy(col("__pos"))
    collapsed
      .withColumn("depth", sum(col("__d"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__next", lead(col("__pos"), 1).over(byPos))
      .filter(col("__next").isNotNull && col("depth") > 0)
      .select((kc :+ col("__pos").as("d_start") :+
        col("__next").as("d_end") :+ col("depth")): _*)
  }

  /** Range-partitioned census shared by the ByRange sweeps below:
    * range-repartition on (keys..., orderCols...), pin the
    * partitioning (same persist license as `Batching.withOrderedHalo`
    * — the census job and the caller's final plan must see identical
    * partition boundaries), and collect one row per (partition, key
    * group) with the requested aggregates. Range partitions are
    * CONTIGUOUS in key order, so the census holds at most
    * #partitions + #keyGroups rows — metadata, never data. */
  private def keyedRangeCensus(df: DataFrame, keys: Seq[String],
      orderCols: Seq[Column], aggs: Seq[Column],
      numPartitions: Int): (DataFrame, Array[Row]) = {
    val sortCols = keys.map(col) ++ orderCols
    val parts =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    val withPid = Batching.pin(
      parts.withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val census = withPid.groupBy((col("__pid") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*).collect()
    (withPid, census)
  }

  /** Per-key EXCLUSIVE prefix fold of the census (pids in ascending
    * order within each key group): returns one row per census row,
    * `__pid :: keyValues :: folded-prefix-state`, where `fold` maps
    * (accumulated state, census row, has-next-row's-extra) — the
    * driver-side half of the offsets skeleton. */
  private def censusOffsets(census: Array[Row], nKeys: Int)(
      fold: Seq[Row] => Seq[Seq[Any]]): Seq[Row] =
    census.groupBy(r => (1 to nKeys).map(r.get(_).asInstanceOf[AnyRef]))
      .toSeq.flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_.getInt(0))
        fold(sorted.toSeq).zip(sorted).map { case (state, r) =>
          Row.fromSeq(r.toSeq.take(nKeys + 1) ++ state) }
      }

  /** `coverageDepth`, range-partitioned: the scale twin for
    * low-cardinality keys (chrom-keyed sweeps collapse to #chroms
    * tasks in the plain form — 23 tasks for a whole-genome corpus no
    * matter the cluster). The collapsed event frame range-partitions
    * on (keys, pos); per-(partition, key) sums and first positions
    * collect as metadata; each key's running depth then offsets by
    * the preceding partitions' total, and the segment extent at a
    * partition tail chains to the NEXT partition's first position for
    * that key (no ghost rows needed — the lead is exactly one value,
    * which the census already holds). Bitwise-equal to
    * `coverageDepth` (IntervalJoinSpec pins it); parallelism =
    * #partitions, not #keys.
    *
    * ADOPTION CONTRACT: flip to this form when cluster parallelism
    * exceeds #keys by a wide margin. It pays a range-sample pass, a
    * cache write (pin license: `Batching.releasePins()` between
    * batches) and one extra exchange — measured at sf10/local[32]
    * (23 chroms ≈ 32 threads, nothing to reclaim) the plain sweep
    * wins (9.8 s vs 11.8 s), which is why the bench rows keep it; at
    * 1000 executors the plain form is a 23-task wall and this one
    * scales with the cluster. */
  def coverageDepthByRange(df: DataFrame, keys: Seq[String],
                           start: String, end: String,
                           numPartitions: Int = 0): DataFrame = {
    val kc = keys.map(col)
    val events =
      df.select((kc :+ col(start).as("__pos") :+ lit(1L).as("__delta")): _*)
        .unionByName(
          df.select((kc :+ col(end).as("__pos") :+ lit(-1L).as("__delta")): _*))
    val collapsed = events.groupBy((kc :+ col("__pos")): _*)
      .agg(sum(col("__delta")).as("__d"))
    val (withPid, census) = keyedRangeCensus(collapsed, keys,
      Seq(col("__pos")),
      Seq(sum(col("__d")).as("__s"), min(col("__pos")).as("__first")),
      numPartitions)
    val n = keys.length
    // state per census row: (depth offset, next partition's first pos)
    val offRows = censusOffsets(census, n) { sorted =>
      var acc = 0L
      sorted.zipWithIndex.map { case (r, i) =>
        val off = acc
        acc += r.getLong(n + 1)
        val nextFirst: Any =
          if (i + 1 < sorted.length) sorted(i + 1).get(n + 2) else null
        Seq[Any](off, nextFirst)
      }
    }
    val spark = df.sparkSession
    val posType = withPid.schema("__pos").dataType
    val offSchema = StructType(
      StructField("__pid", IntegerType, nullable = false) +:
        keys.map(k => withPid.schema(k)) ++:
        Seq(StructField("__offset", LongType, nullable = false),
          StructField("__next_first", posType, nullable = true)))
    val offsetDf = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(offRows).asJava),
      offSchema)
    val w = Window.partitionBy((col("__pid") +: kc): _*).orderBy(col("__pos"))
    withPid.join(broadcast(offsetDf), "__pid" +: keys)
      .withColumn("depth", col("__offset") +
        sum(col("__d")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__next",
        coalesce(lead(col("__pos"), 1).over(w), col("__next_first")))
      .filter(col("__next").isNotNull && col("depth") > 0)
      .select((kc :+ col("__pos").as("d_start") :+
        col("__next").as("d_end") :+ col("depth")): _*)
  }

  /** `mergeOverlaps`, range-partitioned — same scale rationale as
    * [[coverageDepthByRange]]. Two census passes over one pinned
    * range partitioning: (1) per-(partition, key) max end → each
    * partition's rows see the true preceding running max as
    * `greatest(local window max, prior partitions' max)`; (2) the
    * island-start flags (computable after pass 1) sum per
    * (partition, key) → each partition's island ids offset by the
    * flags before it. Island aggregation is then a plain hash
    * aggregation on (keys, island id) — balanced, not per-key.
    * Bitwise-equal to `mergeOverlaps` (IntervalJoinSpec pins it).
    * Same adoption contract as [[coverageDepthByRange]]: the flag
    * window runs twice (census + final plan, against the pinned
    * cache), so at toy parallelism the plain one-exchange form wins —
    * flip only when #keys caps the cluster. */
  def mergeOverlapsByRange(df: DataFrame, keys: Seq[String],
                           start: String, end: String,
                           minGap: Long = 0L,
                           numPartitions: Int = 0): DataFrame = {
    val kc = keys.map(col)
    val (withPid, census) = keyedRangeCensus(df, keys,
      Seq(col(start), col(end)),
      Seq(max(col(end)).as("__maxend")), numPartitions)
    val n = keys.length
    val endType = withPid.schema(end).dataType
    // exclusive running MAX of end per key across partitions
    val maxRows = censusOffsets(census, n) { sorted =>
      var acc: Any = null
      sorted.map { r =>
        val prior = acc
        val m = r.get(n + 1)
        if (acc == null) acc = m
        else if (m != null &&
          m.asInstanceOf[Comparable[Any]].compareTo(acc) > 0) acc = m
        Seq[Any](prior)
      }
    }
    val spark = df.sparkSession
    def offDf(rows: Seq[Row], name: String,
              tpe: org.apache.spark.sql.types.DataType,
              nullable: Boolean) =
      spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(
          StructField("__pid", IntegerType, nullable = false) +:
            keys.map(k => withPid.schema(k)) ++:
            Seq(StructField(name, tpe, nullable = nullable))))
    val w = Window.partitionBy((col("__pid") +: kc): _*)
      .orderBy(col(start), col(end))
    val prevLocal = max(col(end)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    // greatest() skips nulls, so a key's very first row (both null)
    // stays null — the island-start condition, as in the plain form
    val flagged = withPid
      .join(broadcast(offDf(maxRows, "__pmax", endType, nullable = true)),
        "__pid" +: keys)
      .withColumn("__prev_max", greatest(prevLocal, col("__pmax")))
      .withColumn("__new_island",
        when(col("__prev_max").isNull ||
          col(start) > col("__prev_max") + lit(minGap), 1L).otherwise(0L))
    // pass 2: island-id offsets = exclusive prefix sum of flag counts
    val flagCensus = flagged.groupBy((col("__pid") +: kc): _*)
      .agg(sum(col("__new_island")).as("__f")).collect()
    val ioffRows = censusOffsets(flagCensus, n) { sorted =>
      var acc = 0L
      sorted.map { r => val o = acc; acc += r.getLong(n + 1); Seq[Any](o) }
    }
    flagged
      .join(broadcast(offDf(ioffRows, "__ioff", LongType, nullable = false)),
        "__pid" +: keys)
      .withColumn("__island", col("__ioff") + sum(col("__new_island"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((kc :+ col("__island")): _*)
      .agg(min(col(start)).as(start), max(col(end)).as(end),
        count(lit(1)).as("n_intervals"))
      .drop("__island")
  }

}
