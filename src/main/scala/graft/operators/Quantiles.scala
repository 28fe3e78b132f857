package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Exact global order statistics without `percentile`'s buffers.
  *
  * Spark's exact `percentile` holds a per-partition map of DISTINCT
  * values — near-unique columns (l_extendedprice-shaped) buffer the
  * whole partition, and the single final merge re-sorts every distinct
  * value on one task. This engine computes the same order statistics
  * by RADIX SEARCH instead: four histogram passes over the
  * order-preserving bit image of the column (`plans.DoubleOrderBits`),
  * each narrowing every requested rank to a 16-bit-finer prefix range.
  * State per pass is ≤ 65536 counts per (column, target) — KBs at any
  * corpus size — every pass is a codegen'd map-side-combining
  * aggregation, and nothing is ever sorted or collected beyond those
  * histograms: the final 64-bit prefix IS the value.
  *
  * All requested columns and fractions ride the SAME four scans (the
  * histograms are tagged by column index), so a 7-column profile costs
  * 4 scans total, not 28.
  *
  * Parity: Spark's `Percentile.getPercentile` semantics are replicated
  * branch-for-branch — position = p·(n−1) on the null-filtered count,
  * the floor/ceil order statistics, the two no-interpolation
  * short-circuits (integral position; numerically equal boundary
  * keys, so a −0.0/+0.0 straddle returns the lower key), and
  * the `(higher−position)·lo + (position−lower)·hi` interpolation in
  * that exact IEEE evaluation order (QuantilesSpec pins equality
  * against `expr("percentile(...)")` on adversarial data). Values are
  * compared through their double image, so int/long/float columns
  * match `percentile` for magnitudes below 2^53 (the double-exact
  * range); NaN sorts above +Inf and −0.0 below +0.0, as in
  * `java.lang.Double.compare`.
  */
object Quantiles {

  /** Unsigned-comparable bit image: prefix ranges are value ranges. */
  private def uimg(c: Column): Column =
    ColumnBridge.column(graft.plans.DoubleOrderBits(
        ColumnBridge.expression(c.cast("double"))))
      .bitwiseXOR(lit(Long.MinValue))

  private def fromU(u: Long): Double = {
    val s = u ^ Long.MinValue
    java.lang.Double.longBitsToDouble(
      if (s >= 0) s else s ^ Long.MaxValue)
  }

  /** Exact quantiles for several (column, fractions) requests in four
    * shared scans. Returns, per column, the values in request order —
    * `None` when the column has no non-null rows (matching
    * `percentile`'s null). EAGER: runs the histogram jobs when called
    * (the `Profile.psi` contract — compute-then-use operators run
    * their metadata jobs up front). */
  def exactQuantiles(df: DataFrame,
                     colPs: Seq[(String, Seq[Double])],
                     pin: Boolean = false)
      : Map[String, Seq[Option[Double]]] = {
    require(colPs.nonEmpty, "no quantile requests")
    colPs.foreach { case (c, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
        s"fractions out of [0,1] for $c: $ps") }
    // INPUT LICENSE: the refinement assumes bit-identical data across
    // its four separate jobs — a value that moves between passes
    // leaves a rank pointing at a prefix the finer histograms never
    // saw (NoSuchElementException at best, a shifted rank at worst).
    // Re-reading a static source (parquet snapshot, cached frame, any
    // deterministic lineage — every caller in this repo) satisfies
    // it. Over a VOLATILE source (concurrently-appended table,
    // nondeterministic upstream like rand()), set `pin = true`: the
    // projected columns persist for the duration and release before
    // returning. Not the default because the cache write costs more
    // than the re-scans it saves on cheap columnar sources (measured
    // 3× on the tagged-union drift at sf10).
    if (pin) {
      val src = df.select(colPs.map(_._1).distinct.map(col): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try exactQuantilesOn(src, colPs)
      finally { src.unpersist(); () }
    } else exactQuantilesOn(df, colPs)
  }

  private def exactQuantilesOn(df: DataFrame,
                               colPs: Seq[(String, Seq[Double])])
      : Map[String, Seq[Option[Double]]] = {
    val names = colPs.map(_._1)

    // pass 0: top-16-bit histogram per column (also yields n per col)
    var hist = histogramPass(df, names.zipWithIndex.map { case (c, i) =>
      (i, shiftrightunsigned(uimg(col(c)), 48), None) })
    val nByCol = hist.groupBy(_._1).map { case (i, rs) =>
      i -> rs.map(_._3).sum }

    // ranks (0-based order-statistic indices) per column: floor and
    // ceil of every position p·(n−1)
    val ranks: Seq[(Int, Seq[Long])] = colPs.zipWithIndex.map {
      case ((_, ps), i) =>
        val n = nByCol.getOrElse(i, 0L)
        i -> (if (n == 0L) Seq.empty[Long]
              else ps.flatMap { p =>
                val pos = p * (n - 1)
                Seq(math.floor(pos).toLong, math.ceil(pos).toLong)
              }.distinct.sorted)
    }

    // narrow each rank to its bucket, up to three refinements deep —
    // ADAPTIVELY (optimization round 16, guide §1.2 "remove passes"):
    // once every surviving target bucket is small (the total rows
    // under all located buckets ≤ `terminalRows`), ONE terminal pass
    // histograms the FULL 64-bit image inside those buckets instead
    // of walking the remaining 16-bit levels — the located "prefix"
    // is then the exact value immediately. State stays bounded: the
    // terminal histogram holds ≤ one entry per distinct value under
    // the surviving buckets ≤ terminalRows (512K) — same KB-to-MB
    // class as the 65536-bucket levels, at any corpus size. Typical
    // pass counts: 2 at sf0.1 (was 4), 3 at sf10, ≤4 always (the
    // worst case is the old fixed ladder, bit-for-bit). Parity is
    // unchanged — the terminal locate walks the same cumulative
    // counts the remaining levels would have walked, pinned by
    // QuantilesSpec against `percentile`.
    var located: Map[(Int, Long), (Long, Long)] = locate(hist, ranks)
    val terminalRows = 1L << 19
    var shiftPrev = 48 // current prefix granularity (bits shifted out)
    var done = false
    while (!done && shiftPrev > 0) {
      val byKey = hist.map(t => ((t._1, t._2), t._3)).toMap
      val surviving = ranks.flatMap { case (i, rs) =>
        rs.flatMap(r => located.get((i, r)).map(p => (i, p._1))) }.distinct
      val rowsUnder = surviving.map(byKey.getOrElse(_, 0L)).sum
      val shift = if (rowsUnder <= terminalRows) 0 else shiftPrev - 16
      val specs = names.zipWithIndex.flatMap { case (c, i) =>
        val prefixes = ranks.find(_._1 == i).get._2
          .flatMap(r => located.get((i, r))).map(_._1).distinct
        if (prefixes.isEmpty) None
        else {
          val u = uimg(col(c))
          val inPrev = shiftrightunsigned(u, shiftPrev)
            .isin(prefixes.map(java.lang.Long.valueOf): _*)
          Some((i, when(inPrev,
            if (shift == 0) u else shiftrightunsigned(u, shift)), Some(())))
        }
      }
      if (specs.nonEmpty) {
        hist = histogramPass(df, specs)
        located = refine(hist, ranks, located, deltaBits = shiftPrev - shift)
      }
      done = specs.isEmpty || shift == 0
      shiftPrev = shift
    }

    // assemble: located at level 3 maps each rank to its exact image
    colPs.zipWithIndex.map { case ((c, ps), i) =>
      val n = nByCol.getOrElse(i, 0L)
      c -> ps.map { p =>
        if (n == 0L) None
        else {
          val pos = p * (n - 1)
          val lower = math.floor(pos).toLong
          val higher = math.ceil(pos).toLong
          val lowerVal = fromU(located((i, lower))._1)
          if (higher == lower) Some(lowerVal)
          else {
            val higherVal = fromU(located((i, higher))._1)
            // Percentile's boundary short-circuit compares the KEYS
            // numerically (`higherKey == lowerKey`), so −0.0 == +0.0
            // returns the lower key (−0.0), never interpolating
            if (higherVal == lowerVal) Some(lowerVal)
            else Some((higher - pos) * lowerVal + (pos - lower) * higherVal)
          }
        }
      }
    }.toMap
  }

  /** Null-safe multi-key equi-join: right-side key columns are renamed
    * to positional aliases so self-join lineage (both sides derived
    * from the same checkpointed histogram) never hits attribute
    * ambiguity, and `<=>` keeps null group keys matched — `groupBy`
    * treats null as a group, so the engine must too. */
  private def joinNS(l: DataFrame, r: DataFrame, keys: Seq[String],
                     joinType: String = "inner"): DataFrame = {
    val rr = keys.zipWithIndex.foldLeft(r) { case (d, (k, i)) =>
      d.withColumnRenamed(k, s"__jk$i") }
    val cond = keys.zipWithIndex.map { case (k, i) =>
      l(k) <=> rr(s"__jk$i") }.reduce(_ && _)
    l.join(rr, cond, joinType).drop(keys.indices.map(i => s"__jk$i"): _*)
  }

  /** Per-GROUP exact order statistics — [[exactQuantiles]] with a group
    * key, fully RELATIONAL: histograms key by (group, bucket), rank
    * location and refinement are joins over those bounded histogram
    * frames, and no per-group value state ever reaches the driver.
    * This removes `percentile`'s per-group distinct-value buffers (the
    * documented swap-to-approx-past-~10⁷-distincts caveat) the same
    * way the global engine removed the single-reducer merge.
    *
    * Shape per level: one corpus scan joined (broadcast) against the
    * surviving (group, prefix) set, one (group, bucket) hash
    * aggregation, one window over the histogram frame (≤ 65536 rows
    * per (group, prefix) — metadata, not data). Four corpus scans
    * total, shared by ALL requested fractions.
    *
    * LICENSES: (a) the survivors frame (≤ groups × 2·fractions rows)
    * is broadcast at each refinement level — group cardinality up to
    * ~10⁶ is fine, beyond that the hint itself is the limit. The
    * license is now CHECKED, not assumed (r13 verdict #5): the group
    * count is read off the already-materialized pass-0 histogram (one
    * metadata-sized job, no extra corpus scan), and past
    * `maxBroadcastGroups` every metadata join falls back to the
    * UNHINTED plan (shuffled joins — slower, never a driver OOM),
    * with a stderr note. Adversarial test in QuantilesSpec pins both
    * the fallback plan (no BroadcastExchange) and its results;
    * (b) the
    * engine's input license, four scans over bit-identical data
    * (`exactQuantiles` scaladoc). ADOPTION CONTRACT (the ByRange-twin
    * discipline): this engine wins when per-group value sets are WIDE
    * (latency tables over few event types); for MANY small groups
    * (per-user gap multisets) plain hash-agg `percentile` is the
    * right plan — its buffers are tiny and it scans once, not four
    * times. `Profile.groupedPercentiles` exposes both as `engine`.
    *
    * EAGER: each refinement level `localCheckpoint`s its located-rank
    * frame (bounded), cutting the ×2-per-level lineage growth — the
    * psi contract; blocks are node-local, re-call on executor loss.
    *
    * Output: one row per group — group cols ++ one double column per
    * (label, fraction), unrounded; all-null groups emit nulls, exactly
    * like `percentile`. Interpolation parity is branch-for-branch with
    * `Percentile` (floor/ceil order statistics, the integral-position
    * and equal-boundary short-circuits, `(hi−pos)·lo + (pos−lo)·hi` in
    * that IEEE order) — pinned in QuantilesSpec. */
  def groupedExactQuantiles(df: DataFrame, groupCols: Seq[String],
                            valueCol: String,
                            labeled: Seq[(String, Double)],
                            maxBroadcastGroups: Long = 1000000L): DataFrame = {
    require(groupCols.nonEmpty, "no group columns")
    require(labeled.nonEmpty &&
      labeled.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      s"fractions out of [0,1]: $labeled")
    require(labeled.map(_._1).distinct.size == labeled.size,
      s"duplicate labels: ${labeled.map(_._1)}")
    val g = groupCols.map(col)
    val u = uimg(col(valueCol))
    def ckpt(d: DataFrame): DataFrame = d.localCheckpoint(true)

    // pass 0: (group, top-16-bit bucket, count); the null-bucket rows
    // keep all-null groups in the spine
    val h0 = ckpt(df
      .groupBy((g :+ shiftrightunsigned(u, 48).as("__bk")): _*)
      .agg(count(lit(1)).as("__c")))
    val spine = h0.select(g: _*).distinct()
    val n = h0.filter(col("__bk").isNotNull)
      .groupBy(g: _*).agg(sum("__c").as("__n"))

    // broadcast-license guard: count groups off the CHECKPOINTED
    // pass-0 histogram (metadata-sized job over materialized blocks,
    // no extra corpus scan); past the license, drop the hints — the
    // metadata joins plan shuffled instead of OOMing the driver.
    // Two-tier: h0's plain row count (leaf count, no shuffle) upper-
    // bounds the group count — only when even THAT exceeds the
    // license is the exact distinct (one metadata shuffle) computed
    // (the r14 sf0.1 diff measured the unconditional distinct at
    // ~+0.4 s per call on toy data; the common under-license case
    // should not pay it)
    val nGroups = {
      val h0Rows = h0.count()
      if (h0Rows <= maxBroadcastGroups) h0Rows else spine.count()
    }
    val hinted = nGroups <= maxBroadcastGroups
    if (!hinted) System.err.println(
      s"[groupedExactQuantiles] $nGroups groups > maxBroadcastGroups=" +
        s"$maxBroadcastGroups: metadata joins fall back to unhinted plans")
    def bhint(d: DataFrame): DataFrame = if (hinted) broadcast(d) else d

    // 0-based order-statistic targets per group: floor and ceil of
    // every position p·(n−1), deduplicated
    val targets = n
      .select(g :+ col("__n") :+ explode(array(
        labeled.map { case (_, p) => lit(p) }: _*)).as("__p"): _*)
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .select(g :+ explode(array(floor(col("__pos")).cast("long"),
        ceil(col("__pos")).cast("long"))).as("__r"): _*)
      .distinct()

    // locate level 0: walk each group's cumulative histogram to the
    // bucket holding each rank — as a join, not a driver loop. The
    // checkpointed frames carry no stats, so without hints these
    // metadata-sized joins plan as SortMergeJoins; the targets/located
    // side is ≤ groups × 2·fractions rows BY CONSTRUCTION (the same
    // broadcast license as the survivors), so it is hinted explicitly
    val w0 = Window.partitionBy(g: _*).orderBy("__bk")
    val cum0 = h0.filter(col("__bk").isNotNull)
      .withColumn("__below", sum("__c").over(w0) - col("__c"))
    var loc = ckpt(joinNS(bhint(targets), cum0, groupCols)
      .filter(col("__r") >= col("__below") &&
        col("__r") < col("__below") + col("__c"))
      .select(g :+ col("__r") :+ col("__bk").as("__pfx") :+
        col("__below"): _*))

    // three refinements, 16 bits finer each: after level 3 the prefix
    // IS the full 64-bit order image
    for (level <- 1 to 3) {
      val shift = 48 - 16 * level
      val surv = loc.select(g :+ col("__pfx").as("__ppfx"): _*).distinct()
      val hk = joinNS(
        df.select(g :+ shiftrightunsigned(u, shift + 16).as("__ppfx") :+
          shiftrightunsigned(u, shift).as("__bk"): _*),
        bhint(surv), groupCols :+ "__ppfx")
        .groupBy((g :+ col("__ppfx") :+ col("__bk")): _*)
        .agg(count(lit(1)).as("__c"))
      val wk = Window.partitionBy((g :+ col("__ppfx")): _*).orderBy("__bk")
      val cumk = hk.withColumn("__blocal", sum("__c").over(wk) - col("__c"))
      loc = ckpt(joinNS(bhint(loc.withColumnRenamed("__pfx", "__ppfx")),
          cumk, groupCols :+ "__ppfx")
        .filter(col("__r") >= col("__below") + col("__blocal") &&
          col("__r") < col("__below") + col("__blocal") + col("__c"))
        .select(g :+ col("__r") :+ col("__bk").as("__pfx") :+
          (col("__below") + col("__blocal")).as("__below"): _*))
    }

    // image -> value: unflip the order transform (self-inverse long
    // arithmetic), then reinterpret the raw bits
    val s = col("__pfx").bitwiseXOR(lit(Long.MinValue))
    val rawBits = when(s >= 0, s).otherwise(s.bitwiseXOR(lit(Long.MaxValue)))
    val vals = loc.select(g :+ col("__r") :+
      ColumnBridge.column(graft.plans.DoubleFromBits(
        ColumnBridge.expression(rawBits))).as("__v"): _*)

    // interpolate per (group, fraction), Percentile-branch parity
    val withPos = n
      .select(g :+ col("__n") :+ posexplode(array(
        labeled.map { case (_, p) => lit(p) }: _*)): _*)
      .withColumnRenamed("pos", "__pi").withColumnRenamed("col", "__p")
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    val vlo = vals.withColumnRenamed("__r", "__lo")
      .withColumnRenamed("__v", "__vlo")
    val vhi = vals.withColumnRenamed("__r", "__hi")
      .withColumnRenamed("__v", "__vhi")
    val scored = joinNS(joinNS(withPos, bhint(vlo), groupCols :+ "__lo"),
        bhint(vhi), groupCols :+ "__hi")
      .withColumn("__val",
        when(col("__hi") === col("__lo") ||
            col("__vhi") === col("__vlo"), col("__vlo"))
          .otherwise(
            (col("__hi").cast("double") - col("__pos")) * col("__vlo") +
              (col("__pos") - col("__lo").cast("double")) * col("__vhi")))
    val wideAggs = labeled.zipWithIndex.map { case ((lab, _), i) =>
      max(when(col("__pi") === i, col("__val"))).as(lab) }
    val wide = scored.groupBy(g: _*).agg(wideAggs.head, wideAggs.tail: _*)
    joinNS(spine, bhint(wide), groupCols, "left")
      .select((g ++ labeled.map(l => col(l._1))): _*)
  }

  /** One shared histogram scan: each spec contributes (colIdx, bucket
    * expr — null for rows outside the spec's range or null values).
    * Returns (colIdx, bucket, count) rows, collected (bounded: ≤
    * 65536 per surviving prefix). */
  private def histogramPass(df: DataFrame,
      specs: Seq[(Int, Column, Option[Unit])]): Seq[(Int, Long, Long)] = {
    val tagged = specs.map { case (i, bkt, _) =>
      struct(lit(i).as("ci"), bkt.as("bk")) }
    df.select(explode(array(tagged: _*)).as("t"))
      .filter(col("t.bk").isNotNull)
      .groupBy(col("t.ci").as("ci"), col("t.bk").as("bk"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
  }

  /** Walk each column's sorted level-0 histogram to the bucket holding
    * each rank. */
  private def locate(hist: Seq[(Int, Long, Long)],
      ranks: Seq[(Int, Seq[Long])]): Map[(Int, Long), (Long, Long)] = {
    val byCol = hist.groupBy(_._1).map { case (i, rs) =>
      i -> rs.map(t => (t._2, t._3)).sortBy(_._1) }
    ranks.flatMap { case (i, rs) =>
      val buckets = byCol.getOrElse(i, Seq.empty)
      rs.map { r =>
        var cum = 0L
        var found: (Long, Long) = null
        val it = buckets.iterator
        while (found == null && it.hasNext) {
          val (bk, c) = it.next()
          if (r < cum + c) found = (bk, cum) else cum += c
        }
        (i, r) -> found
      }
    }.toMap
  }

  /** Refinement step: the new histogram's buckets are `deltaBits`
    * finer (16 for a ladder level, up to 48 for the adaptive terminal
    * full-image pass); each rank re-locates within its previous
    * bucket's sub-histogram, offset by the count below that bucket. */
  private def refine(hist: Seq[(Int, Long, Long)],
      ranks: Seq[(Int, Seq[Long])],
      prev: Map[(Int, Long), (Long, Long)],
      deltaBits: Int = 16)
      : Map[(Int, Long), (Long, Long)] = {
    val byColPrefix = hist.groupBy(t => (t._1, t._2 >>> deltaBits)).map {
      case (k, rs) => k -> rs.map(t => (t._2, t._3)).sortBy(_._1) }
    ranks.flatMap { case (i, rs) =>
      rs.map { r =>
        val (pfx, below) = prev((i, r))
        val sub = byColPrefix((i, pfx))
        var cum = below
        var found: (Long, Long) = null
        val it = sub.iterator
        while (found == null && it.hasNext) {
          val (bk, c) = it.next()
          if (r < cum + c) found = (bk, cum) else cum += c
        }
        (i, r) -> found
      }
    }.toMap
  }
}
