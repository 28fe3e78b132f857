package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extensions (SURVEY.md §2.10: the reference is
  * batch-only, so these are the streaming twins of the batch ops —
  * same semantics, incremental execution).
  *
  * Event times arrive as epoch-nanos longs (the testdata `events.ts`
  * convention); converted to micros timestamps for watermarking.
  */
object StreamOps {

  final case class Event(user_id: Long, ts: Long, event_id: Long,
                         event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, session_id: Long,
                              n_events: Long, t_start: Long, t_end: Long)
  /** Internal session state (public: encoder codegen needs JVM-visible
    * accessors). */
  final case class SessState(sessionId: Long, lastTs: Long,
                             n: Long, firstTs: Long)

  /** Streaming twin of operators.Sessionize.sessionStats: per-user
    * gap-based sessions via flatMapGroupsWithState. Every batch emits
    * (a) the FINAL aggregate of each session closed within the batch —
    * including a session carried in state across batches and closed by
    * a later event — and (b) the running aggregate of the user's
    * current open session. The latest row per (user, session) always
    * equals the batch result. Events must arrive time-ordered per user
    * within a batch (the iterator is sorted here defensively).
    */
  def sessionizeStream(events: Dataset[Event], gapNs: Long)
  : Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionAgg](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[SessState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(SessState(0L, Long.MinValue, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionAgg]
          sorted.foreach { e =>
            if (s.lastTs == Long.MinValue || e.ts - s.lastTs > gapNs) {
              // close the previous session with its accumulated state
              if (s.n > 0)
                out += SessionAgg(user, s.sessionId, s.n, s.firstTs, s.lastTs)
              s = SessState(s.sessionId + 1, e.ts, 1L, e.ts)
            } else s = s.copy(lastTs = e.ts, n = s.n + 1)
          }
          state.update(s)
          if (s.n > 0)
            out += SessionAgg(user, s.sessionId, s.n, s.firstTs, s.lastTs)
          out.iterator
      }
  }

  /** Streaming twin of `Sessionize.debounce`: per (user, type) the
    * state is ONE long — the ts of the last event SEEN (kept or not,
    * the lag semantics of the batch operator). State size is O(ACTIVE
    * keys), not every key ever seen: an EVENT-TIME timeout expires a
    * key once the watermark passes lastTs + minGap, at which point any
    * future event that respects the watermark is at least minGap past
    * the dropped state and would have been kept anyway — eviction
    * provably cannot flip a survivor decision (only watermark-late
    * events lose their drop, the standard lateness contract).
    * Processing-time timeouts are NOT an option here: they keep the
    * micro-batch engine permanently "due for another batch", so
    * processAllAvailable never quiesces. Within a batch events replay
    * in (ts, id) order; cross-batch the state carries the boundary. */
  def debounceStream(events: Dataset[Event],
                     minGapNs: Long): Dataset[Event] = {
    import events.sparkSession.implicits._
    val gapMs = math.max(1L, minGapNs / 1000000L)
    val withWm = events
      .withColumn("__evt", timestamp_micros(expr("ts div 1000")))
      .withWatermark("__evt", "0 seconds")
      .as[Event]
    withWm.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            var last = state.getOption.getOrElse(Long.MinValue)
            val out = scala.collection.mutable.ArrayBuffer.empty[Event]
            sorted.foreach { e =>
              if (last == Long.MinValue || e.ts - last > minGapNs) out += e
              last = e.ts
            }
            state.update(last)
            // +1ms covers the strict ">" of the batch gap test; the
            // max() keeps the timeout legal when late data lands with
            // the watermark already past it
            state.setTimeoutTimestamp(math.max(
              last / 1000000L + gapMs + 1L,
              state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Stream-static SCD2 AS-OF enrichment: each event picks the
    * dimension version that was effective AT ITS EVENT TIME —
    * `effective_from <= ts < effective_to` (open `effective_to` =
    * still current), the `Merge.scd2` column contract. Events with no
    * effective version (before the key's first version, or an unknown
    * key) survive with null dimension columns.
    *
    * Scale shape: a stream-STATIC join is stateless — the dimension
    * broadcasts (or re-reads per micro-batch when it's a table that
    * updates in place), no watermark and no join state; the range
    * predicate evaluates per row. This is the lookup-enrichment half
    * of CDC: `Merge.scd2` maintains the dimension in batch, this
    * applies it to a live stream. Works identically on a batch
    * `events` frame (nothing here is streaming-specific). */
  def scd2EnrichStream(events: DataFrame, dim: DataFrame,
                       keyCol: String, tsCol: String): DataFrame = {
    val d = dim.columns.foldLeft(dim)((acc, c) =>
      acc.withColumnRenamed(c, s"__d_$c"))
    val joined = events.join(broadcast(d),
      events(keyCol) === d(s"__d_$keyCol") &&
        events(tsCol) >= d("__d_effective_from") &&
        (d("__d_effective_to").isNull ||
          events(tsCol) < d("__d_effective_to")),
      "leftOuter")
    val dimCols = dim.columns.filterNot(c =>
      c == keyCol || c == "effective_from" || c == "effective_to" ||
        c == "is_current")
    dimCols.foldLeft(joined)((acc, c) =>
      acc.withColumnRenamed(s"__d_$c", c))
      .drop(s"__d_$keyCol", "__d_effective_from", "__d_effective_to",
        "__d_is_current")
  }

  /** Watermarked stream-stream WINDOWED JOIN — the streaming twin of
    * the attribution range join: each left event (e.g. a purchase)
    * pairs with every right event (e.g. a marketing touch) of the
    * same user whose time falls in [left.ts − windowNs, left.ts).
    * Unmatched left events survive with null touch columns.
    *
    * Scale shape: both sides carry a watermark and the join carries a
    * time-range condition, which is exactly what lets Spark BOUND the
    * join state — right-side rows evict once the watermark passes
    * their ts + windowNs, left-side unmatched rows emit (with nulls)
    * once no future right row could match them. Without the range
    * condition the state grows forever; with it, state is O(events in
    * one window), independent of stream length.
    *
    * On a BATCH Dataset the same function degrades gracefully —
    * withWatermark is a no-op and the join is a plain range join — so
    * the batch-parity test runs the SAME code on both engines. */
  def windowedJoinStream(left: Dataset[Event], right: Dataset[Event],
                         windowNs: Long): DataFrame = {
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    val windowUs = math.max(1L, windowNs / 1000L)
    val l = left
      .withColumn("__lts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("__lts", "0 seconds")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("__lts"))
    val r = right
      .withColumn("__rts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("__rts", "0 seconds")
      .select(col("user_id").as("__ruser"),
        col("event_id").as("touch_id"),
        col("event_type").as("touch_type"),
        col("ts").as("touch_ts"), col("__rts"))
    l.join(r,
        col("user_id") === col("__ruser") &&
          col("__rts") >= col("__lts") - expr(s"INTERVAL $windowUs MICROSECOND") &&
          col("__rts") < col("__lts"),
        "leftOuter")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("touch_id"), col("touch_type"), col("touch_ts"))
  }

  /** Funnel progress state: furthest step index completed and the ts
    * of that completion (first-touch chain). */
  final case class FunnelState(step: Int, lastT: Long)
  final case class FunnelProgress(user_id: Long, steps_completed: Int)

  /** Streaming twin of operators.Funnel.reached: per-user strict
    * first-touch funnel progression via flatMapGroupsWithState. The
    * state is two numbers per user (the definition of "cheap state").
    * Emits each user's current `steps_completed` every batch they
    * appear in (Update mode — the latest row per user equals the
    * batch result). Same ordering contract as `sessionizeStream`:
    * in-batch events are sorted defensively; ACROSS batches per-user
    * ts must be non-decreasing (late cross-batch events cannot rewind
    * an advanced step). */
  def funnelStream(events: Dataset[Event], steps: Seq[String])
  : Dataset[FunnelProgress] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (user, it, state: GroupState[FunnelState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
          sorted.foreach { e =>
            if (s.step < steps.length && e.event_type == steps(s.step) &&
                (s.step == 0 || e.ts > s.lastT))
              s = FunnelState(s.step + 1, e.ts)
          }
          state.update(s)
          Iterator.single(FunnelProgress(user, s.step))
      }
  }

  /** A two-sided as-of stream record: `side` 0 = reference (right),
    * 1 = probe (left); `payload` is the reference value carried onto
    * probes. */
  final case class AsOfIn(key: Long, ts: Long, side: Int,
                          probe_id: Long, payload: Double)
  final case class AsOfOut(key: Long, ts: Long, probe_id: Long,
                           matched_ts: Long, payload: Double)
  /** Latest reference row seen per key (ts + payload). */
  final case class AsOfState(ts: Long, payload: Double)

  /** Streaming twin of operators.AsOfJoin.backward: enrich each probe
    * event with the LATEST reference value at-or-before it, keeping
    * one reference row per key in state (the state is O(keys), not
    * O(events) — the shape an unbounded enrichment stream needs).
    * Within a batch both sides are merged time-ordered, so a reference
    * and a probe arriving in the same batch still align exactly like
    * the batch operator. Late REFERENCES (older than the state) are
    * ignored, and a late PROBE (older than the retained reference)
    * emits the no-match sentinel rather than silently matching a
    * FUTURE reference — with one retained reference per key the
    * at-or-before contract can only be answered for probes at or
    * after it; retain a history buffer if late probes must resolve.
    * Bound state further with a timeout if keys churn. `matched_ts` =
    * Long.MinValue and payload = NaN mark unmatched probes. */
  def asOfEnrichStream(in: Dataset[AsOfIn]): Dataset[AsOfOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[AsOfState]) =>
          // reference sorts before probe at equal ts (inclusive match)
          val sorted = it.toSeq.sortBy(e => (e.ts, e.side))
          var s = state.getOption
            .getOrElse(AsOfState(Long.MinValue, Double.NaN))
          val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
          sorted.foreach { e =>
            if (e.side == 0) {
              if (e.ts >= s.ts) s = AsOfState(e.ts, e.payload)
            } else if (s.ts != Long.MinValue && s.ts <= e.ts) {
              out += AsOfOut(key, e.ts, e.probe_id, s.ts, s.payload)
            } else {
              out += AsOfOut(key, e.ts, e.probe_id, Long.MinValue,
                Double.NaN)
            }
          }
          state.update(s)
          out.iterator
      }
  }

  /** Streaming twin of operators.Dedup.exactByContent: keep the
    * first-seen row per content hash, dropping duplicates ACROSS
    * batches (state = one hash per distinct document). For bounded
    * state on unbounded streams pass `watermark = Some(eventTimeCol ->
    * delay)` — duplicates are then only suppressed within the
    * watermark horizon (`dropDuplicatesWithinWatermark`), the standard
    * trade on infinite corpora. */
  def exactDedupStream(df: DataFrame, textCol: String,
                       watermark: Option[(String, String)] = None)
  : DataFrame = {
    val hashed = df.withColumn("content_hash", md5(col(textCol)))
    watermark match {
      case Some((timeCol, delay)) =>
        hashed.withWatermark(timeCol, delay)
          .dropDuplicatesWithinWatermark("content_hash")
      case None => hashed.dropDuplicates("content_hash")
    }
  }

  /** Streaming NEAR-dup dedup (the SimHash leg) as a `foreachBatch`
    * step against an accumulated signature store — the production
    * pattern when dedup state is a TABLE (every signature seen so
    * far) rather than the per-key scalar state the built-in stateful
    * operators hold. Each microbatch is:
    *   1. deduped internally with the batch operator
    *      (`Dedup.dedupBySimhash` — banded buckets + compiled
    *      hamming kernel);
    *   2. screened against the store via the same block banding
    *      (a batch doc within `maxHamming` of ANY stored signature
    *      is dropped);
    *   3. survivors written to `outDir/batch_id=<id>` and their
    *      signatures appended to `storeDir/batch_id=<id>`.
    * Replay safety: both writes overwrite their own batch_id slice,
    * and the screen reads only `batch_id < current` — a retried batch
    * neither duplicates output nor screens itself against its own
    * signatures.
    *
    *   docs.writeStream
    *     .foreachBatch(StreamOps.simhashDedupBatchStep(store, out,
    *       "text", "doc_id")).start()
    */
  def simhashDedupBatchStep(storeDir: String, outDir: String,
                            textCol: String, idCol: String,
                            bits: Int = 32, maxHamming: Int = 3,
                            maxBucket: Int = 10000)
  : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.Dedup
    import graft.functions.TextFns
    val spark = batch.sparkSession
    val blocks = maxHamming + 1
    require(bits % blocks == 0,
      s"bits=$bits must divide into maxHamming+1=$blocks blocks")
    val blockBits = bits / blocks
    val mask = (1L << blockBits) - 1
    def banded(sigs: DataFrame): DataFrame =
      sigs.select(col("*"), explode(array((0 until blocks).map { b =>
        struct(lit(b).as("blk"),
          shiftright(col("sig"), b * blockBits).bitwiseAND(mask).as("bval"))
      }: _*)).as("e"))
        .select(col(idCol), col("sig"), col("e.blk"), col("e.bval"))

    val internal = Dedup.dedupBySimhash(batch, textCol, idCol, bits,
      maxHamming, maxBucket)
    val sigs = internal.select(col(idCol),
      TextFns.simhash(col(textCol), bits).as("sig"))
    val stored =
      try Some(spark.read.parquet(storeDir)
        .filter(col("batch_id") < batchId)
        .select(col("sig").as("__ssig"), col("blk"), col("bval")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val survivors = stored match {
      case None => internal
      case Some(st) =>
        val dupIds = banded(sigs).join(st, Seq("blk", "bval"))
          .filter(TextFns.hamming(col("sig"), col("__ssig"), bits)
            <= maxHamming)
          .select(col(idCol)).distinct()
        internal.join(dupIds, Seq(idCol), "left_anti")
    }
    survivors.write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")
    banded(sigs.join(survivors.select(col(idCol)), Seq(idCol)))
      .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
  }

  /** Streaming NEAR-dup dedup (the MinHash-LSH leg) — the streaming
    * twin of `Dedup.incrementalLsh` / the q_d_incr_lsh operational
    * shape, completing the store-probing family (SimHash / SRP /
    * MinHash). Each microbatch:
    *   1. dedupes internally via the checked LSH pipeline
    *      (`Dedup.dedupByLshChecked`: banded candidates → exact
    *      n-gram-Jaccard confirm → CC representatives);
    *   2. probes the accumulated BAND store ((band, bucket)
    *      equi-join — the `bandSignatures` rows `incrementalLsh`
    *      probes), confirming with the MINHASH-AGREEMENT estimator: a
    *      batch doc drops when the fraction of agreeing signature
    *      slots with ANY colliding stored doc ≥ `minJaccard`. The
    *      store carries the k-slot signature alongside each band row
    *      precisely so the cross-batch confirm is self-contained —
    *      stored TEXT is gone, so the estimator (unbiased for
    *      Jaccard, ±1/√k) stands in for the exact confirm the
    *      in-batch leg runs; size `numHashes` to the tolerance;
    *   3. writes survivors to `outDir/batch_id=<id>` and their
    *      (band, bucket, signature) rows to `storeDir/batch_id=<id>`.
    * Replay safety as in the SimHash twin: both writes overwrite
    * their own batch_id slice and the screen reads only
    * `batch_id < current`. Docs shorter than the shingle size carry
    * no bands: never screened, never stored (they cannot near-dup
    * via LSH), but kept in the output.
    *
    * `confirm` selects the cross-batch confirm exactly as in the
    * batch twin — `"estimator"` (default, signature-only store),
    * `"exact"` (exact n-gram Jaccard over stored shingle sets), or
    * `"hybrid"` (estimator decides outside the ±`hybridWindow`
    * agreement band around `minJaccard`, the exact kernel only
    * inside it — see `Dedup.hybridCuts`); both run the SAME
    * `Dedup.confirmedDupPairs` code as `lshIngestBatch`, so
    * batch/stream parity is structural. Exact/hybrid store slices
    * additionally carry the sorted shingle set per band row (the
    * `withShingleSets` layout's streaming analogue — same ~bands ×
    * |shingles| longs/doc storage tax, measured 5.1× at sf10 in
    * BASELINE.md); restarting an exact/hybrid query over a store
    * written under `confirm = "estimator"` fails loudly rather than
    * silently downgrading the confirm. */
  def minhashLshDedupBatchStep(storeDir: String, outDir: String,
                               textCol: String, idCol: String,
                               numHashes: Int = 16, bands: Int = 4,
                               shingleSize: Int = 3,
                               minJaccard: Double = 0.5,
                               maxBucket: Int = 1000,
                               confirm: String = "estimator",
                               hybridWindow: Double = Double.NaN)
  : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.Dedup
    require(Set("estimator", "exact", "hybrid")(confirm),
      s"confirm=$confirm — must be estimator, exact, or hybrid")
    val needsSets = confirm != "estimator"
    val spark = batch.sparkSession
    val internal = Dedup.dedupByLshChecked(batch, textCol, idCol,
      numHashes, bands, shingleSize, minJaccard, maxBucket).deduped
    // band rows with the k-slot signature (and, under exact/hybrid,
    // the sorted shingle set) riding along — ONE kernel pass, same
    // rows the batch twin's store holds
    val banded = Dedup.bandRows(internal, textCol, idCol,
      numHashes, bands, shingleSize, withMh = true, withSet = needsSets)
    val stored =
      try {
        val st = spark.read.parquet(storeDir)
          .filter(col("batch_id") < batchId)
        // legacy slices (pre-confirm-modes builds) named the
        // signature __mh; read either, write the batch-store names
        val mhCol = if (st.columns.contains("mh")) "mh" else "__mh"
        require(!needsSets || st.columns.contains("sset"),
          s"$storeDir carries no shingle sets; confirm=$confirm requires " +
            "a store written by an exact/hybrid query from its first batch")
        Some(st.select(Seq(col("band"), col("bucket"),
          col("doc_id").as("cand_id"), col(mhCol).as("__smh")) ++
          (if (needsSets) Seq(col("sset").as("__sss")) else Seq.empty): _*))
      } catch { case _: org.apache.spark.sql.AnalysisException => None }
    val survivors = stored match {
      case None => internal
      case Some(st) =>
        val dupIds = Dedup.confirmedDupPairs(
            banded.join(st, Seq("band", "bucket")),
            numHashes, minJaccard, confirm, hybridWindow)
          .select(col("doc_id").as(idCol)).distinct()
        internal.join(dupIds, Seq(idCol), "left_anti")
    }
    survivors.write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")
    banded.join(survivors.select(col(idCol).as("doc_id")), Seq("doc_id"))
      .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
  }

  /** Streaming SEMANTIC dedup (the embedding leg, twin of
    * `Dedup.dedupByEmbedding(exact = false, multiProbe = true)`) as a
    * `foreachBatch` step against an accumulated signature store —
    * same table-state pattern as `simhashDedupBatchStep`. Each
    * microbatch:
    *   1. dedupes internally via the multi-probe SRP-bucketed ANN
    *      path (bucket join + exact cosine confirm, never all-pairs);
    *   2. screens against the store: each batch survivor probes its
    *      home bucket plus the one-flip buckets — the same probe set
    *      the in-batch path uses, so a stored near-dup split from the
    *      batch doc by a single hyperplane is still caught — and is
    *      dropped when any stored vector confirms `cos >= minCos`;
    *   3. writes survivors to `outDir/batch_id=<id>` and their
    *      (bucket, vector) signatures to `storeDir/batch_id=<id>`.
    * Replay safety as in the SimHash twin: both writes overwrite
    * their own batch_id slice and the screen reads only
    * `batch_id < current`.
    */
  def srpDedupBatchStep(storeDir: String, outDir: String,
                        vecCol: String, idCol: String, minCos: Double,
                        planes: Int = 8, dim: Int = 64,
                        maxBucket: Int = 1000)
  : (DataFrame, Long) => Unit = { (batch, batchId) =>
    import graft.operators.{Dedup, Similarity}
    val spark = batch.sparkSession
    val internal = Dedup.dedupByEmbedding(batch, idCol, vecCol, minCos,
      exact = false, multiProbe = true, planes, dim, maxBucket)
    val sigs = internal.select(col(idCol),
      col(vecCol).cast("array<double>").as("__v"))
      .withColumn("bucket", Similarity.srpBucket(col("__v"), planes, dim))
    val stored =
      try Some(spark.read.parquet(storeDir)
        .filter(col("batch_id") < batchId)
        .select(col("bucket"), col("__v").as("__sv")))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    val survivors = stored match {
      case None => internal
      case Some(st) =>
        val probes = sigs.select(col(idCol), col("__v"),
          explode(array(col("bucket") +: (0 until planes).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
        val dupIds = probes.join(st, Seq("bucket"))
          .filter(Similarity.cosine(col("__v"), col("__sv")) >= minCos)
          .select(col(idCol)).distinct()
        internal.join(dupIds, Seq(idCol), "left_anti")
    }
    survivors.write.mode("overwrite")
      .parquet(s"$outDir/batch_id=$batchId")
    sigs.join(survivors.select(col(idCol)), Seq(idCol))
      .select(col(idCol), col("__v"), col("bucket"))
      .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
  }

  final case class ActiveCount(bucket: Long, n_active: Long)
  /** Internal rolling-distinct state (public for encoder codegen):
    * the distinct actors contributing to one bucket-end's trailing
    * window, plus whether the bucket itself has direct activity. */
  final case class RollState(actors: Seq[Long], direct: Boolean)
  /** Internal fan-out row (public for encoder codegen): one event's
    * contribution to one bucket-end, carrying the ORIGINAL event time
    * (ms precision) so the watermark tracks true event time, not the
    * fanned-out bucket index. */
  final case class RollContrib(bucket: Long, actor: Long,
                               direct: Boolean,
                               event_time: java.sql.Timestamp)

  /** Streaming twin of `Features.rollingActive` (the WAU curve): each
    * event contributes its actor to the `window` bucket-ends it falls
    * inside (constant fan-out flatMap — map-side, before any state),
    * then per-bucket state accumulates the DISTINCT actor set and
    * emits an updated count whenever the bucket has direct activity
    * (idle bucket-ends carry state but never emit — the batch twin's
    * observed-bucket semi join). The latest row per bucket equals the
    * batch result, including late events that back-fill a window.
    *
    * Scale note: state per bucket-end is the exact distinct-actor
    * set — the parity-checkable form. At true WAU scale swap the set
    * for mergeable HLL registers (`Sketch.hllRegisters` shape): same
    * flatMap skeleton, sketch-sized state, approximate counts.
    *
    * Retention contract: a bucket-end can only change while events
    * with `ts < (bucket+1)*bucketNs` can still arrive, so its state
    * expires (event-time timeout) once the watermark — true event
    * time minus `lateness` — passes the bucket end. Events later
    * than `lateness` are dropped by the watermark (the standard
    * trade); without this bound the state map holds every bucket-end
    * ever seen, forever. */
  def rollingActiveStream(events: Dataset[Event], bucketNs: Long,
                          window: Int, lateness: String = "1 hour")
  : Dataset[ActiveCount] = {
    require(bucketNs > 0 && window > 0,
      s"need positive bucketNs/window, got $bucketNs/$window")
    import events.sparkSession.implicits._
    val contrib = events.flatMap { e =>
      val b = Math.floorDiv(e.ts, bucketNs)
      val t = new java.sql.Timestamp(Math.floorDiv(e.ts, 1000000L))
      (0 until window).map(i => RollContrib(b + i, e.user_id, i == 0, t))
    }.withWatermark("event_time", lateness)
    contrib.groupByKey(_.bucket)
      .flatMapGroupsWithState[RollState, ActiveCount](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        case (bucket, it, state: GroupState[RollState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val s = state.getOption.getOrElse(RollState(Seq.empty, false))
            val set = scala.collection.mutable.HashSet[Long](s.actors: _*)
            var direct = s.direct
            it.foreach { c =>
              set += c.actor; direct ||= c.direct
            }
            state.update(RollState(set.toSeq.sorted, direct))
            // last instant an event can contribute to this bucket-end
            // is the bucket end; the timeout must sit past the current
            // watermark or Spark rejects it.
            val endMs = Math.floorDiv((bucket + 1) * bucketNs, 1000000L)
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1))
            if (direct)
              Iterator.single(ActiveCount(bucket, set.size.toLong))
            else Iterator.empty
          }
      }
  }

  /** Streaming twin of `Sketch.rollingDistinctHll`'s register build —
    * the documented HLL state swap for [[rollingActiveStream]] when
    * exact per-bucket actor sets no longer fit: the register maxima
    * ARE the streaming state, maintained by a plain update-mode
    * `groupBy(bucket, j).max(rank)` after the same constant fan-out
    * flatMap (sketch-sized state: ≤ 2^p longs per open bucket, no
    * custom stateful operator at all — max is the mergeable op).
    * The sink's latest register frame feeds `Sketch.hllMerge`-style
    * estimation downstream; parity with the batch registers is
    * spec-proven.
    *
    * Retention contract: the aggregation groups on a timestamp key
    * derived from the bucket index (`bucket_time`, injective for
    * bucketNs ≥ 1µs) so the watermark can evict closed buckets —
    * an unwatermarked update-mode aggregation would keep one register
    * set per bucket-end ever seen, forever. Because `bucket_time` of
    * a fan-out row runs AHEAD of true event time by up to
    * `window - 1` buckets, the watermark delay is widened by a full
    * `window * bucketNs` on top of `latenessNs`, which restores the
    * true-event-time contract: bucket B is evicted only once events
    * more than `latenessNs` past B's end have been seen. */
  def rollingHllRegistersStream(events: Dataset[Event], bucketNs: Long,
                                window: Int, p: Int = 9,
                                salt: String = "hll",
                                latenessNs: Long = 3600L * 1000000000L)
  : DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    require(bucketNs >= 1000 && window > 0,
      s"need bucketNs >= 1000ns and positive window, got $bucketNs/$window")
    require(latenessNs >= 0, s"negative lateness: $latenessNs")
    import events.sparkSession.implicits._
    val restBits = 60 - p
    val restSpace = 1L << restBits
    val delayMicros =
      Math.addExact(latenessNs, Math.multiplyExact(window.toLong,
        bucketNs)) / 1000L
    val contrib = events.flatMap { e =>
      (0 until window).map(i =>
        (Math.floorDiv(e.ts, bucketNs) + i, e.user_id))
    }.toDF("bucket", "__actor")
      .withColumn("bucket_time",
        // bucket END, not start: bucket 0's start is epoch 0, which
        // sits exactly on the initial watermark and would be dropped
        // by the <=-watermark late filter.
        timestamp_micros((col("bucket") + 1) * lit(bucketNs / 1000L)))
      .withWatermark("bucket_time", s"$delayMicros microseconds")
    val h = graft.functions.ColumnFns
      .hash60(concat(lit(salt), col("__actor").cast("string")))
    val rem = h % restSpace
    contrib
      .select(col("bucket_time"), col("bucket"),
        shiftright(h, restBits).as("j"),
        when(rem === 0, lit(restBits + 1))
          .otherwise(lit(restBits) - length(bin(rem)) + 1)
          .cast("long").as("rank"))
      .groupBy("bucket_time", "bucket", "j")
      .agg(max(col("rank")).as("r"))
      .select(col("bucket"), col("j"), col("r"))
  }

  /** Streaming tumbling-window counts with a watermark — the
    * incremental form of the q_e_hourly batch query. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours")
  : DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_val"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_val"))

  /** Streaming twin of `Features.ohlcBars`: the same lexicographic
    * struct min/max aggregates under a watermark + tumbling window —
    * no custom state at all, the bar IS an algebraic aggregate, so
    * late data within the watermark revises the bar and the final
    * emission matches the batch operator exactly. */
  def ohlcStream(events: DataFrame, watermark: String = "2 hours")
  : DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Stream-static Fellegi-Sunter scoring: each arriving record is
    * linked against a STATIC reference registry — blocked broadcast
    * join, per-field agreement, integer micro-nat score (the batch
    * `Linkage.fellegiSunter` weights, applied one record at a time).
    *
    * Scale shape: stateless — the reference projection (id, blocks,
    * precomputed field values) and the 1-row weight frame both
    * broadcast; no watermark, no join state, so throughput is the
    * map throughput of the codegen'd comparisons. Weights are
    * computed ONCE from the reference at plan time (the registry is
    * the population whose value frequencies define u — a stream
    * cannot re-estimate them incrementally without state; re-plan the
    * query to refresh). Works identically on a batch frame (test
    * parity contract: `StreamOpsSpec`).
    *
    * Output: stream_id, ref_id, n_agree, score_unats, agree_<f>…
    * — candidates only (records matching no block emit nothing). */
  def linkageScoreStream(stream: DataFrame, reference: DataFrame,
                         idCol: String, blockCols: Seq[String],
                         fieldExprs: Seq[(String, String)],
                         m: Double = 0.95): DataFrame = {
    val weights = graft.operators.Linkage.fieldWeights(
      reference, fieldExprs, m)
    def proj(df: DataFrame, tag: String) = df.select(
      (col(idCol).as(s"__id_$tag") +:
        blockCols.map(c => col(c).as(s"__bk_${tag}_$c"))) ++
        fieldExprs.map { case (name, ex) =>
          expr(ex).as(s"__f${tag}_$name")
        }: _*)
    val s = proj(stream, "a")
    val r = proj(reference, "b")
    val cond = blockCols.map(c =>
      col(s"__bk_a_$c") === col(s"__bk_b_$c")).reduce(_ && _)
    val pairs = s.join(broadcast(r), cond)
      .withColumnRenamed("__id_a", "stream_id")
      .withColumnRenamed("__id_b", "ref_id")
    graft.operators.Linkage.scorePairs(
      pairs.crossJoin(broadcast(weights)), fieldExprs,
      Seq(col("stream_id"), col("ref_id")))
  }

  /** Spark `round()` parity in one place: BigDecimal.valueOf HALF_UP —
    * every streaming twin's exact-milli conversion and 6 dp output
    * round must stay bit-identical to the batch Column round, so the
    * logic lives once. */
  private def sparkRound(d: Double, scale: Int): java.math.BigDecimal =
    BigDecimal.valueOf(d)
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP).underlying

  /** Running lag-1 autocorrelation per key — the streaming twin of
    * `Features.autocorrelation`, emitted as a running value after each
    * batch. State is SEVEN longs per key (pair count, five exact
    * integer-milli moment sums, the previous value) — the entire
    * Pearson computation is incremental, so a year of stream costs the
    * same state as a minute. After any prefix, the emitted row equals
    * the batch operator run over that prefix (same exact-long moment
    * arithmetic, same <3-pairs/degenerate-variance null, same 6 dp
    * round with −0.0 canonicalized). Ordered per-key arrival across
    * batches, as for `meanShiftStream`. */
  final case class AutocorrPoint(event_type: String, n_pairs: Long,
                                 r1: Option[Double])
  /** (public for encoder codegen) */
  final case class AutocorrState(n: Long, sx: Long, sy: Long, sxy: Long,
                                 sxx: Long, syy: Long, last: Long,
                                 hasLast: Boolean)

  def autocorrStream(events: Dataset[Event]): Dataset[AutocorrPoint] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[AutocorrState, AutocorrPoint](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (typ, it, state: GroupState[AutocorrState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(
            AutocorrState(0L, 0L, 0L, 0L, 0L, 0L, 0L, hasLast = false))
          sorted.foreach { e =>
            val y = sparkRound(e.value * 1e3, 0).longValue
            if (s.hasLast) {
              val yl = s.last
              s = AutocorrState(s.n + 1, s.sx + y, s.sy + yl,
                s.sxy + y * yl, s.sxx + y * y, s.syy + yl * yl,
                y, hasLast = true)
            } else s = s.copy(last = y, hasLast = true)
          }
          state.update(s)
          val num = s.n.toDouble * s.sxy - s.sx.toDouble * s.sy
          val dx = s.n.toDouble * s.sxx - s.sx.toDouble * s.sx
          val dy = s.n.toDouble * s.syy - s.sy.toDouble * s.sy
          val r1 =
            if (s.n < 3 || dx <= 0.0 || dy <= 0.0) None
            else Some(sparkRound(num / math.sqrt(dx * dy), 6)
              .doubleValue + 0.0)
          Iterator.single(AutocorrPoint(typ, s.n, r1))
      }
  }

  /** One per-bucket drift reading — the streaming twin of
    * `Profile.psi`'s headline number over a time-bucketed stream. */
  final case class PsiWindow(bucket: Long, n_cur: Long, psi: Double)
  /** (public for encoder codegen) */
  final case class PsiState(counts: Seq[Long])

  /** Streaming PSI drift gate: the current sample is each time bucket
    * of the stream, the reference is FIXED metadata from
    * `Profile.psiReference` (bins longs — the reference corpus never
    * rides along). State per bucket is the bins-sized count vector, so
    * a day of stream costs bins longs per bucket touched. Every batch
    * re-emits each touched bucket's running PSI (Update mode); after
    * any prefix the value equals `Profile.psi(ref, that bucket's rows
    * so far)`'s `round6(Σ psi_term)` — same bin clamping, same Laplace
    * smoothing, same float-op order, terms summed bin-ascending.
    * Buckets are floorDiv(ts, bucketNs), like the rolling siblings
    * (truncating division would fold two pre-epoch buckets into one).
    * Late data folds into its bucket exactly (counts are additive);
    * buckets are never dropped — at true 100 TB retention, add a
    * timeout that finalizes buckets past the watermark. */
  def psiStream(events: Dataset[Event], refLo: Double, refHi: Double,
                refCounts: Seq[Long], bucketNs: Long): Dataset[PsiWindow] = {
    val bins = refCounts.length
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(bucketNs > 0, s"bucket must be positive, got $bucketNs")
    import events.sparkSession.implicits._
    val refN = refCounts.sum.toDouble
    // NaN lands in bin 0, matching the batch formula empirically
    // (floor(NaN) stays NaN and the long cast folds it to 0 before the
    // clamps) — math.floor(NaN).toLong is the same fold, so the plain
    // expression below already agrees; pinned by the NaN event in
    // StreamOpsSpec's psi parity test
    def bin(v: Double): Int =
      if (refHi == refLo) 0
      else math.max(0L, math.min((bins - 1).toLong,
        math.floor((v - refLo) * bins / (refHi - refLo)).toLong)).toInt
    events.groupByKey(e => Math.floorDiv(e.ts, bucketNs))
      .flatMapGroupsWithState[PsiState, PsiWindow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        case (bucket, it, state: GroupState[PsiState]) =>
          val counts = state.getOption.map(_.counts.toArray)
            .getOrElse(new Array[Long](bins))
          it.foreach(e => counts(bin(e.value)) += 1)
          state.update(PsiState(counts.toSeq))
          val n = counts.sum
          val psi = sparkRound((0 until bins).map { i =>
            val ra = (refCounts(i) + 1.0) / (refN + bins)
            val rc = (counts(i) + 1.0) / (n + bins)
            sparkRound((ra - rc) * math.log(ra / rc), 6).doubleValue
          }.sum, 6).doubleValue
          Iterator.single(PsiWindow(bucket, n, psi))
      }
  }

  /** One emitted change-point probe — the streaming twin of
    * `Features.meanShiftPoints`' output row (`ts` is the probe
    * position's order value). */
  final case class ShiftPoint(event_type: String, ts: Long,
                              lsum_milli: Long, rsum_milli: Long,
                              shift_milli: Long, is_shift: Int)
  /** Bounded sliding buffer: the last ≤ 2k (ts, milli) pairs per key
    * (public for encoder codegen). */
  final case class ShiftState(ts: Seq[Long], milli: Seq[Long])

  /** Streaming twin of `Features.meanShiftPoints`: per event type,
    * the trailing k rows vs the leading k rows around every position,
    * emitted as soon as the position's leading window completes —
    * change-point detection that keeps up with the stream instead of
    * re-scanning history. State is a BOUNDED 2k-row buffer per key
    * (the only rows any future emission can touch), so state size is
    * keys × 2k regardless of stream length. Exact integer milli sums
    * and Spark-round (HALF_UP) parity with the batch op; positions
    * without both full windows are never emitted, exactly like the
    * batch filter. Events must arrive time-ordered per key across
    * batches (the in-batch iterator is sorted defensively) — the
    * `sessionizeStream` caveat. */
  def meanShiftStream(events: Dataset[Event], k: Int,
                      thresholdMilli: Long): Dataset[ShiftPoint] = {
    require(k > 0, s"window size must be positive, got $k")
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[ShiftState, ShiftPoint](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (typ, it, state: GroupState[ShiftState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
          var ts = state.getOption.map(_.ts.toVector)
            .getOrElse(Vector.empty[Long])
          var ml = state.getOption.map(_.milli.toVector)
            .getOrElse(Vector.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer.empty[ShiftPoint]
          sorted.foreach { e =>
            ts :+= e.ts
            ml :+= sparkRound(e.value * 1e3, 0).longValue
            if (ts.length == 2 * k) {
              val lsum = ml.take(k).sum
              val rsum = ml.drop(k).sum
              out += ShiftPoint(typ, ts(k), lsum, rsum,
                sparkRound((rsum - lsum).toDouble / k, 0).longValue,
                if (math.abs(rsum - lsum) > thresholdMilli * k) 1 else 0)
              ts = ts.tail
              ml = ml.tail
            }
          }
          state.update(ShiftState(ts, ml))
          out.iterator
      }
  }
}
