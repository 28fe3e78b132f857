package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{Event, SessionAgg}

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000000000L // one minute in ns

  test("sessionizeStream converges to the batch sessionization") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionizeStream(input.toDS(), gapNs = 30 * M)
      .writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1L, 0 * M, 1L, "click", 1.0),
        Event(1L, 10 * M, 2L, "click", 1.0),
        Event(2L, 0 * M, 3L, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(1L, 50 * M, 4L, "click", 1.0)) // 40-min gap
      q.processAllAvailable()
      // latest row per (user, session)
      val latest = spark.table("sess")
        .groupBy("user_id", "session_id")
        .agg(max(struct("n_events", "t_start", "t_end")).as("s"))
        .select(col("user_id"), col("session_id"),
          col("s.n_events"), col("s.t_start"), col("s.t_end"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(latest == Set(
        (1L, 1L, 2L, 0L, 10 * M),
        (1L, 2L, 1L, 50 * M, 50 * M),
        (2L, 1L, 1L, 0L, 0L)))
    } finally q.stop()
  }

  test("sessionizeStream: session closed by a later batch emits its FINAL aggregate") {
    // the mapGroupsWithState form lost this: batch1 e@0; batch2 grows
    // the session (e@10) AND closes it (e@50 starts session 2) in the
    // same batch -> session 1's final row must show n=2, not n=1
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.sessionizeStream(input.toDS(), gapNs = 30 * M)
      .writeStream.format("memory").queryName("sess_close")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Event(7L, 0 * M, 1L, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(7L, 10 * M, 2L, "click", 1.0),
        Event(7L, 50 * M, 3L, "click", 1.0))
      q.processAllAvailable()
      val latest = spark.table("sess_close")
        .groupBy("user_id", "session_id")
        .agg(max(struct("n_events", "t_start", "t_end")).as("s"))
        .select(col("session_id"), col("s.n_events"),
          col("s.t_start"), col("s.t_end"))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(latest == Set(
        (1L, 2L, 0L, 10 * M),          // closed with BOTH events
        (2L, 1L, 50 * M, 50 * M)))
    } finally q.stop()
  }

  test("rollingActiveStream converges to the batch rollingActive") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.rollingActiveStream(input.toDS(),
        bucketNs = 10 * M, window = 3)
      .writeStream.format("memory").queryName("roll")
      .outputMode(OutputMode.Update()).start()
    // ts = 1*M, not 0: an epoch-0 event sits exactly ON the initial
    // watermark (0 ms) and Spark's <=-watermark late filter drops it —
    // a boundary artifact, not the parity under test.
    val all = Seq(
      Event(1L, 1 * M, 1L, "click", 1.0),   // user 1, bucket 0
      Event(2L, 5 * M, 2L, "click", 1.0),   // user 2, bucket 0
      Event(1L, 25 * M, 3L, "click", 1.0),  // user 1, bucket 2
      Event(3L, 21 * M, 4L, "click", 1.0),  // user 3, bucket 2 (batch 2)
      Event(4L, 100 * M, 5L, "click", 1.0)) // user 4, far bucket 10
    try {
      input.addData(all.take(3): _*)
      q.processAllAvailable()
      input.addData(all.drop(3): _*)
      q.processAllAvailable()
      val latest = spark.table("roll")
        .groupBy("bucket").agg(max("n_active").as("n_active"))
        .as[(Long, Long)].collect().toMap
      val batch = graft.operators.Features.rollingActive(
        all.toDF(), "ts", "user_id", bucketNs = 10 * M, window = 3)
        .as[(Long, Long)].collect().toMap
      assert(latest == batch)
      // spot-check the semantics: bucket 2 sees users {1,2,3}
      assert(batch(2L) == 3L)
      assert(!batch.contains(1L)) // idle bucket emits nothing
    } finally q.stop()
  }

  test("rollingHllRegistersStream converges to the batch register build") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.rollingHllRegistersStream(input.toDS(),
        bucketNs = 10 * M, window = 3)
      .writeStream.format("memory").queryName("rollhll")
      .outputMode(OutputMode.Update()).start()
    // +M inside each bucket keeps every event off epoch 0 (the
    // initial-watermark boundary drops an exactly-epoch-0 row).
    val all = (1 to 40).map(i =>
      Event(i.toLong % 13, (i % 5).toLong * 10 * M + M, i.toLong, "c", 1.0))
    try {
      input.addData(all.take(20): _*)
      q.processAllAvailable()
      input.addData(all.drop(20): _*)
      q.processAllAvailable()
      // registers only grow: latest value per (bucket, j) is the max
      val streamed = spark.table("rollhll")
        .groupBy("bucket", "j").agg(max("r").as("r"))
        .as[(Long, Long, Long)].collect().toSet
      val contrib = all.flatMap(e =>
        (0 until 3).map(i => (e.ts / (10 * M) + i, e.user_id)))
        .toDF("bucket", "actor")
      val batch = graft.operators.Sketch
        .hllRegisters(contrib, "bucket", "actor", p = 9)
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("exactDedupStream: duplicates dropped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.exactDedupStream(
      input.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "same text"), (2L, "same text"), (3L, "other"))
      q.processAllAvailable()
      input.addData((4L, "same text"), (5L, "brand new")) // 4 is a cross-batch dup
      q.processAllAvailable()
      val kept = spark.table("dedup_stream")
        .select("doc_id").as[Long].collect().toSet
      // which of the two same-batch duplicates survives is arbitrary;
      // the cross-batch duplicate (4) must never appear
      assert(kept.intersect(Set(1L, 2L)).size == 1 &&
        kept.contains(3L) && kept.contains(5L) && !kept.contains(4L) &&
        kept.size == 3, kept.toString)
    } finally q.stop()
  }

  test("exactDedupStream with watermark: bounded state still dedups in-horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val src = input.toDF().toDF("doc_id", "ts_ms", "text")
      .withColumn("event_time", timestamp_millis(col("ts_ms")))
    val q = StreamOps.exactDedupStream(src, "text",
      watermark = Some("event_time" -> "10 minutes"))
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, 0L, "same"), (2L, 1000L, "same"), (3L, 2000L, "other"))
      q.processAllAvailable()
      input.addData((4L, 3000L, "same")) // in-horizon duplicate: dropped
      q.processAllAvailable()
      val kept = spark.table("dedup_wm")
        .select("doc_id").as[Long].collect().toSet
      assert(!kept.contains(4L) && kept.contains(3L) && kept.size == 2,
        kept.toString)
    } finally q.stop()
  }

  test("hourlyCounts: windowed streaming agg matches batch grouping") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000000000L
    val input = MemoryStream[Event]
    val q = StreamOps.hourlyCounts(input.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1L, 0, 1L, "click", 2.0),
        Event(1L, H / 2, 2L, "click", 3.0),
        Event(1L, H + 1, 3L, "buy", 5.0))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select("event_type", "n", "sum_val")
        .as[(String, Long, Double)].collect().toSet
      assert(got == Set(("click", 2L, 5.0), ("buy", 1L, 5.0)))
    } finally q.stop()
  }

  test("ohlcStream: windowed bars match the batch ohlcBars, late revision applied") {
    implicit val sqlCtx = spark.sqlContext
    val H = 3600L * 1000000000L
    val input = MemoryStream[Event]
    val q = StreamOps.ohlcStream(input.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("ohlc")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(1L, H / 4, 1L, "click", 5.0),
        Event(1L, H / 2, 2L, "click", 9.0))
      q.processAllAvailable()
      // late-but-in-watermark event EARLIER than the current open:
      // the bar must revise its open
      input.addData(Event(2L, H / 8, 3L, "click", 2.0))
      q.processAllAvailable()
      val latest = spark.table("ohlc")
        .groupBy("hour_start", "event_type")
        .agg(max(struct("n", "open", "high", "low", "close")).as("s"))
        .select(col("event_type"), col("s.open"), col("s.high"),
          col("s.low"), col("s.close"), col("s.n"))
        .as[(String, Double, Double, Double, Double, Long)]
        .collect().toSet
      assert(latest == Set(("click", 2.0, 9.0, 2.0, 9.0, 3L)))
      // parity with the batch operator on the same rows
      val all = Seq((H / 4, 1L, "click", 5.0), (H / 2, 2L, "click", 9.0),
        (H / 8, 3L, "click", 2.0)).toDF("ts", "event_id", "event_type", "value")
      val batch = graft.operators.Features.ohlcBars(all, Seq("event_type"),
        "ts", "event_id", "value", bucket = H)
        .select("event_type", "open", "high", "low", "close", "n")
        .as[(String, Double, Double, Double, Double, Long)].collect().toSet
      assert(batch == latest)
    } finally q.stop()
  }

  test("simhashDedupBatchStep: near-dups dropped across batches via the store") {
    implicit val sqlCtx = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft-stream-dedup")
    val (store, out) = (s"$dirs/store", s"$dirs/out")
    val input = MemoryStream[(Long, String)]
    val step = StreamOps.simhashDedupBatchStep(store, out, "text", "doc_id")
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(step).start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta"), // in-batch dup of 1
        (3L, "completely different vocabulary about other topics entirely"))
      q.processAllAvailable()
      input.addData(
        (4L, "alpha beta gamma delta epsilon zeta"), // cross-batch dup of 1
        (5L, "fresh unrelated content with novel words and phrasing"))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L))
      // the store holds banded signatures only for survivors
      val storedIds = spark.read.parquet(store)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(storedIds == Set(1L, 3L, 5L))
      // replaying batch 1 against the store is idempotent: the screen
      // reads only batch_id < current, so survivors are unchanged
      val replay = Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "alpha beta gamma delta epsilon zeta"),
        (3L, "completely different vocabulary about other topics entirely"))
        .toDF("doc_id", "text")
      step(replay, 0L)
      val after = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      assert(after == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("minhashLshDedupBatchStep: near-dups dropped across batches via the band store") {
    implicit val sqlCtx = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft-stream-lshdedup")
    val (store, out) = (s"$dirs/store", s"$dirs/out")
    val input = MemoryStream[(Long, String)]
    val step = StreamOps.minhashLshDedupBatchStep(store, out, "text",
      "doc_id", numHashes = 8, bands = 4)
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch(step).start()
    try {
      input.addData(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta"), // in-batch dup
        (3L, "completely different vocabulary about other topics entirely"),
        (6L, "xy")) // < shingleSize tokens: no bands, kept, never stored
      q.processAllAvailable()
      input.addData(
        (4L, "alpha beta gamma delta epsilon zeta eta theta"), // cross-batch dup
        (5L, "fresh unrelated content with novel words and phrasing"))
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L, 6L))
      // the band store holds rows only for survivors WITH bands
      val storedIds = spark.read.parquet(store)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(storedIds == Set(1L, 3L, 5L))
      // replay idempotence: batch 0 re-run screens only batch_id < 0
      val replay = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta"),
        (2L, "alpha beta gamma delta epsilon zeta eta theta"),
        (3L, "completely different vocabulary about other topics entirely"),
        (6L, "xy")).toDF("doc_id", "text")
      step(replay, 0L)
      val after = spark.read.parquet(out)
        .select("doc_id").as[Long].collect().toSet
      assert(after == Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }

  test("restart from checkpoint: batch ids continue, no duplicate or lost store rows (r14 verdict #7)") {
    // the hazard this pins: a restart WITHOUT the checkpoint restarts
    // batchId at 0 and the replay-safe overwrite-own-slice discipline
    // would clobber the store's batch_id=0 generation; WITH the
    // checkpoint, batch ids continue and every prior slice survives.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val dirs = java.nio.file.Files.createTempDirectory("graft-restart")
    val (in, store, out, ckpt) =
      (s"$dirs/in", s"$dirs/store", s"$dirs/out", s"$dirs/ckpt")
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val c = "fresh unrelated content with novel words and phrasing"
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
    val step = StreamOps.minhashLshDedupBatchStep(store, out, "text",
      "doc_id", numHashes = 8, bands = 4)
    def runAvailable(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).foreachBatch(step).start()
      q.awaitTermination(60000)
      q.stop()
    }
    // generation 1: in-batch dup (1,2); then the query "dies"
    Seq((1L, a), (2L, a), (3L, "completely different vocabulary about other topics entirely"))
      .toDF("doc_id", "text").write.mode("append").parquet(in)
    runAvailable()
    val outAfter1 = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(outAfter1 == Set(1L, 3L))
    // generation 2 arrives; RESTART from the same checkpoint:
    // 4 is a cross-batch dup of stored 1, 5 is novel
    Seq((4L, a), (5L, c)).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    runAvailable()
    val outAfter2 = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(outAfter2 == Set(1L, 3L, 5L), outAfter2.toString)
    // the store kept generation 0 AND gained a later slice (batch ids
    // continued — a reset-to-0 restart would have clobbered slice 0)
    val slices = spark.read.parquet(store)
      .select("batch_id").distinct().as[Long].collect().toSet
    assert(slices.size == 2 && slices.contains(0L), slices.toString)
    val storedIds = spark.read.parquet(store)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(storedIds == Set(1L, 3L, 5L))
    // no duplicated store rows (one band row per (doc, band))
    val dupRows = spark.read.parquet(store)
      .groupBy("doc_id", "band").count().filter(col("count") > 1).count()
    assert(dupRows == 0)
    // a third restart with nothing new processes nothing — outputs
    // and store byte-identical (row-level: same counts per slice)
    val before = spark.read.parquet(store).count()
    runAvailable()
    assert(spark.read.parquet(store).count() == before)
    assert(spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 5L))
  }

  test("band-store maintenance parity: streaming store and batch write+append probe interchangeably") {
    // r13 verdict #6: once the batch store gained an append leg, pin
    // that the STREAMING store (per-batch_id slices) and the BATCH
    // store (bucketed write + appendBucketed) are interchangeable as
    // incrementalLsh probe targets. Corpus of all-distinct docs split
    // in two: streaming ingests it as two microbatches; batch writes
    // gen0 then appends gen1. Same probe, same pairs.
    import graft.operators.Dedup
    val docs = (1L to 60L).map(i =>
      (i, s"alpha beta gamma delta body number ${i % 7} tail"))
    val (gen0, gen1) = docs.partition(_._1 % 2 == 0)
    val dirs = java.nio.file.Files.createTempDirectory("graft-store-parity")
    val (sDir, oDir) = (s"$dirs/store", s"$dirs/out")
    val step = StreamOps.minhashLshDedupBatchStep(sDir, oDir, "text",
      "doc_id", numHashes = 8, bands = 4, minJaccard = 0.95)
    // near-dups exist (the %7 cycle) — run both stores over the SAME
    // surviving population: feed streaming first, then build the batch
    // store from exactly the docs the streaming store retained
    step(gen0.toDF("doc_id", "text"), 0L)
    step(gen1.toDF("doc_id", "text"), 1L)
    val streamStore = spark.read.parquet(sDir)
      .select("doc_id", "band", "bucket")
    val survivorIds = streamStore.select("doc_id").distinct()
      .as[Long].collect().toSet
    val surv0 = docs.filter(d => survivorIds(d._1) && d._1 % 2 == 0)
    val surv1 = docs.filter(d => survivorIds(d._1) && d._1 % 2 == 1)
    Dedup.writeBandSignatureStore(surv0.toDF("doc_id", "text"), "text",
      "doc_id", "parity_store", s"$dirs/tbl", buckets = 4,
      numHashes = 8, bands = 4)
    Dedup.appendBandSignatures(surv1.toDF("doc_id", "text"), "text",
      "doc_id", "parity_store", numHashes = 8, bands = 4)
    try {
      // the stores hold identical band rows...
      val sm = streamStore.as[(Long, Int, Long)].collect().toSet
      val bm = spark.table("parity_store")
        .select("doc_id", "band", "bucket")
        .as[(Long, Int, Long)].collect().toSet
      assert(sm == bm && sm.nonEmpty,
        s"store contents diverge: stream-only=${sm -- bm} batch-only=${bm -- sm}")
      // ...and probe identically through incrementalLsh
      val probe = (1L to 6L).map(i =>
        (i + 1000L, s"alpha beta gamma delta body number ${i % 7} tail"))
        .toDF("doc_id", "text")
      val viaStream = Dedup.incrementalLsh(probe, "text", "doc_id",
        streamStore, numHashes = 8, bands = 4)
        .pairs.as[(Long, Long, Long)].collect().toSet
      val viaBatch = Dedup.incrementalLsh(probe, "text", "doc_id",
        spark.table("parity_store"), numHashes = 8, bands = 4)
        .pairs.as[(Long, Long, Long)].collect().toSet
      assert(viaStream == viaBatch && viaStream.nonEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS parity_store")
  }

  test("ingest parity: batch lshIngestBatch and streaming minhashLshDedupBatchStep keep the same survivors") {
    // the two substrates of the same operational loop — bucketed
    // catalog store vs per-batch_id parquet slices — must agree
    // batch-for-batch on who enters the corpus, including in-batch
    // dup resolution, the cross-batch agreement screen, and short-doc
    // passthrough
    import graft.operators.Dedup
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val c = "fresh unrelated content with novel words and phrasing"
    val batch1 = Seq(1L -> a, 2L -> a,
      3L -> "completely different vocabulary about other topics entirely",
      6L -> "xy")
    val batch2 = Seq(4L -> a, 5L -> c)
    val batch3 = Seq(7L -> c, 8L -> "yet another novel set of words here")
    val dirs = java.nio.file.Files.createTempDirectory("graft-ingest-parity")
    // streaming substrate
    val step = StreamOps.minhashLshDedupBatchStep(s"$dirs/store",
      s"$dirs/out", "text", "doc_id", numHashes = 8, bands = 4,
      minJaccard = 0.5)
    Seq(batch1, batch2, batch3).zipWithIndex.foreach { case (rows, i) =>
      step(rows.toDF("doc_id", "text"), i.toLong) }
    def streamSurvivors(i: Int): Set[Long] =
      spark.read.parquet(s"$dirs/out/batch_id=$i")
        .select("doc_id").as[Long].collect().toSet
    // batch substrate
    Dedup.writeBandSignatureStore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "text", "doc_id",
      "parity_ingest", s"$dirs/tbl", buckets = 4, numHashes = 8,
      bands = 4, withSignatures = true)
    try {
      val got = Seq(batch1, batch2, batch3).map { rows =>
        Dedup.lshIngestBatch(rows.toDF("doc_id", "text"), "text",
            "doc_id", "parity_ingest", numHashes = 8, bands = 4,
            minJaccard = 0.5)
          .survivors.select("doc_id").as[Long].collect().toSet
      }
      Seq(0, 1, 2).foreach { i =>
        assert(got(i) == streamSurvivors(i),
          s"batch $i diverged: batch=${got(i)} stream=${streamSurvivors(i)}")
      }
      assert(got(0).nonEmpty && got(1).nonEmpty)
      // and the stores carry the same banded population
      val sIds = spark.read.parquet(s"$dirs/store")
        .select("doc_id").distinct().as[Long].collect().toSet
      val bIds = spark.table("parity_ingest")
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(sIds == bIds, s"stores diverge: stream=$sIds batch=$bIds")
    } finally spark.sql("DROP TABLE IF EXISTS parity_ingest")
  }

  test("ingest parity under exact and hybrid confirms: same survivors as lshIngestBatch; estimator store refuses loudly") {
    // the confirm upgrade must hold across BOTH substrates: the
    // streaming step now runs the same Dedup.confirmedDupPairs code as
    // the batch loop, so survivors match per batch in every mode. The
    // hybrid window 0.25 at k=8 puts cuts at (2,7): estimator-dup,
    // estimator-keep, AND exact-kernel routes all exercised (the
    // q_d_ingest4 oracle fixture's shape).
    import graft.operators.Dedup
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val aNear = "alpha beta gamma delta epsilon zeta eta iota"
    val c = "fresh unrelated content with novel words and phrasing"
    // 9 is an EXACT copy of stored 1 (identical signature → every band
    // collides, J = 1 confirms in every mode) — the deterministic
    // did-the-screen-run anchor; 4 (one token changed, J = 5/7) rides
    // along for the parity check, whatever band fate the hashes deal it
    val batches = Seq(
      Seq(1L -> a, 2L -> a,
        3L -> "completely different vocabulary about other topics entirely",
        6L -> "xy"),
      Seq(4L -> aNear, 5L -> c, 9L -> a),
      Seq(7L -> c, 8L -> "yet another novel set of words here"))
    for (mode <- Seq("exact", "hybrid")) {
      val dirs =
        java.nio.file.Files.createTempDirectory(s"graft-parity-$mode")
      val step = StreamOps.minhashLshDedupBatchStep(s"$dirs/store",
        s"$dirs/out", "text", "doc_id", numHashes = 8, bands = 4,
        minJaccard = 0.5, confirm = mode, hybridWindow = 0.25)
      batches.zipWithIndex.foreach { case (rows, i) =>
        step(rows.toDF("doc_id", "text"), i.toLong) }
      // streaming slices carry the shingle sets (the withShingleSets
      // layout's streaming analogue)
      assert(spark.read.parquet(s"$dirs/store").columns.contains("sset"))
      val tag = s"parity_$mode"
      Dedup.writeBandSignatureStore(Seq.empty[(Long, String)]
          .toDF("doc_id", "text"), "text", "doc_id", tag, s"$dirs/tbl",
        buckets = 4, numHashes = 8, bands = 4, withSignatures = true,
        withShingleSets = true)
      try {
        batches.zipWithIndex.foreach { case (rows, i) =>
          val bSurv = Dedup.lshIngestBatch(rows.toDF("doc_id", "text"),
              "text", "doc_id", tag, numHashes = 8, bands = 4,
              minJaccard = 0.5, confirm = mode, hybridWindow = 0.25)
            .survivors.select("doc_id").as[Long].collect().toSet
          val sSurv = spark.read.parquet(s"$dirs/out/batch_id=$i")
            .select("doc_id").as[Long].collect().toSet
          assert(bSurv == sSurv,
            s"$mode batch $i diverged: batch=$bSurv stream=$sSurv")
        }
        // the cross-batch screen demonstrably ran: doc 7 — an exact
        // copy of batch-2 survivor 5, with no in-batch near-dup to
        // absorb it first — was dropped in every confirm mode
        // (identical signature → every band collides, J = 1 confirms)
        assert(!spark.read.parquet(s"$dirs/out/batch_id=2")
          .select("doc_id").as[Long].collect().toSet.contains(7L))
      } finally spark.sql(s"DROP TABLE IF EXISTS $tag")
    }
    // an estimator-written store cannot be silently downgraded: the
    // exact/hybrid restart fails loudly instead of confirming without
    // shingle sets
    val dirs2 = java.nio.file.Files.createTempDirectory("graft-parity-est")
    StreamOps.minhashLshDedupBatchStep(s"$dirs2/store", s"$dirs2/out",
      "text", "doc_id", numHashes = 8, bands = 4)(
      batches.head.toDF("doc_id", "text"), 0L)
    val ex = intercept[IllegalArgumentException] {
      StreamOps.minhashLshDedupBatchStep(s"$dirs2/store", s"$dirs2/out",
        "text", "doc_id", numHashes = 8, bands = 4, confirm = "hybrid",
        hybridWindow = 0.25)(
        batches(1).toDF("doc_id", "text"), 1L)
    }
    assert(ex.getMessage.contains("shingle sets"))
  }

  test("srpDedupBatchStep: embedding near-dups dropped across batches via the store") {
    implicit val sqlCtx = spark.sqlContext
    val dirs = java.nio.file.Files.createTempDirectory("graft-stream-embdedup")
    val (store, out) = (s"$dirs/store", s"$dirs/out")
    val a = Seq(1.0, 0.2, 0.1, 0.0, 0.3, 0.0, 0.1, 0.2)
    val aJit = Seq(1.0, 0.21, 0.1, 0.0, 0.3, 0.0, 0.1, 0.19) // cos(a,·) ≈ 0.99992
    val b = Seq(0.0, 1.0, 0.0, 0.9, 0.0, 0.8, 0.0, 0.0) // cos(a,·) ≈ 0.12
    val c = Seq(0.1, 0.0, 1.0, 0.0, 0.0, 0.0, 0.9, 0.0) // cos(a,·) ≈ 0.20
    val input = MemoryStream[(Long, Seq[Double])]
    val step = StreamOps.srpDedupBatchStep(store, out, "embedding",
      "vec_id", minCos = 0.95, planes = 8, dim = 8)
    val q = input.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch(step).start()
    try {
      input.addData((1L, a), (2L, aJit), (3L, b)) // 2 is an in-batch near-dup
      q.processAllAvailable()
      input.addData((4L, a), (5L, c)) // 4 is a cross-batch near-dup of 1
      q.processAllAvailable()
      val got = spark.read.parquet(out)
        .select("vec_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L))
      // the store holds signatures only for survivors
      val storedIds = spark.read.parquet(store)
        .select("vec_id").distinct().as[Long].collect().toSet
      assert(storedIds == Set(1L, 3L, 5L))
      // convergence: identical keep-set to the batch twin on the
      // whole corpus (ids arrive in increasing order, so first-seen
      // == min-id representative)
      val batchKept = graft.operators.Dedup.dedupByEmbedding(
        Seq((1L, a), (2L, aJit), (3L, b), (4L, a), (5L, c))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", minCos = 0.95, exact = false,
        multiProbe = true, planes = 8, dim = 8)
        .select("vec_id").as[Long].collect().toSet
      assert(got == batchKept)
      // replaying batch 0 is idempotent: the screen reads only
      // batch_id < current, so survivors are unchanged
      step(Seq((1L, a), (2L, aJit), (3L, b)).toDF("vec_id", "embedding"), 0L)
      val after = spark.read.parquet(out)
        .select("vec_id").as[Long].collect().toSet
      assert(after == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("annotation stage composes with streaming (stateless mapPartitions)") {
    // §2.9 × §2.10: the effectful annotator is a stateless per-row
    // transform, so the same withAnnotations call drops into a
    // readStream pipeline unchanged — per-microbatch partition
    // lifecycle, same output schema as the batch twin
    implicit val sqlCtx = spark.sqlContext
    case class Variant(CHROM: String, POS: Long, REF: String, ALT: String)
    val input = MemoryStream[(String, Long, String, String)]
    val variants = input.toDS()
      .toDF("CHROM", "POS", "REF", "ALT")
    val annotated = graft.annotate.Annotate.withAnnotations(
      variants, new graft.annotate.MockAnnotator, maxRetries = 0)
    val q = annotated.writeStream.format("memory").queryName("anno")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(("17", 7577120L, "C", "T"), ("2", 200L, "G", "C"))
      q.processAllAvailable()
      input.addData(("1", 100L, "A", "G"))
      q.processAllAvailable()
      val got = spark.table("anno")
      assert(got.count() == 3)
      // identical rows to the batch twin on the same input
      val batch = graft.annotate.Annotate.withAnnotations(
        Seq(("17", 7577120L, "C", "T"), ("2", 200L, "G", "C"),
          ("1", 100L, "A", "G")).toDF("CHROM", "POS", "REF", "ALT"),
        new graft.annotate.MockAnnotator, maxRetries = 0)
      assert(got.collect().map(_.toSeq).toSet ==
        batch.collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("asOfEnrichStream: probes enriched from cross-batch reference state") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{AsOfIn, AsOfOut}
    val input = MemoryStream[AsOfIn]
    val q = StreamOps.asOfEnrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: reference r@5 then probe p1@10 (same batch), probe
      // p0@3 BEFORE any reference
      input.addData(
        AsOfIn(1L, 5L, 0, 0L, 50.0),
        AsOfIn(1L, 10L, 1, 101L, 0.0),
        AsOfIn(1L, 3L, 1, 100L, 0.0))
      q.processAllAvailable()
      // batch 2: probe sees the batch-1 reference from STATE; a newer
      // reference then takes over; equal-ts probe matches inclusively
      input.addData(
        AsOfIn(1L, 20L, 1, 102L, 0.0),
        AsOfIn(1L, 30L, 0, 0L, 70.0),
        AsOfIn(1L, 30L, 1, 103L, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof")
        .as[AsOfOut].collect().map(o => o.probe_id ->
          (o.matched_ts, if (o.payload.isNaN) None else Some(o.payload)))
        .toMap
      assert(got(100L) == ((Long.MinValue, None)))  // no reference yet
      assert(got(101L) == ((5L, Some(50.0))))       // same-batch alignment
      assert(got(102L) == ((5L, Some(50.0))))       // from state
      assert(got(103L) == ((30L, Some(70.0))))      // equal ts inclusive
    } finally q.stop()
  }

  test("asOfEnrichStream: late probe emits the sentinel, never a future reference") {
    implicit val sqlCtx = spark.sqlContext
    import StreamOps.{AsOfIn, AsOfOut}
    val input = MemoryStream[AsOfIn]
    val q = StreamOps.asOfEnrichStream(input.toDS())
      .writeStream.format("memory").queryName("asof_late")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(AsOfIn(9L, 100L, 0, 0L, 7.0))
      q.processAllAvailable()
      // probe OLDER than the retained reference: at-or-before cannot
      // be answered from one retained row -> sentinel, not ts=100
      input.addData(AsOfIn(9L, 50L, 1, 200L, 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_late").as[AsOfOut].collect()
        .filter(_.probe_id == 200L).head
      assert(got.matched_ts == Long.MinValue && got.payload.isNaN)
    } finally q.stop()
  }

  test("funnelStream converges to the batch funnel across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val steps = Seq("view", "click", "purchase")
    val q = StreamOps.funnelStream(input.toDS(), steps)
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Update()).start()
    try {
      // u1 advances over two batches; u2's purchase precedes its
      // click -> stuck at 2; u3 same-ts click must NOT advance
      input.addData(
        Event(1L, 10L, 1L, "view", 0.0), Event(1L, 20L, 2L, "click", 0.0),
        Event(2L, 10L, 3L, "view", 0.0), Event(2L, 20L, 4L, "purchase", 0.0),
        Event(3L, 10L, 5L, "view", 0.0), Event(3L, 10L, 6L, "click", 0.0))
      q.processAllAvailable()
      input.addData(
        Event(1L, 30L, 7L, "purchase", 0.0),
        Event(2L, 30L, 8L, "click", 0.0))
      q.processAllAvailable()
      val latest = spark.table("funnel")
        .groupBy("user_id").agg(max("steps_completed").as("sc"))
        .as[(Long, Int)].collect().toMap
      assert(latest == Map(1L -> 3, 2L -> 2, 3L -> 1))
      // equals the batch operator on the union of all events
      val all = Seq(
        (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
        (2L, 10L, "view"), (2L, 20L, "purchase"), (2L, 30L, "click"),
        (3L, 10L, "view"), (3L, 10L, "click")
      ).toDF("user_id", "ts", "event_type")
      val batch = graft.operators.Funnel.reached(all, "user_id", "ts",
        "event_type", steps).as[(Long, Int)].collect().toMap
      assert(latest == batch)
    } finally q.stop()
  }

  test("debounceStream: cross-batch gap state matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.debounceStream(input.toDS(), minGapNs = 30 * M)
      .writeStream.format("memory").queryName("deb")
      .outputMode(OutputMode.Update()).start()
    try {
      // ts offsets start at 60 min, not 0: the event-time timeout
      // defines a watermark, and a row at exactly epoch 0 sits AT the
      // initial watermark and is late-filtered before the state fn
      input.addData(
        Event(1L, 60 * M, 1L, "click", 1.0),
        Event(1L, 70 * M, 2L, "click", 1.0),   // 10 min after 1: dropped
        Event(1L, 105 * M, 3L, "click", 1.0))  // 35 after 2: kept
      q.processAllAvailable()
      // batch 2 starts 10 min after the last SEEN event (3): dropped
      // even though the drop decision crosses the batch boundary
      input.addData(Event(1L, 115 * M, 4L, "click", 1.0),
        Event(1L, 159 * M, 5L, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("deb").select("event_id")
        .as[Long].collect().toSet
      val all = Seq(
        (1L, 60 * M, 1L, "click"), (1L, 70 * M, 2L, "click"),
        (1L, 105 * M, 3L, "click"), (1L, 115 * M, 4L, "click"),
        (1L, 159 * M, 5L, "click"))
        .toDF("user_id", "ts", "event_id", "event_type")
      val batch = graft.operators.Sessionize.debounce(all,
        Seq("user_id", "event_type"), "ts",
        Seq(col("event_id")), minGapNs = 30 * M)
        .select("event_id").as[Long].collect().toSet
      assert(got == batch && got == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("windowedJoinStream: stream-stream range join matches the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val touches = MemoryStream[Event]
    val q = StreamOps.windowedJoinStream(purchases.toDS(), touches.toDS(),
        windowNs = 30 * M)
      .writeStream.format("memory").queryName("wjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      val touchRows = Seq(
        Event(1L, 60 * M, 101L, "ad", 1.0),     // 15 min before purchase: in
        Event(1L, 40 * M, 102L, "email", 1.0),  // 35 min before: out
        Event(2L, 70 * M, 103L, "ad", 1.0))     // other user
      val purchaseRows = Seq(
        Event(1L, 75 * M, 1L, "purchase", 1.0),
        Event(2L, 75 * M, 2L, "purchase", 1.0),
        Event(3L, 76 * M, 3L, "purchase", 1.0)) // no touches: null row
      touches.addData(touchRows: _*)
      purchases.addData(purchaseRows: _*)
      q.processAllAvailable()
      // push both watermarks far past every event so unmatched-left
      // rows (user 3) are emitted and join state is evicted
      touches.addData(Event(99L, 1000 * M, 998L, "ad", 1.0))
      purchases.addData(Event(99L, 1000 * M, 999L, "purchase", 1.0))
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .filter(col("user_id") =!= 99L)
        .select(col("purchase_id"), col("touch_id"))
        .as[(Long, Option[Long])].collect().toSet
      val got = rows(spark.table("wjoin"))
      // the SAME function on batch frames: watermark is a no-op there
      val batch = rows(StreamOps.windowedJoinStream(
        purchaseRows.toDS(), touchRows.toDS(), windowNs = 30 * M))
      assert(got == batch)
      assert(got == Set((1L, Some(101L)), (2L, Some(103L)), (3L, None)))
    } finally q.stop()
  }

  test("scd2EnrichStream: events pick the version effective at their ts") {
    implicit val sqlCtx = spark.sqlContext
    // dimension: key 1 has two versions (tier a then b from ts=100),
    // key 2 one open version from ts=50
    val dim = Seq(
      (1L, "a", 0L, Some(100L), false),
      (1L, "b", 100L, None, true),
      (2L, "c", 50L, None, true))
      .toDF("user_id", "tier", "effective_from", "effective_to", "is_current")
    val input = MemoryStream[Event]
    val q = StreamOps.scd2EnrichStream(input.toDF(), dim, "user_id", "ts")
      .writeStream.format("memory").queryName("scd2e")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1L, 40L, 1L, "click", 1.0),   // version a
        Event(1L, 100L, 2L, "click", 1.0),  // boundary: version b
        Event(2L, 60L, 3L, "click", 1.0),   // version c
        Event(2L, 10L, 4L, "click", 1.0),   // before first version: null
        Event(9L, 40L, 5L, "click", 1.0))   // unknown key: null
      q.processAllAvailable()
      val got = spark.table("scd2e")
        .select(col("event_id"), col("tier"))
        .as[(Long, Option[String])].collect().toMap
      assert(got == Map(1L -> Some("a"), 2L -> Some("b"),
        3L -> Some("c"), 4L -> None, 5L -> None))
      // the same function on a batch frame gives the same enrichment
      val batch = StreamOps.scd2EnrichStream(
          Seq(Event(1L, 40L, 1L, "click", 1.0),
            Event(1L, 100L, 2L, "click", 1.0),
            Event(2L, 60L, 3L, "click", 1.0),
            Event(2L, 10L, 4L, "click", 1.0),
            Event(9L, 40L, 5L, "click", 1.0)).toDF(), dim, "user_id", "ts")
        .select(col("event_id"), col("tier"))
        .as[(Long, Option[String])].collect().toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("linkageScoreStream: blocked stream-static FS scoring, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // reference registry: (id, block, phone, mail)
    val ref = Seq(
      (101L, 1, "555", "x@y"),
      (102L, 1, "999", "q@z"),
      (201L, 2, "111", "a@a"))
      .toDF("rid", "blk", "phone", "mail")
    val input = MemoryStream[(Long, Int, String, String)]
    val scored = StreamOps.linkageScoreStream(
      input.toDF().toDF("rid", "blk", "phone", "mail"), ref,
      "rid", Seq("blk"), Seq("phone" -> "phone", "mail" -> "mail"))
    val q = scored.writeStream.format("memory").queryName("links")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, 1, "555", "x@y"), // full match vs 101, none vs 102
        (2L, 2, "000", "b@b"), // blocked vs 201, no agreement
        (3L, 9, "555", "x@y")) // no block -> emits nothing
      q.processAllAvailable()
      val got = spark.table("links")
        .select(col("stream_id"), col("ref_id"), col("n_agree"),
          col("score_unats"))
        .as[(Long, Long, Int, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(got.keySet == Set((1L, 101L), (1L, 102L), (2L, 201L)))
      assert(got((1L, 101L))._1 == 2 && got((1L, 102L))._1 == 0 &&
        got((2L, 201L))._1 == 0)
      // full agreement outranks; disagreement scores are negative
      assert(got((1L, 101L))._2 > 0L && got((1L, 102L))._2 < 0L)
      // batch parity: same function over a batch frame
      val batch = StreamOps.linkageScoreStream(
          Seq((1L, 1, "555", "x@y"), (2L, 2, "000", "b@b"),
            (3L, 9, "555", "x@y")).toDF("rid", "blk", "phone", "mail"),
          ref, "rid", Seq("blk"),
          Seq("phone" -> "phone", "mail" -> "mail"))
        .select(col("stream_id"), col("ref_id"), col("n_agree"),
          col("score_unats"))
        .as[(Long, Long, Int, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("meanShiftStream converges to the batch meanShiftPoints") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.meanShiftStream(input.toDS(), k = 3,
        thresholdMilli = 2000L)
      .writeStream.format("memory").queryName("shift")
      .outputMode(OutputMode.Append()).start()
    // two keys; key "a" steps from ~1.0 to ~6.0 at t=6 (a clean shift
    // for k=3), key "b" stays flat; values have one decimal so the
    // milli conversion is exact in both engines
    val rng = new scala.util.Random(7)
    def v(base: Double) = math.rint(base * 10 + rng.nextInt(3)) / 10.0
    val all = (0 until 12).map { i =>
      Event(1L, (i + 1) * M, i.toLong, "a",
        v(if (i < 6) 1.0 else 6.0))
    } ++ (0 until 10).map { i =>
      Event(2L, (i + 1) * M, 100L + i, "b", v(2.0))
    }
    try {
      // split MID-WINDOW: rows 0-4 of "a" arrive in batch 1, the rest
      // in batch 2 — emission at the boundary must use carried state
      val (b1, b2) = all.partition(_.ts <= 5 * M)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("shift")
        .select("event_type", "ts", "lsum_milli", "rsum_milli",
          "shift_milli", "is_shift")
        .as[(String, Long, Long, Long, Long, Int)].collect().toSet
      val batch = graft.operators.Features.meanShiftPoints(
        all.toDF(), Seq("event_type"), "ts", "value", k = 3,
        thresholdMilli = 2000L, tiebreak = Seq(col("event_id")))
        .as[(String, Long, Long, Long, Long, Int)].collect().toSet
      assert(got == batch)
      assert(batch.exists(_._6 == 1)) // the "a" step is detected
      assert(batch.forall(t => t._1 != "b" || t._6 == 0)) // "b" is calm
    } finally q.stop()
  }

  test("autocorrStream running value equals the batch autocorrelation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamOps.autocorrStream(input.toDS())
      .writeStream.format("memory").queryName("acorr")
      .outputMode(OutputMode.Update()).start()
    val rng = new scala.util.Random(13)
    // "up" trends (strong +r1), "alt" alternates (strong -r1),
    // "tiny" has 2 pairs -> null r1; one-decimal values = exact millis
    val all = (0 until 20).map { i =>
      Event(1L, (i + 1) * M, i.toLong, "up",
        math.rint(i * 10 + rng.nextInt(2)) / 10.0)
    } ++ (0 until 20).map { i =>
      Event(2L, (i + 1) * M, 100L + i, "alt",
        if (i % 2 == 0) 1.0 else 9.0)
    } ++ (0 until 3).map { i =>
      Event(3L, (i + 1) * M, 200L + i, "tiny", i * 1.0)
    }
    try {
      val (b1, b2) = all.partition(_.ts <= 9 * M)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("acorr")
        .groupBy("event_type")
        .agg(max(struct(col("n_pairs"), col("r1"))).as("s"))
        .select(col("event_type"), col("s.n_pairs"), col("s.r1"))
        .as[(String, Long, Option[Double])].collect().toSet
      val batch = graft.operators.Features.autocorrelation(
        all.toDF(), Seq("event_type"), "ts", "value",
        Seq(col("event_id")))
        .as[(String, Long, Option[Double])].collect().toSet
      assert(got == batch)
      val byKey = batch.map(t => t._1 -> t._3).toMap
      assert(byKey("up").exists(_ > 0.9) && byKey("alt").exists(_ < -0.9))
      assert(byKey("tiny").isEmpty)
    } finally q.stop()
  }

  test("psiStream per-bucket drift equals the batch Profile.psi headline") {
    implicit val sqlCtx = spark.sqlContext
    // reference ~ N(5, 1)-ish fixed sample; bucket 0 of the stream
    // matches it, bucket 1 shifts hard right (drift the gate must see)
    val rng = new scala.util.Random(29)
    val refVals = (0 until 200).map(_ => math.rint((5.0 + rng.nextGaussian()) * 10) / 10.0)
    val ref = refVals.toDF("value")
    val (lo, hi, refCounts) = graft.operators.Profile.psiReference(ref, "value", bins = 8)
    val input = MemoryStream[Event]
    val q = StreamOps.psiStream(input.toDS(), lo, hi, refCounts.toSeq,
        bucketNs = 100 * M)
      .writeStream.format("memory").queryName("psi")
      .outputMode(OutputMode.Update()).start()
    val all = (0 until 150).map { i =>
      Event(1L, (i + 1) * M, i.toLong, "a",
        math.rint((5.0 + rng.nextGaussian()) * 10) / 10.0)  // bucket 0: same dist
    } ++ (0 until 150).map { i =>
      Event(2L, (i + 101) * M, 500L + i, "a",
        math.rint((9.0 + rng.nextGaussian()) * 10) / 10.0)  // bucket 1+: shifted
    } ++ Seq(Event(3L, 2 * M, 900L, "a", Double.NaN)) // NaN -> bin 0, both engines
    // ((long)Math.floor(NaN) == 0 before the clamps — StreamOps.psiStream's fold
    // and the batch floor/cast expression agree; pinned empirically in round 10)
    try {
      val (b1, b2) = all.partition(_.ts <= 120 * M) // split INSIDE bucket 1
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("psi")
        .groupBy("bucket").agg(max(struct(col("n_cur"), col("psi"))).as("s"))
        .select(col("bucket"), col("s.n_cur"), col("s.psi"))
        .as[(Long, Long, Double)].collect()
        .map { case (b, n, p) => b -> ((n, p)) }.toMap
      // batch twin per bucket: round6(sum of bin-ascending psi_terms)
      def round6(d: Double) =
        BigDecimal.valueOf(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      all.groupBy(_.ts / (100 * M)).foreach { case (b, evs) =>
        val cur = evs.map(_.value).toDF("value")
        val terms = graft.operators.Profile.psi(ref, cur, "value", bins = 8)
          .orderBy("bin").select("psi_term").as[Double].collect()
        val expected = round6(terms.sum)
        assert(got(b)._1 == evs.length && got(b)._2 == expected,
          s"bucket $b: got ${got(b)}, expected (${evs.length}, $expected)")
      }
      assert(got(0L)._2 < 0.1 && got(2L)._2 > 0.5) // calm vs drifted
    } finally q.stop()
  }
}
