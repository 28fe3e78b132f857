package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Plan-quality assertions — the properties `.explain` audits by eye,
  * pinned as tests so a refactor can't silently regress them:
  * signature sharing, broadcast choice, parquet pushdown/pruning. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("LSH plan computes the minhash signature ONCE per row") {
    // a real scan, not a LocalRelation — local input would be
    // constant-folded and the expression wouldn't survive to the plan
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Dedup.minhashLshCandidates(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3)
      .pairs.queryExecution.optimizedPlan.toString
    // one kernel call in the whole plan: the banding projection reads
    // the bound signature column, never re-derives it per band/perm
    assert(count(plan, "graft_minhash_sig") == 1, plan)
  }

  test("jaccard plan builds token hashes in their own projection (no inlining)") {
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val plan = Dedup.ngramJaccard(pairs, docs, "text", "doc_id", 3)
      .queryExecution.optimizedPlan.toString
    // tokenization (split+xxhash) appears once per join side, not once
    // per element_at reference inside the shingle transform
    assert(count(plan, "split(lower(text") <= 2, plan)
  }

  test("VAF lookup join broadcasts the small side") {
    val maf = (1L to 100L).map(i => (i.toString, i, "x"))
      .toDF("Chromosome", "Start_Position", "payload")
    val af = Seq(("1", 1, "0.5")).toDF("Chromosome", "Start_Position", "AF")
    val plan = graft.operators.VariantOps.addVaf(maf, af)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("parquet scan: filter pushed down, columns pruned") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val q = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      formatted)
    // ReadSchema carries only the referenced columns, not all 16
    val read = formatted.linesIterator
      .find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(read.contains("l_orderkey") && read.contains("l_quantity") &&
      !read.contains("l_extendedprice"), read)
  }

  test("wide conditional-agg matrix shuffles exactly once") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("pcol", concat(lit("p"), col("l_partkey") % 20))
    val plan = graft.operators.Pivots.continuousAgg(
      li, "l_suppkey", "pcol", "l_quantity",
      (0 until 20).map(i => s"p$i"), c => sum(c))
      .queryExecution.sparkPlan.toString
    // at most ONE exchange (zero when the scan is a single partition),
    // never the pre-agg + pivot double shuffle; map-side combine on
    assert(count(plan, "Exchange") <= 1, plan)
    assert(plan.contains("partial_sum"), plan)
  }

  test("dumpStats window admits statement markers only, not complete INSERT rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-dump")
    val p = dir.resolve("d.sql")
    java.nio.file.Files.writeString(p,
      "CREATE TABLE `t` (\n  `id` int,\n);\nINSERT INTO `t` VALUES (1);\n")
    val plan = graft.sources.Readers.dumpStats(spark, p.toString)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.size == 1, plan.toString)
    val sub = windows.head.treeString
    // below the window: the bare-header anchor (VALUES at end-of-line)
    // admits multi-line INSERT headers; the self-identifying complete
    // INSERT pattern (VALUES followed by a tuple) must NOT feed it
    assert(sub.contains("VALUES\\s*$"), sub)
    assert(!sub.contains("VALUES\\s*\\("), sub)
  }

  test("multi-probe SRP plan: no cartesian, candidates deduped BEFORE the vector join-back") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qe = Similarity.lshBucketedMultiProbe(emb, "vec_id", "embedding",
      minCos = 0.2).pairs.queryExecution
    // every join is an equi join — the probe expansion must never
    // degrade to an all-pairs nested loop
    val sp = qe.sparkPlan.toString
    assert(!sp.contains("CartesianProduct") &&
      !sp.contains("BroadcastNestedLoopJoin"), sp)
    // the candidate distinct groups on BARE ids (no vector columns):
    // each surviving pair is scored once, after dedup
    val dedupAggs = qe.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.output.map(_.name).toSet == Set("id_a", "id_b") => a
    }
    assert(dedupAggs.nonEmpty, qe.optimizedPlan.toString)
  }

  test("SimHash near-dup candidate stage: no full-table window, no cartesian") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val qe = Dedup.simhashNearDups(docs, "text", "doc_id",
      bits = 32, maxHamming = 3).queryExecution
    assert(qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, qe.optimizedPlan.toString)
    assert(!qe.sparkPlan.toString.contains("CartesianProduct"),
      qe.sparkPlan.toString)
  }

  test("SRP-bucketed pair stage: no full-table window, no cartesian") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val qe = Similarity.lshBucketed(emb, "vec_id", "embedding",
      minCos = 0.3).queryExecution
    assert(qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, qe.optimizedPlan.toString)
    assert(!qe.sparkPlan.toString.contains("CartesianProduct"),
      qe.sparkPlan.toString)
  }

  test("IVF assignment broadcasts centroids (no shuffle of the corpus)") {
    val emb = (1L to 50L).map(i =>
      (i, Array.fill(8)(i.toFloat))).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(emb, "vec_id", "embedding", 4)
    val plan = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("bloom semi join: probe filter sits on the big side BELOW the join") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val ords = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .filter(col("o_totalprice") > 450000.0)
    val qe = graft.operators.BloomJoin.semiJoin(li, ords,
      "l_orderkey", "o_orderkey", numBits = 1 << 16).queryExecution
    val plan = qe.sparkPlan.toString
    val probeIdx = plan.indexOf("graft_bloom_might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(probeIdx >= 0, plan)
    // sparkPlan prints top-down: the join node precedes (is above)
    // the probe filter, so the filter runs before rows reach the join
    assert(joinIdx >= 0 && joinIdx < probeIdx, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("chunking is map-only: no exchange anywhere in the plan") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = graft.operators.Corpus.chunk(docs, "text", "doc_id",
      maxChars = 80, overlap = 20).queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("decontamination: no cartesian; train grams semi-joined") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val qe = graft.operators.Decontaminate.overlapReport(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      "text", "doc_id", n = 5).queryExecution
    val plan = qe.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // ONE tokenization pass per side: the n-gram kernel appears once
    // for train and once for bench, never a third time for the counts
    assert(count(plan, "graft_ngram_hashes") <= 2, plan)
  }

  test("interval merge + scd2: one exchange each (groupBy/windows reuse the key partitioning)") {
    // parquet scans, not LocalRelations — local inputs plan without
    // exchanges at all and the assertion would be vacuous
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val iv = orders.select((col("o_orderkey") % 23).as("chrom"),
      (col("o_orderkey") * 53 % 100000).as("s"),
      (col("o_orderkey") * 53 % 100000 + 100).as("e"))
    // executedPlan: exchanges exist only after EnsureRequirements
    val mergePlan = graft.operators.Intervals
      .mergeOverlaps(iv, Seq("chrom"), "s", "e")
      .queryExecution.executedPlan.toString
    assert(count(mergePlan, "Exchange hashpartitioning") == 1, mergePlan)
    val scd2Plan = graft.operators.Merge.scd2(
      orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus"),
      Seq("o_custkey"), "o_orderdate", tieBreak = Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(count(scd2Plan, "Exchange hashpartitioning") == 1, scd2Plan)
  }

  test("prefix-filter pairs: no cartesian; candidates deduped before the verify join") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val qe = Dedup.prefixFilterPairs(docs, "text", "doc_id", 0.6)
      .queryExecution
    val plan = qe.sparkPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan)
    // the distinct() on (id_a, id_b) sits in the optimized plan as an
    // Aggregate BELOW the set-verification joins
    val opt = qe.optimizedPlan.toString
    assert(opt.contains("Aggregate [id_a"), opt)
  }

  test("count-min estimate broadcasts the sketch, never shuffles the queries") {
    val stream = (1L to 2000L).map(i => i % 50).toDF("k")
    val sk = graft.operators.Sketch.countMin(stream, "k", 4, 64)
    val plan = graft.operators.Sketch
      .estimate(sk, stream.distinct(), "k", 4, 64)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("weighted sample is a TakeOrdered, not a global sort") {
    val df = (1L to 2000L).map(i => (i, 1.0 + i)).toDF("id", "w")
    val plan = graft.operators.Sampling
      .weightedSample(df, "id", "w", k = 10)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Sort ["), plan) // no full-sort operator
  }

  test("incremental dedup: bucketed signature store joins exchange-free (corpus never re-shuffles)") {
    val docs = (1L to 200L).map(i => (i, s"text body number ${i % 7}"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.writeSignatureStore(docs.filter(col("doc_id") % 10 =!= 0),
      "text", "doc_id", "sig_store_test", path + "/tbl", buckets = 4)
    try {
      val store = spark.table("sig_store_test")
      val got = Dedup.incrementalExact(
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", store)
      val plan = got.queryExecution.executedPlan.toString
      // the store side satisfies BOTH its aggregation and its join leg
      // from the bucketed scan: the ONLY exchange is the batch side
      assert(count(plan, "Exchange") == 1, plan)
      assert(plan.contains("Bucketed: true"), plan)
      // semantics: checked against a brute-force two-sided join (the
      // %7 content cycle guarantees every batch doc has stored dups)
      val sigs = Dedup.contentSignatures(docs, "text", "doc_id")
      val brute = sigs.filter(col("doc_id") % 10 === 0).as("b")
        .join(sigs.filter(col("doc_id") % 10 =!= 0)
          .groupBy("sig").agg(min("doc_id").as("dup_of")), Seq("sig"))
        .select("doc_id", "dup_of")
        .as[(Long, Long)].collect().toSet
      val gotSet = got.select("doc_id", "dup_of")
        .as[(Long, Long)].collect().toSet
      assert(gotSet == brute && gotSet.nonEmpty, s"got=$gotSet")
    } finally spark.sql("DROP TABLE IF EXISTS sig_store_test")
  }

  test("incremental LSH: bucketed band store probes exchange-free (corpus never re-shuffles)") {
    val docs = (1L to 200L).map(i =>
        (i, s"alpha beta gamma delta body number ${i % 7} tail"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bandstore").toString
    Dedup.writeBandSignatureStore(docs.filter(col("doc_id") % 10 =!= 0),
      "text", "doc_id", "band_store_test", path + "/tbl", buckets = 4,
      numHashes = 8, bands = 4)
    try {
      val store = spark.table("band_store_test")
      val got = Dedup.incrementalLsh(
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", store,
        numHashes = 8, bands = 4)
      val plan = got.pairs.queryExecution.executedPlan.toString
      // the store side satisfies BOTH the bucket-size window and its
      // join leg from the bucketed scan; the only exchanges are the
      // batch band shuffle and the batch-sized pair aggregation
      assert(count(plan, "Exchange") == 2, plan)
      assert(plan.contains("Bucketed: true"), plan)
      // semantics: brute-force band self-join (the %7 content cycle
      // guarantees every batch doc has stored near-dups)
      val storeBands = Dedup.bandSignatures(
        docs.filter(col("doc_id") % 10 =!= 0), "text", "doc_id",
        numHashes = 8, bands = 4)
      val batchBands = Dedup.bandSignatures(
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id",
        numHashes = 8, bands = 4)
      val brute = batchBands.as("b")
        .join(storeBands.withColumnRenamed("doc_id", "cand_id"),
          Seq("band", "bucket"))
        .groupBy("doc_id", "cand_id")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("bm"))
        .as[(Long, Long, Long)].collect().toSet
      val gotSet = got.pairs.as[(Long, Long, Long)].collect().toSet
      assert(gotSet == brute && gotSet.nonEmpty, s"got=$gotSet")
      // no silent drops at this corpus size
      assert(got.droppedBuckets.count() == 0)
    } finally spark.sql("DROP TABLE IF EXISTS band_store_test")
  }

  test("incremental LSH: store stays exchange-free AFTER appendBandSignatures (two generations)") {
    val docs = (1L to 200L).map(i =>
        (i, s"alpha beta gamma delta body number ${i % 7} tail"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("bandstore2").toString
    // gen0 = even corpus ids; gen1 = odd corpus ids folded in via append
    Dedup.writeBandSignatureStore(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 2 === 0),
      "text", "doc_id", "band_store_app", path + "/tbl", buckets = 4,
      numHashes = 8, bands = 4)
    Dedup.appendBandSignatures(
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 2 === 1),
      "text", "doc_id", "band_store_app", numHashes = 8, bands = 4)
    try {
      val store = spark.table("band_store_app")
      val got = Dedup.incrementalLsh(
        docs.filter(col("doc_id") % 10 === 0), "text", "doc_id", store,
        numHashes = 8, bands = 4)
      val plan = got.pairs.queryExecution.executedPlan.toString
      // the append must not cost the store its bucketed-scan
      // distribution: still exactly the two batch-sided exchanges
      assert(count(plan, "Exchange") == 2, plan)
      assert(plan.contains("Bucketed: true"), plan)
      // semantics: identical to a store written in ONE generation
      val oneShot = Dedup.bandSignatures(
        docs.filter(col("doc_id") % 10 =!= 0), "text", "doc_id",
        numHashes = 8, bands = 4)
      val brute = Dedup.bandSignatures(
          docs.filter(col("doc_id") % 10 === 0), "text", "doc_id",
          numHashes = 8, bands = 4)
        .join(oneShot.withColumnRenamed("doc_id", "cand_id"),
          Seq("band", "bucket"))
        .groupBy("doc_id", "cand_id")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("bm"))
        .as[(Long, Long, Long)].collect().toSet
      val gotSet = got.pairs.as[(Long, Long, Long)].collect().toSet
      assert(gotSet == brute && gotSet.nonEmpty, s"got=$gotSet")
    } finally spark.sql("DROP TABLE IF EXISTS band_store_app")
  }

  test("winnowing fingerprints are map-only: no exchange in the plan") {
    val docs = (1L to 50L).map(i => (i, s"a b c d e f g $i"))
      .toDF("doc_id", "text")
    val plan = Dedup.winnowFingerprints(docs, "text", "doc_id", 3, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("OHLC bars: exactly one exchange, no window") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val plan = graft.operators.Features
      .ohlcBars(events, Seq("event_type"), "ts", "event_id", "value",
        3600000000000L)
      .queryExecution.executedPlan.toString
    assert(count(plan, "Exchange hashpartitioning") == 1, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("hard negatives broadcast the anchors, never shuffle the corpus twice") {
    val df = (1L to 500L).map(i =>
      (i, Array(i.toFloat, 1f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val plan = Similarity.hardNegatives(df, df.filter(col("vec_id") < 5),
      "vec_id", "embedding", "label", 5)
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("meanPool shuffles groups x dims, not the corpus twice") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = Similarity.meanPool(emb, "embedding", "label")
      .queryExecution.executedPlan.toString
    // (label,pos) aggregation + per-label reassembly: two exchanges,
    // both with map-side partials; no window anywhere
    assert(count(plan, "Exchange hashpartitioning") == 2, plan)
    assert(!plan.contains("Window"), plan)
  }

  test("BM25: query-term filter sits below the first aggregation") {
    val docs = (1L to 200L).map(i => (i, s"spark join vector doc $i"))
      .toDF("doc_id", "text")
    val optimized = graft.operators.Tfidf
      .bm25(docs, "text", "doc_id", Seq("spark", "join"))
      .queryExecution.optimizedPlan.toString
    // the membership filter on exploded terms survives optimization
    // (it must prune before the tf aggregation, not after)
    assert(optimized.contains("IN (spark,join)") ||
      optimized.contains("INSET"), optimized.take(2000))
  }

  test("count-min build runs the compiled bucket kernel, not the hex chain") {
    val df = (1L to 100L).map(i => Tuple1(i)).toDF("k")
    val plan = graft.operators.Sketch.countMin(df, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_cms_buckets"), plan)
    assert(!plan.contains("conv("), plan)
  }

  test("BPE encode: one kernel call on a vocab-sized frame, occurrences join broadcast") {
    val docs = Seq((1L, "low lower slow"), (2L, "low slow")).toDF("doc_id", "text")
    val merges = graft.operators.Bpe.learnMerges(docs, "text", k = 5)
    val qe = graft.operators.Bpe.encode(docs, "text", "doc_id", merges)
      .queryExecution
    // the k merges live INSIDE one expression — not a k-deep fold whose
    // plan grows with the vocabulary size (optimizedPlan: the simple
    // physical toString elides aggregate result expressions)
    assert(count(qe.optimizedPlan.toString, "graft_bpe_encode") == 1,
      qe.optimizedPlan.toString)
    assert(qe.executedPlan.toString.contains("BroadcastHashJoin"),
      qe.executedPlan.toString)
  }

  test("goldenRecord: all attributes resolve in ONE window (one exchange)") {
    val df = (1L to 50L).map(i => (i % 5, i, s"n$i", i * 1.5))
      .toDF("cluster", "id", "name", "bal")
    val plan = graft.operators.Merge.goldenRecord(df, "cluster",
        Seq(col("id").desc))
      .queryExecution.executedPlan.toString
    assert(count(plan, "Exchange hashpartitioning") == 1, plan)
    assert(count(plan, "Window") <= 2, plan) // rn/count + firsts, same key
  }

  test("packExact: no single-task global window (partition-local windows only)") {
    val df = (1L to 400L).map(i => (i, i % 97 + 3L)).toDF("id", "w")
    val plan = graft.operators.Batching.packExact(df, "id", "w",
        seqLen = 128L, numPartitions = 8)
      .queryExecution.executedPlan.toString
    // every Window partitions by __pid — a global ntile-style window
    // would show 'Window [...]' without a partition spec and move the
    // whole table through one task
    assert(!plan.contains("Window [") ||
      !plan.contains("windowspecdefinition()"), plan)
    assert(plan.contains("RangePartitioning") ||
      plan.contains("rangepartitioning"), plan)
  }

  test("temperature mix: rates broadcast, corpus never shuffles") {
    val df = (1L to 2000L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "src")
    val plan = graft.operators.Sampling.temperatureMix(df, "doc_id", "src",
        alpha = 0.5, targetTotal = 500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges feed the rate build (tiny) and the broadcast;
    // no hash-exchange of the corpus side by doc rows
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("tumor/normal merge: full-outer on the variant key, single join") {
    val mk = (m: Long) => (1L to 40L).filter(_ % m == 0)
      .map(i => (s"chr${i % 3}", i, "A", "T", s"i$i", i * 1.0, s"s$i"))
      .toDF("CHROM", "POS", "REF", "ALT", "INFO", "QUAL", "S1")
    val plan = graft.operators.VariantOps
      .mergeTumorNormal(mk(2), mk(3), "S1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(count(plan, "SortMergeJoin") + count(plan, "BroadcastHashJoin")
      + count(plan, "ShuffledHashJoin") == 1, plan)
  }

  test("mean-shift change points: both frames fold into ONE window pass") {
    val df = (1 to 40).map(i => ("k", i.toLong, i * 1.0))
      .toDF("key", "ord", "v")
    val plan = graft.operators.Features.meanShiftPoints(df, Seq("key"),
        "ord", "v", 4, 1000L, Seq(col("ord")))
      .queryExecution.executedPlan.toString
    assert(count(plan, "Window [") == 1, plan)
    assert(count(plan, "Exchange") == 1, plan)
  }

  test("closest: no window over the pair set, no cartesian, binned overlap leg") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val part = Tables.load(spark, "/root/testdata/sf0.001", "part")
    val ord = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val a = part.select(col("p_partkey").as("g_id"),
      (col("p_partkey") % 23).as("chrom"),
      ((col("p_partkey") * 37) % 100000).as("g_start"),
      ((col("p_partkey") * 37) % 100000 + 60).as("g_end"))
    val b = ord.select(col("o_orderkey").as("s_id"),
      (col("o_orderkey") % 23).as("chrom"),
      ((col("o_orderkey") * 53) % 100000).as("s_start"),
      ((col("o_orderkey") * 53) % 100000 + 100).as("s_end"))
    val qe = graft.operators.Intervals.closest(a, b, Seq("chrom"),
      "g_id", "g_start", "g_end", "s_id", "s_start", "s_end",
      binWidth = 10000).queryExecution
    // the best-neighbor pick must be the min(struct) AGGREGATION, not
    // a row_number window sorting the enumerated overlap-pair set —
    // the sf1 stall mode (one task TimSorting ~10^8 pair rows). The
    // TWO windows that remain are the as-of legs' per-key running
    // last() over the n+m union — neither may order by the pair
    // distance (the old implementation's signature).
    val wins = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.size == 2, qe.optimizedPlan.toString)
    assert(wins.forall(!_.orderSpec.exists(
      _.child.references.exists(_.name == "dist"))),
      qe.optimizedPlan.toString)
    val sp = qe.sparkPlan.toString
    assert(!sp.contains("CartesianProduct") &&
      !sp.contains("BroadcastNestedLoopJoin"), sp)
    assert(!sp.contains("WindowGroupLimit"), sp)
  }

  test("skyline2D: one range-frame window, one exchange, no join") {
    val df = (1 to 40).map(i => ("g", (i % 7).toLong, i))
      .toDF("k", "cost", "q")
    val plan = graft.operators.Features.skyline2D(df, Seq("k"), "cost", "q")
      .queryExecution.executedPlan.toString
    assert(count(plan, "Window [") == 1, plan)
    assert(count(plan, "Exchange") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("FS field weights: ONE table scan + ONE Expand serve all fields") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val cust = Tables.load(spark, dir, "customer")
    val plan = graft.operators.Linkage.fieldWeights(cust,
        Seq("bal" -> "cast(floor(c_acctbal / 100) as bigint)",
          "tail" -> "substr(c_name, -2, 2)",
          "mid" -> "substr(c_name, -4, 2)"))
      .queryExecution.executedPlan.toString
    assert(count(plan, "Expand") == 1, plan)
    assert(count(plan, "Scan parquet") == 1, plan)
  }

  test("fellegiSunter: no cartesian on records (weight frames are 1-row)") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val cust = Tables.load(spark, dir, "customer")
    val plan = graft.operators.Linkage.fellegiSunter(cust, "c_custkey",
        Seq("c_nationkey", "c_mktsegment"),
        Seq("tail" -> "substr(c_name, -2, 2)"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the record-pair join is an equi-join on the block keys
    assert(count(plan, "SortMergeJoin") + count(plan, "BroadcastHashJoin")
      + count(plan, "ShuffledHashJoin") >= 1, plan)
  }

  test("auc: prefix sum is range-partitioned, never a global window") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 3000L).map(i => (i % 97 * 1.0, i % 3 == 0))
      .toDF("s", "lbl")
    val plan = graft.operators.Classify.auc(df, "s", col("lbl"))
      .queryExecution.executedPlan.toString
    // every Window partitions by __pid (the range-partition id); an
    // empty windowspecdefinition() would be the single-task trap
    assert(!plan.contains("windowspecdefinition()"), plan)
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan)
    // offsets join back as a broadcast (metadata-sized)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("vocabCoverage: frequency rank is range-partitioned, one final agg") {
    val df = (1L to 500L).map(i => (i, s"w${i % 50} w${i % 7} common"))
      .toDF("doc_id", "text")
    val plan = graft.operators.Tfidf.vocabCoverage(df, "text", Seq(10, 50))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition()"), plan)
    assert(plan.contains("rangepartitioning") ||
      plan.contains("RangePartitioning"), plan)
  }
}
