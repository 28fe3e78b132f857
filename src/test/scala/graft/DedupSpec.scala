package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("keepFirst: deterministic under explicit total order") {
    val df = Seq(
      ("k1", 5, "a"), ("k1", 9, "b"), ("k1", 9, "a"),
      ("k2", 1, "z")).toDF("k", "v", "t")
    val got = Dedup.keepFirst(df, Seq("k"),
      Seq(col("v").desc, col("t").asc))
      .as[(String, Int, String)].collect().toSet
    assert(got == Set(("k1", 9, "a"), ("k2", 1, "z")))
  }

  test("keepLongest: longest interval wins, tiebreak applies") {
    val df = Seq(
      ("g1", 0L, 10L, "x"), ("g1", 0L, 100L, "y"),
      ("g1", 100L, 200L, "z") // same length as y: tiebreak t asc -> y
    ).toDF("g", "s", "e", "t")
    val got = Dedup.keepLongest(df, Seq("g"), "s", "e", Seq(col("t").asc))
      .as[(String, Long, Long, String)].collect().toSet
    assert(got == Set(("g1", 0L, 100L, "y")))
  }

  test("preferReported: 'Not Reported' and null sort last (mci:263-279)") {
    val df = Seq(
      ("v1", "Not Reported", 1), ("v1", "Pathogenic", 2),
      ("v2", null, 1), ("v2", "Benign", 9),
      ("v3", null, 3)).toDF("key", "sig", "ord")
    val got = Dedup.preferReported(df, Seq("key"), "sig", Seq(col("ord").asc))
      .select("key", "sig").as[(String, String)].collect().toSet
    assert(got == Set(("v1", "Pathogenic"), ("v2", "Benign"), ("v3", null)))
  }

  test("exactByContent groups identical text") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("id", "text")
    val got = Dedup.exactByContent(df, "text", "id")
      .select("keep_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH: identical docs collide in every band, distinct docs don't") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different words about spark query engines at scale"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 4L)))
  }

  test("dedupByLsh end-to-end: keeps one representative per dup cluster") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val docs = Seq(
      (1L, base), (2L, base), (5L, base),                  // exact dup cluster
      (3L, "completely different text about spark engines and scale systems"),
      (4L, "another unrelated document with its own distinct vocabulary set"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupByLsh(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3, minJaccard = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("lshIngestBatch: probe-confirm-accept-append closes the loop across three batches") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-ingest")
    val tag = "ingest_test_store"
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "completely different vocabulary about other topics entirely"
    val c = "fresh unrelated content with novel words and phrasing"
    Dedup.writeBandSignatureStore(mk(Seq.empty), "text", "doc_id", tag,
      s"$dirs/tbl", buckets = 4, numHashes = 8, bands = 4,
      withSignatures = true)
    try {
      // batch 1: in-batch dup (1,2) collapses; all reps enter corpus
      val r1 = Dedup.lshIngestBatch(mk(Seq(1L -> a, 2L -> a, 3L -> b)),
        "text", "doc_id", tag, numHashes = 8, bands = 4)
      assert(r1.survivors.select("doc_id").as[Long].collect().toSet
        == Set(1L, 3L))
      assert(r1.crossBatchDups.count() == 0)
      // batch 2: 4 is a cross-batch dup of stored 1; 5 is novel;
      // 6 is SHORT (no bands) — kept, never screened, never stored
      val r2 = Dedup.lshIngestBatch(
        mk(Seq(4L -> a, 5L -> c, 6L -> "xy")),
        "text", "doc_id", tag, numHashes = 8, bands = 4)
      assert(r2.survivors.select("doc_id").as[Long].collect().toSet
        == Set(5L, 6L))
      assert(r2.crossBatchDups.select("doc_id", "cand_id")
        .as[(Long, Long)].collect().toSet == Set(4L -> 1L))
      // batch 3: dup of batch-2's survivor — the APPEND leg works
      // (the store now holds batch 2's acceptance, not just batch 1)
      val r3 = Dedup.lshIngestBatch(mk(Seq(7L -> c)),
        "text", "doc_id", tag, numHashes = 8, bands = 4)
      assert(r3.survivors.count() == 0)
      assert(r3.crossBatchDups.select("doc_id", "cand_id")
        .as[(Long, Long)].collect().toSet == Set(7L -> 5L))
      // store contents: exactly the accepted banded docs, with mh
      val stored = spark.table(tag)
      assert(stored.select("doc_id").distinct().as[Long].collect().toSet
        == Set(1L, 3L, 5L))
      assert(stored.columns.contains("mh"))
      // a plain (signature-free) store refuses loudly
      Dedup.writeBandSignatureStore(mk(Seq(9L -> a)), "text", "doc_id",
        "ingest_plain", s"$dirs/plain", buckets = 4, numHashes = 8,
        bands = 4)
      intercept[IllegalArgumentException] {
        Dedup.lshIngestBatch(mk(Seq(10L -> a)), "text", "doc_id",
          "ingest_plain", numHashes = 8, bands = 4)
      }
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tag")
      spark.sql("DROP TABLE IF EXISTS ingest_plain")
    }
  }

  test("lshIngestBatch under a writer lease: foreign holder blocks loudly, store untouched; lease released after success") {
    import graft.sources.Storage
    val dirs = java.nio.file.Files.createTempDirectory("graft-ingest-lease")
    val tag = "ingest_lease_store"
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    Dedup.writeBandSignatureStore(Seq.empty[(Long, String)]
        .toDF("doc_id", "text"), "text", "doc_id", tag,
      s"$dirs/tbl", buckets = 4, numHashes = 8, bands = 4,
      withSignatures = true)
    try {
      // another job holds the lease: the leased ingest fails LOUDLY
      // before touching the store (no interleaved generation, no
      // manifest blessing a half-written union)
      val other = Storage.acquireWriterLease(spark, tag, "other-ingest")
      val rowsBefore = spark.table(tag).count()
      val ex = intercept[IllegalStateException] {
        Dedup.lshIngestBatch(Seq(1L -> a).toDF("doc_id", "text"),
          "text", "doc_id", tag, numHashes = 8, bands = 4,
          leaseOwner = "this-ingest")
      }
      assert(ex.getMessage.contains("other-ingest"))
      assert(spark.table(tag).count() == rowsBefore)
      // holder releases → the leased ingest proceeds AND releases its
      // own lease afterward (a follow-up leased ingest acquires fine)
      Storage.releaseWriterLease(spark, other)
      val r1 = Dedup.lshIngestBatch(Seq(1L -> a).toDF("doc_id", "text"),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        leaseOwner = "this-ingest")
      assert(r1.survivors.count() == 1)
      val r2 = Dedup.lshIngestBatch(Seq(2L -> a).toDF("doc_id", "text"),
        "text", "doc_id", tag, numHashes = 8, bands = 4,
        leaseOwner = "this-ingest")
      assert(r2.survivors.count() == 0 && r2.crossBatchDups.count() == 1)
    } finally spark.sql(s"DROP TABLE IF EXISTS $tag")
  }

  test("lshIngestBatch confirm=exact: shingle-set store, exact Jaccard decisions, append preserves layout") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-exactconf")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c = "fresh unrelated content with novel words and phrasing today"
    Dedup.writeBandSignatureStore(Seq(1L -> a).toDF("doc_id", "text"),
      "text", "doc_id", "exc_t", s"$dirs/t", buckets = 4, numHashes = 8,
      bands = 4, withShingleSets = true)
    try {
      val stored = spark.table("exc_t")
      assert(stored.columns.contains("sset") && stored.columns.contains("mh"))
      // batch: 2 is an exact dup of stored 1 (J=1.0); 3 is novel
      val r = Dedup.lshIngestBatch(Seq(2L -> a, 3L -> c).toDF("doc_id", "text"),
        "text", "doc_id", "exc_t", numHashes = 8, bands = 4,
        confirm = "exact")
      val dups = r.crossBatchDups.select("doc_id", "cand_id", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(dups == Set((2L, 1L, 1.0)), dups.toString)
      assert(r.survivors.select("doc_id").as[Long].collect().toSet == Set(3L))
      // the appended generation carries the shingle-set layout too
      val afterCols = spark.table("exc_t").columns.toSet
      assert(afterCols.contains("sset"))
      assert(spark.table("exc_t").select("doc_id").distinct()
        .as[Long].collect().toSet == Set(1L, 3L))
      // second batch: near-dup of 3 below J=0.5 must SURVIVE under the
      // exact confirm (deterministic — no estimator noise near the
      // threshold): 4 shares a 4-token run with 3 (2 shared shingles
      // of 8+8 total -> J = 2/14 < 0.5)
      val nearMiss = "fresh unrelated content with altered trailing words appended here"
      val exactJ = Dedup.ngramJaccard(Seq((3L, 4L)).toDF("id_a", "id_b"),
        Seq(3L -> c, 4L -> nearMiss).toDF("doc_id", "text"),
        "text", "doc_id", 3).select("jaccard").as[Double].head()
      assert(exactJ > 0 && exactJ < 0.5, s"fixture J=$exactJ")
      val r2 = Dedup.lshIngestBatch(Seq(4L -> nearMiss).toDF("doc_id", "text"),
        "text", "doc_id", "exc_t", numHashes = 8, bands = 4,
        confirm = "exact")
      assert(r2.survivors.select("doc_id").as[Long].collect().toSet == Set(4L))
      assert(r2.crossBatchDups.count() == 0)
      // a store without sset refuses confirm="exact" loudly
      Dedup.writeBandSignatureStore(Seq(9L -> a).toDF("doc_id", "text"),
        "text", "doc_id", "exc_plain", s"$dirs/p", buckets = 4,
        numHashes = 8, bands = 4, withSignatures = true)
      val e = intercept[IllegalArgumentException] {
        Dedup.lshIngestBatch(Seq(10L -> a).toDF("doc_id", "text"),
          "text", "doc_id", "exc_plain", numHashes = 8, bands = 4,
          confirm = "exact")
      }
      assert(e.getMessage.contains("withShingleSets"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS exc_t")
      spark.sql("DROP TABLE IF EXISTS exc_plain")
    }
  }

  test("band store refuses appends/ingest under a different LSH recipe (table properties)") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-lshprops")
    val docs = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
      .toDF("doc_id", "text")
    Dedup.writeBandSignatureStore(docs, "text", "doc_id", "lshp_t",
      s"$dirs/t", buckets = 4, numHashes = 8, bands = 4,
      withSignatures = true)
    try {
      // drifted numHashes: schema-compatible, semantically incompatible
      val e1 = intercept[IllegalArgumentException] {
        Dedup.appendBandSignatures(Seq(2L -> "some other words here now")
          .toDF("doc_id", "text"), "text", "doc_id", "lshp_t",
          numHashes = 16, bands = 4)
      }
      assert(e1.getMessage.contains("numHashes"))
      val e2 = intercept[IllegalArgumentException] {
        Dedup.lshIngestBatch(Seq(3L -> "yet more words to ingest today")
          .toDF("doc_id", "text"), "text", "doc_id", "lshp_t",
          numHashes = 8, bands = 2)
      }
      assert(e2.getMessage.contains("bands"))
      // matching recipe still works
      Dedup.appendBandSignatures(Seq(4L -> "fresh content with new words")
        .toDF("doc_id", "text"), "text", "doc_id", "lshp_t",
        numHashes = 8, bands = 4)
      assert(spark.table("lshp_t").select("doc_id").distinct().count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS lshp_t")
  }

  test("lshIngestBatch confirm=hybrid: estimator fast paths outside the band, exact kernel inside") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-hybrid")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c = "fresh unrelated content with novel words and phrasing today"
    // near-dup of c above the threshold: last token changed ->
    // 7 shared of 9 distinct shingles, J = 7/9 ~ 0.78
    val cNear = "fresh unrelated content with novel words and phrasing nowhere"
    // below-threshold overlap with c (same fixture as the exact test)
    val cMiss = "fresh unrelated content with altered trailing words appended here"
    Dedup.writeBandSignatureStore(
      Seq(1L -> a, 2L -> c).toDF("doc_id", "text"),
      "text", "doc_id", "hyb_t", s"$dirs/t", buckets = 4, numHashes = 8,
      bands = 4, withShingleSets = true)
    try {
      // window 0.25 at k=8 -> cuts (2, 7): agree >= 7 is an
      // estimator-decided dup whose exact kernel never ran (jaccard
      // null in the report); the exact-dup batch doc exercises it
      assert(Dedup.hybridCuts(8, 0.5, 0.25) == (2L, 7L))
      val r1 = Dedup.lshIngestBatch(Seq(10L -> a).toDF("doc_id", "text"),
        "text", "doc_id", "hyb_t", numHashes = 8, bands = 4,
        minJaccard = 0.5, confirm = "hybrid", hybridWindow = 0.25)
      assert(r1.survivors.count() == 0)
      val rep1 = r1.crossBatchDups
        .select("doc_id", "cand_id", "agree", "jaccard")
        .as[(Long, Long, Long, Option[Double])].collect().toSet
      assert(rep1 == Set((10L, 1L, 8L, None)), rep1.toString)
      // window 1.0 -> cuts (0, 13): no estimator fast path, EVERY
      // collided pair routes to the exact kernel — the in-band leg.
      // cNear (J ~ 0.78 vs stored 2) drops with a real jaccard;
      // cMiss (J < 0.5) must SURVIVE even though it collides
      assert(Dedup.hybridCuts(8, 0.5, 1.0) == (0L, 13L))
      val exactJ = Dedup.ngramJaccard(Seq((2L, 11L)).toDF("id_a", "id_b"),
        Seq(2L -> c, 11L -> cNear).toDF("doc_id", "text"),
        "text", "doc_id", 3).select("jaccard").as[Double].head()
      assert(exactJ >= 0.5, s"fixture J=$exactJ")
      val r2 = Dedup.lshIngestBatch(
        Seq(11L -> cNear).toDF("doc_id", "text"),
        "text", "doc_id", "hyb_t", numHashes = 8, bands = 4,
        minJaccard = 0.5, confirm = "hybrid", hybridWindow = 1.0)
      assert(r2.survivors.count() == 0)
      val rep2 = r2.crossBatchDups
        .select("doc_id", "cand_id", "jaccard")
        .as[(Long, Long, Option[Double])].collect().toSet
      assert(rep2 == Set((11L, 2L, Some(BigDecimal(exactJ)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))),
        rep2.toString)
      val r3 = Dedup.lshIngestBatch(
        Seq(12L -> cMiss).toDF("doc_id", "text"),
        "text", "doc_id", "hyb_t", numHashes = 8, bands = 4,
        minJaccard = 0.5, confirm = "hybrid", hybridWindow = 1.0)
      assert(r3.survivors.select("doc_id").as[Long].collect().toSet
        == Set(12L))
      assert(r3.crossBatchDups.count() == 0)
      // a signature-only store refuses hybrid loudly
      Dedup.writeBandSignatureStore(Seq(9L -> a).toDF("doc_id", "text"),
        "text", "doc_id", "hyb_plain", s"$dirs/p", buckets = 4,
        numHashes = 8, bands = 4, withSignatures = true)
      val e = intercept[IllegalArgumentException] {
        Dedup.lshIngestBatch(Seq(20L -> a).toDF("doc_id", "text"),
          "text", "doc_id", "hyb_plain", numHashes = 8, bands = 4,
          confirm = "hybrid")
      }
      assert(e.getMessage.contains("withShingleSets"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS hyb_t")
      spark.sql("DROP TABLE IF EXISTS hyb_plain")
    }
  }

  test("hybridCuts: default window is 4/sqrt(k); boundaries round outward into the exact band") {
    // k=64, t=0.5, default w=0.5: band is the whole agreement range —
    // everything routes to exact, nothing escapes to the estimator
    assert(Dedup.hybridCuts(64, 0.5) == (0L, 65L))
    // k=256, t=0.5, default w=0.25: agree in [64, 193) routes exact;
    // 192 = (t+w)*k exactly stays IN the band (outward rounding),
    // 193 is the first estimator-dup
    assert(Dedup.hybridCuts(256, 0.5) == (64L, 193L))
    // explicit window wins over the default
    assert(Dedup.hybridCuts(256, 0.5, 0.125) == (96L, 161L))
  }

  test("hash-family guard: a store with recipe properties but a foreign/missing family tag fails loudly") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-hashfam")
    val docs = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
      .toDF("doc_id", "text")
    Dedup.writeBandSignatureStore(docs, "text", "doc_id", "fam_t",
      s"$dirs/t", buckets = 4, numHashes = 8, bands = 4,
      withSignatures = true)
    try {
      // simulate a store written by a pre-fix build: recipe properties
      // present, hashFamily tag absent — its signatures were computed
      // under the retired coefficient family and would never agree
      spark.sql("ALTER TABLE fam_t UNSET TBLPROPERTIES ('graft.lsh.hashFamily')")
      val e = intercept[IllegalArgumentException] {
        Dedup.appendBandSignatures(
          Seq(2L -> "some other words arriving now today").toDF("doc_id", "text"),
          "text", "doc_id", "fam_t", numHashes = 8, bands = 4)
      }
      assert(e.getMessage.contains("hash family"), e.getMessage)
      // a drifted (future) family tag fails the same way
      spark.sql("ALTER TABLE fam_t SET TBLPROPERTIES ('graft.lsh.hashFamily'='other-v9')")
      val e2 = intercept[IllegalArgumentException] {
        Dedup.lshIngestBatch(
          Seq(3L -> "yet more words to ingest right now").toDF("doc_id", "text"),
          "text", "doc_id", "fam_t", numHashes = 8, bands = 4)
      }
      assert(e2.getMessage.contains("other-v9"), e2.getMessage)
      // a hand-built table with NO graft.lsh.* properties at all is a
      // legacy layout — let through (the guard is not a gate on those)
      graft.sources.Storage.writeBucketed(
        Dedup.bandSignatures(docs, "text", "doc_id", 8, 4, 3),
        "fam_legacy", s"$dirs/l", bucketKeys = Seq("band", "bucket"),
        buckets = 4)
      Dedup.appendBandSignatures(
        Seq(4L -> "fresh legacy content with new words").toDF("doc_id", "text"),
        "text", "doc_id", "fam_legacy", numHashes = 8, bands = 4)
      assert(spark.table("fam_legacy").select("doc_id").distinct().count() == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS fam_t")
      spark.sql("DROP TABLE IF EXISTS fam_legacy")
    }
  }

  test("compactBucketed carries graft.* properties: the recipe guard survives compaction") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-compactprops")
    val docs = Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
      .toDF("doc_id", "text")
    Dedup.writeBandSignatureStore(docs, "text", "doc_id", "cpr_t",
      s"$dirs/t0", buckets = 4, numHashes = 8, bands = 4,
      withSignatures = true)
    try {
      Dedup.appendBandSignatures(
        Seq(2L -> "more content words arriving in batch two").toDF("doc_id", "text"),
        "text", "doc_id", "cpr_t", numHashes = 8, bands = 4)
      val old = graft.sources.Storage.compactBucketed(spark, "cpr_t", s"$dirs/t1")
      // the compacted generation still carries the semantic properties…
      val props = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("cpr_t")).properties
      assert(props.get("graft.lsh.numHashes").contains("8"), props.toString)
      assert(props.get("graft.lsh.hashFamily")
        .contains(graft.functions.TextFns.hashFamily), props.toString)
      // …so a drifted-recipe append STILL fails loudly after compaction
      // (the exact silent-disarm failure the carry-over prevents)
      val e = intercept[IllegalArgumentException] {
        Dedup.appendBandSignatures(
          Seq(3L -> "drifted recipe content words here").toDF("doc_id", "text"),
          "text", "doc_id", "cpr_t", numHashes = 16, bands = 4)
      }
      assert(e.getMessage.contains("numHashes"))
      graft.sources.Storage.retire(spark, "cpr_t", Seq(old))
    } finally spark.sql("DROP TABLE IF EXISTS cpr_t")
  }

  test("composed ingest crash recovery: interrupted append + recoverToManifest replays to the uninterrupted result") {
    val dirs = java.nio.file.Files.createTempDirectory("graft-ingestcrash")
    val mk = (rows: Seq[(Long, String)]) => rows.toDF("doc_id", "text")
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "completely different vocabulary about other topics entirely now"
    val c = "fresh unrelated content with novel words and phrasing today"
    val batch1 = Seq(1L -> a, 2L -> b)
    val batch2 = Seq(5L -> c, 6L -> a) // 6 is a cross-batch dup of 1
    for ((tag, sub) <- Seq("crash_t" -> "ct", "crash_ref" -> "cr"))
      Dedup.writeBandSignatureStore(mk(Seq.empty), "text", "doc_id", tag,
        s"$dirs/$sub", buckets = 4, numHashes = 8, bands = 4,
        withSignatures = true)
    try {
      def ingest(tag: String, rows: Seq[(Long, String)]) =
        Dedup.lshIngestBatch(mk(rows), "text", "doc_id", tag,
          numHashes = 8, bands = 4, minJaccard = 0.5)
      // uninterrupted twin
      ingest("crash_ref", batch1); val rRef = ingest("crash_ref", batch2)
      // crashed run: batch 1 commits, then an append DIES after its
      // files land but before the manifest write — the stray rows are
      // a copy of c under doc 99, which (if recovery failed to delete
      // them) would swallow batch 2's doc 5 as a cross-batch dup
      ingest("crash_t", batch1)
      graft.sources.Storage.appendBucketed(spark,
        Dedup.bandSignaturesMh(mk(Seq(99L -> c)), "text", "doc_id", 8, 4, 3),
        "crash_t", commitManifest = false)
      assert(spark.table("crash_t").filter(col("doc_id") === 99L).count() > 0)
      // restart protocol: recover to the last-good manifest first
      val deleted = graft.sources.Storage.recoverToManifest(spark, "crash_t")
      assert(deleted.nonEmpty)
      assert(spark.table("crash_t").filter(col("doc_id") === 99L).count() == 0)
      val rGot = ingest("crash_t", batch2)
      assert(rGot.survivors.select("doc_id").as[Long].collect().toSet
        == rRef.survivors.select("doc_id").as[Long].collect().toSet)
      assert(rGot.crossBatchDups.select("doc_id", "cand_id")
        .as[(Long, Long)].collect().toSet
        == rRef.crossBatchDups.select("doc_id", "cand_id")
          .as[(Long, Long)].collect().toSet)
      // the stores themselves converged to identical contents
      val sGot = spark.table("crash_t")
        .select("doc_id", "band", "bucket").as[(Long, Int, Long)]
        .collect().toSet
      val sRef = spark.table("crash_ref")
        .select("doc_id", "band", "bucket").as[(Long, Int, Long)]
        .collect().toSet
      assert(sGot == sRef)
    } finally {
      spark.sql("DROP TABLE IF EXISTS crash_t")
      spark.sql("DROP TABLE IF EXISTS crash_ref")
    }
  }

  test("minhash coefficient family is not rank-1 (the confirm-census degeneracy class)") {
    // the pre-r15 family a_i = c1·(i+1), b_i = c2·(i+1) satisfies
    // a_i·b_j ≡ a_j·b_i (mod P) for ALL slot pairs — slot values
    // collapse to (i+1)·g and one small-g shingle dominates every
    // slot (measured: J=0.01 pairs agreeing on 60–95 of 128 slots).
    // Pin that the current family breaks proportionality.
    import graft.functions.TextFns
    val P = BigInt(TextFns.P)
    val proportional = (0 until 16).combinations(2).forall { case Seq(i, j) =>
      (BigInt(TextFns.minhashA(i)) * TextFns.minhashB(j) -
       BigInt(TextFns.minhashA(j)) * TextFns.minhashB(i)).mod(P) == 0
    }
    assert(!proportional, "minhash coefficients are a rank-1 family — " +
      "one shared small-g shingle would dominate every slot again")
  }

  test("minhash agreement estimator: within ±3.5/√k of exact Jaccard on fixture pairs, k=16/64/128") {
    // The sizing contract lshIngestBatch's cross-batch confirm relies
    // on (measured corpus-wide by graft.tools.ConfirmCensus): the
    // agreement fraction is an unbiased Jaccard estimator with ~1/√k
    // std. Fixture pairs span J ≈ 0.1–0.9; deterministic hashes make
    // this a fixed-point pin, the 3.5σ+0.02 slack is the documented
    // band.
    import graft.functions.TextFns
    val base = (0 until 60).map(i => s"w$i")
    val docs = (1 to 9).flatMap { m =>
      val keep = 6 * m // shared prefix length
      val a = base.mkString(" ")
      val b = (base.take(keep) ++ (0 until (60 - keep)).map(i => s"x${m}_$i"))
        .mkString(" ")
      Seq((m * 2L, a), (m * 2L + 1, b))
    }.toDF("doc_id", "text")
    val pairs = (1 to 9).map(m => (m * 2L, m * 2L + 1)).toDF("id_a", "id_b")
    val exact = Dedup.ngramJaccard(pairs, docs, "text", "doc_id", 3)
      .select("id_a", "jaccard")
    val sigs = docs.select(col("doc_id"),
      TextFns.minhashSignatureNative(col("text"), 128, 3).as("mh"))
    val joined = exact
      .join(sigs.select(col("doc_id").as("id_a"), col("mh").as("ma")), Seq("id_a"))
      .join(pairs, Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("mh").as("mb")), Seq("id_b"))
    def agree(k: Int) = (0 until k).map(i =>
      when(col("ma").getItem(i) === col("mb").getItem(i), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k
    val rows = joined.select(col("jaccard"), agree(16).as("e16"),
      agree(64).as("e64"), agree(128).as("e128")).collect()
    assert(rows.length == 9)
    for (r <- rows; (k, idx) <- Seq((16, 1), (64, 2), (128, 3))) {
      val (j, est) = (r.getDouble(0), r.getDouble(idx))
      assert(math.abs(est - j) <= 3.5 / math.sqrt(k) + 0.02,
        s"k=$k: estimate $est vs exact J $j out of band")
    }
  }

  test("dupClusters: connected components via label propagation") {
    // components: {1,2,3,4} (chain), {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
  }

  test("minhash LSH: oversize buckets are reported, not silently dropped") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (1L to 6L).map(i => (i, base)).toDF("doc_id", "text")
    // all 6 docs identical -> every band bucket has 6 members > maxBucket=4
    val res = Dedup.minhashLshCandidates(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3, maxBucket = 4)
    assert(res.pairs.count() == 0)
    val dropped = res.droppedBuckets
      .select("band", "size").as[(Int, Int)].collect()
    assert(dropped.length == 4 && dropped.forall(_._2 == 6))
  }

  test("minhash LSH: short docs excluded instead of sharing a null bucket") {
    val docs = Seq(
      (1L, "a b"), (2L, "c d"), (3L, "e"),   // < shingleSize tokens
      (4L, "one real document with enough words to produce shingles here"))
      .toDF("doc_id", "text")
    val res = Dedup.minhashLshCandidates(docs, "text", "doc_id",
      numHashes = 8, bands = 4, shingleSize = 3)
    // no spurious pairs among the short docs
    assert(res.pairs.count() == 0 && res.droppedBuckets.count() == 0)
  }

  test("simhashNearDups: banding is exact vs brute-force hamming") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(11)
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simhashNearDups(docs, "text", "doc_id",
      bits = 16, maxHamming = 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the same signatures
    val sigs = docs.select(col("doc_id"),
      graft.functions.TextFns.simhash(col("text"), 16).as("s"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == expected)
    assert(expected.nonEmpty) // fixture actually exercises the path
  }

  test("dupClusters: 200-node chain converges in O(log n) rounds (pointer jumping)") {
    // worst-case diameter graph: a path 1-2-...-200. Pure min-label
    // propagation needs ~200 rounds; with pointer jumping the label
    // tree halves per round, so 12 rounds must be plenty for n=200
    val pairs = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // force the distributed loop: this test pins the O(log n) claim
    val got = Dedup.dupClusters(pairs, maxIterations = 12,
      localSolveMaxEdges = 0)
    assert(got.count() == 200)
    assert(got.select("cluster_id").distinct().as[Long].collect().toSeq
      == Seq(1L))
  }

  test("cache-in-loop guard: per-round plan size stays O(1) in rounds (the sf100 driver-planning bug class)") {
    // The r13 session-2 bug: a .cache() preserving a huge producer
    // plan feeding the CC loop re-analyzed that plan EVERY round on
    // the driver (162 s of idle executors at sf100). The discipline is
    // lineage truncation at the loop's edge (eager checkpoint) plus a
    // bounded cache window (checkpointEvery). This guard pins it: the
    // analyzed-plan size observed per round must not grow with rounds
    // — only with the bounded in-window chain. A 200-node chain forces
    // ≥6 distributed rounds; a PRODUCER with a deliberately deep plan
    // (10 stacked projections + a union) stands in for the LSH subtree.
    val base = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val deep = (1 to 10).foldLeft(base)((d, _) =>
      d.select(col("id_a") + 1 - 1 as "id_a", col("id_b")))
    val producer = deep.unionAll(deep).distinct()
    val sizes = scala.collection.mutable.Map[Int, Int]()
    graft.operators.Dedup.roundProbe = (round, frame) =>
      sizes(round) = frame.queryExecution.analyzed.treeString.length
    try {
      val got = Dedup.dupClusters(producer, maxIterations = 12,
        checkpointEvery = 3, localSolveMaxEdges = 0)
      assert(got.select("cluster_id").distinct().count() == 1)
      assert(sizes.size >= 6, s"expected >=6 rounds, saw ${sizes.keys}")
      // no growth ACROSS checkpoint windows: within a window the chain
      // deepens by design (bounded by checkpointEvery), so the pin is
      // that NO later round exceeds the first window's max by more
      // than expr-id-digit noise. Leaked producer lineage (the bug
      // class) grows the per-round plan by the whole producer tree —
      // orders of magnitude past this bound.
      val firstWindowMax = sizes.filter(_._1 < 3).values.max
      sizes.foreach { case (r, s) =>
        assert(s <= 2 * firstWindowMax,
          s"round $r plan $s > 2x first-window max $firstWindowMax — " +
            s"lineage leaking across rounds: $sizes")
      }
    } finally graft.operators.Dedup.roundProbe = null
  }

  test("dupClusters: reliable checkpoint dir (cluster knob) — loop is green and uses the dir") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      val got = Dedup.dupClusters(pairs, maxIterations = 12,
        localSolveMaxEdges = 0)
      assert(got.count() == 64 &&
        got.select("cluster_id").distinct().count() == 1)
      // the reliable path actually wrote checkpoint data
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        s"no checkpoint data under $dir")
    } finally {
      // clear the sticky session-level dir so later tests keep the
      // localCheckpoint path; setCheckpointDir(null) may NPE in the
      // non-local-path warning, so fall back to the bytecode setter
      try spark.sparkContext.setCheckpointDir(null)
      catch { case _: Throwable =>
        spark.sparkContext.getClass.getMethods
          .find(_.getName == "checkpointDir_$eq")
          .foreach(_.invoke(spark.sparkContext, None))
      }
    }
  }

  test("dupClusters: hitting maxIterations throws instead of returning split clusters") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      // localSolveMaxEdges = 0 forces the distributed loop
      Dedup.dupClusters(pairs, maxIterations = 0, localSolveMaxEdges = 0)
    }
  }

  test("dupClusters: matches brute-force components on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 30
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // brute-force union-find on the driver
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => (v, find(v))).toSet
      // both paths must agree with the brute force: the driver-side
      // union-find (default) and the distributed pointer-jump loop
      val local = Dedup.dupClusters(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toSet
      val dist = Dedup.dupClusters(edges.toDF("id_a", "id_b"),
        localSolveMaxEdges = 0)
        .as[(Long, Long)].collect().toSet
      assert(local == expected, s"trial $trial (local)")
      assert(dist == expected, s"trial $trial (distributed)")
    }
  }

  test("dedupBySimhash: exact-dup texts collapse, distinct texts survive") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (4L, base), (9L, base),  // hamming 0 cluster
      (2L, "completely different text about spark engines and scale systems"),
      (3L, "another unrelated document with its own distinct vocabulary set"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupBySimhash(docs, "text", "doc_id",
      bits = 32, maxHamming = 0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(4L) && !kept.contains(9L))
    assert(kept.contains(2L) && kept.contains(3L))
  }

  test("dedupKeepBest: cluster keeps the highest-score member, not the min id") {
    val docs = Seq(
      (1L, "short dup", 10L),        // cluster {1,4}: 4 scores higher
      (4L, "short dup", 90L),
      (7L, "solo survivor", 5L))     // singleton: kept regardless
      .toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 4L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupKeepBest(docs, pairs, "doc_id", col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(4L, 7L), kept)
    // tie on score -> min id wins
    val tied = docs.withColumn("score", lit(1L))
    val keptTie = Dedup.dedupKeepBest(tied, pairs, "doc_id", col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptTie == Set(1L, 7L), keptTie)
  }

  test("dedupByEmbedding: near-identical vectors collapse to one representative") {
    def vec(base: Double, jitter: Double): Array[Double] =
      Array.tabulate(8)(i => base + i + jitter)
    val docs = Seq(
      (1L, vec(1.0, 0.0)), (2L, vec(1.0, 0.001)), (7L, vec(1.0, -0.001)),
      (3L, Array.tabulate(8)(i => if (i % 2 == 0) 5.0 else -5.0)))
      .toDF("vec_id", "embedding")
    for ((exact, probe) <- Seq((true, false), (false, false), (false, true))) {
      val kept = Dedup.dedupByEmbedding(docs, "vec_id", "embedding",
        minCos = 0.9999, exact = exact, multiProbe = probe)
        .select("vec_id").as[Long].collect().toSet
      assert(kept == Set(1L, 3L), s"exact=$exact multiProbe=$probe")
    }
  }

  test("srpIngestBatch: the embedding ingest loop closes probe-confirm-accept-append across three batches") {
    import graft.operators.Similarity
    val dirs = java.nio.file.Files.createTempDirectory("graft-srp-ingest")
    val tag = "srp_ingest_test_store"
    val a = Array.tabulate(8)(i => 1.0 + i)
    val b = Array.tabulate(8)(i => if (i % 2 == 0) 5.0 else -5.0)
    val c = Array.tabulate(8)(i => if (i < 4) -3.0 else 4.0)
    val dd = Array.tabulate(8)(i => math.sin(i + 1.0) * 3.0)
    val mk = (rows: Seq[(Long, Array[Double])]) =>
      rows.toDF("vec_id", "embedding")
    Similarity.writeSrpStore(mk(Seq.empty), "vec_id", "embedding", tag,
      s"$dirs/tbl", buckets = 4)
    try {
      // batch 1: in-batch dup (1,2) collapses; reps enter the corpus
      val r1 = Similarity.srpIngestBatch(mk(Seq(1L -> a, 2L -> a, 3L -> b)),
        "vec_id", "embedding", tag, minCos = 0.9)
      assert(r1.survivors.select("vec_id").as[Long].collect().toSet
        == Set(1L, 3L))
      assert(r1.crossBatchDups.count() == 0)
      // batch 2: 4 duplicates stored 1 (exact vector, cos = 1);
      // 5 is novel
      val r2 = Similarity.srpIngestBatch(mk(Seq(4L -> a, 5L -> c)),
        "vec_id", "embedding", tag, minCos = 0.9)
      assert(r2.survivors.select("vec_id").as[Long].collect().toSet
        == Set(5L))
      assert(r2.crossBatchDups.select("vec_id", "cand_id", "cos")
        .as[(Long, Long, Double)].collect().toSet == Set((4L, 1L, 1.0)))
      // batch 3: dup of batch-2's ACCEPTED survivor — the append leg
      // works; 7 is novel
      val r3 = Similarity.srpIngestBatch(mk(Seq(6L -> c, 7L -> dd)),
        "vec_id", "embedding", tag, minCos = 0.9)
      assert(r3.survivors.select("vec_id").as[Long].collect().toSet
        == Set(7L))
      assert(r3.crossBatchDups.select("vec_id", "cand_id")
        .as[(Long, Long)].collect().toSet == Set(6L -> 5L))
      // store holds exactly the accepted vectors' bucket rows
      assert(spark.table(tag).select("vec_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L, 7L))
      // recipe drift fails loudly (plane-count mismatch)
      val ex = intercept[IllegalArgumentException] {
        Similarity.srpIngestBatch(mk(Seq(9L -> a)), "vec_id",
          "embedding", tag, minCos = 0.9, planes = 4)
      }
      assert(ex.getMessage.contains("planes"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tag")
  }

  test("100TB path: shingle sets materialized to bucketed storage feed Jaccard") {
    // the documented scale shape (shingleSets scaladoc): build the
    // hashed set frame ONCE, write it bucketed by id, score candidate
    // pairs from storage — shingling never reruns per scoring pass
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, "text", "doc_id", 3)
    val path = java.nio.file.Files.createTempDirectory("sets").toString
    graft.sources.Storage.writeBucketed(sets, "shingle_sets",
      path + "/tbl", bucketKeys = Seq("__id"), buckets = 4)
    try {
      val stored = graft.sources.Storage.table(spark, "shingle_sets")
      val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
      val got = Dedup.ngramJaccardOnSets(pairs, stored)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 2L, 1.0), (1L, 3L, 0.0)))
    } finally spark.sql("DROP TABLE IF EXISTS shingle_sets")
  }

  test("bucket-count sketch bound: >= true intersection on random sets (suffix-filter soundness)") {
    // the static suffix filter is only exact if the sketch bound never
    // UNDERshoots |A∩B| — probe the pairing across set shapes incl.
    // saturation (>127 elements per bucket forces the overflow path)
    val rnd = new scala.util.Random(42)
    val cases = (0 until 40).map { i =>
      val na = 1 + rnd.nextInt(if (i % 5 == 0) 12000 else 80)
      val nb = 1 + rnd.nextInt(if (i % 5 == 0) 12000 else 80)
      val shared = rnd.nextInt(math.min(na, nb) + 1)
      // element domain small enough that buckets collide + saturate
      val pool = (0 until (na + nb)).map(_ => rnd.nextLong() % 5000).distinct
      val common = pool.take(shared)
      val restA = pool.drop(shared).take(na - shared)
      val restB = pool.drop(shared + restA.size).take(nb - shared)
      ((common ++ restA).toArray, (common ++ restB).toArray)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      cases.map { case (a, b) => org.apache.spark.sql.Row(a, b) }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.types.StructField("b",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def sk(c: org.apache.spark.sql.Column, bits: Int) =
      ColumnBridge.column(graft.plans.BucketCountSketch(
        ColumnBridge.expression(c), bits))
    def bb(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      ColumnBridge.column(graft.plans.BucketBound(
        ColumnBridge.expression(x), ColumnBridge.expression(y)))
    for (bits <- Seq(1, 6, 8)) {
      val got = df.select(
        bb(sk(col("a"), bits), sk(col("b"), bits)).as("bound"),
        size(array_intersect(col("a"), col("b"))).as("inter"))
        .as[(Int, Int)].collect()
      got.foreach { case (bound, inter) =>
        assert(bound >= inter, s"bits=$bits: bound $bound < inter $inter")
      }
    }
    // mismatched sketch widths fail safe (-1)
    val mm = df.select(bb(sk(col("a"), 4), sk(col("b"), 6)).as("bound"))
      .as[Int].collect()
    assert(mm.forall(_ == -1))
  }

  test("ngramJaccard: identical=1, disjoint=0") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w q"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.ngramJaccard(pairs, docs, "text", "doc_id", 3)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (1L, 3L, 0.0)))
  }

  test("duplicatedNgrams: cross-doc n-grams flagged, within-doc repeats are not") {
    val docs = Seq(
      (1L, "the cat sat on the mat today"),       // shares 5-gram with 2
      (2L, "the cat sat on the mat tomorrow"),
      (3L, "aa bb cc dd ee aa bb cc dd ee"),      // repeats ONLY within itself
      (4L, "completely different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedNgrams(docs, "text", "doc_id", n = 5,
      minDocs = 2).as[(Long, Long, Long)].collect()
    // docs 1+2 share exactly two 5-grams ("the cat sat on the",
    // "cat sat on the mat"); doc 3's self-repeats span < 2 docs
    assert(got.length == 2)
    assert(got.forall { case (_, nd, nt) => nd == 2 && nt == 2 })
  }

  test("sourceOverlap: within-source dups don't inflate, pairs ordered") {
    val docs = Seq(
      (1L, "same content", "A"), (2L, "same content", "B"),
      (3L, "same content", "B"),   // within-B dup: counts once
      (4L, "other content", "A"), (5L, "other content", "C"),
      (6L, "unique", "C"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceOverlap(docs, "text", "source")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("A", "B", 1L), ("A", "C", 1L)))
  }

  test("winnowPairs: shared-passage docs pair, ubiquitous fp capped out") {
    // docs 1+2 share a 7-token run (>= w+n-1 = 6 guarantees shared
    // fingerprints); doc 3 is unrelated
    val base = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"$base one two three"),
      (2L, s"zero $base nine"),
      (3L, "completely different words in this document here"))
      .toDF("doc_id", "text")
    val got = Dedup.winnowPairs(docs, "text", "doc_id", n = 3, w = 4,
      minShared = 2, maxFp = 100)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 >= 2L)
    // with maxFp = 1 every fingerprint is dropped: no pairs at all
    assert(Dedup.winnowPairs(docs, "text", "doc_id", n = 3, w = 4,
      minShared = 1, maxFp = 1).count() == 0L)
  }

  test("ngramContainment: short-inside-long scores 1.0 on the short side") {
    val docs = Seq(
      (1L, "a b c d"),                       // 3-grams: {abc, bcd}
      (2L, "a b c d e f g h"),               // superset of doc 1's grams
      (3L, "x y z w"))                       // disjoint
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.ngramContainment(pairs, docs, "text", "doc_id", n = 3)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // doc1 fully contained in doc2 (2 of its 2 grams); doc2 has 6 grams
    assert(got((1L, 2L)) == ((1.0, BigDecimal(2.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got((1L, 3L)) == ((0.0, 0.0)))
  }

  test("ngramNovelty: first occurrence by doc order wins") {
    val docs = Seq(
      (1L, "a b c d e f"),      // 2 distinct 5-grams, all first here
      (2L, "a b c d e f"),      // identical: zero novel
      (3L, "a b c d e zz"),     // 1 gram shared with doc1, 0 novel... the
                                // gram 'b c d e zz' IS new
      (4L, "one two"))          // below n: no grams
      .toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(docs, "text", "doc_id", n = 5)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((2L, 1L, 0.5)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("trimDuplicatedSpans: shared spans removed everywhere, clean docs untouched") {
    val docs = Seq(
      (1L, "the cat sat on the mat today"),       // shares 5-gram run with 2
      (2L, "the cat sat on the mat tomorrow"),
      (3L, "aa bb cc dd ee aa bb cc dd ee"),      // self-repeat only: kept
      (4L, "completely different words here now"))
      .toDF("doc_id", "text")
    val got = Dedup.trimDuplicatedSpans(docs, "text", "doc_id", n = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs 1+2 share "the cat sat on the mat" (positions 1-6 via the
    // two overlapping flagged 5-grams); the differing last token stays
    assert(got(1L) == ((7L, 6L, "today")))
    assert(got(2L) == ((7L, 6L, "tomorrow")))
    assert(got(3L) == ((10L, 0L, "aa bb cc dd ee aa bb cc dd ee")))
    assert(got(4L) == ((5L, 0L, "completely different words here now")))
  }

  test("winnowFingerprints: matches a Scala reference winnow over the same hashes") {
    import graft.functions.TextFns
    val docs = Seq(
      (1L, "a b c d e f g h i j"),                 // 8 3-grams, 5 windows
      (2L, "x y z w x y z w x y z"),               // repeated grams → ties
      (3L, "short doc here"),                      // exactly one 3-gram
      (4L, "one two"),                             // below n → no fingerprints
      (5L, "p q r s t"))                           // 3 grams < w → one window
      .toDF("doc_id", "text")
    // reference: winnow in plain Scala over the engine's own hash arrays
    val hs = docs.select(col("doc_id"),
        TextFns.ngramHashesNative(col("text"), 3).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val w = 4
    val expected = hs.toSeq.flatMap { case (id, h) =>
      val starts =
        if (h.isEmpty) Seq.empty
        else if (h.length < w) Seq(0)
        else 0 to (h.length - w)
      starts.map { i =>
        val win = h.slice(i, i + w)
        val minv = win.min
        val jmax = win.lastIndexWhere(_ == minv)
        (id, (i + jmax).toLong, minv)
      }.distinct
    }.toSet
    val got = Dedup.winnowFingerprints(docs, "text", "doc_id", n = 3, w = w)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(!got.exists(_._1 == 4L))
    // guarantee: docs sharing a run >= w+n-1 = 6 tokens share a fingerprint
    val shared = Seq((10L, "alpha beta gamma delta epsilon zeta junk1"),
      (11L, "junk2 junk3 alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(shared, "text", "doc_id", n = 3, w = w)
      .as[(Long, Long, Long)].collect()
    val common = fps.filter(_._1 == 10L).map(_._3).toSet
      .intersect(fps.filter(_._1 == 11L).map(_._3).toSet)
    assert(common.nonEmpty)
  }

  test("ngramSpanCoverage: covered positions counted once, zero for clean docs") {
    val docs = Seq(
      (1L, "a b c d e f"),   // 5-grams: "a b c d e", "b c d e f" — both shared
      (2L, "a b c d e f"),
      (3L, "p q r s t u v")) // no shared n-grams
      .toDF("doc_id", "text")
    val got = Dedup.ngramSpanCoverage(docs, "text", "doc_id", n = 5,
      minDocs = 2).select("doc_id", "n_tokens", "covered", "coverage")
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    // both docs fully covered: overlapping spans 1-5 and 2-6 union to 1-6
    assert(got(1L) == ((1L, 6, 6L, 1.0)))
    assert(got(2L) == ((2L, 6, 6L, 1.0)))
    assert(got(3L) == ((3L, 7, 0L, 0.0)))
  }

  test("ngramSpanCoverage: docs shorter than n have zero n-grams, zero coverage") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Dedup.ngramSpanCoverage(docs, "text", "doc_id", n = 5,
      minDocs = 2).select("doc_id", "covered", "coverage")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 0L, 0.0), (2L, 0L, 0.0)))
  }

  test("prefixFilterPairs: exact — equals brute-force all-pairs Jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (4L, "completely different words in this one entirely"),
      (5L, "another unrelated document with its own content"),
      (6L, "the quick brown fox leaps over the lazy dog"),  // near-dup of 1
      (7L, "short one"),
      (8L, "")
    ).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val got = Dedup.prefixFilterPairs(docs, "text", "doc_id", t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // brute force: every pair, exact Jaccard, same threshold
      val ids = docs.select("doc_id").as[Long].collect().sorted
      val allPairs = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSeq.toDF("id_a", "id_b")
      val expect = Dedup.ngramJaccardOnSets(allPairs,
          Dedup.shingleSets(docs, "text", "doc_id"))
        .filter(col("jaccard") >= t)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == expect, s"threshold $t")
      if (t == 0.8) assert(got.contains((1L, 3L))) // the planted exact dup
    }
  }

  test("prefixFilterPairs: boundary pairs with J exactly == t survive") {
    // |A|=28 ⊂ |B|=35 word trigrams → J = 28/35 = 0.8 EXACTLY, with
    // |A|+|B| = 63 — a size sum where double ceil(t/(1+t)·(sza+szb))
    // and t·|b| both drift a hair above the exact rational for t=0.8,
    // so without the float-safe (−1e-9) bounds the candidate filters
    // drop a true pair. Same construction at t=0.9 (63/70, sum 133).
    val words = (1 to 80).map(i => f"tok$i%03d")
    def doc(k: Int) = words.take(k).mkString(" ")
    val docs = Seq((1L, doc(30)), (2L, doc(37)),  // J(1,2) = 28/35 = 0.8
                   (3L, doc(65)), (4L, doc(72)))  // J(3,4) = 63/70 = 0.9
      .toDF("doc_id", "text")
    val got8 = Dedup.prefixFilterPairs(docs, "text", "doc_id", 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got8.contains((1L, 2L)), s"J==t pair dropped at t=0.8: $got8")
    val got9 = Dedup.prefixFilterPairs(docs, "text", "doc_id", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got9.contains((3L, 4L)), s"J==t pair dropped at t=0.9: $got9")
    assert(!got9.contains((1L, 2L))) // 0.8 < 0.9 stays excluded
  }

  test("prefixFilterPairs: frequent shingles stay out of prefixes at high t") {
    // every doc shares the frequent head; only 1/2 are real near-dups
    val docs = Seq(
      (1L, "common common common common alpha beta gamma delta"),
      (2L, "common common common common alpha beta gamma epsilon"),
      (3L, "common common common common zeta eta theta iota"),
      (4L, "common common common common kappa lambda mu nu")
    ).toDF("doc_id", "text")
    val got = Dedup.prefixFilterPairs(docs, "text", "doc_id", 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(got.head._3 >= 0.5)
  }
}
