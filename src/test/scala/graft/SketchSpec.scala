package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish key stream: key k appears ~200/k times
  private lazy val stream = (1L to 20L)
    .flatMap(k => Seq.fill((200 / k).toInt)(k))
    .toDF("k")

  private lazy val truth = stream.groupBy("k")
    .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap

  test("compiled bucket kernel == composable cmBucket chain") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val keys = stream.distinct()
      .union(Seq(-7L, 0L, Long.MaxValue).toDF("k"))
    val kernel = keys.select(col("k"),
      posexplode(ColumnBridge.column(graft.plans.CmsBuckets(
        ColumnBridge.expression(col("k").cast("string")),
        4, 256, "cms"))).as(Seq("j", "b")))
      .as[(Long, Int, Long)].collect().toSet
    val chain = keys.select(col("k"),
        explode(array((0 until 4).map(j => struct(lit(j).as("j"),
          Sketch.cmBucket(col("k"), j, 256, "cms").as("b"))): _*)).as("e"))
      .select(col("k"), col("e.j"), col("e.b"))
      .as[(Long, Int, Long)].collect().toSet
    assert(kernel == chain)
  }

  test("estimate never undercounts (one-sided error)") {
    val sk = Sketch.countMin(stream, "k", depth = 4, width = 16) // collides
    val est = Sketch.estimate(sk, stream.distinct(), "k",
      depth = 4, width = 16).as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) => assert(est(k) >= n, s"key $k") }
  }

  test("wide sketch is exact; unseen keys estimate 0") {
    val sk = Sketch.countMin(stream, "k", depth = 4, width = 4096)
    val queries = (1L to 30L).toDF("k") // 21-30 never appeared
    val est = Sketch.estimate(sk, queries, "k", depth = 4, width = 4096)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) => assert(est(k) == n) }
    (21L to 30L).foreach(k => assert(est(k) == 0L))
  }

  test("merge of shard sketches == sketch of the union") {
    val a = stream.filter(col("k") % 2 === 0)
    val b = stream.filter(col("k") % 2 =!= 0)
    val merged = Sketch.merge(
      Sketch.countMin(a, "k", 4, 64), Sketch.countMin(b, "k", 4, 64))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(stream, "k", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  // ---- KMV ----

  test("kmv: exact below k, within 15% above k (fixed salt, deterministic)") {
    val small = (1L to 100L).toDF("k")
    val se = Sketch.kmvEstimate(Sketch.kmv(small, "k", k = 256), k = 256)
      .as[(Long, Long, Double)].head()
    assert(se._1 == 100L && se._3 == 100.0) // exact: sketch holds all
    val big = (1L to 20000L).toDF("k")
    val be = Sketch.kmvEstimate(Sketch.kmv(big, "k", k = 512), k = 512)
      .as[(Long, Long, Double)].head()
    assert(math.abs(be._3 - 20000.0) / 20000.0 < 0.15, s"est ${be._3}")
  }

  test("kmv: duplicates don't inflate the estimate") {
    val dups = (1L to 5000L).flatMap(i => Seq(i % 50)).toDF("k")
    val e = Sketch.kmvEstimate(Sketch.kmv(dups, "k", k = 256), k = 256)
      .as[(Long, Long, Double)].head()
    assert(e._1 == 50L && e._3 == 50.0)
  }

  test("kmv: merge of shard sketches == sketch of the union") {
    val all = (1L to 10000L).toDF("k")
    val a = all.filter(col("k") % 2 === 0)
    val b = all.filter(col("k") % 3 =!= 1) // overlapping shards
    val merged = Sketch.kmvMerge(
      Sketch.kmv(a, "k", 128), Sketch.kmv(b, "k", 128), 128)
      .as[Long].collect().toSet
    val whole = Sketch.kmv(a.unionByName(b), "k", 128)
      .as[Long].collect().toSet
    assert(merged == whole)
  }

  test("kmv: prefilter bound never changes the sketch when conservative") {
    val df = (1L to 5000L).toDF("k")
    val plain = Sketch.kmv(df, "k", 64).as[Long].collect().toSet
    val kth = plain.max
    val pruned = Sketch.kmv(df, "k", 64,
      prefilterBound = Some(kth + 1)).as[Long].collect().toSet
    assert(pruned == plain)
  }

  test("sketch size is bounded by depth x width regardless of stream size") {
    val sk = Sketch.countMin(stream, "k", depth = 3, width = 8)
    assert(sk.count() <= 3L * 8L)
    // and total mass per row equals the stream length
    val mass = sk.groupBy("j").agg(sum("c").as("m"))
      .select("m").as[Long].collect()
    assert(mass.forall(_ == stream.count()))
  }

  test("kmvGrouped: below-k groups are exact, sketch bounded at k") {
    import graft.operators.Sketch
    val df = ((1 to 50).map(i => ("big", i)) ++
      (1 to 5).map(i => ("small", i))).toDF("g", "v")
    val sk = Sketch.kmvGrouped(df, "g", "v", k = 16)
    val sizes = sk.groupBy("grp").count().as[(String, Long)]
      .collect().toMap
    assert(sizes == Map("big" -> 16L, "small" -> 5L))
    val est = Sketch.kmvEstimateGrouped(sk, k = 16)
      .select("grp", "n", "est").as[(String, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(est("small") == (("small", 5L, 5.0)))  // exact below k
    assert(est("big")._3 > 20.0 && est("big")._3 < 200.0)
  }

  // ---- HyperLogLog ----

  test("hll: registers deterministic across partitionings; shard merge == whole") {
    val df = (1L to 3000L).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("g", "v")
    val whole = Sketch.hllRegisters(df, "g", "v")
      .as[(String, Long, Long)].collect().toSet
    val repart = Sketch.hllRegisters(df.repartition(13), "g", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(whole == repart)
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(df.filter($"v" % 2 === 0), "g", "v"),
      Sketch.hllRegisters(df.filter($"v" % 2 =!= 0), "g", "v"))
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
    // register invariants: j in [0, 512), rank in [1, 52] at p=9
    assert(whole.forall { case (_, j, r) =>
      j >= 0 && j < 512 && r >= 1 && r <= 52 })
  }

  test("hll: estimate within 10% at 20k distinct, linear counting small") {
    val big = (1L to 20000L).map(i => ("g", i)).toDF("g", "v")
    val est = Sketch.hllEstimate(Sketch.hllRegisters(big, "g", "v"))
      .as[(String, Double)].collect().head._2
    assert(math.abs(est - 20000.0) / 20000.0 < 0.10, s"est=$est")
    // duplicates must not inflate it
    val dup = Sketch.hllEstimate(
      Sketch.hllRegisters(big.unionAll(big), "g", "v"))
      .as[(String, Double)].collect().head._2
    assert(dup == est)
    // linear-counting regime: occupied-register count has ~9% std at
    // this load (100 keys / 512 registers) — bound accordingly
    val small = (1L to 100L).map(i => ("g", i)).toDF("g", "v")
    val estS = Sketch.hllEstimate(Sketch.hllRegisters(small, "g", "v"))
      .as[(String, Double)].collect().head._2
    assert(math.abs(estS - 100.0) / 100.0 < 0.20, s"est=$estS")
  }

  test("countMin maintains incrementally over a stream (running sketch == batch sketch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    // the sketch build IS a keyed running aggregation, so Update-mode
    // streaming gives the merged sketch for free — no separate
    // streaming twin needed
    val q = Sketch.countMin(input.toDF().toDF("k"), "k",
        depth = 4, width = 16)
      .writeStream.format("memory").queryName("scms")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      input.addData(1L to 300L: _*)
      q.processAllAvailable()
      input.addData(201L to 500L: _*)
      q.processAllAvailable()
      val latest = spark.table("scms")
        .groupBy("j", "b").agg(max(col("c")).as("c"))
        .as[(Int, Long, Long)].collect().toSet
      val batch = Sketch.countMin(
          ((1L to 300L) ++ (201L to 500L)).toDF("k"), "k",
          depth = 4, width = 16)
        .as[(Int, Long, Long)].collect().toSet
      assert(latest == batch)
    } finally q.stop()
  }

  test("lexicalDiversity: hand-computed TTR and hapax fraction") {
    val docs = Seq(
      (1L, "a a a b", "s1"),     // tokens 4, types {a,b}, hapax {b}
      (2L, "c d", "s2"))         // tokens 2, types 2, hapax 2
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Tfidf
      .lexicalDiversity(docs, "text", "source")
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 4L, 2L, 1L, 0.5, 0.5)))
    assert(got("s2") == (("s2", 2L, 2L, 2L, 1.0, 1.0)))
  }

  test("kmvJaccardGrouped: exact set arithmetic below k, zero overlap zero") {
    import graft.operators.Sketch
    val df = ((1 to 20).map(i => ("A", i)) ++
      (11 to 30).map(i => ("B", i)) ++
      (101 to 105).map(i => ("C", i))).toDF("src", "v")
    val sk = Sketch.kmvGrouped(df, "src", "v", k = 64)
    val got = Sketch.kmvJaccardGrouped(sk, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7))).toMap
    // below k the sketch IS the set: |A∪B|=30, |A∩B|=10
    val ab = got(("A", "B"))
    assert(ab._1 == 30L && ab._2 == 10L)
    assert(ab._3 == 333333L)            // round(10/30 * 1e6)
    assert(ab._4 == 30.0 && ab._5 == 10.0)
    assert(got(("A", "C"))._2 == 0L && got(("A", "C"))._5 == 0.0)
    assert(got(("B", "C"))._2 == 0L)
  }

  test("rollingDistinctHll tracks the exact rolling distinct within sketch error") {
    import graft.operators.{Features, Sketch}
    // 300 users: 200 active in bucket 0, 150 in bucket 2 (overlap
    // 50), far bucket 10 with 40 users; day = 10 ns for the test
    val rows =
      (1L to 200L).map(u => (u, 0L)) ++
        (151L to 300L).map(u => (u, 25L)) ++
        (500L to 539L).map(u => (u, 105L))
    val df = rows.toDF("u", "ts")
    val exact = Features.rollingActive(df, "ts", "u", bucketNs = 10L,
      window = 3).as[(Long, Long)].collect().toMap
    val est = Sketch.rollingDistinctHll(df, "ts", "u", bucketNs = 10L,
      window = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // identical bucket sets (observed-only on both paths)
    assert(est.keySet == exact.keySet)
    // every estimate within 10% of the exact count (p=9 linear
    // counting at these cardinalities is far tighter than that)
    exact.foreach { case (b, n) =>
      val e = est(b) / 1e6
      assert(math.abs(e - n) <= 0.10 * n,
        s"bucket $b: est $e vs exact $n")
    }
    // the windows genuinely merge: bucket 2 covers both cohorts
    assert(exact(2L) == 300L)
  }
}
