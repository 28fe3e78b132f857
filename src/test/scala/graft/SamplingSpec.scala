package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (1L to 2000L).toDF("id")

  test("thresholdHex: fixed-width hex, 0 and 1 are the extremes") {
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(1.0) == "g") // sorts after every hex key
    intercept[IllegalArgumentException](Sampling.thresholdHex(1.2))
  }

  test("hashSample: deterministic, near-uniform, fraction-monotone") {
    val s25a = Sampling.hashSample(ids, "id", 0.25).as[Long].collect().toSet
    val s25b = Sampling.hashSample(ids, "id", 0.25).as[Long].collect().toSet
    assert(s25a == s25b) // re-run stability
    assert(math.abs(s25a.size - 500) < 100) // ~binomial(2000, .25)
    // nested property: lower fraction with same salt is a subset
    val s10 = Sampling.hashSample(ids, "id", 0.10).as[Long].collect().toSet
    assert(s10.subsetOf(s25a))
    // fraction 0 and 1 boundaries
    assert(Sampling.hashSample(ids, "id", 0.0).count() == 0)
    assert(Sampling.hashSample(ids, "id", 1.0).count() == 2000)
  }

  test("hashSample: salts draw independently") {
    val a = Sampling.hashSample(ids, "id", 0.25, salt = "a")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 0.25, salt = "b")
      .as[Long].collect().toSet
    assert(a != b)
    // overlap should be ~ 2000 * 0.0625 = 125, not ~500
    assert(a.intersect(b).size < 300)
  }

  test("assignSplit: total, disjoint, append-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.assignSplit(ids, "id", splits)
      .as[(Long, String)].collect()
    assert(got.length == 2000) // every row assigned exactly once
    val byLabel = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 1400 && byLabel("val") < 400)
    // append-stability: the first 1000 ids get the same labels when
    // assigned alone as within the full set
    val sub = Sampling.assignSplit((1L to 1000L).toDF("id"), "id", splits)
      .as[(Long, String)].collect().toMap
    val full = got.toMap
    assert(sub.forall { case (k, v) => full(k) == v })
    intercept[IllegalArgumentException](
      Sampling.assignSplit(ids, "id", Seq("a" -> 0.5, "b" -> 0.3)))
  }

  test("stratifiedSample: per-stratum rates honored, default applies") {
    val df = ids.withColumn("stratum",
      when(col("id") % 2 === 0, "even").otherwise("odd"))
    val got = Sampling.stratifiedSample(df, "id", "stratum",
      Map("even" -> 0.9), defaultRate = 0.1)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(got("even") > 800 && got("even") <= 1000)
    assert(got("odd") < 200)
    // rate-monotone within a stratum (same salt): 0.5 ⊂ 0.9
    val hi = Sampling.stratifiedSample(df, "id", "stratum",
      Map("even" -> 0.9), 0.1).filter(col("stratum") === "even")
      .select("id").as[Long].collect().toSet
    val lo = Sampling.stratifiedSample(df, "id", "stratum",
      Map("even" -> 0.5), 0.1).filter(col("stratum") === "even")
      .select("id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("samplePerKey: exactly k per big group, all of smaller groups") {
    val df = Seq.tabulate(100)(i => (s"u${i % 3}", i.toLong)) ++
      Seq(("tiny", 999L))
    val got = Sampling.samplePerKey(df.toDF("user", "id"),
      Seq("user"), "id", k = 5)
    val counts = got.groupBy("user").count().as[(String, Long)]
      .collect().toMap
    assert(counts("u0") == 5 && counts("u1") == 5 && counts("u2") == 5)
    assert(counts("tiny") == 1)
    // deterministic across runs
    val again = Sampling.samplePerKey(df.toDF("user", "id"),
      Seq("user"), "id", k = 5).select("id").as[Long].collect().toSet
    assert(again == got.select("id").as[Long].collect().toSet)
  }

  test("sample filter pushes down to the scan (no shuffle, no window)") {
    val plan = Sampling.hashSample(ids, "id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("hashSample is streaming-safe: stateless filter, same rows as batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val q = Sampling.hashSample(input.toDF().toDF("id"), "id", 0.25)
      .writeStream.format("memory").queryName("ssample").start()
    try {
      input.addData(1L to 1000L: _*)
      q.processAllAvailable()
      input.addData(1001L to 2000L: _*)
      q.processAllAvailable()
      val streamed = spark.table("ssample").as[Long].collect().toSet
      val batch = Sampling.hashSample((1L to 2000L).toDF("id"), "id", 0.25)
        .as[Long].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("oversample: realized ratio near factor, deterministic, copy indexed") {
    val got = Sampling.oversample(ids, "id", factor = 2.3)
      .as[(Long, Long)].collect()
    assert(math.abs(got.length - 2000 * 2.3) < 150)
    val byId = got.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq)
    assert(byId.values.forall(cs => cs == (1L to cs.length)))
    assert(byId.values.forall(cs => cs.length == 2 || cs.length == 3))
    val again = Sampling.oversample(ids, "id", factor = 2.3)
      .as[(Long, Long)].collect()
    assert(got.sorted.sameElements(again.sorted))
    // factor < 1 degrades to plain sampling
    val sub = Sampling.oversample(ids, "id", factor = 0.25)
      .select("id").as[Long].collect().toSet
    val plain = Sampling.hashSample(ids, "id", 0.25)
      .as[Long].collect().toSet
    assert(sub == plain)
  }

  test("tokenBudget: fills each domain to its budget in hash order, +<=1 overflow row") {
    val docs = (1L to 400L).map(i =>
      (i, if (i % 3 == 0) "code" else "web", 10L + i % 7))
      .toDF("id", "dom", "toks")
    val got = Sampling.tokenBudget(docs, "id", "dom", "toks",
      Map("web" -> 600L), defaultBudget = 300L, numPartitions = 8)
    // equals the single-window reference definition
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("dom")
      .orderBy(Sampling.sampleKey(col("id"), ""), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = docs
      .withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") - col("toks") <
        when(col("dom") === "web", 600L).otherwise(300L))
      .select("id").as[Long].collect().toSet
    val gotIds = got.select("id").as[Long].collect().toSet
    assert(gotIds == expected)
    // per-domain totals land in [budget, budget + max row weight)
    val totals = got.groupBy("dom").agg(sum("toks").as("t"))
      .as[(String, Long)].collect().toMap
    assert(totals("web") >= 600L && totals("web") < 600L + 17L)
    assert(totals("code") >= 300L && totals("code") < 300L + 17L)
    // append stability: appending rows to ONE domain leaves the other
    // domains' kept sets untouched (per-domain hash order is local)
    val more = (401L to 500L).map(i => (i, "web", 10L)).toDF("id", "dom", "toks")
    val again = Sampling.tokenBudget(docs.union(more), "id", "dom", "toks",
      Map("web" -> 600L), defaultBudget = 300L, numPartitions = 8)
    val codeBefore = got.filter(col("dom") === "code")
      .select("id").as[Long].collect().toSet
    val codeAfter = again.filter(col("dom") === "code")
      .select("id").as[Long].collect().toSet
    assert(codeAfter == codeBefore)
  }

  test("deterministicShuffle: a permutation, salt-sensitive, scalable rank == global window") {
    val got = Sampling.deterministicShuffle(ids, "id", numPartitions = 8)
      .select("id", "shuffle_rank").as[(Long, Long)].collect()
    assert(got.map(_._2).sorted.sameElements(1L to 2000L)) // total permutation
    // equals the single-window definition
    import org.apache.spark.sql.expressions.Window
    val expected = ids.withColumn("shuffle_rank", row_number().over(
      Window.orderBy(Sampling.sampleKey(col("id"), ""), col("id"))))
      .as[(Long, Int)].collect().map(t => t._1 -> t._2.toLong).toMap
    assert(got.toMap == expected)
    // different salt -> different permutation
    val other = Sampling.deterministicShuffle(ids, "id", salt = "epoch2",
      numPartitions = 8).select("id", "shuffle_rank")
      .as[(Long, Long)].collect().toMap
    assert(other != got.toMap)
  }

  // ---- weightedSample (Efraimidis–Spirakis) ----

  private lazy val weighted = (1L to 500L)
    .map(i => (i, if (i <= 5) 10000.0 else 1.0))
    .toDF("id", "w")

  test("weightedSample: deterministic, partitioning-independent, k-bounded") {
    val a = Sampling.weightedSample(weighted, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(weighted.repartition(13), "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.size == 50)
  }

  test("weightedSample: heavy weights dominate the draw") {
    val got = Sampling.weightedSample(weighted, "id", "w", k = 50)
      .select("id").as[Long].collect().toSet
    // 5 items carry 10000x weight: all of them make a 10% sample
    assert((1L to 5L).forall(got.contains))
  }

  test("weightedSample: nonpositive and null weights are excluded") {
    val df = Seq((1L, 5.0), (2L, 0.0), (3L, -1.0))
      .toDF("id", "w")
      .unionByName(Seq(Tuple1(4L)).toDF("id")
        .withColumn("w", lit(null).cast("double")))
    val got = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("weightedSample: raising a row's weight never hurts its rank") {
    val base = (1L to 100L).map(i => (i, 1.0)).toDF("id", "w")
    def rankOf(df: org.apache.spark.sql.DataFrame, id: Long): Int = {
      val ordered = df
        .withColumn("__es", Sampling.esKey(col("id"), col("w"), ""))
        .orderBy(col("__es").desc, col("id").asc)
        .select("id").as[Long].collect()
      ordered.indexOf(id)
    }
    val before = rankOf(base, 42L)
    val boosted = (1L to 100L).map(i => (i, if (i == 42L) 50.0 else 1.0))
      .toDF("id", "w")
    val after = rankOf(boosted, 42L)
    assert(after <= before)
  }

  test("weightedSamplePerKey: k per group, groups smaller than k intact") {
    val df = (1L to 100L).map(i => (i % 4, i, 1.0 + i)).toDF("g", "id", "w")
    val got = Sampling.weightedSamplePerKey(df, Seq("g"), "id", "w", k = 5)
      .groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 5L))
    val tiny = Seq((0L, 1L, 1.0), (0L, 2L, 2.0)).toDF("g", "id", "w")
    assert(Sampling.weightedSamplePerKey(tiny, Seq("g"), "id", "w", 5)
      .count() == 2L)
  }

  test("interleaveByGroup: proportional spread, big group fills gaps evenly") {
    // group a: 8 rows, group b: 2 rows → sorting by progress_micro
    // must spread the b's through the epoch, never all-a-then-all-b
    val df = (Seq.tabulate(8)(i => (i.toLong, "a")) ++
      Seq((100L, "b"), (101L, "b"))).toDF("doc_id", "source")
    val got = Sampling.interleaveByGroup(df, "doc_id", "source")
      .orderBy(col("progress_micro"), col("source"), col("doc_id"))
      .select("source").as[String].collect().toSeq
    assert(got.count(_ == "a") == 8 && got.count(_ == "b") == 2)
    assert(got.indexOf("b") >= 1 && got.indexOf("b") <= 4)
    assert(got.lastIndexOf("b") >= 5 && got.lastIndexOf("b") <= 8)
    // midpoint keys for ranks 1,2 of a 2-row group: (2r-1)/4 * 1e12
    val keys = Sampling.interleaveByGroup(df, "doc_id", "source")
      .filter(col("source") === "b")
      .select("progress_micro").as[Long].collect().toSet
    assert(keys == Set(250000000000L, 750000000000L))
  }

  test("temperatureMix: sqrt-proportional shares, small sources kept whole") {
    // head source 8000 docs, tail sources 500 each: alpha=0.5 shares
    // are prop. to sqrt(n) -> the tail keeps a far larger fraction
    val df = ((1L to 8000L).map(i => (i, "big")) ++
      (8001L to 8500L).map(i => (i, "s1")) ++
      (8501L to 9000L).map(i => (i, "s2")))
      .toDF("doc_id", "src")
    val kept = Sampling.temperatureMix(df, "doc_id", "src",
        alpha = 0.5, targetTotal = 3000L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // expected rates: w = sqrt(n); z = sqrt(8000)+2*sqrt(500)
    val z = math.sqrt(8000.0) + 2 * math.sqrt(500.0)
    def expect(n: Long) =
      math.min(1.0, 3000.0 * math.sqrt(n.toDouble) / z / n) * n
    assert(math.abs(kept("big") - expect(8000)) < 200,
      s"${kept("big")} vs ${expect(8000)}")
    assert(math.abs(kept("s1") - expect(500)) < 60)
    // deterministic: a second run is identical
    val again = Sampling.temperatureMix(df, "doc_id", "src",
        alpha = 0.5, targetTotal = 3000L)
      .groupBy("src").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(again == kept)
    // a target above the corpus keeps everything (rate caps at 1)
    val all = Sampling.temperatureMix(df, "doc_id", "src",
      alpha = 0.5, targetTotal = 100000L).count()
    assert(all == 9000L)
  }

  test("applyMixRates is streaming-safe: batch-census rates gate a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val census = Seq(("big", 8000L), ("s1", 500L), ("s2", 500L))
      .toDF("src", "__n")
    val rates = Sampling.temperatureRates(census, "src",
      alpha = 0.5, targetTotal = 3000L)
    val input = MemoryStream[(Long, String)]
    val q = Sampling.applyMixRates(
        input.toDF().toDF("doc_id", "src"), "doc_id", "src", rates)
      .writeStream.format("memory").queryName("smix").start()
    try {
      input.addData((1L to 500L).map(i => (i, if (i % 4 == 0) "s1" else "big")): _*)
      q.processAllAvailable()
      input.addData((501L to 1000L).map(i => (i, if (i % 4 == 0) "s2" else "big")): _*)
      q.processAllAvailable()
      val streamed = spark.table("smix")
        .select("doc_id").as[Long].collect().toSet
      val batchDf = (1L to 1000L).map(i =>
        (i, if (i % 4 != 0) "big" else if (i <= 500) "s1" else "s2"))
        .toDF("doc_id", "src")
      val batch = Sampling.applyMixRates(batchDf, "doc_id", "src", rates)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("learningCurve: one-scan totals match per-rate hashSample counts, nested") {
    val df = (1L to 1000L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val rates = Seq(0.1, 0.4, 0.8)
    val got = Sampling.learningCurve(df, "id", rates, Some("w"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rates.foreach { r =>
      val sampled = Sampling.hashSample(df, "id", r)
      val n = sampled.count()
      val w = sampled.agg(sum(col("w"))).as[Long].head()
      assert(got(math.round(r * 1e6)) == ((n, w)))
    }
    // nested: counts strictly increase with the rate
    assert(got(100000L)._1 < got(400000L)._1)
    assert(got(400000L)._1 < got(800000L)._1)
  }

  test("balanceClasses: every class trimmed to the minority size, deterministically") {
    // class sizes: a=50, b=20, c=5 -> everyone keeps 5
    val rows = (1L to 50L).map((_, "a")) ++ (51L to 70L).map((_, "b")) ++
      (71L to 75L).map((_, "c"))
    val df = rows.toDF("id", "cls")
    val got = Sampling.balanceClasses(df, "id", "cls")
      .as[(Long, String)].collect()
    val byCls = got.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCls.keySet == Set("a", "b", "c"))
    assert(byCls.values.forall(_.size == 5))
    // deterministic: a second run keeps the identical rows
    val again = Sampling.balanceClasses(df, "id", "cls")
      .as[(Long, String)].collect().toSet
    assert(again == got.toSet)
  }

  test("groupAwareSplit: all rows of a group share one split; agrees with assignSplit on the group key") {
    val df = (1L to 300L).map(i => (i, s"src${i % 20}")).toDF("id", "grp")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.groupAwareSplit(df, "grp", splits)
    // zero leakage: every group maps to exactly one split
    val perGroup = got.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .as[(String, Long)].collect()
    assert(perGroup.forall(_._2 == 1L))
    // the group's split is the id-split of the group KEY itself
    val keyed = Sampling.assignSplit(
      df.select(col("grp")).distinct(), "grp", splits)
      .as[(String, String)].collect().toMap
    val byRow = got.select("grp", "split").distinct()
      .as[(String, String)].collect().toMap
    assert(byRow == keyed)
  }
}
