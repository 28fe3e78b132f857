package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Dedup, IntervalJoin, Pivots, Skew}

/** Seeded randomized property tests (SURVEY.md §5: reconciliation
  * invariants, partition laws, idempotence). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(1234)

  test("property: binned interval join == naive join (200 random intervals × 3 widths)") {
    def randIntervals(n: Int, tag: String) = (1 to n).map { i =>
      val s = rng.nextInt(10000).toLong
      (i.toLong, s"c${rng.nextInt(3)}", s, s + 1 + rng.nextInt(2000))
    }.toDF(s"${tag}_id", "chrom", s"${tag}_start", s"${tag}_end")
    val a = randIntervals(200, "a")
    val b = randIntervals(200, "b")
    val naive = IntervalJoin.overlap(a, b, Seq("chrom"),
      "a_start", "a_end", "b_start", "b_end", frac = 0.5)
      .select("a_id", "b_id", "overlap_len")
      .as[(Long, Long, Long)].collect().toSet
    for (w <- Seq(64L, 1000L, 1000000L)) {
      val binned = IntervalJoin.overlapBinned(a, b, Seq("chrom"),
        "a_start", "a_end", "b_start", "b_end", frac = 0.5, binWidth = w)
        .select("a_id", "b_id", "overlap_len")
        .as[(Long, Long, Long)].collect().toSet
      assert(binned == naive, s"binWidth=$w")
    }
    // reciprocal (-r) mode: binned + two-sided filter == the naive
    // join with both fraction predicates applied directly
    val naiveRecip = IntervalJoin.overlap(a, b, Seq("chrom"),
        "a_start", "a_end", "b_start", "b_end")
      .filter(col("overlap_len") >= (col("a_end") - col("a_start")) * 0.5 &&
        col("overlap_len") >= (col("b_end") - col("b_start")) * 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val binnedRecip = IntervalJoin.fractionFilter(
        IntervalJoin.overlapBinned(a, b, Seq("chrom"),
          "a_start", "a_end", "b_start", "b_end", binWidth = 1000L),
        "a_start", "a_end", "b_start", "b_end",
        fracA = 0.5, fracB = 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(binnedRecip == naiveRecip)
  }

  test("property: semi and anti joins partition the left side") {
    val left = (1 to 500).map(i => (rng.nextInt(100).toLong, i)).toDF("k", "v")
    val right = (1 to 50).map(_ => rng.nextInt(150).toLong).toDF("k")
    val semi = left.join(right, Seq("k"), "left_semi").count()
    val anti = left.join(right, Seq("k"), "left_anti").count()
    assert(semi + anti == left.count())
  }

  test("property: keepFirst is idempotent and emits one row per key") {
    val df = (1 to 400)
      .map(i => (rng.nextInt(40), rng.nextInt(1000), i)).toDF("k", "v", "t")
    val once = Dedup.keepFirst(df, Seq("k"), Seq(col("v").asc, col("t").asc))
    val twice = Dedup.keepFirst(once, Seq("k"), Seq(col("v").asc, col("t").asc))
    assert(once.collect().toSet == twice.collect().toSet)
    assert(once.count() == df.select("k").distinct().count())
  }

  test("property: pivot non-null cells == distinct (idx, col) pairs") {
    val df = (1 to 300).map(_ =>
      (s"g${rng.nextInt(20)}", s"s${rng.nextInt(5)}", rng.nextDouble()))
      .toDF("gene", "sample", "v")
      .dropDuplicates("gene", "sample")
    val samples = (0 until 5).map(i => s"s$i")
    val wide = Pivots.continuous(df, "gene", "sample", "v", samples)
    val nonNull = wide.select(
      samples.map(s => sum(when(col(s).isNotNull, 1).otherwise(0))): _*)
      .collect().head.toSeq.map(_.asInstanceOf[Long]).sum
    assert(nonNull == df.count())
  }

  test("property: saltedJoin == plain join for every join type used") {
    val skewed = (1 to 1000).map(i =>
      (if (i % 10 == 0) 1L else rng.nextInt(50).toLong, i)).toDF("k", "v")
    val dim = (0 until 30).map(k => (k.toLong, s"d$k")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .select("k", "v", "name").collect().toSet
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), numSalts = 8, jt)
        .select("k", "v", "name").collect().toSet
      assert(salted == plain, jt)
    }
  }

  test("property: saltedJoin spreads IDENTICAL duplicate rows across salts") {
    // worst case for a whole-row-hash salt: every skewed row is
    // bit-identical, so they'd all hash into ONE salt bucket and
    // recreate the hotspot — the partition-stable row-id mix must
    // spread them while leaving the join result (a multiset with
    // duplicates!) exactly equal to the unsalted join
    val skewed = spark.range(1000)
      .select(lit(1L).as("k"), lit(42).as("v")).repartition(4)
    val dim = Seq((1L, "d1"), (2L, "d2")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"), "inner")
      .select("k", "v", "name").collect().map(_.toSeq)
      .sortBy(_.mkString(","))
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), numSalts = 8, "inner")
      .select("k", "v", "name").collect().map(_.toSeq)
      .sortBy(_.mkString(","))
    assert(salted.length == 1000 && salted.toSeq == plain.toSeq)
    val spread = skewed.select(Skew.rowSalt(skewed, 8).as("s"))
      .select(countDistinct(col("s"))).collect().head.getLong(0)
    assert(spread == 8L, s"identical rows landed in only $spread salts")
  }

  test("property: single-shuffle continuousAgg == pre-agg + pivot") {
    val df = (1 to 800).map(_ =>
      (s"g${rng.nextInt(25)}", s"s${rng.nextInt(30)}", rng.nextDouble()))
      .toDF("gene", "sample", "v")
    val samples = (0 until 30).map(i => s"s$i")
    val viaPivot = Pivots.continuous(
      df.groupBy("gene", "sample").agg(round(sum(col("v")), 4).as("sv")),
      "gene", "sample", "sv", samples)
    val viaAgg = Pivots.continuousAgg(df, "gene", "sample", "v", samples,
      c => round(sum(c), 4))
    assert(viaAgg.columns.toSeq == viaPivot.columns.toSeq)
    assert(viaAgg.collect().map(_.toSeq).toSet ==
      viaPivot.collect().map(_.toSeq).toSet)
  }

  test("property: saltedOuterJoin == plain join for full/right outer") {
    // incl. null keys on both sides: SQL null never matches, so each
    // null-key row must surface exactly once, null-extended
    val skewed = ((1 to 1000).map(i =>
      (if (i % 10 == 0) java.lang.Long.valueOf(1L)
      else java.lang.Long.valueOf(rng.nextInt(50).toLong), i)) :+
      ((null: java.lang.Long, 9999))).toDF("k", "v")
    // dim keys 100-109 match nothing in skewed -> right-only rows;
    // skewed keys 30-49 match nothing in dim -> left-only rows
    val dim = (((0 until 30) ++ (100 until 110))
      .map(k => (java.lang.Long.valueOf(k.toLong), s"d$k")) :+
      ((null: java.lang.Long, "dnull"))).toDF("k", "name")
    for (jt <- Seq("full_outer", "right_outer")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .select("k", "v", "name").collect().toSet
      val salted = Skew.saltedOuterJoin(skewed, dim, Seq("k"),
        numSalts = 8, jt).select("k", "v", "name").collect().toSet
      assert(salted == plain, jt)
    }
    // the unmatched-replica duplication saltedJoin refuses must not
    // sneak back in: exactly one null-extended row per unmatched key
    // (10 unmatched dim keys + the null-key dim row)
    val fo = Skew.saltedOuterJoin(skewed, dim, Seq("k"), 8, "full_outer")
    assert(fo.filter(col("v").isNull).count() == 11)
  }

  test("keySkewReport: single aggregation tree, correct shares") {
    val df = (1 to 100).map(i => (if (i <= 60) "hot" else s"k$i", i))
      .toDF("k", "v")
    val rep = Skew.keySkewReport(df, Seq("k"), topK = 3).collect()
    assert(rep.head.getAs[String]("k") == "hot")
    assert(rep.head.getAs[Long]("rows") == 60L)
    assert(rep.head.getAs[Double]("share") == 0.6)
  }

  test("property: exact dedup keep counts sum to input size") {
    val docs = (1 to 300).map(i => (i.toLong, s"text-${rng.nextInt(40)}"))
      .toDF("id", "text")
    val groups = Dedup.exactByContent(docs, "text", "id")
    assert(groups.agg(sum("dup_count")).as[Long].collect().head == 300L)
    assert(groups.count() == docs.select("text").distinct().count())
  }

  test("property: asOfJoin == brute-force latest-preceding on random data") {
    val rnd = new scala.util.Random(42)
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000) * 7L + i, i * 1.5))
      .distinct // unique (k, ts) per construction (ts = m*7+i unique)
    val l = left.toDF("k", "ts", "lid")
    val r = right.toDF("k", "ts", "pay")
    val got = AsOfJoin.backward(l, r, Seq("k"), "ts", Seq("pay"))
      .select("k", "ts", "lid", "pay")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    val expected = left.map { case (k, ts, lid) =>
      val cands = right.filter(rr => rr._1 == k && rr._2 <= ts)
      (k, ts, lid) -> (if (cands.isEmpty) None
        else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(got == expected)
    // strict variant: equal-ts right rows excluded
    val gotS = AsOfJoin.backward(l, r, Seq("k"), "ts", Seq("pay"),
      strict = true)
      .select("k", "ts", "lid", "pay")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(t => (t._1, t._2, t._3) -> t._4).toMap
    val expectedS = left.map { case (k, ts, lid) =>
      val cands = right.filter(rr => rr._1 == k && rr._2 < ts)
      (k, ts, lid) -> (if (cands.isEmpty) None
        else Some(cands.maxBy(_._2)._3))
    }.toMap
    assert(gotS == expectedS)
  }

  test("property: bloom semi/anti == plain joins on random key sets (3 sizes)") {
    for (m <- Seq(64, 1 << 10, 1 << 16)) {
      val bigKeys = Seq.fill(2000)(rng.nextLong() % 10000).toDF("bk")
      val smallKeys = Seq.fill(300)(rng.nextLong() % 10000).toDF("sk")
      val semi = graft.operators.BloomJoin
        .semiJoin(bigKeys, smallKeys, "bk", "sk", numBits = m, k = 3)
        .as[Long].collect().sorted.toSeq
      val expSemi = bigKeys.join(smallKeys, col("bk") === col("sk"), "left_semi")
        .as[Long].collect().sorted.toSeq
      assert(semi == expSemi, s"numBits=$m")
      val anti = graft.operators.BloomJoin
        .antiJoin(bigKeys, smallKeys, "bk", "sk", numBits = m, k = 3)
        .as[Long].collect().sorted.toSeq
      val expAnti = bigKeys.join(smallKeys, col("bk") === col("sk"), "left_anti")
        .as[Long].collect().sorted.toSeq
      assert(anti == expAnti, s"numBits=$m")
    }
  }

  test("property: upsert is idempotent; upsert+cdcDiff reconcile") {
    val base = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
    val upd = (400L to 600L).map(i => (i, s"u$i")).toDF("k", "v")
    val once = graft.operators.Merge.upsert(base, upd, Seq("k"))
    val twice = graft.operators.Merge.upsert(once, upd, Seq("k"))
    assert(once.as[(Long, String)].collect().toSet ==
      twice.as[(Long, String)].collect().toSet)
    // diff of base vs upsert result: updates changed, new keys insert,
    // nothing deleted (upsert never removes), rest unchanged
    val diff = graft.operators.Merge.cdcDiff(base, once, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(!diff.values.exists(_ == "delete"))
    assert((501L to 600L).forall(k => diff(k) == "insert"))
    assert((400L to 500L).forall(k => diff(k) == "update"))
    assert((1L to 399L).forall(k => diff(k) == "unchanged"))
  }

  test("property: chunks reconstruct the original text exactly") {
    val docs = (1L to 60L).map { i =>
      (i, rng.alphanumeric.take(rng.nextInt(300)).mkString)
    }.filter(_._2.nonEmpty).toDF("doc_id", "text")
    val chunks = graft.operators.Corpus
      .chunk(docs, "text", "doc_id", maxChars = 40, overlap = 10)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val original = docs.as[(Long, String)].collect().toMap
    chunks.foreach { case (id, cs) =>
      // drop each successor's overlap prefix and concatenate
      val rebuilt = cs.head._4 + cs.tail.map(_._4.drop(10)).mkString
      assert(rebuilt == original(id), s"doc $id")
    }
    assert(chunks.keySet == original.keySet)
  }

  test("property: tokenBudget keeps a PREFIX of each domain's hash order") {
    val docs = (1L to 500L).map(i =>
      (i, if (i % 2 == 0) "a" else "b", 5L + i % 11)).toDF("id", "dom", "w")
    val kept = graft.operators.Sampling
      .tokenBudget(docs, "id", "dom", "w", Map("a" -> 700L), 400L,
        numPartitions = 6)
      .select("id", "dom").as[(Long, String)].collect().toSet
    val order = docs
      .withColumn("sk", graft.operators.Sampling.sampleKey(col("id"), ""))
      .select("id", "dom", "sk").as[(Long, String, String)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(r => (r._3, r._1)).map(_._1)).toMap
    for ((dom, ids) <- order) {
      val keptIds = ids.filter(id => kept.contains((id, dom)))
      assert(ids.take(keptIds.length).sameElements(keptIds),
        s"domain $dom kept set is not a hash-order prefix")
    }
  }

  test("property: winnow guarantee — shared run of w+n-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def randTokens(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val sharedRun = randTokens(6) // w + n - 1 = 4 + 3 - 1 = 6
    val docs = (1L to 20L).map { i =>
      // the shared run embedded at a random position in random noise
      val pre = randTokens(rnd.nextInt(5))
      val post = randTokens(rnd.nextInt(5))
      (i, (pre ++ sharedRun ++ post).mkString(" "))
    }.toDF("doc_id", "text")
    val fps = graft.operators.Dedup
      .winnowFingerprints(docs, "text", "doc_id", n = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    val common = (1L to 20L).map(fps(_)).reduce(_ intersect _)
    assert(common.nonEmpty,
      "guaranteed shared fingerprint missing for a 6-token shared run")
  }

  test("property: debounce is idempotent") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 7L, i.toLong, "t")
    }.toDF("user_id", "ts", "event_id", "event_type")
    val once = graft.operators.Sessionize.debounce(df,
      Seq("user_id", "event_type"), "ts", Seq(col("event_id")), 50L)
    val twice = graft.operators.Sessionize.debounce(once,
      Seq("user_id", "event_type"), "ts", Seq(col("event_id")), 50L)
    assert(once.select("event_id").as[Long].collect().toSet ==
      twice.select("event_id").as[Long].collect().toSet)
  }

  test("property: AUC is a rank statistic — invariant under monotone score transforms") {
    import graft.operators.Classify
    val rows = (1 to 400).map { _ =>
      (rng.nextInt(50) / 10.0 + 1.0, rng.nextBoolean())
    }.toDF("s", "lbl")
    def aucOf(df: org.apache.spark.sql.DataFrame) =
      Classify.auc(df, "s", col("lbl")).collect().head.getLong(2)
    val base = aucOf(rows)
    // squaring and exp are strictly monotone on positive scores:
    // ranks (and ties) are preserved, so AUC must be bit-identical
    assert(aucOf(rows.withColumn("s", col("s") * col("s"))) == base)
    assert(aucOf(rows.withColumn("s", exp(col("s")))) == base)
    // and reversing the score order flips AUC around 1/2
    val rev = aucOf(rows.withColumn("s", -col("s")))
    assert(rev + base == 1000000L)
  }

  test("property: histQuantiles stays within one bin width of the exact percentile") {
    val vals = (1 to 2000).map(_ => rng.nextDouble() * 1000.0 - 200.0)
    val df = vals.toDF("v")
    val bins = 32
    val width = (vals.max - vals.min) / bins
    val ps = Seq(0.1, 0.5, 0.9, 0.99)
    val est = graft.operators.Profile.histQuantiles(df, "v", bins, ps)
      .collect().map(r => r.getLong(0) -> r.getLong(2) / 1e6).toMap
    val sorted = vals.sorted
    ps.foreach { p =>
      val pos = (sorted.length - 1) * p
      val exact = sorted(pos.toInt) +
        (sorted(math.ceil(pos).toInt) - sorted(pos.toInt)) * (pos - pos.toInt)
      val e = est(math.round(p * 1e6))
      assert(math.abs(e - exact) <= width + 1e-6,
        s"p=$p est=$e exact=$exact width=$width")
    }
  }

  test("property: rollingActive equals the brute-force window distinct") {
    import graft.operators.Features
    val rows = (1 to 800).map { _ =>
      (rng.nextInt(60).toLong, rng.nextInt(30).toLong * 10L)
    }
    val df = rows.toDF("u", "ts")
    val got = Features.rollingActive(df, "ts", "u", bucketNs = 10L,
      window = 4).as[(Long, Long)].collect().toMap
    val byBucket = rows.map { case (u, ts) => (ts / 10, u) }
    val observed = byBucket.map(_._1).toSet
    val brute = observed.map { b =>
      b -> byBucket.filter { case (eb, _) =>
        eb <= b && eb > b - 4
      }.map(_._2).toSet.size.toLong
    }.toMap
    assert(got == brute)
  }

  test("property: twap equals the brute-force duration-weighted mean") {
    import graft.operators.Features
    val rows = (1 to 300).map { i =>
      (rng.nextInt(5).toLong, rng.nextInt(100000).toLong * 1000000L,
        i.toLong, rng.nextDouble() * 20 - 5)
    }
    val df = rows.toDF("u", "ts", "eid", "v")
    val got = Features.twap(df, "u", "ts", "v", tieCols = Seq("eid"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.map(r => (r._2 / 1000000L, r._3,
        Math.round(r._4 * 1e6))).sortBy(t => (t._1, t._2))
      if (sorted.length < 2) assert(!got.contains(u))
      else {
        val segs = sorted.zip(sorted.tail).map { case (a, b) =>
          (b._1 - a._1, a._3)
        }
        val span = segs.map(_._1).sum
        val s = segs.map { case (g, vm) => BigInt(g) * vm }.sum
        val expectTwap =
          if (span > 0) Some(BigDecimal(s) / span) else None
        val (nSeg, gotSpan, gotTwap) = got(u)
        assert(nSeg == segs.length && gotSpan == span)
        expectTwap.foreach { e =>
          assert(math.abs(gotTwap - e.toDouble) <= 1.0,
            s"u=$u got=$gotTwap expect=$e")
        }
      }
    }
  }
}
