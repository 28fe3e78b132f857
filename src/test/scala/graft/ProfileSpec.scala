package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1.0, Some(10.0)), (2.0, Some(20.0)), (3.0, None),
    (4.0, Some(40.0)), (100.0, Some(10.0))
  ).toDF("a", "b")

  test("numeric: counts, nulls, distincts, exact median per column") {
    val got = Profile.numeric(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 == 5 && a._3 == 0 && a._4 == 5)
    assert(a._5 == 1.0 && a._6 == 100.0)
    assert(a._7 == 22.0)   // mean
    assert(a._8 == 3.0)    // exact median of {1,2,3,4,100}
    val b = got("b")
    assert(b._2 == 4 && b._3 == 1 && b._4 == 3) // null excluded, 10 dup
    assert(b._8 == 15.0)   // median of {10,10,20,40} -> interpolated 15
  }

  test("numeric: two single-purpose passes, Expand never feeds percentile") {
    val plan = Profile.numeric(df, Seq("a", "b"))
      .queryExecution.optimizedPlan.toString
    // exactly two scans (basic+median pass, distinct pass) — not one
    // per column, and never one combined agg (the Expand × object-hash
    // interaction measured 3× slower; see scaladoc)
    assert("LocalRelation".r.findAllIn(plan).size == 2,
      s"expected two scans:\n$plan")
    // the Expand subtree (distinct pass) must not compute percentiles:
    // everything below the Expand node is scan-only
    val belowExpand = plan.substring(plan.indexOf("Expand"))
    assert(!belowExpand.contains("percentile("),
      s"Expand feeds percentile:\n$plan")
  }

  test("approxProfileCheck: exact anchors match numeric, both contracts hold") {
    val many = spark.range(1000)
      .select((col("id") % 97).cast("double").as("a"),
        (col("id") * 7 % 1000).cast("double").as("b"))
    val got = Profile.approxProfileCheck(many, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.numeric(many, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("a", "b")) {
      // anchors are byte-identical to the exact profile's checked form
      assert((1 to 7).forall(i => got(c).get(i) == exact(c).get(i)),
        s"$c anchors drifted: ${got(c)} vs ${exact(c)}")
      assert(got(c).getBoolean(8), s"$c HLL outside its 3-sigma rsd band")
      assert(got(c).getBoolean(9), s"$c approx median outside its rank bound")
    }
  }

  test("approxDriftCheck: deltas match exact drift, all four contracts hold") {
    val base = spark.range(2000)
      .select(col("id"), (col("id") % 97).cast("double").as("a"),
        when(col("id") % 13 === 0, lit(null).cast("double"))
          .otherwise((col("id") * 7 % 500).cast("double")).as("b"))
    val ref = base.filter(col("id") % 2 === 0)
    val cur = base.filter(col("id") % 2 === 1)
    val got = Profile.approxDriftCheck(ref, cur, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Profile.drift(ref, cur, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("a", "b")) {
      // the exact drift report (anchors + deltas) is byte-identical to
      // drift's exact form — that is what the SQL oracle replays
      assert((1 to 13).forall(i => got(c).get(i) == exact(c).get(i)),
        s"$c drift anchors drifted: ${got(c)} vs ${exact(c)}")
      for (i <- 14 to 17)
        assert(got(c).getBoolean(i),
          s"$c sketch contract boolean $i failed: ${got(c)}")
    }
  }

  test("frequentValues: top-k with deterministic tie-break by value") {
    val t = Seq("x", "x", "y", "y", "z").toDF("c1")
      .withColumn("c2", lit("k"))
    val got = Profile.frequentValues(t, Seq("c1", "c2"), k = 2)
      .as[(String, String, Long, Int)].collect().toSet
    // c1: x and y tie at 2 -> x first by value; z (1) cut at k=2
    assert(got == Set(
      ("c1", "x", 2L, 1), ("c1", "y", 2L, 2), ("c2", "k", 5L, 1)))
  }

  test("frequentValues: null values surface as a row, not a crash") {
    val t = Seq(Some("v"), None, None).toDF("c")
    val got = Profile.frequentValues(t, Seq("c"), k = 2)
      .as[(String, String, Long, Int)].collect()
    // null casts to null string; grouped as its own value
    assert(got.exists(r => r._2 == null && r._3 == 2))
  }

  test("winsorize: values clipped to the global quantile band") {
    val t = (1 to 100).map(_.toDouble).toDF("v")
    val got = Profile.winsorize(t, "v", 0.05, 0.95)
      .select("v", "v_wins").as[(Double, Double)].collect().toMap
    assert(got(1.0) > 1.0 && got(50.0) == 50.0 && got(100.0) < 100.0)
    assert(got.values.max <= got(100.0) && got.values.min >= got(1.0))
    intercept[IllegalArgumentException](Profile.winsorize(t, "v", 0.9, 0.1))
  }

  test("piiCounts/redactPii: formats found and scrubbed, clean text untouched") {
    import graft.functions.{TextFns => TF}
    val df = Seq(
      "mail me at a.b+c@ex-corp.io or see https://ex.io/x?y=1 call +1 (555) 123-4567",
      "no pii here at all").toDF("t")
    val got = df.select(TF.piiCounts(col("t")).as("p"),
      TF.redactPii(col("t")).as("r"))
      .select("p.n_emails", "p.n_urls", "p.n_phones", "r")
      .as[(Int, Int, Int, String)].collect()
    assert(got(0)._1 == 1 && got(0)._2 == 1 && got(0)._3 == 1)
    assert(got(0)._4 == "mail me at <EMAIL> or see <URL> call <PHONE>")
    assert(got(1) == ((0, 0, 0, "no pii here at all")))
  }

  test("histogram: bins cover [min, max], max lands in last bin, constant col safe") {
    val t = (1 to 100).map(_.toDouble).toDF("v")
    val got = Profile.histogram(t, "v", bins = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == (0L to 9L).toSet)
    assert(got.values.sum == 100)
    assert(got(9L) >= 10) // 91..100 inclusive of the max
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val g2 = Profile.histogram(const, "v", bins = 10)
      .as[(Long, Long)].collect().toMap
    assert(g2 == Map(0L -> 3L))
  }

  test("correlationMatrix: perfect and inverse correlations, one pass") {
    val t = (1 to 50).map(i => (i.toDouble, 2.0 * i, -3.0 * i))
      .toDF("a", "b", "c")
    val got = Profile.correlationMatrix(t, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == -1.0)
    assert(got(("b", "c")) == -1.0)
    assert(got.size == 3)
  }

  test("histogram excludes nulls; correlationMatrix survives '__' column names") {
    val t = Seq(Some(1.0), Some(100.0), None).toDF("v")
    val got = Profile.histogram(t, "v", bins = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.values.sum == 2) // null row NOT folded into a bin
    val c = (1 to 20).map(i => (i.toDouble, 2.0 * i, 3.0 * i))
      .toDF("a__b", "a", "b__c")
    val cm = Profile.correlationMatrix(c, Seq("a__b", "a", "b__c"))
      .as[(String, String, Double)].collect()
    assert(cm.length == 3 && cm.forall(_._3 == 1.0))
  }

  test("equiDepthHistogram: near-uniform counts on skewed data, nulls excluded") {
    val skewed = ((1L to 800L).map(_ => 1.0) ++ (1L to 200L).map(i => i * 100.0))
      .map(Option(_)).padTo(1050, Option.empty[Double]).toDF("v")
    val got = Profile.equiDepthHistogram(skewed, "v", bins = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.values.sum == 1000L) // 50 nulls excluded
    // 80% identical values: they all share bin 0 (duplicate bounds
    // collapse), the tail spreads over the upper bins
    assert(got(0L) == 800L)
    // all three bounds collapse to 1.0, so the tail lands in the top
    // bin and the middle bins are empty — no misassignment
    assert(got.getOrElse(1L, 0L) == 0L && got.getOrElse(2L, 0L) == 0L)
    assert(got(3L) == 200L)
  }

  test("psi: identical samples score ~0, shifted sample scores big") {
    val a = (1L to 1000L).map(i => (i, (i % 100).toDouble)).toDF("id", "v")
    val same = Profile.psi(a, a, "v", bins = 10)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(math.abs(same) < 1e-9)
    // current sample shifted entirely above the reference range:
    // clamps into the top bin -> large positive PSI
    val b = (1L to 1000L).map(i => (i, 500.0 + (i % 7))).toDF("id", "v")
    val drift = Profile.psi(a, b, "v", bins = 10)
      .agg(sum("psi_term")).head.getDouble(0)
    assert(drift > 1.0, s"psi $drift")
    // every bin row present, counts conserved
    val rows = Profile.psi(a, b, "v", bins = 10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).sum == 1000L)
    assert(rows.map(_.getLong(2)).sum == 1000L)
  }

  test("chiSquare: perfectly dependent columns score high, independent near 0") {
    // dependent: b == a
    val dep = (Seq.fill(50)(("x", "x")) ++ Seq.fill(50)(("y", "y")))
      .toDF("c1", "c2")
    val gotDep = Profile.chiSquare(dep, "c1", "c2")
      .as[(Long, Long, Double)].collect().head
    assert(gotDep == ((100L, 1L, 100.0))) // chi2 = n for a perfect 2x2
    // independent: all four cells equal
    val ind = (Seq.fill(25)(("x", "p")) ++ Seq.fill(25)(("x", "q")) ++
      Seq.fill(25)(("y", "p")) ++ Seq.fill(25)(("y", "q"))).toDF("c1", "c2")
    val gotInd = Profile.chiSquare(ind, "c1", "c2")
      .as[(Long, Long, Double)].collect().head
    assert(gotInd == ((100L, 1L, 0.0)))
  }

  test("madStats: exact median and MAD, robust to one wild value") {
    val df = (Seq.tabulate(9)(i => ("a", (i + 1).toDouble)) :+
      (("a", 1000.0)) :+ (("b", 5.0)))
      .toDF("k", "value")
    val got = Profile.madStats(df, Seq("k"), "value")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a: values 1..9 + 1000 → median 5.5 (interpolated), devs
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} → MAD 2.5; the
    // 1000 outlier does not move MAD at all
    assert(got("a") == ((10L, 5.5, 2.5)))
    assert(got("b") == ((1L, 5.0, 0.0)))
  }

  test("fdReport: holding, violated, and constant-rhs dependencies") {
    val df = Seq(
      (1L, "x", "P1"), (2L, "x", "P2"), (3L, "y", "P1"),
      (1L, "x", "P1") // duplicate row must not create a violation
    ).toDF("id", "grp", "prio")
    val got = Profile.fdReport(df,
      Seq("id" -> "grp", "grp" -> "prio", "prio" -> "prio"))
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap
    assert(got("id") == ((3L, 0L, 1L, 1)))   // id -> grp holds
    assert(got("grp") == ((2L, 1L, 2L, 0)))  // x maps to P1 and P2
    assert(got("prio") == ((2L, 0L, 1L, 1))) // trivially holds
  }

  test("drift: per-column deltas between snapshots, unit-free severity") {
    val ref = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val cur = Seq(2.0, 3.0, 4.0, 5.0).toDF("v")
    val r = Profile.drift(ref, cur, Seq("v")).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("mean_ref") == 2.5 && m("mean_cur") == 3.5)
    assert(m("mean_delta") == 1.0)
    assert(m("median_delta") == 1.0)
    // +1.0 over |2.5| = 400000 micro
    assert(m("rel_mean_shift_micro") == 400000L)
  }

  test("drift: nulls counted per side; an EMPTY snapshot reports null, not 0") {
    val ref = Seq[java.lang.Double](1.0, null, 3.0).toDF("v")
    val cur = Seq[java.lang.Double](2.0, 4.0).toDF("v")
    val r = Profile.drift(ref, cur, Seq("v")).collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_ref") == 2L && m("null_ref") == 1L)
    assert(m("n_cur") == 2L && m("null_cur") == 0L)
    // empty ref: the per-frame profile's sum over no rows is NULL —
    // the tagged-union form must not report the masked sum's 0
    val e = Profile.drift(ref.filter(lit(false)), cur, Seq("v"))
      .collect().head
    val em = e.getValuesMap[Any](e.schema.fieldNames)
    assert(em("n_ref") == 0L && em("null_ref") == null)
    assert(em("mean_ref") == null && em("median_ref") == null)
    assert(em("null_cur") == 0L && em("n_cur") == 2L)
  }

  test("infoGain: perfect predictor recovers H(label); constant feature zero") {
    val perfect = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("f", "l")
    val p = Profile.infoGain(perfect, "f", "l").collect().head
    // H(label) for a 50/50 split is ln 2 = 693147 micro-nats
    assert(p.getLong(2) == 693147L)  // h_label
    assert(p.getLong(3) == 0L)       // h_cond: feature determines label
    assert(p.getLong(4) == 693147L)  // ig
    val const = Seq(("c", "x"), ("c", "x"), ("c", "y"), ("c", "y"))
      .toDF("f", "l")
    val c = Profile.infoGain(const, "f", "l").collect().head
    assert(c.getLong(4) == 0L)       // constant feature: no information
  }

  test("benford: exact digit counts, micro shares, sub-1 excluded") {
    val df = Seq(10.0, 12.0, 19.9, 25.0, 0.5, -37.0, 1.0)
      .toDF("v") // digits: 1,1,1,2,(excl),3,1
    val got = Profile.benford(df, "v").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1)._1 == 4L && got(2)._1 == 1L && got(3)._1 == 1L)
    assert(got(1)._2 == math.round(4.0 / 6.0 * 1e6))
    // benford expectation for digit 1 is log10(2) ≈ 301030 micro
    val b1 = Profile.benford(df, "v").filter($"digit" === 1)
      .select($"benford_micro").as[Long].head()
    assert(b1 == 301030L)
  }

  test("histQuantilesByGroup: per-group edges, matches the ungrouped op per group") {
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      (1 to 50).map(i => ("b", i * 100.0))).toDF("g", "v")
    val got = Profile.histQuantilesByGroup(df, "g", "v", bins = 10,
        ps = Seq(0.5)).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    for (g <- Seq("a", "b")) {
      val solo = Profile.histQuantiles(df.filter(col("g") === g), "v",
        10, Seq(0.5)).collect().head
      assert(got(g) == ((solo.getLong(1), solo.getLong(2))), g)
    }
    // groups don't contaminate each other's bin edges
    assert(got("a")._2 < 60L * 1000000L && got("b")._2 > 1000L * 1000000L)
  }

  test("joinSizeEstimate: containment-assumption estimate and exact truth") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")        // n_a=4, d_a=3
    val b = Seq(1L, 2L, 2L, 4L, 5L).toDF("j")    // n_b=5, d_b=4
    val got = Profile.joinSizeEstimate(a, "k", b, "j").collect().head
    assert(got.getAs[Long]("n_a") == 4L && got.getAs[Long]("d_a") == 3L)
    assert(got.getAs[Long]("n_b") == 5L && got.getAs[Long]("d_b") == 4L)
    assert(got.getAs[Long]("est_rows") == 5L)    // round(4*5/4)
    // actual: k=1 matches 1 b-row ×2 a-rows, k=2 matches 2 -> 4
    assert(got.getAs[Long]("actual_rows") == 4L)
  }

  test("chiSquareResiduals: independent table has zero residuals, driver cell flags") {
    // perfectly dependent 2x2: (x,p) and (y,q) only
    val dep = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a0", "b0")
    val got = Profile.chiSquareResiduals(dep, "a0", "b0").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getAs[Long]("resid_milli")))).toMap
    assert(got.size == 4) // densified grid includes the zero cells
    // e = 1 everywhere; diagonal cells o=2 -> resid +1.0, off -> -1.0
    assert(got(("x", "p")) == ((2L, 1000L)))
    assert(got(("x", "q")) == ((0L, -1000L)))
    // independent table: every residual 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a0", "b0")
    val r2 = Profile.chiSquareResiduals(ind, "a0", "b0").collect()
    assert(r2.forall(_.getAs[Long]("resid_milli") == 0L))
  }

  test("freshness: staleness lag against the global high-water mark") {
    val df = Seq(("a", 5000000L), ("a", 9000000L), ("b", 2000000L))
      .toDF("src", "ts")
    val got = Profile.freshness(df, "src", "ts").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("n") == 2L)
    assert(got("a").getAs[Long]("latest_ns") == 9000000L)
    assert(got("a").getAs[Long]("lag_ms") == 0L)
    assert(got("b").getAs[Long]("lag_ms") == 7L) // (9e6-2e6) ns -> 7 ms
  }

  test("histQuantiles: uniform data interpolates exactly, one-bin-width error bound") {
    // 0..99 over 10 bins of width 9.9: every bin holds 10 values
    val df = (0 until 100).map(_.toDouble).toDF("v")
    val got = Profile.histQuantiles(df, "v", bins = 10,
        ps = Seq(0.5, 0.9)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(500000L, 900000L))
    assert(got(500000L)._1 == 100L)
    // p=0.5: target 50 -> bin 5 (cum 60, before 50)... bin with
    // cumBefore < 50 <= cum is bin 4 (cum 50): est = 0 + (4 + 1) * 9.9
    assert(got(500000L)._2 == 49500000L)
    // exact p50 of 0..99 is 49.5: the estimate IS the exact value here
    // p=0.9: target 90 -> bin 8 (cum 90): est = (8 + 1) * 9.9 = 89.1
    assert(got(900000L)._2 == 89100000L)
    // estimates stay within one bin width of the exact percentile
    val exact90 = 89.1 // quantile_cont(0.9) of 0..99
    assert(math.abs(got(900000L)._2 / 1e6 - exact90) <= 9.9)
    // merge property: binning two halves separately and summing
    // counts gives the same estimate (the counts are the sketch)
    val degenerate = Seq(5.0, 5.0, 5.0).toDF("v")
    val deg = Profile.histQuantiles(degenerate, "v", 10, Seq(0.5))
      .collect().head
    assert(deg.getLong(2) == 5000000L) // hi == lo -> the constant
  }
}
