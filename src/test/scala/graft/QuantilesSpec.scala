package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantiles

/** The radix order-statistic engine must be BIT-EQUAL to Spark's exact
  * `percentile` — Profile's oracle-checked medians / winsorize bounds /
  * equi-depth boundaries all route through it, so any interpolation or
  * ordering divergence would surface as a hash mismatch in the DuckDB
  * gate. Every case compares the unrounded doubles via
  * `doubleToLongBits`. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)

  private def check(values: Seq[java.lang.Double], label: String): Unit = {
    val df = values.toDF("v")
    val got = Quantiles.exactQuantiles(df, Seq("v" -> ps))("v")
    val pctArr = ps.map(p => s"${p}D").mkString("array(", ", ", ")")
    val want = df.agg(expr(s"percentile(v, $pctArr)").as("q"))
      .collect()(0)
    val wantSeq: Seq[Option[Double]] =
      if (want.isNullAt(0)) ps.map(_ => None)
      else want.getSeq[Double](0).map(Option(_))
    ps.indices.foreach { i =>
      (got(i), wantSeq(i)) match {
        case (None, None) =>
        case (Some(g), Some(w)) =>
          assert(java.lang.Double.doubleToLongBits(g) ==
            java.lang.Double.doubleToLongBits(w),
            s"$label p=${ps(i)}: got $g want $w")
        case (g, w) => fail(s"$label p=${ps(i)}: got $g want $w")
      }
    }
  }

  test("parity vs percentile: adversarial value sets") {
    check(Seq(42.0), "single value")
    check(Seq(1.0, 2.0), "two values")
    check(Seq(-0.0, 0.0, 0.0, -0.0), "signed zeros")
    check(Seq(-1e308, 1e308, -4.9e-324, 4.9e-324, 0.0), "extremes")
    check((1 to 1000).map(i => java.lang.Double.valueOf(i.toDouble)),
      "integral positions")
    check(Seq.fill(5000)(java.lang.Double.valueOf(7.25)) ++
      Seq(java.lang.Double.valueOf(7.26)), "duplicate pile")
    check(Seq[java.lang.Double](3.0, null, 1.0, null, 2.0), "nulls ignored")
    check(Seq[java.lang.Double](null, null), "all null")
    // deterministic pseudo-random doubles incl. negatives and repeats
    val rnd = new scala.util.Random(20260815)
    check((1 to 4096).map(_ =>
        java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 2e6)) ++
      (1 to 512).map(_ => java.lang.Double.valueOf(rnd.nextInt(16).toDouble)),
      "random mix")
  }

  test("parity vs percentile: non-double input columns") {
    val longs = Seq(5L, 1L, 9L, 9L, 2L, 1L, 7L).toDF("v")
      .select(col("v").cast("long").as("v"))
    val got = Quantiles.exactQuantiles(
      longs.select(col("v")), Seq("v" -> Seq(0.5, 0.9)))("v")
    val want = longs.agg(expr("percentile(v, array(0.5D, 0.9D))"))
      .collect()(0).getSeq[Double](0)
    assert(got.map(_.get) == want)
  }

  test("multi-column requests share scans and stay independent") {
    val df = (1 to 100).map(i => (i.toDouble, (101 - i).toDouble * 10))
      .toDF("a", "b")
    val got = Quantiles.exactQuantiles(df,
      Seq("a" -> Seq(0.5), "b" -> Seq(0.25, 0.75)))
    assert(got("a") == Seq(Some(50.5)))
    val wb = df.agg(expr("percentile(b, array(0.25D, 0.75D))"))
      .collect()(0).getSeq[Double](0)
    assert(got("b").map(_.get) == wb)
  }

  test("groupedExactQuantiles: past maxBroadcastGroups the hints fall back (no BroadcastExchange, same results)") {
    // r13 verdict #5: the ~10^6-group broadcast license was documented
    // but never checked — past it the hinted metadata joins OOM the
    // driver. Adversarial setting: a threshold of 3 with 8 groups must
    // (a) plan WITHOUT any broadcast, (b) return bit-identical results
    val rnd = new scala.util.Random(14)
    val df = (1 to 800).map(_ =>
      (rnd.nextInt(8), (rnd.nextDouble() - 0.5) * 1e4)).toDF("g", "v")
    val gps = Seq("p50" -> 0.5, "p90" -> 0.9)
    // isolate HINT-driven broadcasts: the auto threshold also
    // broadcasts tiny sides from size stats, which self-limits and is
    // not the OOM class the guard removes
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hinted = Quantiles.groupedExactQuantiles(df, Seq("g"), "v", gps)
      val fallback = Quantiles.groupedExactQuantiles(df, Seq("g"), "v", gps,
        maxBroadcastGroups = 3)
      val plan = fallback.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"fallback plan still broadcasts:\n$plan")
      // the hinted plan DOES broadcast (the guard changed only the plan)
      assert(hinted.queryExecution.executedPlan.toString
        .contains("BroadcastExchange"))
      val a = hinted.orderBy("g").collect().toSeq
      val b = fallback.orderBy("g").collect().toSeq
      assert(a == b, s"fallback diverged:\n$a\nvs\n$b")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("groupedExactQuantiles: bit-parity vs grouped percentile, adversarial") {
    val gps = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95, "p100" -> 1.0)
    val rnd = new scala.util.Random(20260815)
    // group zoo: a 1-row group, a duplicate pile, signed zeros, an
    // all-null group, a null GROUP KEY, and random mixes incl. nulls
    val rows: Seq[(java.lang.Integer, java.lang.Double)] =
      Seq[(java.lang.Integer, java.lang.Double)](
        (1, 42.0), (2, 7.25), (2, 7.25), (2, 7.26),
        (3, -0.0), (3, 0.0), (3, -0.0), (3, 0.0),
        (4, null), (4, null),
        (null, 5.0), (null, 6.0), (null, null)) ++
        (1 to 2000).map(_ => (java.lang.Integer.valueOf(rnd.nextInt(6) + 10),
          java.lang.Double.valueOf((rnd.nextDouble() - 0.5) * 2e6))) ++
        (1 to 300).map(_ => (java.lang.Integer.valueOf(rnd.nextInt(6) + 10),
          null: java.lang.Double))
    val df = rows.toDF("g", "v")
    val got = Quantiles.groupedExactQuantiles(df, Seq("g"), "v", gps)
      .collect().map(r => Option(r.get(0)) -> r).toMap
    val pctArr = gps.map { case (_, p) => s"${p}D" }
      .mkString("array(", ", ", ")")
    val want = df.groupBy("g")
      .agg(expr(s"percentile(v, $pctArr)").as("q"))
      .collect().map(r => Option(r.get(0)) -> r).toMap
    assert(got.keySet == want.keySet, "group spines differ")
    for ((k, gr) <- got) {
      val wr = want(k)
      val wSeq: Seq[Option[Double]] =
        if (wr.isNullAt(1)) gps.map(_ => None)
        else wr.getSeq[Double](1).map(Option(_))
      gps.indices.foreach { i =>
        val gv = if (gr.isNullAt(i + 1)) None else Some(gr.getDouble(i + 1))
        (gv, wSeq(i)) match {
          case (None, None) =>
          case (Some(a), Some(b)) =>
            assert(java.lang.Double.doubleToLongBits(a) ==
              java.lang.Double.doubleToLongBits(b),
              s"group $k ${gps(i)._1}: got $a want $b")
          case (a, b) => fail(s"group $k ${gps(i)._1}: got $a want $b")
        }
      }
    }
  }

  test("groupedPercentiles: radix and buffer engines agree (6-dp gate form)") {
    val rnd = new scala.util.Random(42)
    val df = (1 to 5000).map(_ => (s"t${rnd.nextInt(4)}",
        (rnd.nextDouble() * 1e4).floor / 100.0)).toDF("k", "v")
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().toSeq
    assert(sorted(operators.Profile.groupedPercentiles(
        df, Seq("k"), "v", Seq(0.5, 0.95, 0.99), engine = "radix")) ==
      sorted(operators.Profile.groupedPercentiles(
        df, Seq("k"), "v", Seq(0.5, 0.95, 0.99), engine = "buffer")))
  }

  test("madStats: radix and buffer engines agree (incl. null values and groups)") {
    val rnd = new scala.util.Random(7)
    val rows: Seq[(String, java.lang.Double)] =
      (1 to 3000).map(_ => (s"g${rnd.nextInt(5)}",
        java.lang.Double.valueOf((rnd.nextDouble() - 0.3) * 1e4))) ++
        (1 to 100).map(_ => (s"g${rnd.nextInt(5)}", null: java.lang.Double)) ++
        Seq((null: String, 3.0), (null, 9.0), ("lone", 42.0))
    val df = rows.toDF("k", "v")
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.orderBy("k").collect().toSeq
    assert(sorted(operators.Profile.madStats(df, Seq("k"), "v")) ==
      sorted(operators.Profile.madStats(df, Seq("k"), "v", engine = "radix")))
  }

  test("profile median / winsorize / equi-depth route through the engine") {
    // near-unique doubles — the shape percentile buffered whole
    val df = (1 to 3000).map(i => ((i * 2654435761L % 100000L) / 7.0))
      .toDF("x")
    val med = operators.Profile.numeric(df, Seq("x"))
      .select("median_v").as[Double].head()
    val wantMed = df.agg(round(expr("percentile(x, 0.5D)"), 6))
      .as[Double].head()
    assert(med == wantMed)
    val w = operators.Profile.winsorize(df, "x")
    val bounds = df.agg(
      round(expr("percentile(x, 0.05D)"), 6),
      round(expr("percentile(x, 0.95D)"), 6)).as[(Double, Double)].head()
    val clipped = w.agg(min("x_wins"), max("x_wins"))
      .as[(Double, Double)].head()
    assert(clipped == bounds)
    val eq = operators.Profile.equiDepthHistogram(df, "x", bins = 8)
      .as[(Long, Long)].collect().toMap
    assert(eq.values.sum == 3000L && eq.size == 8)
    // equal depth: every bin within one boundary-tie of n/bins
    assert(eq.values.forall(n => n >= 300 && n <= 450))
  }
}
