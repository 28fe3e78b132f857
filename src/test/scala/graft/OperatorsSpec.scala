package graft

import org.apache.spark.sql.functions._
import graft.operators._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Pivots (V1/V2) ----

  test("continuous pivot: explicit values, nulls preserved") {
    val df = Seq(("g1", "s1", 1.5), ("g1", "s2", -0.5), ("g2", "s1", 0.25))
      .toDF("gene", "sample", "v")
    val wide = Pivots.continuous(df, "gene", "sample", "v", Seq("s1", "s2"))
    val rows = wide.orderBy("gene").collect()
    assert(rows(0).getDouble(1) == 1.5 && rows(0).getDouble(2) == -0.5)
    assert(rows(1).getDouble(1) == 0.25 && rows(1).isNullAt(2))
  }

  test("discrete pivot: nulls->0, int cast (cnv.py:670-679)") {
    val df = Seq(("g1", "s1", 2), ("g2", "s2", -1)).toDF("gene", "sample", "v")
    val wide = Pivots.discrete(df, "gene", "sample", "v", Seq("s1", "s2"))
    val got = wide.orderBy("gene").as[(String, Int, Int)].collect().toSeq
    assert(got == Seq(("g1", 2, 0), ("g2", 0, -1)))
    assert(wide.schema("s1").dataType.typeName == "integer")
  }

  test("pivot scales to a 1000-column sample matrix (SURVEY §7.4 item 3)") {
    val samples = (0 until 1000).map(i => f"S$i%04d")
    val rng = new scala.util.Random(3)
    val df = (for (g <- 0 until 20; s <- samples if rng.nextDouble() < 0.3)
      yield (s"g$g", s, rng.nextDouble())).toDF("gene", "sample", "v")
    val wide = Pivots.continuous(df, "gene", "sample", "v", samples)
    assert(wide.columns.length == 1001)
    assert(wide.count() == 20)
  }

  test("melt: inverse of the continuous pivot (round-trip law)") {
    val long = Seq(("g1", "s1", 1.5), ("g1", "s2", -0.5), ("g2", "s1", 0.25))
      .toDF("gene", "sample", "v")
    val wide = Pivots.continuous(long, "gene", "sample", "v", Seq("s1", "s2"))
    val back = Pivots.melt(wide, Seq("gene"), Seq("s1", "s2"),
      varName = "sample", valueName = "v")
      .as[(String, String, Double)].collect().toSet
    assert(back == long.as[(String, String, Double)].collect().toSet)
    // dropNulls=false keeps the empty g2/s2 cell
    val withNull = Pivots.melt(wide, Seq("gene"), Seq("s1", "s2"),
      varName = "sample", valueName = "v", dropNulls = false)
    assert(withNull.count() == 4L)
  }

  test("quantileNormalize: rank means substituted, samples end up identical") {
    import graft.operators.Features
    val m = Seq(
      ("s1", "g1", 2L), ("s1", "g2", 4L), ("s1", "g3", 6L),
      ("s2", "g1", 3L), ("s2", "g2", 1L), ("s2", "g3", 5L)
    ).toDF("sample_id", "gene", "v")
    val got = Features.quantileNormalize(m, "sample_id", "gene", "v")
      .select("sample_id", "gene", "qn_rank", "qn_value")
      .as[(String, String, Int, Double)].collect()
    val byKey = got.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(byKey(("s1", "g1")) == ((1, 1.5))) // rank1 mean of (2,1)
    assert(byKey(("s2", "g2")) == ((1, 1.5)))
    assert(byKey(("s1", "g2")) == ((2, 3.5)))
    assert(byKey(("s2", "g3")) == ((3, 5.5)))
    // post-normalization the samples have IDENTICAL value multisets
    val dists = got.groupBy(_._1).view.mapValues(_.map(_._4).sorted.toSeq)
    assert(dists("s1") == dists("s2"))
  }

  test("duplicatePairs catches pandas-pivot ValueError case (cnv.py:657)") {
    val df = Seq(("g1", "s1", 1.0), ("g1", "s1", 2.0), ("g2", "s1", 3.0))
      .toDF("gene", "sample", "v")
    val dups = Pivots.duplicatePairs(df, "gene", "sample").collect()
    assert(dups.length == 1 && dups(0).getString(0) == "g1")
  }

  // ---- Reconcile ----

  test("countMatch: outer join + zero-fill + mismatch flag") {
    val exp = Seq(("a"), ("a"), ("b")).toDF("k")
    val obs = Seq(("a"), ("c")).toDF("k")
    val got = Reconcile.countMatch(exp, obs, Seq("k"))
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(("a", 2L, 1L, true), ("b", 1L, 0L, true),
      ("c", 0L, 1L, true)))
  }

  test("constraintViolations: nulls and dup keys reported, valid frame empty") {
    val bad = Seq((Some("s1"), "f1"), (None, "f2"), (Some("s3"), "f2"))
      .toDF("sample_id", "file_name")
    val got = Reconcile.constraintViolations(bad,
      Seq("sample_id"), Seq("file_name"))
      .as[(String, Long)].collect().toSet
    assert(got == Set(("null:sample_id", 1L), ("dup:file_name", 2L)))
    val ok = Seq((Some("s1"), "f1")).toDF("sample_id", "file_name")
    assert(Reconcile.constraintViolations(ok,
      Seq("sample_id"), Seq("file_name")).count() == 0)
  }

  // ---- Sessionize ----

  test("sessionize: 30-min gap starts a new session") {
    val m = 60000000000L // one minute in ns
    val df = Seq(
      (1L, 0 * m, 1L), (1L, 10 * m, 2L), (1L, 50 * m, 3L), // gap 40min
      (2L, 0 * m, 4L)).toDF("user_id", "ts", "event_id")
    val got = Sessionize.sessionStats(df, "user_id", "ts",
      gapNs = 30 * m, tiebreak = Seq(col("event_id")))
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("transitionMatrix: hand-computed counts and conditional PPM") {
    val df = Seq(
      (1L, 0L, 1L, "A"), (1L, 1L, 2L, "B"), (1L, 2L, 3L, "A"),
      (1L, 3L, 4L, "C"),               // u1: A→B, B→A, A→C
      (2L, 0L, 5L, "A"), (2L, 1L, 6L, "B"), // u2: A→B
      (3L, 0L, 7L, "D"))               // single event: no transition
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.transitionMatrix(df, "user_id", "ts",
      "event_type", Seq(col("event_id")))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("A", "B", 2L, 666667L), ("A", "C", 1L, 333333L),
      ("B", "A", 1L, 1000000L)))
  }

  test("transitionMatrix: same-ts events ordered by the tiebreak") {
    val df = Seq((1L, 5L, 2L, "B"), (1L, 5L, 1L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.transitionMatrix(df, "user_id", "ts",
      "event_type", Seq(col("event_id")))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("A", "B", 1L, 1000000L)))
  }

  test("debounce: survivor is a function of each row and its predecessor") {
    val s = 1000000000L // 1s in ns
    val df = Seq(
      (1L, 0 * s, 1L, "click"),
      (1L, 2 * s, 2L, "click"),    // 2s after kept event: dropped
      (1L, 7 * s, 3L, "click"),    // 5s after event 2 (lag form): kept
      (1L, 7 * s, 4L, "view"),     // different type: kept
      (2L, 8 * s, 5L, "click"))    // different user: kept
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.debounce(df, Seq("user_id", "event_type"), "ts",
      Seq(col("event_id")), minGapNs = 4 * s)
      .select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L, 5L))
  }

  test("whiten: unit variance per dim, zero-variance dim maps to 0") {
    val df = Seq(
      (1L, Array(1.0f, 7.0f)), (2L, Array(3.0f, 7.0f)),
      (3L, Array(5.0f, 7.0f))).toDF("vec_id", "embedding")
    val got = Similarity.whiten(df, "vec_id", "embedding")
      .as[(Long, Seq[Double])].collect().map(r => r._1 -> r._2).toMap
    // dim0: mean 3, std 2 → z in {-1, 0, 1}; dim1 constant → 0
    assert(got(1L) == Seq(-1.0, 0.0))
    assert(got(2L) == Seq(0.0, 0.0))
    assert(got(3L) == Seq(1.0, 0.0))
  }

  test("basketRules: support/confidence/lift hand-computed, repeats collapse") {
    val m = 60000000000L
    // u1 s1: {view, click, click(dup)}, u1 s2: {view}, u2 s1: {view, click}
    val df = Seq(
      (1L, 0 * m, 1L, "view"), (1L, 1 * m, 2L, "click"),
      (1L, 2 * m, 3L, "click"),
      (1L, 99 * m, 4L, "view"),
      (2L, 0 * m, 5L, "view"), (2L, 1 * m, 6L, "click"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.basketRules(df, "user_id", "ts", "event_type",
      gapNs = 30 * m, tiebreak = Seq(col("event_id")), minSupport = 2L)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val r = got.head
    // 3 baskets; supp(click,view)=2, supp(click)=2, supp(view)=3
    assert((r._1, r._2, r._3) == (("click", "view", 2L)))
    assert(r._4 == 1.0)                       // click → view always
    assert(r._5 == BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r._6 == 1.0)                       // lift 2*3/(2*3) = 1
  }

  test("topPaths: event order inside sessions, frequency rank") {
    val m = 60000000000L
    val df = Seq(
      (1L, 0 * m, 1L, "view"), (1L, 1 * m, 2L, "click"),   // view>click
      (2L, 0 * m, 3L, "view"), (2L, 2 * m, 4L, "click"),   // view>click
      (3L, 0 * m, 5L, "view"),                             // view
      (1L, 99 * m, 6L, "buy"))                             // new session: buy
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.topPaths(df, "user_id", "ts", "event_type",
      gapNs = 30 * m, tiebreak = Seq(col("event_id")), k = 10)
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(("view>click", 2L, 1), ("buy", 1L, 2), ("view", 1L, 3)))
  }

  // ---- Similarity ----

  test("bruteForceTopK: exact cosine ranking, self excluded") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 1),
      "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((2L, 1), (3L, 2)))
  }

  test("covarianceMatrix: ragged + null-element vectors match explode semantics") {
    // The TriProductSum kernel must reproduce the composable form it
    // replaced: a row contributes pair (i,j) iff its dimension > j
    // (count), null ELEMENTS count toward n but not toward the
    // product/dimension sums, and empty/null VECTORS drop entirely.
    val rows: Seq[(Long, Array[java.lang.Float])] = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (2L, Array[java.lang.Float](4.0f, 5.0f)), // shorter: no (·,2) pairs
      (3L, Array[java.lang.Float](6.0f, null, 7.0f)), // null element
      (4L, Array.empty[java.lang.Float]), // drops
      (5L, null)) // drops
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.covarianceMatrix(df, "embedding")
      .as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    def micro(f: java.lang.Float): Option[Long] =
      Option(f).map(x => Math.round(x.toDouble * 1e6))
    val ys = rows.flatMap { case (_, a) =>
      Option(a).filter(_.nonEmpty).map(_.map(micro)) }
    def ref(i: Int, j: Int): (Long, Double) = {
      val withPair = ys.filter(_.length > j)
      val n = withPair.length.toLong
      val spp = withPair.flatMap(y =>
        for (a <- y(i); b <- y(j)) yield a * b).sum
      val si = ys.filter(_.length > i).flatMap(_(i)).sum
      val sj = ys.filter(_.length > j).flatMap(_(j)).sum
      val cov = BigDecimal(
          (spp.toDouble - si.toDouble * sj / n) / (n - 1) / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n, cov + 0.0)
    }
    assert(got.keySet ==
      (for (i <- 0 until 3; j <- i until 3) yield (i, j)).toSet)
    for (i <- 0 until 3; j <- i until 3)
      assert(got((i, j)) == ref(i, j), s"cov($i,$j)")
  }

  test("covarianceMatrix: all-null dims omitted, never-co-present pairs null") {
    // the exploded form's edge semantics: a dimension with NO non-null
    // values vanished through the inner join against per-dimension
    // sums (pairs omitted); a pair that never has both elements
    // present had sum(p) = NULL (SQL empty sum) -> null covariance
    val rows: Seq[(Long, Array[java.lang.Float])] = Seq(
      (1L, Array[java.lang.Float](1.0f, null, 2.0f, null)),
      (2L, Array[java.lang.Float](null, 3.0f, null, null)),
      (3L, Array[java.lang.Float](4.0f, null)))
    val got = Similarity.covarianceMatrix(rows.toDF("vec_id", "embedding"),
        "embedding")
      .select(col("i"), col("j"), col("n"), col("cov"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    val want = Map(
      (0, 0) -> ((3L, Some(4.333333))),
      (0, 1) -> ((3L, None)),        // never co-present
      (0, 2) -> ((2L, Some(-3.0))),
      (1, 1) -> ((3L, Some(3.0))),
      (1, 2) -> ((2L, None)),        // never co-present
      (2, 2) -> ((2L, Some(2.0))))   // dim 3 all-null: no (·,3) rows
    assert(got == want)
  }

  test("covariance + PCA: exact cov vs Scala reference, components orthonormal") {
    // strongly correlated dims 0,1; independent dim 2
    val rows = (1 to 40).map { i =>
      (i.toLong, Array(i.toFloat, (2 * i).toFloat, (i % 3).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val cov = Similarity.covarianceMatrix(df, "embedding")
    val got = cov.as[(Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    // Scala reference with the same micro-int pipeline
    def micro(x: Double) = Math.round(x * 1e6)
    val ys = rows.map(_._2.map(f => micro(f.toDouble)))
    def ref(i: Int, j: Int): Double = {
      val n = ys.length
      val spp = ys.map(y => y(i) * y(j)).sum
      val (si, sj) = (ys.map(_(i)).sum, ys.map(_(j)).sum)
      BigDecimal((spp.toDouble - si.toDouble * sj / n) / (n - 1) / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (i <- 0 until 3; j <- i until 3)
      assert(got((i, j)) == ref(i, j), s"cov($i,$j)")
    // power iteration: pc1 dominated by the correlated dims, and the
    // two components are orthonormal
    val comps = Similarity.pcaComponents(cov, dims = 3, k = 2, iters = 60)
    val byComp = comps.as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (c, rs) =>
        c -> rs.sortBy(_._2).map(_._3) }
    val (p1, p2) = (byComp(0), byComp(1))
    assert(math.abs(p1.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(p2.map(x => x * x).sum - 1.0) < 1e-9)
    assert(math.abs(p1.zip(p2).map { case (a, b) => a * b }.sum) < 1e-6)
    assert(math.abs(p1(1)) > math.abs(p1(2))) // variance-heavy dim wins
    // projection is map-only and reproducible
    val proj = Similarity.pcaProject(df, "vec_id", "embedding", comps)
    assert(proj.columns.toSeq == Seq("vec_id", "pc0", "pc1"))
    assert(proj.count() == 40L)
  }

  test("dimProfile and vectorHygiene: dead dim, NaN, zero, wrong-dim flags") {
    val df = Seq(
      (1L, Array(1.0f, 5.0f)),
      (2L, Array(1.0f, -3.0f)),
      (3L, Array(1.0f, Float.NaN)),
      (4L, Array(0.0f, 0.0f)),
      (5L, Array(9.9f)))
      .toDF("vec_id", "embedding")
    val prof = Similarity.dimProfile(df.filter(col("vec_id") <= 4), "embedding")
      .as[(Int, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // dim 0: values 1,1,1,0 → min 0, max 1, mean 0.75, no NaN
    assert(prof(0) == ((0, 4L, 0L, 0.0, 1.0, 0.75)))
    // dim 1: 5,-3,NaN,0 → NaN excluded from stats, counted
    assert(prof(1) == ((1, 4L, 1L, -3.0, 5.0,
      BigDecimal((5.0 - 3.0 + 0.0) / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    val hyg = Similarity.vectorHygiene(df, "embedding", expectedDim = 2)
      .as[(String, Long)].collect().toMap
    assert(hyg == Map("ok" -> 2L, "has_nan" -> 1L, "zero_vector" -> 1L,
      "wrong_dim" -> 1L))
  }

  test("rrfFuse: nano-unit sums, doc in both lists outranks single-list docs") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(a, b), "id", "rank", k = 60, topN = 10)
      .as[(Long, Long, Long, Int)].collect().map(r => r._1 -> r).toMap
    def c(r: Int) = Math.round(1e9 / (r + 60))
    assert(got(20L) == ((20L, 2L, c(2) + c(1), 1)))
    assert(got(10L) == ((10L, 1L, c(1), 2)))
    assert(got(40L) == ((40L, 1L, c(2), 3)))
    assert(got(30L) == ((30L, 1L, c(3), 4)))
  }

  test("meanPool: exact micro-unit centroids per label") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.0f, 1.0f), 0),
      (3L, Array(0.25f, 0.75f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.meanPool(df, "embedding", "label")
      .as[(Int, Long, Seq[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(0) == ((2L, Seq(0.5, 0.5))))
    assert(got(1) == ((1L, Seq(0.25, 0.75))))
  }

  test("hardNegatives: only other-label neighbors, nearest first") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.05f), 0),   // same label as anchor: excluded
      (3L, Array(1.0f, 0.2f), 1),    // hard negative (closest other-label)
      (4L, Array(0.0f, 1.0f), 1))    // easy negative
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, df.filter(col("vec_id") === 1),
      "vec_id", "embedding", "label", k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toSet
    assert(got == Set((3L, 1), (4L, 2)))
  }

  test("thresholdPairs symmetric set, id_a < id_b") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.thresholdPairs(df, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("srp bucket collides for identical vectors") {
    val df = Seq((1L, Array.fill(4)(0.5f)), (2L, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val b = df.select(Similarity.srpBucket(
      col("embedding").cast("array<double>"), planes = 4, dim = 4).as("b"))
      .as[Long].collect()
    assert(b(0) == b(1))
  }

  // ---- MultiModal ----

  test("multimodal: attach + stub decode keeps schema and determinism") {
    val df = Seq((1L, "hello world")).toDF("doc_id", "text")
    val dec = MultiModal.decodeStub(MultiModal.attachBinary(df, "text"))
    val r = dec.select("meta.n_bytes", "meta.width", "meta.height").collect()(0)
    assert(r.getLong(0) == 11L)
    assert(r.getLong(1) >= 0 && r.getLong(1) < 640)
  }

  test("multimodal: feature vector normalized, resize bounded, frames sampled") {
    val df = MultiModal.decodeStub(MultiModal.attachBinary(
      Seq((1L, "hello world")).toDF("doc_id", "text"), "text"))
    val feats = MultiModal.featureExtractStub(df)
      .select("features").collect().head.getSeq[Double](0)
    assert(feats.length == 16 && feats.forall(f => f >= 0.0))
    val rs = MultiModal.resizeMeta(df, 64, 64)
      .select("resized.width", "resized.height").collect().head
    assert(rs.getLong(0) <= 64 && rs.getLong(1) <= 64)
    val frames = MultiModal.frameSample(
      Seq((1L, 10L)).toDF("doc_id", "n_frames"), "n_frames", every = 3)
      .select("frame_idx").as[Long].collect().toSeq
    assert(frames == Seq(0L, 3L, 6L, 9L))
  }

  test("multimodal: mapPartitions batch decode matches stub byte count") {
    val df = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
    val dec = MultiModal.decodeBatch(MultiModal.attachBinary(df, "text"))
    val got = dec.select(col("doc_id"), col("meta.n_bytes"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 11L), (2L, 3L)))
  }

  test("multimodal: realDecoder reads true PNG/JPEG headers, stub-falls-back otherwise") {
    def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff8800)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val df = Seq(
      (1L, imageBytes("png", 640, 360)),
      (2L, imageBytes("jpg", 31, 17)),
      (3L, "not an image at all".getBytes("UTF-8")),
      (4L, null: Array[Byte])
    ).toDF("doc_id", "content")
    val got = MultiModal.decodeBatch(df, realDecoder = true)
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.format"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)),
          (if (r.isNullAt(2)) -1L else r.getLong(2)),
          r.getString(3))).toMap
    assert(got(1L) == ((640L, 360L, "png")))
    assert(got(2L)._1 == 31L && got(2L)._2 == 17L &&
      got(2L)._3.startsWith("jp")) // reader reports "jpeg"
    assert(got(3L)._3 == "stub") // undecodable -> deterministic stub
    assert(got(4L) == ((-1L, -1L, null))) // null payload -> null meta
  }

  test("ntileByRange == global ntile for uneven and tiny inputs") {
    for (n <- Seq(97L, 100L, 7L, 3L)) {
      val df = (1L to n).map(i => (i * 13 % 101, i)).toDF("k", "uid")
      val expected = Batching.globalNtile(df, Seq(col("k"), col("uid")), 10)
        .select("uid", "batch").as[(Long, Int)].collect().toMap
      // order by a unique derived key: make (k, uid) total via k*1000+uid
      val keyed = df.withColumn("__ord",
        col("k") * 1000 + col("uid"))
      val got = Batching.ntileByRange(keyed, "__ord", 10, numPartitions = 4)
        .select("uid", "batch").as[(Long, Int)].collect().toMap
      // same order relation (k asc, uid asc) <=> (__ord asc) since uid < 1000
      assert(got == expected, s"n=$n")
    }
  }

  // ---- Impute ----

  test("fillFromGroup: nulls fill from group mean, whole-null group falls to global") {
    val df = Seq(
      ("u1", Some(10.0)), ("u1", Some(20.0)), ("u1", None),
      ("u2", None), ("u2", None) // whole group null
    ).toDF("k", "value")
    val got = Impute.fillFromGroup(df, Seq("k"), "value", "mean")
      .select("k", "value_filled", "value_imputed")
      .as[(String, Double, Int)].collect()
    val u1 = got.filter(_._1 == "u1")
    assert(u1.count(_._3 == 1) == 1)
    assert(u1.filter(_._3 == 1).head._2 == 15.0)   // group mean
    val u2 = got.filter(_._1 == "u2")
    assert(u2.forall(r => r._3 == 1 && r._2 == 15.0)) // global mean
  }

  test("fillFromGroup: median stat and bad stat rejection") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(9.0)),
      ("g", None)).toDF("k", "value")
    val got = Impute.fillFromGroup(df, Seq("k"), "value", "median")
      .filter(col("value_imputed") === 1)
      .select("value_filled").as[Double].collect()
    assert(got.sameElements(Array(2.0)))
    intercept[IllegalArgumentException](
      Impute.fillFromGroup(df, Seq("k"), "value", "mode"))
  }

  test("fillFromGroup: whole-null group falls to the GLOBAL radix median") {
    val df = Seq(
      ("g1", Some(1.0)), ("g1", Some(4.0)), ("g1", Some(100.0)),
      ("g2", None), ("g2", None)).toDF("k", "value")
    val got = Impute.fillFromGroup(df, Seq("k"), "value", "median")
      .filter(col("k") === "g2")
      .select("value_filled", "value_imputed")
      .as[(Double, Int)].collect()
    // global median of (1, 4, 100) = 4.0, via Quantiles (the
    // percentile form it replaced would agree — QuantilesSpec parity)
    assert(got.forall(_ == ((4.0, 1))))
  }

  // ---- Batching.packByBudget ----

  test("packByBudget == single-window cumulative binning; no split rows") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val df = (1L to 500L).map(i => (i, rnd.nextInt(90) + 10L))
      .toDF("id", "w")
    val got = Batching.packByBudget(df, "id", "w", budget = 250L,
      numPartitions = 8)
      .select("id", "pack").as[(Long, Long)].collect().toMap
    val win = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("pack", floor((sum("w").over(win) - col("w")) / 250L))
      .select("id", "pack").as[(Long, Long)].collect().toMap
    assert(got == expected)
    // packs are contiguous in id order
    val ordered = got.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b >= a })
  }

  test("packExact: every sequence is exactly seqLen tokens, docs split losslessly") {
    val rnd = new scala.util.Random(11)
    val weights = (1L to 300L).map(i =>
      (i, if (i % 37 == 0) 0L else rnd.nextInt(190) + 10L))
    val df = weights.toDF("id", "w")
    val spans = Batching.packExact(df, "id", "w", seqLen = 128L,
        numPartitions = 8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // (id, n_tokens, seq_id, span_start, span_end, seq_off)
    val total = weights.map(_._2).sum
    // 1. lossless: per-doc spans are contiguous and cover [0, w)
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_._4)
      assert(sorted.head._4 == 0L)
      assert(sorted.last._5 == sorted.head._2, s"doc $id")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._5 == b._4, s"gap in doc $id")
      }
    }
    // 2. zero-weight docs emit nothing
    assert(!spans.exists(_._2 == 0L))
    // 3. every sequence except the last holds exactly seqLen tokens,
    //    at consistent write offsets
    val bySeq = spans.groupBy(_._3)
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, ss) =>
      val filled = ss.map(s => s._5 - s._4).sum
      if (seq != lastSeq) assert(filled == 128L, s"seq $seq")
      else assert(filled == total - 128L * lastSeq)
      // write offsets tile the sequence without overlap
      val tiles = ss.sortBy(_._6)
      tiles.zip(tiles.tail).foreach { case (a, b) =>
        assert(a._6 + (a._5 - a._4) == b._6, s"overlap in seq $seq")
      }
    }
  }

  test("packByBudget: oversized single row occupies its own pack") {
    val df = Seq((1L, 100L), (2L, 9999L), (3L, 100L)).toDF("id", "w")
    val got = Batching.packByBudget(df, "id", "w", budget = 500L)
      .select("id", "pack").as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L && got(2L) == 0L) // 2 starts inside pack 0
    assert(got(3L) > got(2L))              // and pushes 3 far ahead
  }

  test("groupedRankByRange equals the per-group window rank at any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"g${i % 3}", (i * 37) % 101))
      .toDF("id", "grp", "v")
    val w = Window.partitionBy("grp").orderBy(col("v"), col("id"))
    val expect = df.withColumn("rk", row_number().over(w))
      .select("id", "rk").as[(Long, Int)].collect().toMap
    for (parts <- Seq(0, 7)) {
      val got = Batching.groupedRankByRange(df.repartition(11), "grp",
          Seq(col("v"), col("id")), numPartitions = parts)
        .select(col("id"), col("__grank")).as[(Long, Long)]
        .collect().toMap
      assert(got == expect.map { case (k, v) => k -> v.toLong })
    }
    // null group ranks as its own class
    val withNull = df.withColumn("grp",
      when(col("id") <= 5, lit(null: String)).otherwise(col("grp")))
    val gotN = Batching.groupedRankByRange(withNull, "grp",
        Seq(col("v"), col("id")))
      .filter(col("grp").isNull).select(col("__grank"))
      .as[Long].collect().sorted
    assert(gotN.sameElements(1L to 5L))
  }

  test("standardize: z-scores per group, constant group maps to 0") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0),
      ("c", 5.0), ("c", 5.0)).toDF("k", "value")
    val got = graft.operators.Features.standardize(df, Seq("k"), "value")
      .select("k", "value", "value_z")
      .as[(String, Double, Double)].collect()
    val a = got.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert(a(20.0) == 0.0)
    assert(a(10.0) == -a(30.0) && a(10.0) < 0) // symmetric
    assert(got.filter(_._1 == "c").forall(_._3 == 0.0)) // sigma = 0
  }

  test("meanShiftPoints: a clean step flags exactly at the boundary") {
    import org.apache.spark.sql.functions.col
    // 8 rows at 10.0 then 8 at 50.0 — only position 8 has both
    // windows full; its left/right means differ by 40
    val rows = (0 until 8).map(i => ("k", i.toLong, 10.0)) ++
      (8 until 16).map(i => ("k", i.toLong, 50.0))
    val df = rows.toDF("key", "ord", "v")
    val out = Features.meanShiftPoints(df, Seq("key"), "ord", "v",
      k = 8, thresholdMilli = 20000L, tiebreak = Seq(col("ord")))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 8L)               // boundary position
    assert(r.getLong(2) == 8 * 10000L)       // lsum_milli
    assert(r.getLong(3) == 8 * 50000L)       // rsum_milli
    assert(r.getLong(4) == 40000L)           // shift_milli
    assert(r.getInt(5) == 1)                 // flagged
    // below threshold: same data, higher bar -> not flagged
    val calm = Features.meanShiftPoints(df, Seq("key"), "ord", "v",
      k = 8, thresholdMilli = 50000L, tiebreak = Seq(col("ord")))
      .collect()
    assert(calm.head.getInt(5) == 0)
  }

  test("skyline2D: strict dominance, axis ties survive, per group") {
    val df = Seq(
      // group g: (1,5) and (3,9) on front; (4,7) dominated by (3,9);
      // (3,2) same min as (3,9) -> NOT dominated by it (needs strict
      // min), but dominated by (1,5); (1,1) same min as (1,5) -> kept
      ("g", 1L, 5), ("g", 3L, 9), ("g", 4L, 7), ("g", 3L, 2),
      ("g", 1L, 1),
      // other group is independent
      ("h", 10L, 1)).toDF("k", "cost", "quality")
    val got = Features.skyline2D(df, Seq("k"), "cost", "quality")
      .as[(String, Long, Int)].collect().toSet
    assert(got == Set(("g", 1L, 5), ("g", 3L, 9), ("g", 1L, 1),
      ("h", 10L, 1)))
  }

  test("tokenSortRatio: word order is free, edits are not") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("small bolt", "bolt small"),
      ("small bolt", "small bolt"),
      ("small bolt", "smell bolt"),
      ("", "")).toDF("a", "b")
    val got = df.select(operators.Linkage.tokenSortRatio(
      col("a"), col("b")).as("r")).as[Long].collect()
    assert(got(0) == 1000000L && got(1) == 1000000L)
    assert(got(2) < 1000000L && got(2) > 800000L) // 1 edit of 10 chars
    assert(got(3) == 1000000L) // both empty
  }

  test("rollingActive: trailing-window distinct, idle buckets emit nothing") {
    // user 1 active day 0 and 2; user 2 active day 0; day 5 idle but
    // user 3 fires day 10 (far gap -> day 10 window sees only itself)
    val df = Seq((1L, 0L), (1L, 2L), (2L, 0L), (2L, 0L), (3L, 10L))
      .toDF("u", "d").withColumn("ts", col("d") * 10L)
    val got = Features.rollingActive(df, "ts", "u", bucketNs = 10L,
      window = 3).as[(Long, Long)].collect().toMap
    // observed buckets: 0, 2, 10 only (3..4 inside windows but idle);
    // bucket 2's trailing window holds users {1, 2}
    assert(got == Map(0L -> 2L, 2L -> 2L, 10L -> 1L))
  }

  test("theilSen: median slope shrugs off one outlier point") {
    // y = 2x except one wild point; OLS would tilt, the median holds
    val df = (Seq.tabulate(9)(i => ("k", i.toLong, 2L * i)) :+
      (("k", 9L, 500L))).toDF("k", "x", "y")
    val ts = Features.theilSen(df, Seq("k"), "x", "y").collect().head
    assert(ts.getAs[Long]("n_points") == 10L)
    assert(ts.getAs[Long]("n_pairs") == 45L)
    assert(ts.getAs[Long]("slope_micro") == 2000000L)
    // maxPoints guard: a group past the cap disappears, others stay
    val guarded = Features.theilSen(df, Seq("k"), "x", "y", maxPoints = 5)
    assert(guarded.count() == 0L)
  }

  test("olsTrend: exact line recovered; constant-x group goes null") {
    val df = Seq(("a", 0L, 3L), ("a", 1L, 5L), ("a", 2L, 7L),
      ("b", 4L, 1L), ("b", 4L, 9L)).toDF("k", "x", "y")
    val got = Features.olsTrend(df, Seq("k"), "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("slope_micro") == 2000000L)
    assert(got("a").getAs[Long]("intercept_micro") == 3000000L)
    assert(got("a").getAs[Long]("r2_micro") == 1000000L)
    assert(got("b").isNullAt(got("b").fieldIndex("slope_micro")))
  }

  test("crossCorrelation: shifted copy peaks exactly at its lag") {
    // y is x delayed by 2 ticks -> r=1 at lag 2, weaker elsewhere
    val xs = Seq(1L, 5L, 2L, 8L, 3L, 9L, 4L, 7L, 6L, 2L)
    val rows = xs.indices.map { i =>
      (i.toLong, xs(i), if (i >= 2) xs(i - 2) else 0L)
    }
    val df = rows.toDF("t", "x", "y")
    val got = Features.crossCorrelation(df, "t", "x", "y", maxLag = 3)
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("r_micro")).toMap
    assert(got(2) == 1000000L)
    assert(got.keySet == Set(0, 1, 2, 3))
    assert(got.filterNot(_._1 == 2).values.forall(_ < 1000000L))
  }

  test("seasonalProfile: per-position mean/variance from exact sums") {
    // period 10, position width 5 -> 2 positions; position 0 fires in
    // both periods (counts 2 and 3), position 1 once per period (1, 1)
    val ts = Seq(0L, 1L, 12L, 13L, 14L, 15L, 7L).map(("k", _))
    val df = ts.toDF("k", "ts")
    val got = Features.seasonalProfile(df, Seq("k"), "ts",
      positionNs = 5L, periodNs = 10L).collect()
      .map(r => r.getLong(1) -> r).toMap
    val p0 = got(0L)
    assert(p0.getAs[Long]("n_periods") == 2L)
    assert(p0.getAs[Long]("total") == 5L)
    assert(p0.getAs[Long]("mean_micro") == 2500000L)
    assert(p0.getAs[Long]("var_micro") == 250000L) // ((4+9)-12.5)/2
    val p1 = got(1L)
    assert(p1.getAs[Long]("n_periods") == 2L && p1.getAs[Long]("total") == 2L)
    assert(p1.getAs[Long]("var_micro") == 0L)
  }

  test("seasonalAnomalies: the off-profile spike flags, rush hour does not") {
    // position 0 is always busy (counts 10,10,10,10) -> never flags;
    // position 1 is quiet (1,1,1) except one period with 9 -> flags
    val rows =
      (0 until 4).flatMap(p => Seq.fill(10)(("k", p * 10L))) ++
        (0 until 3).map(p => ("k", p * 10L + 5L)) ++
        Seq.fill(9)(("k", 35L))
    val df = rows.toDF("k", "ts")
    val got = Features.seasonalAnomalies(df, Seq("k"), "ts",
      positionNs = 5L, periodNs = 10L, thresholdMilli = 1500L)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L) // period 3, pos 1
    assert(r.getLong(3) == 9L)   // the spiky count
    assert(r.getLong(4) > 1500L) // strongly positive residual
  }

  test("burstiness: metronome CV 0, burst-then-gap CV high, <2 gaps null") {
    // ts in nanos; user 1 metronomic (gaps 10ms), user 2 bursty
    // (1ms, 1ms, 98ms), user 3 has one event (no gaps at all)
    val rows = Seq(
      (1L, 0L), (1L, 10000000L), (1L, 20000000L), (1L, 30000000L),
      (2L, 0L), (2L, 1000000L), (2L, 2000000L), (2L, 100000000L),
      (3L, 0L))
    val df = rows.zipWithIndex.map { case ((u, ts), i) =>
      (u, ts, i.toLong) }.toDF("u", "ts", "eid")
    val got = Features.burstiness(df, "u", "ts", tieCols = Seq("eid"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(3L)) // no gaps -> no row
    val m = got(1L)
    assert(m.getAs[Long]("n_gaps") == 3L)
    assert(m.getAs[Long]("mean_gap_ms_micro") == 10000000L)
    assert(m.getAs[Long]("cv_micro") == 0L)
    val b = got(2L)
    // gaps 1,1,98 ms: mean 100/3, sd = sqrt(mean(sq)-mean²) >> mean
    assert(b.getAs[Long]("n_gaps") == 3L)
    assert(b.getAs[Long]("cv_micro") > 1000000L)
  }

  test("twap: holding-duration weights, not sample counts") {
    // user 1: value 10 held for 9ms then 1ms burst of 100s ->
    // TWAP = (10*9 + 100*1)/10 = 19, NOT the sample mean 55;
    // the burst samples at the end carry no duration
    val rows = Seq(
      (1L, 0L, 1L, 10.0), (1L, 9000000L, 2L, 100.0),
      (1L, 10000000L, 3L, 100.0),
      (2L, 0L, 4L, 5.0)) // single... no: one event -> no segment
    val df = rows.toDF("u", "ts", "eid", "v")
    val got = Features.twap(df, "u", "ts", "v", tieCols = Seq("eid"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(2L)) // lone event: no holding period
    val r1 = got(1L)
    assert(r1.getAs[Long]("n_segments") == 2L)
    assert(r1.getAs[Long]("span_ms") == 10L)
    assert(r1.getAs[Long]("twap_micro") == 19000000L)
  }

  test("outlierScores: the planted far-out vector ranks first") {
    val base = Seq.tabulate(20)(i =>
      (i.toLong, Array(0.0 + (i % 3), 1.0 - (i % 2))))
    val wild = (99L, Array(100.0, -100.0))
    val df = (base :+ wild).toDF("vec_id", "embedding")
    val got = Similarity.outlierScores(df, "vec_id", "embedding", k = 3)
      .collect()
    assert(got.head.getLong(0) == 99L)
    assert(got.head.getAs[Int]("rank") == 1)
    assert(got.length == 3)
    // scores are non-increasing down the ranking
    val scores = got.map(_.getAs[Long]("score_micro"))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("centroidDrift: identical halves cos 1, opposed halves cos -1") {
    // label A: even/odd halves identical vectors -> cos exactly 1;
    // label B: odd half is the negation -> cos exactly -1
    val vecs = Seq(
      (0L, "A", Array(1.0, 2.0)), (1L, "A", Array(1.0, 2.0)),
      (2L, "A", Array(3.0, 0.0)), (3L, "A", Array(3.0, 0.0)),
      (10L, "B", Array(1.0, 1.0)), (11L, "B", Array(-1.0, -1.0)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidDrift(vecs, "vec_id", "embedding",
        "label", col("vec_id") % 2 === 0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got("A") == ((2L, 1.0)))
    assert(got("B") == ((2L, -1.0)))
  }

  test("diverseSample: every cluster keeps at most perCluster, centroids self-rank first") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)), // the 2 seeds
      (2L, Array(0.9, 0.1)), (3L, Array(0.8, 0.2)), (4L, Array(0.95, 0.05)),
      (5L, Array(0.1, 0.9)), (6L, Array(0.2, 0.8))).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(vecs, "vec_id", "embedding", 2)
    val got = Similarity.diverseSample(vecs, "vec_id", "embedding",
      cents, perCluster = 2).collect()
    val byCluster = got.groupBy(_.getLong(0))
    assert(byCluster.keySet == Set(0L, 1L))
    assert(byCluster.values.forall(_.length == 2))
    // each seed is its own cluster's rank-1 member (cos = 1 with itself)
    assert(byCluster(0L).find(_.getAs[Int]("rank") == 1).get.getLong(1) == 0L)
    assert(byCluster(1L).find(_.getAs[Int]("rank") == 1).get.getLong(1) == 1L)
  }
}
