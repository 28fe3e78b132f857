package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  test("codegen dot/cosine match the interpreted HOF forms bitwise") {
    val rng = new scala.util.Random(7)
    val df = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextDouble() - 0.5),
        Array.fill(64)(rng.nextDouble() - 0.5))
    }.toDF("id", "a", "b")
    val diff = df.select(
      (Similarity.dot(col("a"), col("b")) -
        Similarity.dotHof(col("a"), col("b"))).as("dd"),
      (Similarity.cosine(col("a"), col("b")) -
        Similarity.cosineHof(col("a"), col("b"))).as("dc"))
      .agg(max(abs(col("dd"))), max(abs(col("dc"))))
      .as[(Double, Double)].collect().head
    assert(diff == ((0.0, 0.0)))
  }

  test("graft_dot / graft_cosine register via GraftExtensions SQL path") {
    // imperative registration equivalent for an existing session
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[graft.plans.DotProduct].getName, "graft_dot"),
      (c: Seq[Expression]) => graft.plans.DotProduct(c(0), c(1)))
    val got = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect().head
    assert(got == 11.0)
  }

  test("graft_simhash / graft_minhash_sig register on the SQL surface") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[graft.plans.SimHash].getName, "graft_simhash"),
      (c: Seq[Expression]) => graft.plans.SimHash(c(0),
        c(1).asInstanceOf[Literal].value.asInstanceOf[Int]))
    reg.registerFunction(new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[graft.plans.MinhashSignature].getName,
        "graft_minhash_sig"),
      (c: Seq[Expression]) => graft.plans.MinhashSignature(c(0),
        c(1).asInstanceOf[Literal].value.asInstanceOf[Int],
        c(2).asInstanceOf[Literal].value.asInstanceOf[Int]))
    // SQL results equal the Column-API kernels
    val sql = spark.sql(
      "SELECT graft_simhash('a b c', 8) AS s, graft_minhash_sig('a b c d', 4, 3) AS m")
      .collect().head
    val api = Seq("x").toDF("ignore").select(
      graft.functions.TextFns.simhash(lit("a b c"), 8).as("s"),
      graft.functions.TextFns.minhashSignatureNative(lit("a b c d"), 4, 3).as("m"))
      .collect().head
    assert(sql.getLong(0) == api.getLong(0))
    assert(sql.getSeq[Long](1) == api.getSeq[Long](1))
  }

  test("compiled srp bucket matches the interpreted HOF form bitwise") {
    val rng = new scala.util.Random(13)
    val df = (1 to 200).map(i =>
      (i.toLong, Array.fill(64)(rng.nextDouble() - 0.5))).toDF("id", "v")
    val mismatches = df.select(
      Similarity.srpBucket(col("v"), planes = 8, dim = 64).as("native"),
      Similarity.srpBucketHof(col("v"), planes = 8, dim = 64).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // short vectors (length < dim) must agree too: HOF zip_with pads
    // the shorter side, kernel min()'s the length — both see dim
    // here, so pin with exact-length input at a different dim
    val small = Seq((1L, Array(0.3, -0.7, 0.1, 0.9))).toDF("id", "v")
    val r = small.select(
      Similarity.srpBucket(col("v"), 12, 4).as("n"),
      Similarity.srpBucketHof(col("v"), 12, 4).as("h"))
      .as[(Long, Long)].collect().head
    assert(r._1 == r._2)
  }

  test("lshBucketedChecked caps hot buckets and reports them") {
    // one plane -> at most 2 buckets; 40 near-identical vectors all
    // land together, far past maxBucket=10
    val base = Array.fill(8)(1.0f)
    val df = (1 to 40).map(i => (i.toLong, base.clone()))
      .toDF("vec_id", "embedding")
    val got = Similarity.lshBucketedChecked(df, "vec_id", "embedding",
      minCos = 0.0, planes = 1, dim = 8, maxBucket = 10)
    assert(got.pairs.count() == 0) // the only bucket was dropped
    val dropped = got.droppedBuckets
      .select("size").as[Long].collect()
    assert(dropped.toSeq == Seq(40L))
    // raise the cap: the same corpus pairs fully (40 choose 2)
    val open = Similarity.lshBucketedChecked(df, "vec_id", "embedding",
      minCos = 0.0, planes = 1, dim = 8, maxBucket = 40)
    assert(open.pairs.count() == 40L * 39 / 2)
    assert(open.droppedBuckets.count() == 0)
  }

  test("multi-probe SRP: superset of single-probe, recall recovered") {
    val rng = new scala.util.Random(41)
    // 150 twin pairs: near-identical vectors that a single hyperplane
    // sometimes separates when the plane count is high
    val rows = (0 until 150).flatMap { i =>
      val v = Array.fill(16)(rng.nextDouble() * 2 - 1)
      val twin = v.map(x => x + (rng.nextDouble() - 0.5) * 0.4)
      Seq((2L * i, v.map(_.toFloat)), (2L * i + 1, twin.map(_.toFloat)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.thresholdPairs(df, "vec_id", "embedding", 0.9)
    val single = Similarity.lshBucketed(df, "vec_id", "embedding", 0.9,
      planes = 12, dim = 16)
    val multi = Similarity.lshBucketedMultiProbe(df, "vec_id", "embedding",
      0.9, planes = 12, dim = 16).pairs
    val sp = single.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mp = multi.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sp.subsetOf(mp))
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallReport(approx, exact, Seq("id_a", "id_b"))
        .select("recall").as[Double].collect().head
    val (rs, rm) = (recallOf(single), recallOf(multi))
    assert(rm >= rs)
    assert(rm > rs, s"expected probing to recover split pairs: $rs vs $rm")
  }

  test("planesFor sizes plane count to the corpus") {
    assert(Similarity.planesFor(1000000L, 64) == 14)  // 2^14 buckets
    assert(Similarity.planesFor(100L, 64) == 4)       // clamped low
    assert(Similarity.planesFor(Long.MaxValue / 2, 1) == 62) // clamped high
  }

  test("IVF: nProbe=k equals brute force; nProbe=1 stays within probed buckets") {
    val rng = new scala.util.Random(11)
    val df = (1 to 200).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") <= 3)
    val cents = Similarity.seedCentroids(df, "vec_id", "embedding", 4)
    val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
    assert(assigned.count() == 200) // every vector lands in exactly one bucket
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val full = Similarity.ivfSearch(assigned, cents, queries,
      "vec_id", "embedding", nProbe = 4, topK = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(full == exact)
    val narrow = Similarity.ivfSearch(assigned, cents, queries,
      "vec_id", "embedding", nProbe = 1, topK = 5)
    assert(narrow.groupBy("query_id").count()
      .as[(Long, Long)].collect().forall(_._2 <= 5))
  }

  test("recallReport: per-query top-k and overall pair recall") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 12L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val per = Similarity.recallReport(approx, exact,
      keyCols = Seq("query_id", "neighbor_id"), perCols = Seq("query_id"))
      .select("query_id", "recall").as[(Long, Double)].collect().toMap
    // approx-only extras (2,99) are precision, not recall
    assert(per == Map(1L -> 1.0, 2L -> 0.5))
    val overall = Similarity.recallReport(approx, exact,
      keyCols = Seq("query_id", "neighbor_id"))
      .select("exact_count", "hit_count", "recall")
      .as[(Long, Long, Double)].collect().head
    assert(overall == ((4L, 3L, 0.75)))
    // precision: of the 4 approx pairs, 3 are confirmed by exact
    val prec = Similarity.precisionReport(approx, exact,
      keyCols = Seq("query_id", "neighbor_id"))
      .select("approx_count", "hit_count", "precision")
      .as[(Long, Long, Double)].collect().head
    assert(prec == ((4L, 3L, 0.75)))
  }

  test("IVF recall: full probe = 1.0, narrow probe bounded and reported") {
    val rng = new scala.util.Random(23)
    val df = (1 to 200).map(i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() - 0.5f))).toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") <= 5)
    val cents = Similarity.seedCentroids(df, "vec_id", "embedding", 4)
    val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
    def recallOf(nProbe: Int): Array[Double] = Similarity.recallReport(
      Similarity.ivfSearch(assigned, cents, queries, "vec_id", "embedding",
        nProbe, topK = 5),
      exact, keyCols = Seq("query_id", "neighbor_id"),
      perCols = Seq("query_id"))
      .select("recall").as[Double].collect()
    assert(recallOf(4).forall(_ == 1.0)) // nProbe = k: degrades to exact
    val narrow = recallOf(1)
    assert(narrow.length == 5 && narrow.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("Lloyd refinement tightens clusters (two separated blobs)") {
    val rng = new scala.util.Random(5)
    def blob(center: Float, ids: Range) = ids.map(i =>
      (i.toLong, Array.fill(8)(center + (rng.nextFloat() - 0.5f) * 0.1f)))
    val df = (blob(1.0f, 1 to 50) ++ blob(-1.0f, 51 to 100))
      .toDF("vec_id", "embedding")
    // seeds are the 2 lowest ids — both from the SAME blob; refinement
    // must still produce one centroid per blob is not guaranteed, but
    // assignments must remain total and reproducible
    val seeds = Similarity.seedCentroids(df, "vec_id", "embedding", 2)
    val refined = Similarity.refineCentroids(df, "vec_id", "embedding",
      seeds, iterations = 2)
    assert(refined.count() == 2)
    val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", refined)
    assert(assigned.count() == 100)
    // refined centroids are means: each component within the data range
    val comps = refined.select(explode(col("cvec"))).as[Double].collect()
    assert(comps.forall(c => c >= -1.1 && c <= 1.1))
  }

  test("type check rejects non-double arrays") {
    val err = intercept[Exception] {
      Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
        .select(Similarity.dot(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<double>") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
