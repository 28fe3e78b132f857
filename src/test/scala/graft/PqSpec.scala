package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 40 deterministic 8-dim vectors in two well-separated clusters
  private lazy val vecs = {
    val rows = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 10.0 else -10.0
      (i.toLong, Array.tabulate(8)(j => base + ((i * 7 + j * 3) % 5) * 0.1))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pqTrain: m×k codebook, subvectors of dim/m") {
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val got = cb.select("sub", "centroid_id").as[(Int, Long)].collect()
    assert(got.length == 8) // 2 subspaces × 4 centroids
    assert(got.map(_._1).toSet == Set(0, 1))
    assert(got.map(_._2).toSet == Set(0L, 1L, 2L, 3L)) // lowest-id seeds
    val dims = cb.select(size(col("cvec"))).as[Int].collect()
    assert(dims.forall(_ == 4))
  }

  test("pqEncode: every vector gets one code per subspace; codes separate clusters") {
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 2, dim = 8)
    assert(codes.count() == 80) // 40 vectors × 2 subspaces
    // seeds 0,2 are +10-cluster; 1,3 are -10-cluster. Every +10 vector
    // must encode to a +10-cluster centroid in every subspace.
    val joined = codes.withColumn("is_pos", col("vec_id") % 2 === 0)
      .withColumn("code_pos", col("code") % 2 === 0)
    assert(joined.filter(col("is_pos") =!= col("code_pos")).count() == 0)
  }

  test("pqEncode is map-only: no shuffle exchange in the plan") {
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val plan = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 2, dim = 8).queryExecution.executedPlan.toString
    // the broadcast of the collapsed codebook is expected; a
    // ShuffleExchange on the corpus side is not
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"corpus-side shuffle in encode plan:\n$plan")
  }

  test("pqAdcSearch: self-free top-k, ADC agrees with exact ranking on separated clusters") {
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 2, dim = 8)
    val got = Similarity.pqAdcSearch(codes, cb,
      vecs.filter(col("vec_id") < 4), "vec_id", "embedding",
      m = 2, dim = 8, topK = 5)
    val rows = got.as[(Long, Long, Long, Int)].collect()
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
    assert(rows.forall { case (q, n, _, _) => q != n })
    // cluster purity: a +10 query's neighbors are +10 vectors
    assert(rows.forall { case (q, n, _, _) => (q % 2) == (n % 2) })
  }

  test("Lloyd refinement reduces total quantization error") {
    def totalErr(cb: org.apache.spark.sql.DataFrame): Double = {
      val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
        m = 2, dim = 8)
      // re-derive distance of each (vec, sub) to its chosen centroid
      val sub = 4
      val sv = vecs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v"))
        .select(col("vec_id"), explode(array((0 until 2).map(j =>
          struct(lit(j).as("sub"),
            slice(col("__v"), j * sub + 1, sub).as("svec"))): _*)).as("s"))
        .select(col("vec_id"), col("s.sub").as("sub"), col("s.svec").as("svec"))
      codes.join(sv, Seq("vec_id", "sub"))
        .join(cb, codes("sub") === cb("sub") &&
          codes("code") === cb("centroid_id"))
        .select(Similarity.l2Hof(col("svec"), col("cvec")).as("d"))
        .agg(sum("d")).as[Double].head()
    }
    val cb0 = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4, iterations = 0)
    val cb2 = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4, iterations = 2)
    assert(totalErr(cb2) <= totalErr(cb0) + 1e-9)
  }

  test("quantizeInt8: round-trip error bounded by scale/2, zero vector safe") {
    val df = Seq(
      (1L, Array(1.0, -2.0, 0.5, 126.9)),
      (2L, Array(0.0, 0.0, 0.0, 0.0))
    ).toDF("id", "v")
    val q = Similarity.quantizeInt8(df, "v", "q")
    val rt = q.select(col("id"), col("v"), col("q.scale").as("s"),
      Similarity.dequantizeInt8(col("q")).as("r"))
      .as[(Long, Seq[Double], Double, Seq[Double])].collect()
    rt.foreach { case (id, v, s, r) =>
      v.zip(r).foreach { case (x, y) =>
        assert(math.abs(x - y) <= s / 2 + 1e-12, s"id=$id x=$x y=$y s=$s")
      }
    }
    val zero = rt.find(_._1 == 2L).get
    assert(zero._3 == 0.0 && zero._4.forall(_ == 0.0))
    // codes stay in [-127, 127]
    val codes = q.select(explode(col("q.codes"))).as[Int].collect()
    assert(codes.forall(c => c >= -127 && c <= 127))
  }

  test("ivfPqSearch: probed-cell ADC ranking stays cluster-pure") {
    val cents = Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 2, dim = 8)
    val got = Similarity.ivfPqSearch(assigned, codes, cb, cents,
      vecs.filter(col("vec_id") < 4), "vec_id", "embedding",
      m = 2, dim = 8, nProbe = 2, topK = 3)
      .as[(Long, Long, Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (q, n, _, _) => q != n })
    // +10-cluster queries only ever surface +10-cluster neighbors
    assert(got.forall { case (q, n, _, _) => (q % 2) == (n % 2) })
  }

  test("ivfPqSearch: corpus-side plan has no per-query vector recompute (broadcast LUT + probes)") {
    val cents = Similarity.seedCentroids(vecs, "vec_id", "embedding", 4)
    val assigned = Similarity.ivfAssign(vecs, "vec_id", "embedding", cents)
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = 2, dim = 8, k = 4)
    val codes = Similarity.pqEncode(vecs, "vec_id", "embedding", cb,
      m = 2, dim = 8)
    val plan = Similarity.ivfPqSearch(assigned, codes, cb, cents,
      vecs.filter(col("vec_id") < 4), "vec_id", "embedding",
      m = 2, dim = 8, nProbe = 2, topK = 3)
      .queryExecution.executedPlan.toString
    // both index-side joins are broadcasts of metadata-sized frames
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
  }
}
