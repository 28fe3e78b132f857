package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an embedding column (north-star op).
  *
  * All vector math is `zip_with`/`aggregate` over `array<double>` —
  * codegen'd, no UDF, no MLlib dependency — so it runs inside
  * whole-stage codegen and is portable to the SQL oracle.
  *
  * Scale path: `lshBucketed` cuts the candidate set with sign-random-
  * projection buckets before the exact re-rank; brute force remains
  * the correctness baseline (and is itself a broadcast join, not a
  * cartesian shuffle, when the query set is small).
  */
object Similarity {

  import org.apache.spark.sql.graftbridge.ColumnBridge
  import graft.plans.{CosineSimilarity, DotProduct}

  /** Codegen'd single-pass kernels (graft.plans) — the HOF forms
    * (`aggregate(zip_with(...))`) are kept below for reference/oracle
    * parity testing but run interpreted and allocate per row. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Interpreted HOF equivalents (semantics baseline for tests). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` is broadcast (small side); ranking is deterministic:
    * ties broken by neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Upper-triangle covariance matrix of an embedding column — the
    * one distributed pass PCA/whitening needs. Element values go to
    * integer micro-units first, so the Σyᵢyⱼ accumulations are exact
    * long arithmetic (products ~1e12 · rows: exact to ~9e18 — switch
    * the accumulators to decimal beyond ~1e6 rows); the final
    * cov = (Σyᵢyⱼ − ΣyᵢΣyⱼ/n)/(n−1) is identical IEEE double ops on
    * identical integers in both engines, rounded to 6 dp.
    *
    * Scale shape: ONE `plans.TriProductSum` treeAggregate pass — the
    * full d(d+1)/2 product triangle, per-dimension sums, and pair
    * counts accumulate in a primitive per-partition buffer, so the
    * shuffle is one ~d²-long state per partition (at 1000 executors:
    * 1000 small arrays), not the n·d²/2 exploded (i,j,p) rows of the
    * composable form it replaced (measured 8.6 s → sub-second at sf10
    * for d=64; long sums are associative, so the result is bit-equal
    * under any partitioning). Output: (i, j, n, cov), i ≤ j,
    * 0-based. */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val y = transform(v, x => round(x * lit(1e6)).cast("long"))
    df.select(y.as("__y"))
      .agg(ColumnBridge.column(graft.plans.TriProductSum(
        ColumnBridge.expression(col("__y"))).toAggregateExpression())
        .as("__t"))
      .select(explode(col("__t")).as("__e"))
      .select(col("__e.i").as("i"), col("__e.j").as("j"),
        col("__e.n").as("n"),
        // + 0.0 canonicalizes IEEE −0.0 (engines differ on whether
        // round() preserves the sign of zero)
        (round((col("__e.p").cast("double") -
          col("__e.si").cast("double") * col("__e.sj") / col("__e.n")) /
          (col("__e.n") - 1) / 1e12, 6) + lit(0.0)).as("cov"))
  }

  /** Per-dimension standardization (diagonal whitening): every
    * dimension centered and scaled to unit variance — the
    * preprocessing that stops one out-of-scale dimension from
    * dominating every distance. The dims-sized (Σy, Σy², n) stats
    * collect to the driver (metadata license) and come back as
    * literal arrays, so the transform itself is MAP-ONLY — the
    * corpus never shuffles at all. Zero-variance dimensions map to
    * 0.0. Output: (idCol, whitened), elements rounded to 6 dp. */
  def whiten(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val y = transform(asDouble(col(vecCol)),
      x => round(x * lit(1e6)).cast("long"))
    // Σy² accumulates as decimal(38,0): each square is ~1e12 for
    // unit-scale elements, so a long accumulator silently wraps past
    // ~9e6 rows — decimal stays exact at any corpus size (and matches
    // a SQL oracle's HUGEINT sum bit-for-bit after the double cast)
    val stats = Explodes.posNonEmpty(df, y, "pos", "__yy")
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum(col("__yy")).as("sv"),
        sum((col("__yy") * col("__yy")).cast("decimal(38,0)")).as("spp"))
      .collect().map { r =>
        val (pos, n, sv) = (r.getInt(0), r.getLong(1), r.getLong(2))
        val spp = r.getDecimal(3).doubleValue
        val mean = sv.toDouble / n / 1e6
        val variance = (spp - sv.toDouble * sv / n) / (n - 1) / 1e12
        (pos, mean, math.sqrt(math.max(variance, 0.0)))
      }.sortBy(_._1)
    val means = lit(stats.map(_._2))
    val stds = lit(stats.map(_._3))
    val v = asDouble(col(vecCol))
    val whitened = transform(sequence(lit(1), size(v)), i => {
      val m = element_at(means, i)
      val s = element_at(stds, i)
      when(s === 0.0, 0.0)
        .otherwise(round((element_at(v, i) - m) / s, 6) + lit(0.0))
    })
    df.select(col(idCol), whitened.as("whitened"))
  }

  /** Top-`k` principal components via driver-side power iteration
    * with deflation over the COLLECTED covariance matrix (dims² is
    * metadata-sized — the Lloyd/BPE license; the corpus-sized work
    * is `covarianceMatrix`'s single pass). Fixed iteration count and
    * a fixed start vector keep it deterministic. Returns the
    * components as (component, pos, weight) rows. */
  def pcaComponents(cov: DataFrame, dims: Int, k: Int = 2,
                    iters: Int = 50): DataFrame = {
    val spark = cov.sparkSession
    import spark.implicits._
    val c = Array.ofDim[Double](dims, dims)
    cov.select("i", "j", "cov").collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      c(i)(j) = v; c(j)(i) = v
    }
    val comps = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    for (_ <- 1 to k) {
      var v = Array.tabulate(dims)(i => 1.0 / math.sqrt(dims.toDouble))
      for (_ <- 1 to iters) {
        val w = Array.tabulate(dims)(i =>
          (0 until dims).map(j => c(i)(j) * v(j)).sum)
        // deflate: remove projections onto found components
        comps.foreach { p =>
          val d = (0 until dims).map(i => w(i) * p(i)).sum
          (0 until dims).foreach(i => w(i) -= d * p(i))
        }
        val nrm = math.sqrt(w.map(x => x * x).sum)
        v = if (nrm == 0.0) v else w.map(_ / nrm)
      }
      comps += v
    }
    comps.zipWithIndex.flatMap { case (p, ci) =>
      p.zipWithIndex.map { case (wt, pos) => (ci, pos, wt) }
    }.toSeq.toDF("component", "pos", "weight")
  }

  /** Project vectors onto collected components — map-only. */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 components: DataFrame): DataFrame = {
    val comps = components.collect()
      .groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map { case (ci, rows) =>
        ci -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    val v = asDouble(col(vecCol))
    val projCols = comps.map { case (ci, w) =>
      aggregate(zip_with(v, lit(w), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as(s"pc$ci")
    }
    df.select(col(idCol) +: projCols: _*)
  }

  /** Per-DIMENSION embedding profile — the dead/saturated-dimension
    * health check run before any ANN index build: for each position,
    * n, min, max, and the exact micro-unit mean. A dimension whose
    * min == max is dead weight in every distance computation; one
    * far out of scale dominates them. NaNs are excluded from the
    * stats and surfaced as their own count. One posexplode + one
    * (pos) aggregation — dims-sized output. */
  def dimProfile(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "__x")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"),
        sum(when(isnan(col("__x")), 1L).otherwise(0L)).as("n_nan"),
        min(when(!isnan(col("__x")), col("__x"))).as("min_v"),
        max(when(!isnan(col("__x")), col("__x"))).as("max_v"),
        round(sum(when(isnan(col("__x")), 0L)
            .otherwise(round(col("__x") * 1e6).cast("long")))
          .cast("double") /
          sum(when(isnan(col("__x")), 0L).otherwise(1L)) / 1e6, 6)
          .as("mean_v"))

  /** Vector-level hygiene census — the reject report before vectors
    * enter an index: each vector classified by its FIRST failing
    * check (wrong_dim → has_nan → zero_vector → ok, the expectations
    * convention) and counted. Map-only per row, one tiny aggregate. */
  def vectorHygiene(df: DataFrame, vecCol: String,
                    expectedDim: Int): DataFrame = {
    val v = asDouble(col(vecCol))
    val issue = when(col(vecCol).isNull || size(v) =!= expectedDim,
        "wrong_dim")
      .when(exists(v, x => isnan(x)), "has_nan")
      .when(forall(v, x => x === 0.0), "zero_vector")
      .otherwise("ok")
    df.select(issue.as("issue"))
      .groupBy("issue").agg(count(lit(1)).as("n"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009) — the
    * standard hybrid-retrieval combiner for lexical (BM25) and vector
    * (cosine) rankings: score(d) = Σ_lists 1/(k + rank_d), summed
    * over the lists d appears in.
    *
    * Per-list contributions are rounded to integer NANO-units
    * (round(1e9/(k+rank))) so fused scores are exact long sums with
    * engine-identical ties, broken by id. Inputs are top-k lists, so
    * every frame here is list-sized — the global rank window rides
    * Spark's WindowGroupLimit rewrite, not a full sort of anything
    * corpus-sized. Output: (id, n_lists, rrf_micro, rank). */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
              k: Int = 60, topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: no rankings")
    require(k >= 0 && topN > 0, s"rrfFuse: bad k=$k topN=$topN")
    val all = rankings.map(_.select(col(idCol).as("id"),
        round(lit(1e9) / (col(rankCol) + k)).cast("long").as("__c")))
      .reduce(_ unionByName _)
    // top-N via TakeOrdered before ranking: the fused id frame is as
    // big as the union of the input lists (corpus-sized when callers
    // fuse full rankings), so rank only the ≤topN survivors
    all.groupBy("id")
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("id")).limit(topN)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_micro").desc, col("id"))))
  }

  /** Exact mean vector per group (label centroids, chunk→document
    * pooling): element values scale to integer micro-units
    * (round(x·1e6)) BEFORE summation, so per-position sums are exact
    * long arithmetic — order-independent across partitions AND
    * engines (float addition is not associative; this is the
    * PageRank/LangModel determinism trick applied element-wise) —
    * then divide back once.
    *
    * Scale shape: posexplode → ONE (group, pos) hash aggregation with
    * map-side partials → per-group reassembly via sort_array over a
    * dimension-sized list. Shuffled rows = groups × dims, never
    * corpus × dims twice. Output: (groupCol, n, centroid). */
  def meanPool(df: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val pos = df.select(col(groupCol).as("grp"),
        posexplode(asDouble(col(vecCol))).as(Seq("pos", "__x")))
      .groupBy("grp", "pos")
      .agg(sum(round(col("__x") * 1e6).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
    pos.groupBy(col("grp").as(groupCol))
      .agg(max(col("__n")).as("n"),
        transform(
          array_sort(collect_list(struct(col("pos"), col("__s"), col("__n")))),
          e => round(e.getField("__s").cast("double") /
            e.getField("__n") / 1e6, 6)).as("centroid"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the top-k most-cosine-similar corpus vectors with a DIFFERENT
    * label — the negatives that actually move an embedding model.
    *
    * Scale shape: anchors broadcast against the corpus (map-side, no
    * corpus shuffle); the per-anchor top-k rides the rank-filter
    * window Spark rewrites to WindowGroupLimit (bounded per-partition
    * heaps, same shape as `bruteForceTopK`). Exact over the full
    * corpus — for anchor sets too big to broadcast, compose the LSH
    * path instead: `lshBucketedMultiProbe` pairs, filter label
    * inequality, then this same rank window; `recallReport` measures
    * what the buckets lose. */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"), asDouble(col(vecCol)).as("__cv"))
    val q = anchors.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"), asDouble(col(vecCol)).as("__qv"))
    val scored = c.join(broadcast(q), col("__nl") =!= col("__ql"))
      .withColumn("cos", round(cosine(col("__qv"), col("__cv")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** All pairs above a cosine threshold (id_a < id_b) — threshold
    * form is robust to float rounding at the margin, unlike top-k. */
  def thresholdPairs(df: DataFrame, idCol: String, vecCol: String,
                     minCos: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("__va"))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
  }

  /** Sign-random-projection bucketing: `planes` pseudo-random
    * hyperplanes (deterministic hash-derived coefficients); bucket =
    * bit-packed signs. Vectors in the same bucket are ANN candidates.
    * At 100 TB this turns the n² search into per-bucket groups.
    * Compiled kernel (one two-level loop, no per-row allocation);
    * `srpBucketHof` below is the interpreted reference it is
    * bitwise-parity-tested against.
    */
  def srpBucket(vec: Column, planes: Int, dim: Int): Column =
    ColumnBridge.column(graft.plans.SrpBucket(
      ColumnBridge.expression(vec), planes, dim))

  /** Interpreted HOF reference for srpBucket (parity tests + the shape
    * the DuckDB oracle reproduces). Runs `planes` aggregate passes per
    * row — do not use on the hot path. */
  def srpBucketHof(vec: Column, planes: Int, dim: Int): Column = {
    (0 until planes).map { p =>
      // deterministic pseudo-random plane: coeff_j = (((p*dim+j)*2654435761) mod 1009) - 504
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, j) => x * ((((lit(p) * dim + j) * 2654435761L) % 1009L) - 504L)),
        lit(0.0), (s, v) => s + v)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Plane count as an explicit corpus-sizing knob: expected bucket
    * population is ~corpusSize / 2^planes (uniform directions), so
    * pick the smallest plane count whose expected bucket is at or
    * under `targetBucketSize`. More planes = smaller buckets = lower
    * recall per bucket; pair with multiple probe rounds if recall
    * matters more than cost. Clamped to [4, 62] (bit-packed long). */
  def planesFor(corpusSize: Long, targetBucketSize: Int = 64): Int = {
    require(corpusSize > 0 && targetBucketSize > 0)
    val needed = math.ceil(
      math.log(corpusSize.toDouble / targetBucketSize) / math.log(2.0)).toInt
    math.max(4, math.min(62, needed))
  }

  // ---- IVF (inverted-file) ANN ----

  /** Deterministic seed centroids: the k lowest-id vectors. (A Lloyd
    * refinement pass is a groupBy-avg over assignments; seeds alone
    * already give the partition-the-corpus behavior IVF needs.) */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame =
    df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cvec"))

  /** Lloyd refinement: element-wise mean of each centroid's assigned
    * vectors (posexplode → groupBy (centroid, dim) → avg → re-pack).
    * Fully distributed — no vector ever sits on the driver. */
  def refineCentroids(df: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, iterations: Int = 1): DataFrame = {
    var cents = centroids
    for (_ <- 1 to iterations) {
      val assigned = ivfAssign(df, idCol, vecCol, cents)
      cents = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("centroid_id", "pos")
        .agg(avg(col("x")).as("m"))
        .groupBy("centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("centroid_id"),
          transform(col("pm"), p => p.getField("m")).as("cvec"))
    }
    cents
  }

  /** Assign every corpus vector to its nearest centroid (broadcast
    * k-way compare, keep-best; one narrow pass over the corpus). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val scored = df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .join(broadcast(centroids))
      .withColumn("__sim", cosine(col("__v"), col("cvec")))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__sim").desc, col("centroid_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__v"), col("centroid_id"))
  }

  /** IVF search: probe the `nProbe` nearest centroids per query, exact
    * cosine re-rank inside the probed buckets only. nProbe = k degrades
    * to exact brute force; smaller nProbe trades recall for a
    * 1/nProbe-ish scan fraction — the 100 TB knob. */
  def ivfSearch(assigned: DataFrame, centroids: DataFrame,
                queries: DataFrame, idCol: String, vecCol: String,
                nProbe: Int, topK: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val probes = {
      val scored = q.join(broadcast(centroids))
        .withColumn("__sim", cosine(col("__qv"), col("cvec")))
      val w = Window.partitionBy("query_id")
        .orderBy(col("__sim").desc, col("centroid_id").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= nProbe)
        .select(col("query_id"), col("__qv"), col("centroid_id"))
    }
    val cands = probes.join(assigned, Seq("centroid_id"))
      .filter(col("query_id") =!= col(idCol))
      .withColumn("cos", round(cosine(col("__qv"), col("__v")), 6))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col(idCol).asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("cos"), col("rank"))
  }

  /** Per-label centroid drift between two halves of a corpus (new
    * snapshot vs old, re-embedded vs original): cosine of the two
    * per-label mean vectors — the "did the embedding space move"
    * check run after a model swap or a data refresh. Element means
    * accumulate as exact micro-longs (the `meanPool` recipe), the
    * per-label dot/norm sums are exact long products over dims, and
    * ONE float expression per label produces the cosine — nothing
    * order-dependent survives. Shuffles: one (label, half, pos)
    * aggregation + one label-sized join. Output: (label, n_dims,
    * cos). */
  def centroidDrift(df: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, firstHalf: Column): DataFrame = {
    val base = Explodes.posNonEmpty(
        df.select(col(idCol), col(labelCol).as("label"),
          firstHalf.as("__h"), asDouble(col(vecCol)).as("__v")),
        col("__v"), "pos", "__x", col("label"), col("__h"))
      .groupBy(col("label"), col("__h"), col("pos"))
      .agg(sum(round(col("__x") * 1e6).cast("long")).as("__s"),
        count(lit(1)).as("__n"))
      .withColumn("m",
        round(col("__s").cast("double") / col("__n")).cast("long"))
    val a = base.filter(col("__h"))
      .select(col("label"), col("pos"), col("m").as("__ma"))
    val b = base.filter(!col("__h"))
      .select(col("label"), col("pos"), col("m").as("__mb"))
    a.join(b, Seq("label", "pos"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_dims"),
        sum(col("__ma") * col("__mb")).as("__ab"),
        sum(col("__ma") * col("__ma")).as("__aa"),
        sum(col("__mb") * col("__mb")).as("__bb"))
      .select(col("label"), col("n_dims"),
        when(col("__aa") > 0 && col("__bb") > 0,
          round(col("__ab").cast("double") /
            (sqrt(col("__aa").cast("double")) *
              sqrt(col("__bb").cast("double"))), 6) + lit(0.0))
          .as("cos"))
  }

  /** Embedding outlier census: score = Σ z² over the diagonal-
    * whitened vector (squared Mahalanobis under a diagonal covariance)
    * — the "what does NOT belong in this corpus" screen run before
    * training on scraped embeddings. Builds on `whiten` (dims-sized
    * stats collect, map-only transform), so the corpus-sized work is
    * one projection; the global top-`k` is a TakeOrdered (per-
    * partition heaps + driver merge of k rows), never a full sort.
    *
    * Determinism: each whitened element is already rounded to 6 dp;
    * its square goes to integer micro-units BEFORE the sum, so the
    * score is an exact long no matter the fold order, and ranking
    * ties break on the id. Output: (idCol, score_micro, rank). */
  def outlierScores(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val scored = whiten(df, idCol, vecCol)
      .select(col(idCol),
        aggregate(col("whitened"), lit(0L),
          (acc, v) => acc + round(v * v * 1e6).cast("long"))
          .as("score_micro"))
    val ranked = scored
      .orderBy(col("score_micro").desc, col(idCol).asc)
      .limit(k)
    ranked.withColumn("rank",
      row_number().over(Window.orderBy(col("score_micro").desc,
        col(idCol).asc)))
  }

  /** Cluster-balanced prototype sampling: assign every vector to its
    * nearest centroid, keep the `perCluster` most-central members of
    * EACH cluster — the coverage-preserving downsample ("keep every
    * mode of the distribution, drop the bulk") that plain uniform
    * sampling gets wrong on skewed corpora. One broadcast k-way
    * assignment pass + one per-cluster window (partitioned on
    * centroid — k partitions, each bounded by the cluster size).
    * Similarity is rounded to 6 dp before ranking and ties break on
    * the id, so the kept set is engine-stable.
    * Output: (centroid_id, idCol, cos, rank). */
  def diverseSample(df: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, perCluster: Int): DataFrame = {
    val assigned = ivfAssign(df, idCol, vecCol, centroids)
      .join(broadcast(centroids), Seq("centroid_id"))
      .withColumn("cos", round(cosine(col("__v"), col("cvec")), 6))
    val w = Window.partitionBy("centroid_id")
      .orderBy(col("cos").desc, col(idCol).asc)
    assigned.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
      .select(col("centroid_id"), col(idCol), col("cos"), col("rank"))
  }

  /** ANN via SRP buckets + exact re-rank inside each bucket, with the
    * same skew guardrails as `Dedup.minhashLshCandidates`: buckets
    * past `maxBucket` members are excluded from pairing — otherwise
    * the in-bucket self-join goes quadratic on a single hot bucket —
    * and surfaced in `droppedBuckets` (bucket, size), never silently.
    * Size `planes` to the corpus with `planesFor` so buckets stay
    * small in expectation; the cap is the backstop for skewed
    * direction distributions (e.g. boilerplate-heavy embeddings).
    *
    * Plan shape: one kernel projection, a partial-aggregated bucket
    * census (tiny: ≤ 2^planes rows, broadcast back), then a single
    * shuffled equi-join on bucket whose pairs stream through the
    * compiled cosine filter — no per-bucket member list is ever
    * materialized. */
  def lshBucketedChecked(df: DataFrame, idCol: String, vecCol: String,
                         minCos: Double, planes: Int = 8, dim: Int = 64,
                         maxBucket: Int = 1000): Dedup.LshCandidates = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("bucket", srpBucket(col("__v"), planes, dim))
    val census = v.groupBy("bucket").agg(count(lit(1)).as("bsize"))
    val dropped = census.filter(col("bsize") > maxBucket)
      .select(col("bucket"), col("bsize").as("size"))
    val ok = census.filter(col("bsize").between(2, maxBucket)).select("bucket")
    val vv = v.join(broadcast(ok), Seq("bucket"))
    val a = vv.select(col("bucket"), col("id").as("id_a"), col("__v").as("__va"))
    val b = vv.select(col("bucket"), col("id").as("id_b"), col("__v").as("__vb"))
    val pairs = a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
    Dedup.LshCandidates(pairs, dropped)
  }

  /** Recall accounting for the approximate paths: the fraction of the
    * EXACT result the approximate one recovered, overall or per group.
    * At 100 TB the approximate knobs (nProbe, planes, maxBucket) get
    * turned, and the engine should measure what they cost — run this
    * on a sample, not the full corpus (the exact leg is the expensive
    * one; reference analog: the annotation-coverage accounting at
    * mci:219-226).
    *
    *   - top-k:  recallReport(ivfSearch(...), bruteForceTopK(...),
    *             keyCols = Seq("query_id","neighbor_id"),
    *             perCols = Seq("query_id"))  → recall@k per query
    *   - pairs:  recallReport(lshBucketed(...), thresholdPairs(...),
    *             keyCols = Seq("id_a","id_b"))  → one overall row
    *
    * Output: perCols ++ (exact_count, hit_count, recall). Approx-only
    * extras (false positives of a candidate stage) don't lower recall —
    * they are precision, measurable by swapping the arguments. */
  def recallReport(approx: DataFrame, exact: DataFrame,
                   keyCols: Seq[String],
                   perCols: Seq[String] = Nil): DataFrame = {
    val hits = approx.select(keyCols.map(col): _*).distinct()
      .withColumn("__hit", lit(1L))
    exact.select((keyCols ++ perCols).distinct.map(col): _*)
      .join(hits, keyCols, "left")
      .groupBy(perCols.map(col): _*)
      .agg(count(lit(1)).as("exact_count"),
        sum(coalesce(col("__hit"), lit(0L))).as("hit_count"))
      .withColumn("recall", col("hit_count") / col("exact_count"))
  }

  /** Precision of the approximate result: the fraction of what it
    * RETURNED that the exact result confirms — `recallReport` with the
    * arguments swapped and honest column names. For a candidate stage
    * followed by an exact confirm (LSH → Jaccard, SRP → cosine),
    * precision < 1 measures wasted confirm work, not wrong answers. */
  def precisionReport(approx: DataFrame, exact: DataFrame,
                      keyCols: Seq[String],
                      perCols: Seq[String] = Nil): DataFrame =
    recallReport(exact, approx, keyCols, perCols)
      .withColumnRenamed("exact_count", "approx_count")
      .withColumnRenamed("recall", "precision")

  /** Pairs-only view of `lshBucketedChecked` (oracle/bench surface). */
  def lshBucketed(df: DataFrame, idCol: String, vecCol: String,
                  minCos: Double, planes: Int = 8, dim: Int = 64,
                  maxBucket: Int = 1000): DataFrame =
    lshBucketedChecked(df, idCol, vecCol, minCos, planes, dim, maxBucket).pairs

  // ---- Scalar (int8) quantization ----

  /** Symmetric int8 quantization: scale = max|x| / 127, code_i =
    * floor(x_i/scale + 0.5) ∈ [-127, 127] — 8× smaller embedding
    * storage with ≤ scale/2 per-dimension error, the standard
    * first-rung compression before PQ. All-zero vectors get scale 0 /
    * all-zero codes. floor(+0.5) rather than round(): identical
    * semantics in every engine (SQL round() half-away vs HALF_UP
    * differs), so the oracle replays codes exactly.
    *
    * DataFrame-level on purpose: the scale is bound to its OWN column
    * first, so the per-element lambda reads a cheap reference — a
    * single-Column form would re-evaluate the max|x| aggregate inside
    * the transform for every element (O(dim²) per row; HOF lambdas get
    * no loop-invariant hoisting, and the multi-referenced non-cheap
    * alias is exactly what keeps CollapseProject from inlining it
    * back). Adds `outCol`: struct<scale: double, codes: array<int>>
    * (write codes as array<tinyint> at rest). */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   outCol: String = "q8"): DataFrame = {
    val v = asDouble(col(vecCol))
    df.withColumn("__qscale",
        aggregate(v, lit(0.0), (m, x) => greatest(m, abs(x))) / 127.0)
      .withColumn(outCol, struct(col("__qscale").as("scale"),
        when(col("__qscale") === 0.0,
          transform(v, _ => lit(0).cast("int")))
          .otherwise(transform(v,
            x => floor(x / col("__qscale") + 0.5).cast("int")))
          .as("codes")))
      .drop("__qscale")
  }

  /** Inverse of `quantizeInt8`: code_i · scale. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => c.cast("double") * q.getField("scale"))

  // ---- Product quantization (PQ) ----

  /** Sequential-sum squared L2 distance — the HOF form on BOTH sides
    * of the oracle so the IEEE doubles agree bitwise (same trick as
    * `cosRawSql`). Hot-path note: PQ distances are computed against
    * codebook/LUT-sized data (m·k rows), never per corpus row, so the
    * interpreted HOF is not on the 100 TB critical path — the per-row
    * work is the argmin in `pqEncode` (k·m small-vector L2s) and the
    * integer LUT join in `pqAdcSearch`. */
  def l2Hof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, v) => s + v)

  /** PQ codebooks: the vector space split into `m` contiguous
    * subspaces of `dim/m`; per subspace, `k` centroids seeded from the
    * k lowest-id vectors' subvectors (deterministic, like
    * `seedCentroids`) and optionally refined with per-subspace Lloyd
    * passes (means rounded to 6 dp — same agg-order guard as
    * `refineCentroids`). Output: (sub, centroid_id, cvec).
    *
    * At 100 TB the codebook is the TRAINED artifact (m·k rows —
    * metadata-sized); train on a `Sampling.hashSample` of the corpus,
    * then encode everything. 16-dim subvectors at k=256 give 64×
    * compression of a float64[64] embedding — the reason PQ is the
    * storage format for trillion-row ANN (IVF partitions the corpus,
    * PQ compresses what each partition stores). */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int = 4, dim: Int = 64, k: Int = 8,
              iterations: Int = 0): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    val seeds = df.orderBy(col(idCol)).limit(k)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("__v"))
      .select(col("centroid_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"),
          slice(col("__v"), j * sub + 1, sub).as("cvec"))): _*)).as("s"))
      .select(col("s.sub").as("sub"), col("centroid_id"),
        col("s.cvec").as("cvec"))
    var cb = seeds
    for (_ <- 1 to iterations) {
      val assigned = pqEncodeWithVec(df, idCol, vecCol, cb, m, dim)
      cb = assigned
        .select(col("sub"), col("code").as("centroid_id"),
          posexplode(col("__sv")).as(Seq("pos", "x")))
        .groupBy("sub", "centroid_id", "pos")
        .agg(round(avg(col("x")), 6).as("mu"))
        .groupBy("sub", "centroid_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("sub"), col("centroid_id"),
          transform(col("pm"), p => p.getField("mu")).as("cvec"))
    }
    cb
  }

  /** Encode every vector as m centroid codes — MAP-ONLY: the codebook
    * is collapsed to one array row per subspace and broadcast, and the
    * argmin runs inside the projection (no shuffle, no window — the
    * shape an encode pass over 100 TB needs). Ties keep the lowest
    * centroid_id (cents sorted, strict-less compare). Long format
    * (id, sub, code); pack with groupBy(id) only if storage wants it. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebooks: DataFrame, m: Int = 4, dim: Int = 64): DataFrame =
    pqEncodeWithVec(df, idCol, vecCol, codebooks, m, dim)
      .select(col(idCol), col("sub"), col("code"))

  private def pqEncodeWithVec(df: DataFrame, idCol: String, vecCol: String,
                              codebooks: DataFrame, m: Int,
                              dim: Int): DataFrame = {
    val sub = dim / m
    val grouped = codebooks.groupBy("sub")
      .agg(array_sort(collect_list(
        struct(col("centroid_id"), col("cvec")))).as("cents"))
    df.select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .crossJoin(broadcast(grouped))
      .withColumn("__sv", slice(col("__v"), col("sub") * sub + 1, lit(sub)))
      .withColumn("__best", aggregate(col("cents"),
        struct(lit(Double.PositiveInfinity).as("d"),
          lit(Long.MaxValue).as("centroid_id")),
        (acc, c) => {
          val dd = l2Hof(col("__sv"), c.getField("cvec"))
          when(dd < acc.getField("d"),
            struct(dd.as("d"), c.getField("centroid_id").as("centroid_id")))
            .otherwise(acc)
        }))
      .select(col(idCol), col("sub"),
        col("__best").getField("centroid_id").as("code"), col("__sv"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: per query, a
    * lookup table of micro-integer distances (floor(L2·1e6) — integer
    * so the m-way sum is order-independent and oracle-exact) from each
    * query subvector to each centroid; corpus rows never touch a
    * vector again — score = sum of m LUT entries via a broadcast join
    * on (sub, code). One aggregation + the top-k window; approximate
    * by construction (quantization error), measure with
    * `recallReport` vs `bruteForceTopK`. */
  def pqAdcSearch(codes: DataFrame, codebooks: DataFrame,
                  queries: DataFrame, idCol: String, vecCol: String,
                  m: Int = 4, dim: Int = 64, topK: Int = 5): DataFrame = {
    val sub = dim / m
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
      .select(col("query_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"),
          slice(col("__qv"), j * sub + 1, sub).as("__qs"))): _*)).as("s"))
      .select(col("query_id"), col("s.sub").as("sub"), col("s.__qs").as("__qs"))
    val lut = q.join(codebooks, Seq("sub"))
      .withColumn("__d", floor(l2Hof(col("__qs"), col("cvec")) * 1e6))
      .select(col("query_id"), col("sub"),
        col("centroid_id").as("code"), col("__d"))
    val scored = codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy("query_id", idCol)
      .agg(sum(col("__d")).as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("adist"), col("rank"))
  }

  /** IVF-PQ: the combined index shape trillion-row ANN actually ships
    * — IVF prunes WHICH vectors get scored (only the `nProbe` probed
    * cells), PQ prunes HOW MUCH is read per scored vector (m codes
    * instead of the raw embedding; with `quantizeInt8`/`pqEncode`
    * storage that's the difference between scanning vectors and
    * scanning bytes). Inputs are the already-built index artifacts:
    * `assigned` from `ivfAssign`, `codes` from `pqEncode`, their
    * `centroids`/`codebooks`. Probe selection and the per-query LUT
    * are metadata-sized broadcasts; the corpus-side work is one
    * broadcast-join + one aggregation over the probed cells only.
    * Recall loses both from probing (measure vs `ivfSearch`) and
    * quantization (measure vs `bruteForceTopK`) — `recallReport`
    * takes either pair. */
  def ivfPqSearch(assigned: DataFrame, codes: DataFrame,
                  codebooks: DataFrame, centroids: DataFrame,
                  queries: DataFrame, idCol: String, vecCol: String,
                  m: Int = 4, dim: Int = 64,
                  nProbe: Int = 3, topK: Int = 5): DataFrame = {
    val sub = dim / m
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val probes = {
      val scored = q.join(broadcast(centroids))
        .withColumn("__sim", cosine(col("__qv"), col("cvec")))
      val w = Window.partitionBy("query_id")
        .orderBy(col("__sim").desc, col("centroid_id").asc)
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= nProbe)
        .select("query_id", "centroid_id")
    }
    val lut = q.select(col("query_id"), explode(array((0 until m).map(j =>
        struct(lit(j).as("sub"),
          slice(col("__qv"), j * sub + 1, sub).as("__qs"))): _*)).as("s"))
      .select(col("query_id"), col("s.sub").as("sub"), col("s.__qs").as("__qs"))
      .join(codebooks, Seq("sub"))
      .withColumn("__d", floor(l2Hof(col("__qs"), col("cvec")) * 1e6))
      .select(col("query_id"), col("sub"),
        col("centroid_id").as("code"), col("__d"))
    val cellCodes = codes
      .join(assigned.select(col(idCol), col("centroid_id")), Seq(idCol))
    val scored = cellCodes.join(broadcast(probes), Seq("centroid_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy("query_id", idCol)
      .agg(sum(col("__d")).as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adist").asc, col(idCol).asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("adist"), col("rank"))
  }

  // ---- SRP ingest loop (the embedding twin of Dedup.lshIngestBatch) ----

  /** One ingested batch's outcome on the SRP store: survivors that
    * entered the corpus (bucket rows appended), the cross-batch
    * near-dup report `(vec_id, cand_id, cos)` (exact cosine, 6 dp),
    * and the oversize store buckets excluded from probing (the
    * no-silent-drop contract, as everywhere). */
  final case class SrpIngestResult(survivors: DataFrame,
                                   crossBatchDups: DataFrame,
                                   droppedBuckets: DataFrame)

  /** The SRP plane family is part of the store's semantic schema —
    * signatures from a different plane recipe are column-compatible
    * longs that silently never collide (the minhash hashFamily
    * lesson, applied before the bug this time). */
  private val SrpFamily = "knuth2654435761-mod1009-v1"

  /** Materialize the SRP bucket store BUCKETED BY `bucket` — the
    * one-time shuffle after which every batch probe reads the corpus
    * side exchange-free ([[srpIngestBatch]]). Rows are
    * `(vec_id, bucket, vec)`: the stored vector rides along so the
    * cross-batch confirm is the EXACT cosine — no estimator tier is
    * needed on the embedding side (the vector IS the exact evidence,
    * unlike the text store where the original text is gone). Recipe
    * (planes, dim, plane family) persists as table properties;
    * ingest `require`s a match — drift fails loudly. */
  def writeSrpStore(vecs: DataFrame, idCol: String, vecCol: String,
                    table: String, path: String, buckets: Int,
                    planes: Int = 8, dim: Int = 64): Unit = {
    val rows = vecs
      .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("vec"))
      .withColumn("bucket", srpBucket(col("vec"), planes, dim))
      .select("vec_id", "bucket", "vec")
    graft.sources.Storage.writeBucketed(rows, table, path,
      bucketKeys = Seq("bucket"), buckets = buckets)
    vecs.sparkSession.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES (" +
        s"'graft.srp.planes'='$planes','graft.srp.dim'='$dim'," +
        s"'graft.srp.family'='$SrpFamily')")
  }

  private def requireSrpParams(spark: org.apache.spark.sql.SparkSession,
                               table: String, planes: Int,
                               dim: Int): Unit = {
    val props = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table)).properties
    def check(key: String, got: Int): Unit =
      props.get(s"graft.srp.$key").foreach(stored =>
        require(stored == got.toString,
          s"$table was written with $key=$stored but the caller passed " +
            s"$got — probing under a different SRP recipe would compare " +
            "buckets that silently never collide"))
    check("planes", planes)
    check("dim", dim)
    if (props.keys.exists(_.startsWith("graft.srp."))) {
      val fam = props.getOrElse("graft.srp.family",
        "<untagged — predates plane-family versioning>")
      require(fam == SrpFamily,
        s"$table holds SRP buckets from plane family $fam but this " +
          s"build computes $SrpFamily — stored and batch buckets would " +
          "silently never collide; rewrite the store with writeSrpStore")
    }
  }

  /** The COMPLETE per-batch EMBEDDING near-dedup ingest loop — the
    * semantic twin of `Dedup.lshIngestBatch`, closing the ingest
    * family across both modalities (text → minhash-LSH store,
    * embeddings → SRP store; streaming twin:
    * `StreamOps.srpDedupBatchStep`):
    *
    *   1. the batch dedupes INTERNALLY via the multi-probe SRP ANN
    *      path (`Dedup.dedupByEmbedding(exact = false)`: bucket join
    *      → exact cosine confirm → CC representatives — never
    *      all-pairs);
    *   2. survivors probe the bucket-bucketed store exchange-free on
    *      the store side (home bucket + the `planes` Hamming-1
    *      flips under `multiProbe` — the recall-recovery knob measured
    *      by q_s_recall_mp), each collision CONFIRMED by the exact
    *      cosine against the STORED vector (≥ `minCos`, 6 dp) — no
    *      estimator window at all, because the embedding store keeps
    *      the vector itself;
    *   3. accepted survivors' `(vec_id, bucket, vec)` rows append
    *      under the store's own catalog bucket spec; the next batch
    *      probes store ∪ batch with no rewrite. Same manifest
    *      crash-recovery and `leaseOwner` concurrent-writer fencing
    *      as the text loop; run `Storage.compactBucketed` every N
    *      batches.
    *
    * SIZING (the knob that is NOT free at 100 TB): expected bucket
    * population is corpus/2^planes ([[planesFor]]) — a fixed plane
    * count over a growing corpus drives every bucket past
    * `maxBucket` and the guard (reported, never silent) starts
    * excluding them; re-plane the store (rewrite) as the corpus
    * decades up. Oracle row `q_s_ingest` replays a two-batch ingest
    * end-to-end in portable SQL (both CC rounds, the multiprobe
    * expansion, the store probe) on a plane-count-appropriate
    * corpus slice. */
  def srpIngestBatch(batch: DataFrame, idCol: String, vecCol: String,
                     table: String, minCos: Double, planes: Int = 8,
                     dim: Int = 64, maxBucket: Int = 1000,
                     multiProbe: Boolean = true,
                     leaseOwner: String = null,
                     leaseTtlMs: Long = 10L * 60 * 1000): SrpIngestResult = {
    if (leaseOwner != null)
      graft.sources.Storage.withWriterLease(batch.sparkSession, table,
        leaseOwner, leaseTtlMs)(
        srpIngestBatch(batch, idCol, vecCol, table, minCos, planes, dim,
          maxBucket, multiProbe))
    else {
      val spark = batch.sparkSession
      requireSrpParams(spark, table, planes, dim)
      val store = spark.table(table)
      require(store.columns.contains("vec"),
        s"$table is not an SRP vector store; write it with writeSrpStore")
      val internal = Dedup.dedupByEmbedding(batch, idCol, vecCol, minCos,
        exact = false, multiProbe = multiProbe, planes = planes,
        dim = dim, maxBucket = maxBucket)
      // pinned once: the bucket kernel runs ONE pass per batch, shared
      // by the probe and the append (batch-sized, never corpus-sized)
      val sigs = internal
        .select(col(idCol).as("vec_id"), asDouble(col(vecCol)).as("vec"))
        .withColumn("bucket", srpBucket(col("vec"), planes, dim))
        .localCheckpoint(true)
      // store-side bucket-size guard: a window on the bucketed scan —
      // no exchange, no second store scan (the lshIngestBatch shape)
      val w = Window.partitionBy("bucket")
      val sized = store.withColumn("__bsize", count(lit(1)).over(w))
      val dropped = sized.filter(col("__bsize") > maxBucket)
        .select(col("bucket"), col("__bsize").cast("int").as("size"))
        .distinct()
      val okStore = sized.filter(col("__bsize") <= maxBucket)
        .select(col("bucket"), col("vec_id").as("cand_id"),
          col("vec").as("__sv"))
      val probes =
        if (multiProbe)
          sigs.select(col("vec_id"), col("vec"),
            explode(array(col("bucket") +: (0 until planes).map(p =>
              col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
        else sigs.select(col("vec_id"), col("vec"), col("bucket"))
      // EAGER pins BEFORE the append — the returned frames must not
      // re-probe a store that now contains this batch's own rows
      // (the lshIngestBatch three-batch hazard)
      val dups = probes.join(okStore, Seq("bucket"))
        .withColumn("cos", round(cosine(col("vec"), col("__sv")), 6))
        .filter(col("cos") >= minCos)
        .groupBy(col("vec_id"), col("cand_id"))
        .agg(max(col("cos")).as("cos"))
        .localCheckpoint(true)
      val droppedP = dropped.localCheckpoint(true)
      val survivors = internal
        .join(dups.select(col("vec_id").as(idCol)).distinct(),
          Seq(idCol), "left_anti")
        .localCheckpoint(true)
      graft.sources.Storage.appendBucketed(spark,
        sigs.join(survivors.select(col(idCol).as("vec_id")), Seq("vec_id"))
          .select("vec_id", "bucket", "vec"),
        table)
      SrpIngestResult(survivors, dups, droppedP)
    }
  }

  /** Multi-probe SRP ANN: each vector additionally probes the buckets
    * at sign-space Hamming distance 1 (one plane flipped), so a near
    * pair split by a single hyperplane is still found. This is the
    * recall-recovery knob that pairs with `planesFor`: MORE planes
    * keep buckets small (cost), probing puts back most of the recall
    * the extra cuts lose — measure with `recallReport`.
    *
    * Cost shape: probe side explodes (planes+1)× but carries only
    * (bucket, id, vec); candidate ids are deduped BEFORE the vectors
    * join back for the exact cosine re-rank, so each surviving pair
    * is scored once. Home-bucket census + maxBucket guardrails as in
    * `lshBucketedChecked`; pairs whose BOTH homes are dropped vanish
    * and show up in `droppedBuckets`. */
  def lshBucketedMultiProbe(df: DataFrame, idCol: String, vecCol: String,
                            minCos: Double, planes: Int = 8, dim: Int = 64,
                            maxBucket: Int = 1000): Dedup.LshCandidates = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("__v"))
      .withColumn("bucket", srpBucket(col("__v"), planes, dim))
    val census = v.groupBy("bucket").agg(count(lit(1)).as("bsize"))
    val dropped = census.filter(col("bsize") > maxBucket)
      .select(col("bucket"), col("bsize").as("size"))
    // single-member homes stay: their rows can still pair via probes
    val ok = census.filter(col("bsize") <= maxBucket).select("bucket")
    val vv = v.join(broadcast(ok), Seq("bucket"))
    val probes = vv.select(col("id"),
      explode(array(col("bucket") +: (0 until planes).map(p =>
        col("bucket").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val home = vv.select(col("bucket"), col("id").as("id_b"))
    val cand = probes.join(home, Seq("bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b")).distinct()
    val pairs = cand
      .join(v.select(col("id").as("id_a"), col("__v").as("__va")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("__v").as("__vb")), Seq("id_b"))
      .withColumn("cos", round(cosine(col("__va"), col("__vb")), 6))
      .filter(col("cos") >= minCos)
      .select("id_a", "id_b", "cos")
    Dedup.LshCandidates(pairs, dropped)
  }
}
