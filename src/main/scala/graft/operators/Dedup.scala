package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * Parity ops (SURVEY.md §2.4 A4/A5): the reference's keep-first-after-
  * sort dedups (cnv.py:372-376, mci_clinical_variant_merge.py:263-279)
  * — pandas relies on implicit file order; here every dedup takes an
  * EXPLICIT total order so results are deterministic under any
  * partitioning (SURVEY.md §7.4 item 1).
  *
  * Scale ops (north star): exact + near-duplicate detection for
  * training-data pipelines — hash dedup, MinHash/LSH, SimHash — all
  * built on a portable md5-derived 60-bit hash so a SQL oracle can
  * reproduce them bit-for-bit.
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`.
    * Callers must make `order` a total order (include a unique
    * tiebreaker) or results are nondeterministic — same caveat the
    * reference silently ignores (cnv.py:372).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** A5b: per key keep the LONGEST interval (cnv.py:375-376). */
  def keepLongest(df: DataFrame, keys: Seq[String],
                  start: String, end: String, tiebreak: Seq[Column]): DataFrame =
    keepFirst(df, keys, ((col(end) - col(start)).desc +: tiebreak))

  /** A5c: megaMAF merge-dedup — prefer clinically-reported rows
    * (mci:263-279: custom sort puts `Not Reported`/null significance
    * last, then keep first per 7-col variant key). */
  def preferReported(df: DataFrame, keys: Seq[String],
                     significance: String, tiebreak: Seq[Column],
                     lastValue: String = "Not Reported"): DataFrame = {
    val rank = when(col(significance).isNull ||
      col(significance) === lastValue, 1).otherwise(0)
    keepFirst(df, keys, rank.asc +: tiebreak)
  }

  // ------------------------------------------------------------------
  // North-star: content dedup at scale
  // ------------------------------------------------------------------

  import graft.functions.ColumnFns.hash60
  import graft.functions.TextFns

  /** Exact dedup: one representative (min of `idCol`) per distinct
    * content hash. Single hash-partitioned aggregation; no window, no
    * sort — the cheapest possible shape at 100 TB.
    */
  def exactByContent(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol)))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** MinHash signatures: k permutations approximated as
    * (a_i * h + b_i) mod p over word-shingle hashes. Wholly built from
    * codegen'd HOFs — no UDF — and portable to the SQL oracle.
    */
  def minhashSignature(df: DataFrame, textCol: String,
                       numHashes: Int = 16, shingleSize: Int = 3): DataFrame =
    df.withColumn("__hs", TextFns.shingleHashes(col(textCol), shingleSize))
      .select(df.columns.map(col) ++ (0 until numHashes).map(i =>
        TextFns.minhashPerm(col("__hs"), i).as(s"mh_$i")): _*)

  /** MinHash + LSH banding: rows sharing any (band, band-hash) bucket
    * are near-duplicate candidates. Returns candidate pairs (id_a <
    * id_b) with the number of agreeing bands. The only shuffle is the
    * groupBy on bucket — per-bucket self-pairing happens inside the
    * aggregation, so skewed giant buckets are capped by `maxBucket`.
    */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      numHashes: Int = 16, bands: Int = 4,
                      shingleSize: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val rows = numHashes / bands
    val withSig = df
      .withColumn("__hs", TextFns.shingleHashes(col(textCol), shingleSize))
      .select(
        col(idCol).as("doc_id") +:
          (0 until numHashes).map(i =>
            TextFns.minhashPerm(col("__hs"), i).as(s"mh_$i")): _*)
    val banded = withSig.select(col("doc_id"), explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash60(concat_ws("_",
            (b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*))
            .as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val grouped = banded.groupBy("band", "bucket")
      .agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    // pair within bucket without exploding the cross product through a join
    grouped.select(explode(TextFns.pairs(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("band_matches"))
  }

  /** SimHash: 60-bit signature where bit j is the sign of the sum of
    * (+1/-1) votes from each token hash's bit j. Near-dups share most
    * bits; hamming distance is a cheap post-filter.
    */
  def simhash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("simhash", TextFns.simhash(col(textCol)))

  /** Duplicate-cluster resolution: candidate pairs → connected
    * components via iterative min-label propagation (each round is one
    * join + one aggregate; rounds needed = graph diameter in hops,
    * doubling each round — LSH dup clusters are shallow, so
    * `maxIterations` = 10 covers diameters past 1000). Returns
    * (id, cluster_id) where cluster_id = min member id; the kept
    * representative per cluster is id == cluster_id.
    */
  def dupClusters(pairs: DataFrame, maxIterations: Int = 10): DataFrame = {
    val spark = pairs.sparkSession
    // symmetric edge list incl. self-loops
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIterations) {
      // each node adopts the min label in its closed neighborhood
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("cluster_id")).as("nmin"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .withColumn("new_cluster",
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))))
      changed = updated.filter(col("new_cluster") =!= col("cluster_id")).count()
      labels = updated.select(col("id"), col("new_cluster").as("cluster_id"))
        .cache()
      i += 1
    }
    edges.unpersist()
    labels
  }

  /** Embedding-cosine near-duplicate pairs (the semantic-dedup leg of
    * the training-data pipeline): exact form for modest corpora, SRP-
    * bucketed ANN (`Similarity.lshBucketed`) as the 100 TB path. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        minCos: Double, exact: Boolean = true): DataFrame =
    if (exact) Similarity.thresholdPairs(df, idCol, vecCol, minCos)
    else Similarity.lshBucketed(df, idCol, vecCol, minCos)

  /** N-gram Jaccard similarity for candidate pairs: given a pairs
    * frame (id_a, id_b) and the source docs, compute
    * |A ∩ B| / |A ∪ B| over word n-gram sets.
    *
    * Shingle sets are recomputed per join side here; at real scale
    * materialize them ONCE (write `(id, shingleHashes64(text))` to
    * parquet, ideally bucketed by id) and call `ngramJaccardOnSets` —
    * shingling is the dominant cost and becomes a one-time build.
    */
  def ngramJaccard(pairsDf: DataFrame, docs: DataFrame, textCol: String,
                   idCol: String, n: Int = 3): DataFrame = {
    // hashed shingle sets: same cardinalities, no giant string arrays
    val sets = docs.select(col(idCol).as("__id"),
      TextFns.shingleHashes64(col(textCol), n).as("__set"))
    ngramJaccardOnSets(pairsDf, sets)
  }

  /** Jaccard over precomputed hashed shingle sets `(__id, __set)`. */
  def ngramJaccardOnSets(pairsDf: DataFrame, sets: DataFrame): DataFrame =
    pairsDf
      .join(sets.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__set", "set_a"), Seq("id_a"))
      .join(sets.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__set", "set_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("union", size(array_union(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        when(col("union") === 0, 0.0)
          .otherwise(col("inter").cast("double") / col("union")))
      .drop("set_a", "set_b")

  /** End-to-end near-dup removal: MinHash-LSH candidates → Jaccard
    * confirmation ≥ `minJaccard` → connected components → keep the
    * min-id representative of each cluster. Returns the deduplicated
    * docs frame. */
  def dedupByLsh(docs: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, bands: Int = 4,
                 shingleSize: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val candidates = minhashLshPairs(docs, textCol, idCol,
      numHashes, bands, shingleSize)
    val confirmed = ngramJaccard(candidates, docs, textCol, idCol, shingleSize)
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b")
    val clusters = dupClusters(confirmed)
    val drop = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
