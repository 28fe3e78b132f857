package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond connected components (Dedup's CC
  * handles clustering; this adds importance ranking — reference
  * analog: none, north-star extension for link/citation-weighted
  * corpus curation).
  *
  * PageRank in integer micro-units: ranks are longs (1.0 ≡ 1 000 000)
  * and every per-edge contribution is an integer floor-division, so
  * sums are ORDER-INDEPENDENT — the result is bit-identical across
  * partitionings, retries, and engines (the same convention as the
  * PQ/IVF integer micro-distances; floating-point PageRank cannot be
  * hash-compared across engines because partial-sum order differs).
  * Simplified model: dangling mass is dropped (no redistribution),
  * damping 0.85 in micro-units.
  *
  * Scale shape: the edge list with out-degrees is computed once and
  * pinned; every iteration is one src-keyed join + one dst-keyed
  * aggregation — the two shuffles of any distributed PageRank. The
  * rank frame stays (node, pr) — never wider than 16 bytes of data
  * per node.
  */
object Graph {

  /** ranks: (node, pr) micro-unit longs. `unpersist()` releases the
    * three loop-pinned frames once the caller has consumed/written
    * the ranks — same contract as `Corpus.CleanResult` (a long-lived
    * session must not accumulate corpus-sized cached frames; an
    * eager checkpoint instead would serialize the result and cost
    * ~2× the loop time). */
  final case class RankResult(ranks: DataFrame, private val pinned: Seq[DataFrame]) {
    def unpersist(): Unit = pinned.foreach { f => f.unpersist(); () }
  }

  /** Shared power-iteration core for [[pageRankInt]] (every node is a
    * restart target) and [[personalizedPageRankInt]] (only the seed
    * set is). `seeds = None` marks all nodes seeded. */
  private def rankLoop(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int, seeds: Option[DataFrame]): RankResult = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every iteration reads nodes and the degree-annotated edge list —
    // pin both so the loop's lineage starts at the cache, not the scan
    val allNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = (seeds match {
      case None => allNodes.withColumn("__seed", lit(1))
      case Some(sd) => allNodes
        .join(sd.withColumn("__seed", lit(1)), Seq("node"), "left")
        .select(col("node"), coalesce(col("__seed"), lit(0)).as("__seed"))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val restart = when(col("__seed") === 1, lit(150000L)).otherwise(lit(0L))
    var pr = nodes.select(col("node"), col("__seed"),
      when(col("__seed") === 1, lit(1000000L)).otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      val contribs = withDeg.join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("__c"))
        .groupBy("dst").agg(sum(col("__c")).as("__insum"))
      // split the damping product around the micro-unit division:
      // 850000·insum would overflow Long past ~10^7 nodes feeding one
      // hub; 850000·quotient + 850000·remainder/10^6 is the SAME value
      // ((850000·(q·10^6+r)) div 10^6 = 850000·q + (850000·r) div 10^6)
      // with every intermediate bounded by 850000·n
      pr = nodes.join(contribs, col("node") === col("dst"), "left")
        .select(col("node"), col("__seed"),
          (restart +
            expr("850000 * (coalesce(__insum, 0L) div 1000000) + " +
              "850000 * (coalesce(__insum, 0L) % 1000000) div 1000000"))
            .as("pr"))
    }
    RankResult(pr.select(col("node"), col("pr")), Seq(e, nodes, withDeg))
  }

  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 3): RankResult =
    rankLoop(edges, srcCol, dstCol, iters, None)

  /** Personalized PageRank in the same integer micro-unit convention
    * as `pageRankInt`, with the restart mass pinned to a SEED set —
    * the "relevance to these nodes" primitive (related-document
    * discovery from a trusted core, contamination proximity, expert
    * finding). Convention: each seed carries unit mass 10^6; the
    * restart term is 150000 for seeds and 0 elsewhere (total restart
    * mass = 0.15·|S|·10^6 — scores are comparable WITHIN a run;
    * normalize by |S| outside if cross-run comparison is needed).
    * Same two shuffles per iteration, same pinned frames, same
    * overflow-safe damping split; non-seed nodes unreachable from a
    * seed hold rank 0 and are still emitted.
    */
  def personalizedPageRankInt(edges: DataFrame, srcCol: String,
                              dstCol: String, seeds: DataFrame,
                              seedCol: String,
                              iters: Int = 3): RankResult =
    rankLoop(edges, srcCol, dstCol, iters,
      Some(seeds.select(col(seedCol).cast("long").as("node")).distinct()))

  /** First-class connected components over an arbitrary edge list —
    * the graph-analytics face of the same machinery `Dedup.dupClusters`
    * uses for duplicate-cluster resolution (pointer-jumped min-label
    * propagation, O(log diameter) rounds, adaptive local union-find
    * under `localSolveMaxEdges`). Returns (node, component) where
    * component = min member id; nodes appearing in no edge are absent
    * (they'd each be their own singleton — join the node universe back
    * if needed). Self-loops are harmless and dropped by clustering.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 20,
                          localSolveMaxEdges: Long = 1000000L): DataFrame =
    Dedup.dupClusters(
      edges.select(col(srcCol).cast("long").as("id_a"),
          col(dstCol).cast("long").as("id_b"))
        .filter(col("id_a") =!= col("id_b")),
      localSolveMaxEdges = localSolveMaxEdges,
      maxIterations = maxIterations)
      .select(col("id").as("node"), col("cluster_id").as("component"))

  /** dists: (node, dist) long hop counts from the nearest seed.
    * `unpersist()` releases the loop-pinned level frames once the
    * caller has consumed the result (same contract as RankResult). */
  final case class BfsResult(dists: DataFrame, private val pinned: Seq[DataFrame]) {
    def unpersist(): Unit = pinned.foreach { f => f.unpersist(); () }
  }

  /** Bounded-depth BFS from a seed set: frontier expansion with an
    * anti-join against the visited set, `maxHops` rounds. Returns the
    * min hop distance per reachable node (seeds at 0) — the reach/
    * influence primitive (citation depth, link-graph crawl frontiers,
    * contamination blast radius).
    *
    * Scale shape: each hop is one equi-join frontier⋈edges + one
    * left-anti against visited + a distinct — all key-partitioned,
    * no global structure. The frontier is persisted per level so the
    * next hop's lineage starts there, not at the scan; the loop is
    * FIXED-DEPTH (no convergence action per round — at 100 TB a
    * driver round-trip per hop costs more than the wasted empty-hop
    * jobs it would save at small depth). Edges are treated as
    * DIRECTED; pass a symmetrized list for undirected reach.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int): BfsResult = {
    require(maxHops >= 1 && maxHops <= 20, s"maxHops out of range: $maxHops")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val seed0 = seeds.select(col(seedCol).cast("long").as("node")).distinct()
      .withColumn("dist", lit(0L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var visited = seed0
    var frontier = seed0.select("node")
    val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](e, seed0)
    for (h <- 1 to maxHops) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned += next
      visited = visited.unionAll(next)
      frontier = next.select("node")
    }
    BfsResult(visited, pinned.toSeq)
  }

  /** k-core decomposition membership: iteratively peel nodes of
    * degree < k until only the k-core remains — the crawl-graph
    * cleaning op ("drop pages only reachable from spam tendrils")
    * and the dense-community extractor. Edges canonicalize to
    * undirected uniques first; each peel is two key-partitioned
    * semi-joins plus one degree aggregation.
    *
    * The loop is FIXED-COUNT (`peels` rounds, no convergence action —
    * the bfsHops license: extra peels past convergence are no-ops on
    * an already-stable edge set), which also makes the operator
    * exactly replayable by an oracle that unrolls the same number of
    * rounds. Each round EAGERLY localCheckpoints the surviving edge
    * set: the `keep` frame feeds BOTH semi-joins, so without lineage
    * truncation the logical plan doubles per round and the optimizer
    * dies exponentially long before any data moves (measured: heap
    * exhaustion at 8 peels on a 3 000-edge graph). The edge set also
    * SHRINKS monotonically, so each checkpoint is smaller than the
    * last. Returns (node, core_degree) for nodes meeting degree ≥ k
    * after the final peel. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            peels: Int = 6): DataFrame = {
    require(k >= 1 && peels >= 1 && peels <= 20,
      s"need k >= 1 and 1 <= peels <= 20, got k=$k peels=$peels")
    var e = edges.select(
        least(col(srcCol).cast("long"), col(dstCol).cast("long")).as("a"),
        greatest(col(srcCol).cast("long"), col(dstCol).cast("long")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    def degrees(ed: DataFrame): DataFrame =
      ed.select(col("a").as("node"))
        .unionAll(ed.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("core_degree"))
    for (_ <- 1 to peels) {
      val keep = degrees(e).filter(col("core_degree") >= k)
        .select("node")
      e = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .localCheckpoint(true)
    }
    degrees(e).filter(col("core_degree") >= k)
  }

  /** Per-node triangle counts via degree-ordered orientation — the
    * standard distributed form: orient every undirected edge from the
    * lower (degree, node) rank to the higher, so each triangle has
    * EXACTLY one node with both out-edges (its rank-minimum). The
    * wedge self-join then fans out by ORIENTED out-degree, which the
    * orientation bounds by O(√m) on any graph (a hub of degree d
    * contributes wedges only toward its ≤√m higher-ranked neighbors,
    * not d²) — the reason this survives power-law graphs where a
    * naive neighbor self-join explodes.
    *
    * Input edges may be directed/duplicated/self-looped; they are
    * canonicalized first. Returns (node, n_triangles), nodes in no
    * triangle omitted.
    */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val canon = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (deg, node) rank; carry the head's rank for wedge order
    val annotated = canon
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "da"),
        Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "db"),
        Seq("b"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = annotated.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val e1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val e2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    // closure edge between v1,v2 is oriented v1→v2 (rank(v1) < rank(v2))
    val tri = wedges.join(
      oriented.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
      .select(col("u"), col("v1"), col("v2"))
    tri.select(col("u").as("node"))
      .unionAll(tri.select(col("v1").as("node")))
      .unionAll(tri.select(col("v2").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** labels: (node, label). `unpersist()` releases the loop-pinned
    * frames (same contract as RankResult/BfsResult). */
  final case class LpaResult(labels: DataFrame, private val pinned: Seq[DataFrame]) {
    def unpersist(): Unit = pinned.foreach { f => f.unpersist(); () }
  }

  /** Synchronous label propagation (community detection): every node
    * starts labeled with itself; each round it adopts the MODE of its
    * neighbors' labels, ties broken by the smaller label — fully
    * deterministic (asynchronous/randomized LPA variants are not
    * hash-comparable across engines or even across runs).
    *
    * Scale shape: edges are symmetrized once and pinned; each round
    * is one src-keyed join + one (node,label) count + one per-node
    * argmax — the argmax rides the SAME aggregation pass as a
    * max(struct(cnt, -label)) (no window, no extra shuffle, map-side
    * combinable). Fixed iteration count, no convergence action per
    * round (the bfsHops license: a driver round-trip per round costs
    * more at scale than the converged rounds it saves). The label
    * frame never exceeds (node, label) — 16 bytes of data per node.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int = 3): LpaResult = {
    require(iters >= 1 && iters <= 30, s"iters out of range: $iters")
    val raw = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val e = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pinned = scala.collection.mutable.ArrayBuffer[DataFrame](e)
    var labels = e.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
    for (i <- 1 to iters) {
      val next = e
        .join(labels.withColumnRenamed("node", "a"), Seq("a"))
        .groupBy(col("b").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy("node")
        .agg(max(struct(col("__c"), (-col("label")).as("__neg")))
          .as("__top"))
        .select(col("node"), (-col("__top.__neg")).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned += next
      labels = next
    }
    LpaResult(labels, pinned.toSeq)
  }
}
