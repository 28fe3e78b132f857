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

  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 3): RankResult = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every iteration reads nodes and the degree-annotated edge list —
    // pin both so the loop's lineage starts at the cache, not the scan
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var pr = nodes.withColumn("pr", lit(1000000L))
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
        .select(col("node"),
          (lit(150000L) +
            expr("850000 * (coalesce(__insum, 0L) div 1000000) + " +
              "850000 * (coalesce(__insum, 0L) % 1000000) div 1000000"))
            .as("pr"))
    }
    RankResult(pr, Seq(e, nodes, withDeg))
  }
}
