package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A -> B, A -> C, B -> C (C dangling)
  private lazy val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "t")

  test("pageRankInt: hand-computed two iterations") {
    val got = Graph.pageRankInt(edges, "s", "t", iters = 2).ranks
      .as[(Long, Long)].collect().toMap
    // iter1: pr = (150000, 575000, 1425000); iter2 below
    assert(got == Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("pageRankInt: bit-identical across partitionings (integer sums)") {
    val e = (1L to 3000L).map(i => (i % 97, (i * 31) % 97)).toDF("s", "t")
    val a = Graph.pageRankInt(e, "s", "t", iters = 3).ranks
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRankInt(e.repartition(13), "s", "t", iters = 3).ranks
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("pageRankInt: sink-only nodes hold the base rank's floor") {
    val got = Graph.pageRankInt(edges, "s", "t", iters = 5).ranks
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 150000L) // no in-edges: base only
    assert(got(3L) > got(2L))  // two in-paths beat one
  }
}
