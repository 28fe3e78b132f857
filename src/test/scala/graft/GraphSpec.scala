package graft

import org.apache.spark.sql.functions.{greatest, least}
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

  // ---- triangles ----

  test("triangles: K4 has 4, every node in 3; squares have none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "t")
    val got = Graph.triangles(k4, "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("s", "t")
    assert(Graph.triangles(square, "s", "t").count() == 0L)
  }

  test("triangles: duplicates, reversed edges, and self-loops are canonicalized") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L)).toDF("s", "t")
    val got = Graph.triangles(messy, "s", "t")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- connected components ----

  test("connectedComponents: known components; local and distributed paths agree") {
    val e = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L), (31L, 30L))
      .toDF("s", "t")
    val local = Graph.connectedComponents(e, "s", "t")
      .as[(Long, Long)].collect().toMap
    // 20's self-loop drops; the node is in no real edge → absent
    assert(local == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 30L -> 30L, 31L -> 30L))
    val dist = Graph.connectedComponents(e, "s", "t", localSolveMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(dist == local)
  }

  test("connectedComponents: 60-node chain collapses (distributed pointer jumping)") {
    val e = (1L until 60L).map(i => (i, i + 1)).toDF("s", "t")
    val got = Graph.connectedComponents(e, "s", "t", localSolveMaxEdges = 0)
      .as[(Long, Long)].collect()
    assert(got.length == 60 && got.forall(_._2 == 1L))
  }

  // ---- bounded-depth BFS ----

  test("bfsHops: hand distances on a path; nodes past maxHops absent") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "t")
    val r = Graph.bfsHops(e, "s", "t", Seq(1L).toDF("seed"), "seed",
      maxHops = 3)
    val got = r.dists.as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsHops: min distance wins across seeds; edges are directed") {
    val e = Seq((1L, 2L), (2L, 3L), (5L, 4L), (4L, 3L)).toDF("s", "t")
    val r = Graph.bfsHops(e, "s", "t", Seq(1L, 4L).toDF("seed"), "seed",
      maxHops = 2)
    val got = r.dists.as[(Long, Long)].collect().toMap
    r.unpersist()
    // 3 reached at dist 1 via seed 4 (not 2 via 1→2→3); 5 only has an
    // OUT-edge into 4 — never reached backwards
    assert(got == Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: matches brute force on a pseudo-random graph") {
    val edges = (1L to 2000L).map(i => (i % 60, (i * 13) % 60)).toDF("s", "t")
    val got = Graph.triangles(edges, "s", "t")
      .as[(Long, Long)].collect().toMap
    // brute force over canonical adjacency in local scala
    val canon = edges.select(least($"s", $"t").as("a"),
        greatest($"s", $"t").as("b"))
      .filter($"a" =!= $"b").distinct()
      .as[(Long, Long)].collect().toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2))
    val triCount = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    val sortedNodes = nodes.toSeq.sorted
    for {
      x <- sortedNodes; y <- sortedNodes if y > x && canon((x, y))
      z <- sortedNodes if z > y && canon((x, z)) && canon((y, z))
    } {
      triCount(x) += 1; triCount(y) += 1; triCount(z) += 1
    }
    assert(got == triCount.toMap)
  }

  test("personalizedPageRankInt: hand iteration, restart only at seeds") {
    val seeds = Seq(1L).toDF("seed")
    val got = Graph.personalizedPageRankInt(edges, "s", "t", seeds,
      "seed", iters = 1).ranks.as[(Long, Long)].collect().toMap
    // contribs from seed 1 (mass 10^6, outdeg 2): 500000 to 2 and 3
    assert(got == Map(1L -> 150000L, 2L -> 425000L, 3L -> 425000L))
  }

  test("labelPropagation: two cliques joined by a bridge separate") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L)).toDF("s", "t")
    val r = Graph.labelPropagation(e, "s", "t", iters = 4)
    val got = r.labels.as[(Long, Long)].collect().toMap
    r.unpersist()
    // each clique converges to ONE label; the two differ
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(10L) == got(11L) &&
      got(11L) == got(12L))
    assert(got(1L) != got(11L))
  }

  test("labelPropagation: deterministic mode/tie-break (hand round)") {
    // star: center 5 with leaves 1,2,3 — after one SYNC round the
    // center takes the min leaf label (all counts 1, tie -> min) and
    // every leaf takes the center's label
    val e = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("s", "t")
    val r = Graph.labelPropagation(e, "s", "t", iters = 1)
    val got = r.labels.as[(Long, Long)].collect().toMap
    r.unpersist()
    assert(got == Map(5L -> 1L, 1L -> 5L, 2L -> 5L, 3L -> 5L))
  }

  test("labelPropagation: bit-identical across partitionings") {
    val e = (1L to 2000L).map(i => (i % 131, (i * 17) % 131)).toDF("s", "t")
    val a = Graph.labelPropagation(e.repartition(1), "s", "t", 3)
    val b = Graph.labelPropagation(e.repartition(13), "s", "t", 3)
    val ga = a.labels.as[(Long, Long)].collect().toMap
    val gb = b.labels.as[(Long, Long)].collect().toMap
    a.unpersist(); b.unpersist()
    assert(ga == gb)
  }

  test("kCore: tendrils peel away, the dense core survives with core degrees") {
    // triangle {1,2,3} + a chain 3-4-5 hanging off it + isolated pair
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (6L, 7L)).toDF("s", "t")
    val got = Graph.kCore(e, "s", "t", k = 2, peels = 6)
      .as[(Long, Long)].collect().toMap
    // chain nodes 4,5 peel (degree 1 cascade); pair 6,7 peels; the
    // triangle remains with in-core degree 2 each
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // k=1 keeps everything with original degrees
    val all = Graph.kCore(e, "s", "t", k = 1, peels = 3)
      .as[(Long, Long)].collect().toMap
    assert(all.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(all(3L) == 3L && all(5L) == 1L)
  }
}
