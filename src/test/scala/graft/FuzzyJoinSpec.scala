package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val names = Seq(
    (1L, "small ring"), (2L, "small rang"), (3L, "small bolt"),
    (4L, "large ring"), (5L, "small ring")
  ).toDF("id", "name")

  test("selfPairs: blocked, distance-bounded, identical strings excluded") {
    val got = FuzzyJoin.selfPairs(names, "id", "name",
      s => split(s, " ").getItem(0), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // block "small": (1,2) dist1, (2,5) dist1; (1,3)/(2,3) dist>2 out;
    // (1,5) identical strings out; (1,4) different blocks out
    assert(got == Set((1L, 2L, 1), (2L, 5L, 1)))
  }

  test("valuePairs: distinct values with row-pair multiplicities") {
    val got = FuzzyJoin.valuePairs(names, "name",
      s => split(s, " ").getItem(0), maxDist = 2)
      .as[(String, String, Long, Int)].collect().toSet
    // "small ring" appears twice (ids 1,5): multiplicity 2·1
    assert(got == Set(("small rang", "small ring", 2L, 1)))
  }

  test("wider maxDist admits the in-block distant pair, never crosses blocks") {
    val got = FuzzyJoin.selfPairs(names, "id", "name",
      s => split(s, " ").getItem(0), maxDist = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 3L)) && !got.exists(p => p._1 == 4L || p._2 == 4L))
  }

  // ---- Ed-Join q-gram prefix filter ----

  private def bruteEdit(vals: Seq[String], maxDist: Int): Set[(String, String, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ds = vals.distinct
    (for {
      a <- ds; b <- ds if a < b
      dist = lev(a, b) if dist <= maxDist
    } yield (a, b, dist)).toSet
  }

  test("editGramPairs: recall 1.0 vs brute force, incl. short strings") {
    val vals = Seq("ring", "rang", "rung", "bolt", "bolts", "boltz",
      "ab", "ac", "a", "", "small ring xx", "small rang xx",
      "completely different phrase", "ring") // dup value → multiplicity
    val df = vals.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = FuzzyJoin.editGramPairs(df, "s", q = 2, maxDist = 2)
      .select("s_a", "s_b", "dist").as[(String, String, Int)].collect().toSet
    assert(got == bruteEdit(vals, 2))
    // multiplicity carried: "ring" appears twice
    val np = FuzzyJoin.editGramPairs(df, "s", q = 2, maxDist = 2)
      .filter($"s_a" === "rang" && $"s_b" === "ring")
      .select("n_pairs").as[Long].collect()
    assert(np.toSeq == Seq(2L))
  }

  test("editGramPairs: recall 1.0 on a generated near-dup corpus (q=3, d=1)") {
    val base = (0 until 80).map(i => f"record-$i%04d-alpha")
    val mutated = base.take(40).map(s => s.updated(3, 'x'))
    val vals = base ++ mutated
    val df = vals.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val got = FuzzyJoin.editGramPairs(df, "s", q = 3, maxDist = 1)
      .select("s_a", "s_b", "dist").as[(String, String, Int)].collect().toSet
    assert(got == bruteEdit(vals, 1))
    assert(got.nonEmpty)
  }

  // ---- sorted neighborhood ----

  test("snmPairs: window-rank candidates, Levenshtein-verified, gap recorded") {
    val df = Seq((10L, "aaa"), (11L, "aab"), (12L, "aba"), (13L, "zzz"))
      .toDF("id", "s")
    val got = FuzzyJoin.snmPairs(df, "id", "s", window = 3, maxDist = 2)
      .select("id_a", "id_b", "gap", "dist")
      .as[(Long, Long, Long, Int)].collect().toSet
    // sorted order: aaa(1) aab(2) aba(3) zzz(4); window 3 → gaps 1,2;
    // zzz verifies out against everything
    assert(got == Set((10L, 11L, 1L, 1), (10L, 12L, 2L, 1), (11L, 12L, 1L, 2)))
  }

  test("snmPairs: pairs cross range-partition boundaries") {
    val df = (0L until 200L).map(i => (i, f"k$i%03d")).toDF("id", "s")
    val got = FuzzyJoin.snmPairs(df, "id", "s", window = 2, maxDist = 3,
      numPartitions = 7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // every adjacent pair in sort order must appear, partitions or not
    assert(got == (0L until 199L).map(i => (i, i + 1)).toSet)
  }
}
