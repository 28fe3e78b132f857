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
}
