package graft

import graft.operators.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 contains the benchmark 3-gram "alpha beta gamma"; doc 2 is
  // clean; doc 3 is too short to have any 3-gram.
  private lazy val train = Seq(
    (1L, "the quick alpha beta gamma fox jumps over"),
    (2L, "completely unrelated text about the weather today"),
    (3L, "two words")
  ).toDF("doc_id", "text")

  private lazy val bench = Seq(
    (100L, "eval question alpha beta gamma answer choice")
  ).toDF("doc_id", "text")

  test("overlapReport counts shared n-grams per train doc") {
    val byId = Decontaminate.overlapReport(train, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byId(1L)._1 == 6 && byId(1L)._2 == 1)   // one shared 3-gram
    assert(byId(2L)._2 == 0)
    assert(byId(3L) == ((0L, 0L)))                  // sub-n doc: zero grams
  }

  test("decontaminate drops exactly the contaminated docs") {
    val kept = Decontaminate.decontaminate(train, bench, "text", "doc_id", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("maxRatio loosens the drop rule") {
    // doc 1: 1 hit / 6 grams = 0.1667 — survives a 0.5 ceiling
    val kept = Decontaminate.decontaminate(train, bench, "text", "doc_id",
      n = 3, maxRatio = 0.5).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }
}
