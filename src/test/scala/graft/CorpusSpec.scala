package graft

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // one doc per drop stage + two survivors + dup groups
  private lazy val docs = Seq(
    (1L, "the cat sat on the mat and it is a good day in the sun"),
    (2L, "short doc"),                                    // length (< 3 words)
    (3L, "el perro la gata los ninos es la casa el sol"), // language (es)
    (4L, "a. b, c! d? e; f: g. h, i! j?"),               // quality (punct-heavy)
    (5L, "spam spam spam spam spam spam spam spam ok"),   // repetition
    (6L, "the cat sat on the mat and it is a good day in the sun"), // exact dup of 1
    (7L, "the cat sat on the mat and it is a good day in the rain"), // near dup of 1
    (8L, "completely different english text about the weather and the sea today")
  ).toDF("doc_id", "text")

  private lazy val result = Corpus.clean(docs, "text", "doc_id")

  test("clean: survivors are the representatives plus unique docs") {
    val kept = result.kept.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 8L))
  }

  test("clean: every drop attributed to its FIRST failing stage") {
    val drops = result.drops.as[(Long, String)].collect().toMap
    assert(drops == Map(
      2L -> "length", 3L -> "language", 4L -> "quality",
      5L -> "repetition", 6L -> "exact_dup", 7L -> "near_dup"))
  }

  test("clean: dropReport aggregates the attribution") {
    val rep = result.dropReport.as[(String, Long)].collect().toMap
    assert(rep == Map("length" -> 1L, "language" -> 1L, "quality" -> 1L,
      "repetition" -> 1L, "exact_dup" -> 1L, "near_dup" -> 1L))
  }

  test("clean: kept + drops partition the input exactly") {
    val kept = result.kept.select("doc_id").as[Long].collect().toSet
    val droppedIds = result.drops.select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(droppedIds).isEmpty)
    assert(kept.union(droppedIds) == (1L to 8L).toSet)
  }
}
