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

  test("chunk: overlap windows, short docs, full reconstruction") {
    val d = Seq((1L, "a" * 141), (2L, "b" * 70), (3L, ""), (4L, "xy"))
      .toDF("doc_id", "text")
    val got = Corpus.chunk(d, "text", "doc_id", maxChars = 80, overlap = 20)
      .select("doc_id", "chunk_id", "chunk_start", "chunk")
      .as[(Long, Long, Long, String)].collect()
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 141 chars, stride 60: ceil(121/60)=3 chunks at 0/60/120
    assert(byDoc(1L).map(c => (c._3, c._4.length)).sameElements(
      Array((0L, 80), (60L, 80), (120L, 21))))
    // 70 <= 80: ONE chunk (no redundant contained tail)
    assert(byDoc(2L).map(c => (c._3, c._4.length)).sameElements(Array((0L, 70))))
    assert(!byDoc.contains(3L)) // empty doc: no chunks
    assert(byDoc(4L).head._4 == "xy")
    // consecutive chunks overlap by exactly `overlap` where full-width
    val c1 = byDoc(1L)
    assert(c1(0)._4.takeRight(20) == c1(1)._4.take(20))
  }
}
