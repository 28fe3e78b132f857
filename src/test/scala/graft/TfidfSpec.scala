package graft

import graft.operators.Tfidf

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple apple banana common"),
    (2L, "banana cherry common"),
    (3L, "cherry cherry cherry common")
  ).toDF("doc_id", "text")

  test("docFreq: presence per doc, not occurrence count") {
    val df = Tfidf.docFreq(docs, "text").as[(String, Long)].collect().toMap
    assert(df == Map("apple" -> 1L, "banana" -> 2L,
      "cherry" -> 2L, "common" -> 3L))
  }

  test("topTerms: rare repeated terms outrank ubiquitous ones") {
    val top = Tfidf.topTerms(docs, "text", "doc_id", k = 1)
      .as[(Long, String, Double, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(top == Map(1L -> "apple", 2L -> "banana", 3L -> "cherry"))
    // 'common' (df = N) never wins despite appearing in every doc
  }

  test("topTerms: k bounds per-doc output, ranks dense from 1") {
    val got = Tfidf.topTerms(docs, "text", "doc_id", k = 2)
      .as[(Long, String, Double, Int)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc.values.forall(rows =>
      rows.length <= 2 && rows.map(_._4).sorted.sameElements(1 to rows.length)))
  }

  test("postings: sorted doc lists, hapax pruned") {
    val got = Tfidf.postings(docs, "text", "doc_id", minDf = 2L)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      "banana" -> ((2L, Seq(1L, 2L))),
      "cherry" -> ((2L, Seq(2L, 3L))),
      "common" -> ((3L, Seq(1L, 2L, 3L)))))
  }

  test("cooccurrence: pair counts and PMI sign") {
    val got = Tfidf.cooccurrence(docs, "text", "doc_id", minPairs = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // banana+common in docs 1,2; cherry+common in docs 2,3
    assert(got.keySet == Set(("banana", "common"), ("cherry", "common")))
    assert(got(("banana", "common"))._1 == 2L)
    // PMI of (2/3)/(2/3 * 1) = ln(1) = 0 exactly
    assert(got(("banana", "common"))._2 == 0.0)
  }
}
