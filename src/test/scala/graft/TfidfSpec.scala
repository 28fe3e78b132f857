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
}
