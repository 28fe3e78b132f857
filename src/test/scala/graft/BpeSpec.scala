package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-traced merge sequence with greedy semantics") {
    // corpus: "low" x3, "lower" x1 → pairs: (l,o) 4, (o,w) 4, (w,e) 1,
    // (e,r) 1. Tie (l,o) vs (o,w): lexicographic → (l,o) first.
    val docs = Seq((1L, "low low lower"), (2L, "low")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(docs, "text", k = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(got(0) == ((1, "l", "o", 4L)))
    // after merge 1: words are [lo w] and [lo w e r] → (lo,w) 4 wins
    assert(got(1) == ((2, "lo", "w", 4L)))
    // after merge 2: [low], [low e r] → (e,r) ties (low,e) at 1;
    // lexicographic: "e" < "low"
    assert(got(2) == ((3, "e", "r", 1L)))
  }

  test("mergeOnce greedy: run of identical symbols merges every other") {
    val df = Seq(Seq("a", "a", "a", "a", "a")).toDF("ss")
    val got = df.select(Bpe.mergeOnce(col("ss"), "a", "a").as("m"))
      .as[Seq[String]].collect().head
    assert(got == Seq("aa", "aa", "a"))
  }

  test("encode applies merges in step order") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, "text", k = 2)
    val enc = Bpe.encode(Seq((9L, "low slow")).toDF("doc_id", "text"),
      "text", "doc_id", merges)
      .as[(Long, String, Seq[String])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(enc("low") == Seq("low"))
    assert(enc("slow") == Seq("s", "low"))
  }
}
