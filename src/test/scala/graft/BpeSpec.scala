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

  // sf0.001 documents give a real vocabulary with plenty of argmax
  // ties and overlapping-pair words — the adversarial surface for
  // both parity claims below.
  private def corpus = {
    // deep fold-chain / iterative plans render huge EXPLAIN strings
    // under AQE; cap them so the suite measures compute, not printing
    spark.conf.set("spark.sql.maxPlanStringLength", 64 * 1024)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  }

  test("learnMerges: local path == distributed path, k=20") {
    val local = Bpe.learnMerges(corpus, "text", k = 20)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val dist = Bpe.learnMerges(corpus, "text", k = 20,
        localSymbolCap = 0L)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(local == dist)
  }

  test("batched distributed rounds: disjoint picks merge together, " +
    "overlaps defer, independent tops match sequential") {
    // overlapping pairs: 'x y' outranks 'y z' but shares y — a batch=2
    // round must pick only (x,y), then the next round picks the pair
    // sequential BPE would ((x y, z) once xy exists). Independent
    // words c d / e f have disjoint top pairs that batch together.
    // words (BPE merges chars WITHIN words): xyz -> pairs (x,y)/(y,z)
    // tied at 50; cd and ef are independent
    val docs = (
      Seq.fill(50)("xyz") ++ Seq.fill(30)("cd") ++ Seq.fill(20)("ef")
    ).toDF("text")
    val seqTable = Bpe.learnMerges(docs, "text", k = 4,
        localSymbolCap = 0L)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val batTable = Bpe.learnMerges(docs, "text", k = 4,
        localSymbolCap = 0L, batch = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // sequential: (x,y) then the pair its merge CREATED, (xy,z) at 50,
    // before (c,d) at 30 — the exact divergence the scaladoc documents
    assert(seqTable.map(m => (m._2, m._3)) ==
      Seq(("x", "y"), ("xy", "z"), ("c", "d"), ("e", "f")), seqTable)
    // batched round 1: (x,y) picked, (y,z) deferred (shares y), (c,d)
    // batched alongside (disjoint); round 2 picks (xy,z) then (e,f).
    // Same merge SET, order diverges exactly where documented
    assert(batTable.map(m => (m._2, m._3)) ==
      Seq(("x", "y"), ("c", "d"), ("xy", "z"), ("e", "f")), batTable)
    assert(batTable.map(m => (m._2, m._3)).toSet ==
      seqTable.map(m => (m._2, m._3)).toSet)
  }

  test("batched distributed rounds: batch=1 is exactly the sequential path") {
    val seqTable = Bpe.learnMerges(corpus, "text", k = 8,
        localSymbolCap = 0L)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val b1 = Bpe.learnMerges(corpus, "text", k = 8,
        localSymbolCap = 0L, batch = 1)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(seqTable == b1)
  }

  test("encode: compiled kernel == mergeOnce fold chain, k=25") {
    val merges = Bpe.learnMerges(corpus, "text", k = 25)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Seq[String])].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
    val kernel = rows(Bpe.encode(corpus, "text", "doc_id", merges))
    val fold = rows(Bpe.encodeFoldChain(corpus, "text", "doc_id", merges))
    assert(kernel.size == fold.size)
    assert(kernel == fold)
  }

  test("learnMerges at k=100 stays fast on the local path") {
    val t0 = System.nanoTime()
    val merges = Bpe.learnMerges(corpus, "text", k = 100)
      .as[(Int, String, String, Long)].collect()
    val secs = (System.nanoTime() - t0) / 1e9
    // the sf0.001 vocabulary exhausts its pair space before 100 —
    // learning stops when no adjacent pair remains, like the
    // distributed path's empty-argmax stop
    assert(merges.length >= 60 && merges.length <= 100)
    // counts strictly positive and steps contiguous
    assert(merges.map(_._1).sorted.toSeq == (1 to merges.length))
    assert(merges.forall(_._4 > 0))
    assert(secs < 60.0, s"k=100 learn took ${secs}s — scale path broken?")
  }
}
