package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  // deliberately symmetric: both classes have N = 8 tokens over
  // V = 7 distinct terms, so their smoothing denominators (and
  // therefore their OOV scores) are IDENTICAL — that is what makes
  // the tie test below a true tie
  private val train = Seq(
    (1L, "en", "the quick brown fox"),
    (2L, "en", "the lazy dog sleeps"),
    (3L, "es", "el perro duerme bajo"),
    (4L, "es", "el zorro salta la"))
    .toDF("doc_id", "lang", "text")

  test("classifyBow: held-out docs route to the right language model") {
    val profile = Classify.trainBow(train, "text", "lang")
    val test = Seq(
      (10L, "the fox sleeps"),
      (11L, "el sol duerme"),
      (12L, "")) // token-less: lexicographically first class
    .toDF("doc_id", "text")
    val preds = Classify.classifyBow(test, "text", "doc_id", profile)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(preds == Map(10L -> "en", 11L -> "es", 12L -> "en"))
  }

  test("classifyBow is deterministic on score ties (label order)") {
    val profile = Classify.trainBow(train, "text", "lang")
    // a doc of only out-of-vocabulary terms scores len*oov under both
    // classes; both classes here have IDENTICAL (N, V) so the scores
    // tie exactly and 'en' < 'es' must win
    val test = Seq((20L, "zzz qqq www")).toDF("doc_id", "text")
    val got = Classify.classifyBow(test, "text", "doc_id", profile)
      .as[(Long, String, Long)].collect().head
    assert(got._2 == "en")
  }

  test("confusion counts match a manual tally") {
    val profile = Classify.trainBow(train, "text", "lang")
    val test = Seq(
      (30L, "en", "the dog jumps"),
      (31L, "en", "el perro the"),
      (32L, "es", "el sol bajo la cerca"))
      .toDF("doc_id", "lang", "text")
    val conf = Classify.confusion(
        Classify.classifyBow(test, "text", "doc_id", profile),
        test, "doc_id", "lang")
      .as[(String, String, Long)].collect().toSet
    // every cell count positive and totals = 3
    assert(conf.toSeq.map(_._3).sum == 3L)
    assert(conf.forall(c => c._3 > 0))
    // the clean docs classify correctly
    assert(conf.contains(("en", "en", 1L)) || conf.contains(("en", "en", 2L)))
    assert(conf.exists(c => c._1 == "es" && c._2 == "es"))
  }

  test("prfByClass: hand-computed metrics, pred-only class gets a row") {
    // truth: a a a b; pred: a b a c
    val preds = Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("id", "pred")
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"))
      .toDF("id", "lbl")
    val got = Classify.prfByClass(preds, truth, "id", "lbl")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a: truth 3, pred 2, tp 2 -> P 1.0, R 2/3, F1 4/5
    assert(got("a") == ((3L, 2L, 2L, 1000000L, 666667L, 800000L)))
    // b: truth 1, pred 1, tp 0 -> all zero
    assert(got("b") == ((1L, 1L, 0L, 0L, 0L, 0L)))
    // c: pred-only class still reported
    assert(got("c") == ((0L, 1L, 0L, 0L, 0L, 0L)))
  }
}
