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

  test("auc: perfect separation, ties, and reversal hand-checked") {
    import org.apache.spark.sql.functions.col
    // positives at 3,4 all above negatives at 1,2 -> AUC 1
    val perfect = Seq((1.0, "n"), (2.0, "n"), (3.0, "p"), (4.0, "p"))
      .toDF("s", "l")
    val a1 = Classify.auc(perfect, "s", col("l") === "p").collect().head
    assert((a1.getLong(0), a1.getLong(1), a1.getLong(2)) == ((2L, 2L, 1000000L)))
    // every score tied -> AUC exactly 1/2 (the tie half-credit)
    val tied = Seq((5.0, "n"), (5.0, "p"), (5.0, "n"), (5.0, "p"))
      .toDF("s", "l")
    val a2 = Classify.auc(tied, "s", col("l") === "p").collect().head
    assert(a2.getLong(2) == 500000L)
    // 3 pos vs 1 neg: pairs (1,2) discordant, (3,2)/(4,2) concordant
    // -> AUC 2/3
    val inv = Seq((1.0, "p"), (2.0, "n"), (3.0, "p"), (4.0, "p"))
      .toDF("s", "l")
    val a3 = Classify.auc(inv, "s", col("l") === "p").collect().head
    assert(a3.getLong(2) == 666667L)
    // single-class input -> null AUC
    val onlyPos = Seq((1.0, "p"), (2.0, "p")).toDF("s", "l")
    val a4 = Classify.auc(onlyPos, "s", col("l") === "p").collect().head
    assert(a4.isNullAt(2))
  }

  test("calibrationBins: well-calibrated bins show zero gap") {
    import org.apache.spark.sql.functions.col
    // scores 0.0 and 1.0; positives exactly when score = 1.0 ->
    // bin 0 rate 0, bin 9 rate 1, both gaps 0
    val df = Seq((0.0, "n"), (0.0, "n"), (1.0, "p"), (1.0, "p"),
      (1.0, "p")).toDF("s", "l")
    val got = Classify.calibrationBins(df, "s", col("l") === "p", 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(0L, 9L))
    assert(got(0L).getAs[Long]("n") == 2L)
    assert(got(0L).getAs[Long]("n_pos") == 0L)
    assert(got(0L).getAs[Long]("gap_micro") == 0L)
    assert(got(9L).getAs[Long]("mean_score_micro") == 1000000L)
    assert(got(9L).getAs[Long]("pos_rate_micro") == 1000000L)
    assert(got(9L).getAs[Long]("gap_micro") == 0L)
    // a miscalibrated bin: score 0.5 but rate 1.0 -> gap 500000
    val off = Seq((0.5, "p"), (0.5, "p"), (0.0, "n")).toDF("s", "l")
    val g2 = Classify.calibrationBins(off, "s", col("l") === "p", 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g2(9L).getAs[Long]("gap_micro") == 500000L)
  }
}
