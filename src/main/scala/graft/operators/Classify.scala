package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Trained bag-of-words classification at corpus scale — the TRAINED
  * counterpart to the heuristic screens (`TextFns.langid`): learn
  * per-class unigram models from a labeled slice, score every
  * document under every class, take the argmax. This is the
  * label-propagation workhorse of a training-data pipeline (language
  * ID from a labeled seed, domain tagging, quality-tier routing).
  *
  * Scoring follows the `LangModel` determinism conventions exactly:
  * add-one smoothing, log-probabilities in integer MICRO-NATS
  * (round(ln·1e6) longs) so every per-document accumulation is exact
  * long arithmetic and a SQL oracle replays the scores bit-for-bit.
  * For class c with token count N_c over vocabulary V_c:
  * lpm(c,t) = round(ln((cnt+1)/(N_c+V_c+1))·1e6), OOV under c =
  * round(ln(1/(N_c+V_c+1))·1e6); score(d,c) = Σ_t lpm(c,t).
  * Argmax ties break lexicographically on the class label.
  *
  * Scale shape: the model is vocabulary-sized metadata — it broadcasts
  * into both the present-term join and the per-class fill — and the
  * corpus-sized work is ONE token explode + one (doc, class)
  * aggregation. The documents never shuffle by anything but doc id.
  */
object Classify {

  /** Train per-class unigram profiles: (label, term, cnt) plus the
    * per-class totals the scorer needs. One aggregation. */
  def trainBow(train: DataFrame, textCol: String,
               labelCol: String): DataFrame =
    Explodes.nonEmpty(train, TextFns.tokens(col(textCol)), "term",
        col(labelCol).as("label"))
      .groupBy("label", "term").agg(count(lit(1)).as("cnt"))

  /** Classify `docs` under the trained `profile` (from [[trainBow]]).
    * Output: (idCol, pred, score_micro) — the winning class and its
    * total micro-nat log-likelihood. Token-less documents get the
    * lexicographically first class with score 0 (every class scores
    * an empty document identically). */
  def classifyBow(docs: DataFrame, textCol: String, idCol: String,
                  profile: DataFrame): DataFrame = {
    // PIN the profile and its per-class totals (optimization r16):
    // totals feeds THREE legs (lp, oov, firstClass) and lp reads the
    // profile besides — unpinned, the training token explode + agg
    // re-ran once per leg (4 passes over the train corpus; QueryProf
    // measured q_c_prf re-running the whole train at 4× through its
    // metric legs). Both frames are metadata-sized by the scale-shape
    // contract above (vocab × classes / classes rows), never corpus.
    val prof = profile.localCheckpoint(true)
    val totals = prof.groupBy("label")
      .agg(sum(col("cnt")).as("__n"), count(lit(1)).as("__v"))
      .localCheckpoint(true)
    val denom = col("__n") + col("__v") + 1
    val lp = prof.join(totals, Seq("label"))
      .select(col("label"), col("term"),
        round(log((col("cnt") + 1).cast("double") / denom) * 1e6)
          .cast("long").as("__lpm"))
    val oov = totals.select(col("label"),
      round(log(lit(1.0) / denom) * 1e6).cast("long").as("__oov"))
    val toks = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
      "term", col(idCol))
    // present-term partial scores per (doc, class): only classes whose
    // vocabulary contains the term produce rows here
    val present = toks.join(broadcast(lp), Seq("term"))
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("__lpm")).as("__sp"), count(lit(1)).as("__np"))
    val lens = toks.groupBy(col(idCol)).agg(count(lit(1)).as("__len"))
    // fill every class for every doc: absent (doc, class) pairs score
    // len · oov; present ones add (len − n_present) · oov
    val full = lens.crossJoin(broadcast(oov))
      .join(present, Seq(idCol.toString, "label"), "left")
      .select(col(idCol), col("label"),
        (coalesce(col("__sp"), lit(0L)) +
          (col("__len") - coalesce(col("__np"), lit(0L))) * col("__oov"))
          .as("score_micro"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score_micro").desc, col("label").asc)
    val winners = full.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("label").as("pred"), col("score_micro"))
    val firstClass = totals.agg(min(col("label")).as("__fc"))
    docs.select(col(idCol)).join(winners, Seq(idCol.toString), "left")
      .crossJoin(broadcast(firstClass))
      .select(col(idCol),
        coalesce(col("pred"), col("__fc")).as("pred"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** Per-class precision / recall / F1 of [[classifyBow]] predictions
    * against a truth column — the evaluation face of the trained
    * classifier (confusion gives the matrix; this gives the headline
    * numbers). F1 comes straight from integer counts
    * (2tp / (2tp + fp + fn)), never from composed rounded values, so
    * each metric is ONE division of exact longs. Classes appearing
    * only as predictions (or only as truth) still get a row.
    * Three count aggregations + a classes-sized join. */
  def prfByClass(preds: DataFrame, truth: DataFrame, idCol: String,
                 labelCol: String): DataFrame = {
    // PIN the scored pairs (optimization r16): four metric legs below
    // (classes ×2 via the union, tp, per-truth, per-pred counts) each
    // re-ran the ENTIRE classifier pipeline unpinned — the train
    // explode, the broadcast scoring join and the winner window, 4×.
    // (truth, pred) is two small columns per test doc — bounded.
    val base = preds
      .join(truth.select(col(idCol), col(labelCol).as("__truth")),
        Seq(idCol))
      .select(col("__truth").as("truth"), col("pred"))
      .localCheckpoint(true)
    val classes = base.select(col("truth").as("cls"))
      .union(base.select(col("pred").as("cls"))).distinct()
    val tp = base.filter(col("truth") === col("pred"))
      .groupBy(col("truth").as("cls")).agg(count(lit(1)).as("__tp"))
    val tn = base.groupBy(col("truth").as("cls"))
      .agg(count(lit(1)).as("__nt"))
    val pn = base.groupBy(col("pred").as("cls"))
      .agg(count(lit(1)).as("__np"))
    val j = classes.join(tp, Seq("cls"), "left")
      .join(tn, Seq("cls"), "left").join(pn, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("__nt"), lit(0L)).as("n_truth"),
        coalesce(col("__np"), lit(0L)).as("n_pred"),
        coalesce(col("__tp"), lit(0L)).as("tp"))
    def ratioMicro(num: Column, den: Column): Column =
      when(den === 0, lit(0L)).otherwise(
        round(num.cast("double") / den.cast("double") * 1e6)
          .cast("long"))
    j.select(col("cls"), col("n_truth"), col("n_pred"), col("tp"),
      ratioMicro(col("tp"), col("n_pred")).as("precision_micro"),
      ratioMicro(col("tp"), col("n_truth")).as("recall_micro"),
      ratioMicro(lit(2) * col("tp"),
        lit(2) * col("tp") + (col("n_pred") - col("tp")) +
          (col("n_truth") - col("tp"))).as("f1_micro"))
  }

  /** Confusion matrix of [[classifyBow]] predictions against a truth
    * column: (truth, pred, n). */
  def confusion(preds: DataFrame, truth: DataFrame, idCol: String,
                truthCol: String): DataFrame =
    preds.join(truth.select(col(idCol), col(truthCol).as("truth")),
        Seq(idCol.toString))
      .groupBy("truth", "pred").agg(count(lit(1)).as("n"))

  /** Exact tie-aware ROC AUC of a numeric score against a boolean
    * label — the threshold-free quality number for any learned
    * data-selection score (quality model, dedup score, toxicity
    * screen). AUC = P(score⁺ > score⁻) + ½P(tie), computed from the
    * Mann-Whitney U statistic in EXACT integer arithmetic: group to
    * distinct score values (n₁, n₀ per value), prefix-sum the
    * negatives below each value, then U·2 = Σ n₁·(2·C₀ + n₀) — all
    * longs, one float division at the very end.
    *
    * Scale shape: the corpus-sized work is one hash aggregation to
    * distinct scores. The prefix sum uses the `partitionOffsets`
    * skeleton (range-repartition + per-partition offsets — metadata
    * collect, never data), NOT a single-task global window, so a
    * billion distinct scores still spread across the cluster. U·2
    * accumulates as decimal(38,0): at 10¹² rows U ~ n²/4 ~ 10²³
    * overflows a long; decimal stays exact and one cast to double at
    * the end is the only rounding. Output: one row
    * (n_pos, n_neg, auc_micro); auc_micro null when either class is
    * empty. */
  def auc(df: DataFrame, scoreCol: String, positive: Column): DataFrame = {
    val base = df.filter(col(scoreCol).isNotNull)
      .select(col(scoreCol).as("__s"),
        when(positive, 1L).otherwise(0L).as("__p"))
    val byScore = base.groupBy("__s")
      .agg(sum(col("__p")).as("__n1"), sum(lit(1L) - col("__p")).as("__n0"))
    val (withPid, offsets, _) = Batching.partitionOffsets(byScore,
      Seq(col("__s")), coalesce(sum(col("__n0")), lit(0L)), 0)
    val w = Window.partitionBy("__pid").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = withPid.join(broadcast(offsets), Seq("__pid"))
      .withColumn("__c0",
        col("__offset") + sum(col("__n0")).over(w) - col("__n0"))
      .select((col("__n1").cast("decimal(38,0)") *
        (lit(2L) * col("__c0") + col("__n0"))).cast("decimal(38,0)")
        .as("__u2"),
        col("__n1"), col("__n0"))
    terms
      .agg(sum(col("__n1")).as("n_pos"), sum(col("__n0")).as("n_neg"),
        sum(col("__u2")).as("__u2s"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__u2s").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")) * 1e6).cast("long"))
          .as("auc_micro"))
  }

  /** Reliability diagram (calibration bins): equal-width bins over the
    * observed score range — identical bin-edge semantics to
    * `Profile.histogram` — with the per-bin positive rate and mean
    * score, both from exact integer sums (scores in micro-units before
    * summing, so partial-aggregation order can't leak). A
    * well-calibrated score has mean_score ≈ pos_rate per bin; the gap
    * column is the per-bin calibration error. One extrema pass + one
    * hash aggregation. Output: (bin, n, n_pos, mean_score_micro,
    * pos_rate_micro, gap_micro). */
  def calibrationBins(df: DataFrame, scoreCol: String, positive: Column,
                      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val nonNull = df.filter(col(scoreCol).isNotNull)
    val b = nonNull.agg(min(col(scoreCol)).cast("double").as("__lo"),
      max(col(scoreCol)).cast("double").as("__hi"))
    nonNull.crossJoin(broadcast(b))
      .withColumn("bin",
        Profile.equiWidthBin(col(scoreCol), col("__lo"), col("__hi"), bins))
      .withColumn("__p", when(positive, 1L).otherwise(0L))
      .withColumn("__sm", round(col(scoreCol) * 1e6).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("n_pos"),
        sum(col("__sm")).as("__ssum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__ssum").cast("double") / col("n")).cast("long")
          .as("mean_score_micro"),
        round(col("n_pos").cast("double") / col("n") * 1e6).cast("long")
          .as("pos_rate_micro"))
      .withColumn("gap_micro",
        abs(col("mean_score_micro") - col("pos_rate_micro")))
  }
}
