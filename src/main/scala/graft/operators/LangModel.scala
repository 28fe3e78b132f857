package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Unigram language-model quality scoring — the KenLM-shaped
  * perplexity filter of a training-data pipeline: train token counts
  * on a reference corpus, score every candidate document by its mean
  * token log-probability, drop the tail.
  *
  * Scale shape: training is ONE hash aggregation over exploded
  * tokens; the per-term log-probs are computed once on the
  * vocabulary-sized count table (never per token occurrence) and the
  * scoring join is token→vocabulary — broadcast for word-level
  * vocabularies. No driver-side counts: corpus totals ride along as a
  * broadcast 1-row frame.
  *
  * Determinism: log-probs are rounded to integer micro-nats
  * (round(ln(p)·1e6)) per TERM, so per-document sums are exact long
  * arithmetic — order-independent across partitionings and engines
  * (the same trick as Graph.pageRankInt).
  */
object LangModel {

  /** Unigram counts of the training corpus: (term, cnt). */
  def unigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))

  /** Score documents against trained `counts`. Laplace smoothing:
    * p(t) = (cnt+1)/(N+V+1), out-of-vocabulary p = 1/(N+V+1).
    *
    * Output: idCol, `n_tokens`, `avg_logprob` (mean ln p, 6 dp),
    * `ppl` (per-token perplexity e^(−avg), 4 dp); empty documents
    * keep n_tokens = 0 with null scores.
    */
  def scoreDocs(docs: DataFrame, textCol: String, idCol: String,
                counts: DataFrame): DataFrame = {
    val totals = counts.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__v"))
    val denom = col("__n") + col("__v") + 1
    val lp = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((col("cnt") + 1).cast("double") / denom) * 1e6)
          .cast("long").as("__lpm"))
    val oov = totals.select(
      round(log(lit(1.0) / denom) * 1e6).cast("long").as("__oov"))
    val toks = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("term"))
    val scored = toks
      .join(broadcast(lp), Seq("term"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__lpm"), col("__oov"))).as("__s"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("__s") / col("n_tokens") / 1e6, 6).as("avg_logprob"),
        round(exp(-col("__s") / col("n_tokens") / 1e6), 4).as("ppl"))
  }
}
