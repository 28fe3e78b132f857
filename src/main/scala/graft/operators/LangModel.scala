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
    Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)), "term")
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
    val toks = Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)),
      "term", col(idCol))
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

  /** Per-GROUP cross-entropy against a trained unigram model — the
    * domain-shift report: score every token under `counts` (Laplace
    * smoothing, OOV as in `scoreDocs`) and aggregate by group instead
    * of by document. A source whose cross-entropy sits far above the
    * corpus norm is distributionally atypical — the dashboard row a
    * mixture-rebalancing pass reads. Integer micro-nat log-probs on
    * the vocabulary table keep the group sums exact.
    * Output: (grp, n_tokens, cross_entropy nats 6 dp, ppl 4 dp). */
  def crossEntropyByGroup(docs: DataFrame, textCol: String,
                          groupCol: String, counts: DataFrame): DataFrame = {
    val totals = counts.agg(sum(col("cnt")).as("__n"),
      count(lit(1)).as("__v"))
    val denom = col("__n") + col("__v") + 1
    val lp = counts.crossJoin(broadcast(totals))
      .select(col("term"),
        round(log((col("cnt") + 1).cast("double") / denom) * 1e6)
          .cast("long").as("__lpm"))
    val oov = totals.select(
      round(log(lit(1.0) / denom) * 1e6).cast("long").as("__oov"))
    Explodes.nonEmpty(docs, TextFns.tokens(col(textCol)), "term",
        col(groupCol).as("grp"))
      .join(broadcast(lp), Seq("term"), "left")
      .crossJoin(broadcast(oov))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__lpm"), col("__oov"))).as("__s"))
      .select(col("grp"), col("n_tokens"),
        round(-col("__s") / col("n_tokens") / 1e6, 6).as("cross_entropy"),
        round(exp(-col("__s") / col("n_tokens") / 1e6), 4).as("ppl"))
  }

  /** Bigram counts of the training corpus: (w1, w2, cnt) over
    * consecutive token pairs. Pair extraction is a zip of the token
    * array with its own tail — no window function, no self-join. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame = {
    val tk = TextFns.tokens(col(textCol))
    Explodes.nonEmpty(docs, arrays_zip(
        slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
        slice(tk, lit(2), greatest(size(tk) - 1, lit(0)))), "__p")
      .select(col("__p.0").as("w1"), col("__p.1").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
  }

  /** Score documents under an add-one-smoothed bigram model:
    * p(b|a) = (c(a,b)+1)/(c(a)+V+1), where V is the training
    * vocabulary size; an unseen context a (c(a)=0) degrades to
    * 1/(V+1). Same determinism contract as `scoreDocs`: every
    * distinct (pair | context | OOV) log-prob is rounded to integer
    * micro-nats on the model tables — vocabulary-sized, never per
    * occurrence — so per-document sums are exact long arithmetic.
    *
    * Scale shape: doc bigrams join the pair table on (w1,w2) and the
    * context table on w1 — both model-sized (broadcast for word-level
    * vocabularies); the fallback chain is one coalesce. Documents
    * with fewer than 2 tokens keep n_bigrams = 0 with null scores.
    * Output: idCol, n_bigrams, avg_logprob (6 dp), ppl (4 dp). */
  def scoreDocsBigram(docs: DataFrame, textCol: String, idCol: String,
                      uni: DataFrame, big: DataFrame): DataFrame = {
    val v = uni.agg(count(lit(1)).as("__v"))
    val ctx = uni.crossJoin(broadcast(v))
      .select(col("term").as("w1"),
        (col("cnt") + col("__v") + 1).as("__denom"))
    val pairLp = big.join(ctx, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(log((col("cnt") + 1).cast("double") / col("__denom")) * 1e6)
          .cast("long").as("__plpm"))
    val ctxLp = ctx.select(col("w1"),
      round(log(lit(1.0) / col("__denom")) * 1e6).cast("long").as("__clpm"))
    val oov = v.select(
      round(log(lit(1.0) / (col("__v") + 1)) * 1e6).cast("long").as("__oov"))
    val tk = TextFns.tokens(col(textCol))
    val docPairs = Explodes.nonEmpty(docs, arrays_zip(
        slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
        slice(tk, lit(2), greatest(size(tk) - 1, lit(0)))), "__p",
        col(idCol))
      .select(col(idCol), col("__p.0").as("w1"), col("__p.1").as("w2"))
    val scored = docPairs
      .join(broadcast(pairLp), Seq("w1", "w2"), "left")
      .join(broadcast(ctxLp), Seq("w1"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__plpm"), col("__clpm"), col("__oov"))).as("__s"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__s") / col("n_bigrams") / 1e6, 6).as("avg_logprob"),
        round(exp(-col("__s") / col("n_bigrams") / 1e6), 4).as("ppl"))
  }

  /** Stupid-backoff bigram scoring (Brants et al. 2007 — the
    * web-scale LM smoothing that skips normalization): S(w₂|w₁) =
    * c(w₁,w₂)/c(w₁) when the bigram was seen, else α·c(w₂)/N, else
    * α/(N+1) for OOV words — no discounting state, which is exactly
    * why it is the production choice at corpus scale. Same micro-nat
    * determinism contract as [[scoreDocsBigram]]: each distinct score
    * is rounded once on the model tables (vocabulary-sized), document
    * sums are exact longs. The fallback is ONE coalesce over two
    * broadcast joins — the backoff never branches per row. Output:
    * (idCol, n_bigrams, avg_logprob). */
  def scoreDocsBackoff(docs: DataFrame, textCol: String, idCol: String,
                       uni: DataFrame, big: DataFrame,
                       alpha: Double = 0.4): DataFrame = {
    val tot = uni.agg(sum(col("cnt")).as("__n"))
    val pairLp = big.select(col("w1"), col("w2"), col("cnt").as("__cb"))
      .join(uni.select(col("term").as("w1"), col("cnt").as("__cu")),
        Seq("w1"))
      .select(col("w1"), col("w2"),
        round(log(col("__cb").cast("double") / col("__cu")) * 1e6)
          .cast("long").as("__plpm"))
    val uniLp = uni.crossJoin(broadcast(tot))
      .select(col("term").as("w2"),
        round(log(lit(alpha) * col("cnt") / col("__n")) * 1e6)
          .cast("long").as("__ulpm"))
    val oov = tot.select(
      round(log(lit(alpha) / (col("__n") + 1)) * 1e6).cast("long")
        .as("__oov"))
    val tk = TextFns.tokens(col(textCol))
    val docPairs = Explodes.nonEmpty(docs, arrays_zip(
        slice(tk, lit(1), greatest(size(tk) - 1, lit(0))),
        slice(tk, lit(2), greatest(size(tk) - 1, lit(0)))), "__p",
        col(idCol))
      .select(col(idCol), col("__p.0").as("w1"), col("__p.1").as("w2"))
    val scored = docPairs
      .join(broadcast(pairLp), Seq("w1", "w2"), "left")
      .join(broadcast(uniLp), Seq("w2"), "left")
      .crossJoin(broadcast(oov))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(coalesce(col("__plpm"), col("__ulpm"), col("__oov")))
          .as("__s"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("__s") / col("n_bigrams") / 1e6, 6).as("avg_logprob"))
  }
}
