package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** BPE merge induction — the tokenizer-vocabulary learning pass of an
  * LLM data pipeline (Sennrich et al. 2016), run corpus-scale: count
  * adjacent symbol pairs weighted by word frequency, merge the most
  * frequent pair everywhere (greedy left-to-right, the reference BPE
  * semantics), repeat.
  *
  * Scale shape: the corpus is tokenized ONCE into a vocabulary-sized
  * (word, freq, symbols) frame — every subsequent step runs on that
  * vocabulary frame, never the corpus. Per step: one pair-count
  * aggregation + an argmax of ONE collected row (metadata-sized, the
  * same license as IVF's Lloyd loop) + a map-only merge fold. Each
  * step's frame is persisted and the predecessor released, so lineage
  * stays flat across k steps.
  *
  * Determinism: ties in the argmax break lexicographically on
  * (left, right); the merge fold is a pure function of the symbol
  * array. Both are replayed exactly by the SQL oracle (greedy merge =
  * mark positions, split runs of consecutive marks, merge the odd
  * run-positions — equivalent to the left-to-right fold).
  */
object Bpe {

  /** Greedy left-to-right single-pair merge over a symbol array:
    * fold with (out, pending) accumulator — pending symbol `l`
    * followed by `r` emits the merged symbol, anything else flushes
    * pending. */
  private[graft] def mergeOnce(syms: Column, l: String,
                               r: String): Column = {
    val acc0 = struct(array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(syms, acc0,
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === lit(l) && s === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            s.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
  }

  /** The vocabulary frame BPE iterates on: one corpus pass. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        filter(split(col("w"), ""), ch => ch =!= "").as("ss"))

  /** Learn `k` merges. Output: (step, left, right, cnt) — the ordered
    * merge table a tokenizer ships. */
  def learnMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordFreqs(docs, textCol).persist()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= k && !done) {
      val ss = col("ss")
      val pairs = words.select(col("freq"), explode(arrays_zip(
          slice(ss, lit(1), greatest(size(ss) - 1, lit(0))),
          slice(ss, lit(2), greatest(size(ss) - 1, lit(0))))).as("__p"))
        .select(col("freq"), col("__p.0").as("l"), col("__p.1").as("r"))
        .groupBy("l", "r").agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l, r, c))
        val next = words.withColumn("ss", mergeOnce(col("ss"), l, r))
          .persist()
        next.count() // materialize before releasing the parent
        words.unpersist()
        words = next
        step += 1
      }
    }
    words.unpersist()
    merges.toSeq.toDF("step", "left", "right", "cnt")
  }

  /** Apply a learned merge table to new text: the ENCODE side of the
    * tokenizer. Merges apply in step order (the BPE contract). The
    * fold chain runs once per DISTINCT word — vocabulary-sized, the
    * withAnnotationsDistinct budget trick — and token occurrences
    * join back against that small frame (AQE broadcasts it), so
    * encode cost scales with the vocabulary, not the token count.
    * Output: (idCol, w, pieces). `merges` must be small (it is
    * collected to drive plan construction, like the learn loop). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
             merges: DataFrame): DataFrame = {
    val ordered = merges.select("step", "left", "right")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2)))
    val toks = docs.select(col(idCol),
      explode(TextFns.tokens(col(textCol))).as("w"))
    val init = filter(split(col("w"), ""), ch => ch =!= "")
    val sym = ordered.foldLeft(init) { case (c, (l, r)) => mergeOnce(c, l, r) }
    val vocab = toks.select("w").distinct()
      .withColumn("pieces", sym)
    toks.join(vocab, Seq("w")).select(col(idCol), col("w"), col("pieces"))
  }
}
