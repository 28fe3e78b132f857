package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Benchmark decontamination: flag (and drop) training documents that
  * share word n-grams with an evaluation/benchmark corpus — the
  * standard pre-training hygiene pass (cf. Brown et al. 2020 §C, the
  * 13-gram overlap rule).
  *
  * Scale shape: the benchmark side is distinct-hashed first (its
  * n-gram vocabulary is tiny next to a 100 TB train corpus) and used
  * as the build side of a semi join on the 60-bit n-gram hash — AQE
  * broadcasts it when it fits, otherwise it is a hash semi join on a
  * single shuffle of the exploded train grams. The train side uses the
  * compiled `NgramHashes` kernel, so no n-gram strings are ever
  * materialized.
  */
object Decontaminate {

  /** Per-train-document overlap accounting: distinct n-gram count,
    * how many of those appear anywhere in `bench`, and the
    * contamination ratio. Documents shorter than `n` tokens report
    * `n_grams = 0, contamination = 0`. */
  def overlapReport(train: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int = 13): DataFrame = {
    val benchGrams = bench
      .select(explode(TextFns.ngramHashesNative(col(textCol), n)).as("ngram_hash"))
      .distinct()
      .withColumn("__hit", lit(1L))
    // ONE tokenization pass over the train side: the exploded frame
    // yields both the per-doc gram count and the hit count (bench
    // marked by a left join against the distinct bench vocabulary —
    // each train gram matches at most one bench row)
    val trainGrams = train.select(col(idCol).as("doc_id"),
      explode(array_distinct(TextFns.ngramHashesNative(col(textCol), n)))
        .as("ngram_hash"))
    val perDoc = trainGrams.join(benchGrams, Seq("ngram_hash"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum("__hit"), lit(0L)).as("n_hits"))
    // cheap id-only pass restores sub-n documents (zero grams)
    train.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contamination",
        round(col("n_hits") / greatest(col("n_grams"), lit(1L)), 6))
  }

  /** Drop train documents whose contamination ratio exceeds
    * `maxRatio` (default 0: any shared n-gram disqualifies). Returns
    * the surviving rows with their original schema. */
  def decontaminate(train: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int = 13,
                    maxRatio: Double = 0.0): DataFrame = {
    val dirty = overlapReport(train, bench, textCol, idCol, n)
      .filter(col("contamination") > maxRatio)
      .select("doc_id")
    train.join(dirty, train(idCol) === dirty("doc_id"), "left_anti")
  }
}
