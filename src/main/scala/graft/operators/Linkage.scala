package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.plans.{DamerauLevenshtein, JaroSimilarity, JaroWinklerSimilarity}

/** Probabilistic record linkage — the capability the reference's
  * patient-matching flows approximate with exact-ID joins
  * (`workflows/pedmatch-clinical-vcf-workflow.py:757` batches patients
  * by exact participant ID; `mci_clinical_variant_merge.py` joins on
  * exact sample IDs). At registry scale IDs drift (re-accessioned
  * samples, typo'd participant codes), and the standard fix is
  * Fellegi-Sunter scoring over blocked candidate pairs.
  *
  * Scale shape: candidate generation is a blocked self-join (never
  * all-pairs); u-probabilities come from per-field value-frequency
  * aggregations (k tiny shuffles, each one column); the weights ride
  * to the pair join as a broadcast 1-row frame. Scoring is integer
  * micro-nat arithmetic (the LangModel/pageRankInt determinism
  * recipe), so scores are exact longs — order- and engine-independent.
  */
object Linkage {

  /** Jaro similarity as a codegen'd column (graft.plans.JaroSimilarity). */
  def jaroSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaroSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Jaro-Winkler similarity (prefix boost 0.1/cap 4, threshold 0.7). */
  def jaroWinklerSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Full Damerau-Levenshtein distance (adjacent transpositions with
    * the alphabet table: ca -> abc costs 2). */
  def damerauLev(a: Column, b: Column): Column =
    ColumnBridge.column(DamerauLevenshtein(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Token-sort normalized edit similarity (the fuzzywuzzy
    * "token_sort_ratio" shape, in micro-units): both sides are
    * tokenized on single spaces, sorted, rejoined, then scored
    * 1 − lev/max(len) — word-order-insensitive matching ("bolt small"
    * ≡ "small bolt" → 1 000 000). Pure builtin Columns (split /
    * array_sort / levenshtein), fully codegen'd. Both-empty → 1e6. */
  def tokenSortRatio(a: Column, b: Column): Column = {
    val sa = array_join(array_sort(split(a, " ")), " ")
    val sb = array_join(array_sort(split(b, " ")), " ")
    val mx = greatest(length(sa), length(sb))
    when(mx === 0, lit(1000000L)).otherwise(
      round((lit(1.0) - levenshtein(sa, sb).cast("double") /
        mx.cast("double")) * 1e6).cast("long"))
  }

  /** Edit-similarity profile of the value space: each DISTINCT value
    * of `strCol` paired with its successor in sort order, scored by
    * all five edit measures — a cheap data-quality report:
    * near-identical adjacent keys are exactly where ID drift shows
    * up. Adjacency comes from the range-partitioned global index
    * (`Batching.partitionOffsets` — the `snmPairs` convention), so
    * there is NO single-task global window: a registry-scale value
    * space sorts in parallel and pairs by index join.
    *
    * Output: `s_a`, `s_b`, `jaro_micro`, `jw_micro` (round(sim*1e6)
    * as long — the integer-unit determinism recipe), `dl_dist`,
    * `lev_dist`, `toksort_micro`. The final value (no successor) is
    * dropped.
    */
  def neighborDistances(df: DataFrame, strCol: String,
                        numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(strCol).cast("string").as("s_a"))
      .filter(col("s_a").isNotNull).distinct()
    val (withPid, offsetDf, _) = Batching.partitionOffsets(base,
      Seq(col("s_a")), count(lit(1)), numPartitions)
    val w = Window.partitionBy("__pid").orderBy(col("s_a"))
    val idx = withPid.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__idx", col("__offset") + row_number().over(w))
      .select(col("s_a"), col("__idx"))
    idx.join(
        idx.select(col("s_a").as("s_b"),
          (col("__idx") - 1).as("__idx")), Seq("__idx"))
      .select(col("s_a"), col("s_b"),
        round(jaroSim(col("s_a"), col("s_b")) * 1e6).cast("long")
          .as("jaro_micro"),
        round(jaroWinklerSim(col("s_a"), col("s_b")) * 1e6).cast("long")
          .as("jw_micro"),
        damerauLev(col("s_a"), col("s_b")).as("dl_dist"),
        levenshtein(col("s_a"), col("s_b")).as("lev_dist"),
        tokenSortRatio(col("s_a"), col("s_b")).as("toksort_micro"))
  }

  /** Fellegi-Sunter pair scoring with equality-agreement fields.
    *
    * Candidates: the blocked self-join on `blockCols` (id_a < id_b).
    * For each field f in `fieldExprs` (name -> SQL expression over the
    * record), the u-probability — P(two RANDOM records agree on f) —
    * is estimated from the value-frequency distribution as
    * sum(cnt_v^2) / N^2 (with-replacement convention, documented:
    * keeps the estimate a ratio of two exact integers so both engines
    * divide the same longs). The m-probability is the caller's
    * constant (default 0.95 — "5% typo rate on true matches").
    *
    * Agreement weight  wA = round(ln(m/u)     * 1e6)  micro-nats
    * Disagreement      wD = round(ln((1-m)/(1-u)) * 1e6)
    * score_unats = sum over fields of (agree ? wA : wD) — pure long
    * arithmetic after the per-FIELD rounding, so the per-pair score is
    * exact (same recipe as LangModel.scoreDocs).
    *
    * Output: id_a, id_b, n_agree, score_unats, one `agree_<name>`
    * int flag per field. Null fields never agree (null-safe equality
    * would claim two missing values match — wrong for linkage).
    */
  /** One-row frame of per-field agreement/disagreement weights in
    * micro-nats: `__wa_<name>` / `__wd_<name>` per field, derived
    * from the value-frequency u-estimate sum(cnt^2)/N^2 and the
    * caller's m constant. Shared by `fellegiSunter` (batch pair
    * scoring) and `StreamOps.linkageScoreStream` (stream-static). */
  def fieldWeights(df: DataFrame, fieldExprs: Seq[(String, String)],
                   m: Double = 0.95): DataFrame = {
    require(fieldExprs.nonEmpty, "need at least one comparison field")
    // ALL per-field value-frequency tables in ONE scan: GROUPING SETS
    // ((f1),(f2),…) — one Expand(k) + one hash agg instead of k full
    // passes over the table (the difference between k and 1 table
    // scans at registry scale). grouping_id() separates the sets, so
    // a field's real nulls stay a countable group.
    val fcols = fieldExprs.map { case (name, _) => col(s"__f_$name") }
    val base = df.select(fieldExprs.map { case (name, ex) =>
      expr(ex).as(s"__f_$name")
    }: _*)
    val k = fieldExprs.length
    def gidOf(i: Int): Long = (1L << k) - 1 - (1L << (k - 1 - i))
    val counts = base
      .groupingSets(fieldExprs.map { case (name, _) =>
        Seq(col(s"__f_$name"))
      }, fcols: _*)
      .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
    // k-row frame: (gid, u) with u = Σ c_v² / N² over NON-NULL value
    // groups only — scorePairs never lets null=null agree, so the
    // null group must not contribute agreement mass (else weights on
    // sparse fields are biased mild). The numerator is clamped into
    // [1, N²−1] so a constant or all-null field yields finite
    // weights instead of ln(0)/ln(∞); N keeps counting ALL records
    // (null pairs are disagreeing pairs of the universe).
    val ownNotNull = fieldExprs.zipWithIndex.map { case ((name, _), i) =>
      (col("__gid") === gidOf(i)) && col(s"__f_$name").isNotNull
    }.reduce(_ || _)
    val us = counts.groupBy(col("__gid"))
      .agg((least(
        greatest(sum(when(ownNotNull, col("__c") * col("__c"))
          .otherwise(0L)), lit(1L)),
        sum(col("__c")) * sum(col("__c")) - 1).cast("double") /
        (sum(col("__c")) * sum(col("__c"))).cast("double")).as("__u"))
    val urow = us.agg(
      max(when(col("__gid") === gidOf(0), col("__u")))
        .as(s"__u_${fieldExprs.head._1}"),
      fieldExprs.zipWithIndex.tail.map { case ((name, _), i) =>
        max(when(col("__gid") === gidOf(i), col("__u"))).as(s"__u_$name")
      }: _*)
    urow.select(fieldExprs.flatMap { case (name, _) =>
      Seq(
        round(log(lit(m) / col(s"__u_$name")) * 1e6).cast("long")
          .as(s"__wa_$name"),
        round(log(lit(1.0 - m) / (lit(1.0) - col(s"__u_$name"))) * 1e6)
          .cast("long").as(s"__wd_$name"))
    }: _*)
  }

  /** Scores a pre-joined pair frame holding `__fa_<name>` /
    * `__fb_<name>` value pairs plus the broadcast weight columns:
    * appends n_agree / score_unats / agree_<name> flags. */
  private[graft] def scorePairs(withWeights: DataFrame,
                                fieldExprs: Seq[(String, String)],
                                keep: Seq[Column]): DataFrame = {
    val agreeCols = fieldExprs.map { case (name, _) =>
      (col(s"__fa_$name").isNotNull && col(s"__fb_$name").isNotNull &&
        (col(s"__fa_$name") === col(s"__fb_$name"))).as(s"__ag_$name")
    }
    val withAg = withWeights.select(col("*") +: agreeCols: _*)
    val score = fieldExprs.map { case (name, _) =>
      when(col(s"__ag_$name"), col(s"__wa_$name"))
        .otherwise(col(s"__wd_$name"))
    }.reduce(_ + _)
    val nAgree = fieldExprs.map { case (name, _) =>
      col(s"__ag_$name").cast("int")
    }.reduce(_ + _)
    withAg.select(
      (keep ++ Seq(nAgree.as("n_agree"), score.as("score_unats")) ++
        fieldExprs.map { case (name, _) =>
          col(s"__ag_$name").cast("int").as(s"agree_$name")
        }): _*)
  }

  def fellegiSunter(df: DataFrame, idCol: String, blockCols: Seq[String],
                    fieldExprs: Seq[(String, String)],
                    m: Double = 0.95): DataFrame = {
    val weights = fieldWeights(df, fieldExprs, m)
    // field values are computed ONCE per record, pre-join — the pair
    // join then only compares precomputed scalars
    val proj = fsProjection(df, idCol, blockCols, fieldExprs)
    pairAndScore(proj, weights, blockCols, fieldExprs)
  }

  /** Scored pairs from blocks at or under `maxBlock`, plus the
    * oversized-block report. */
  case class FsCandidates(scores: DataFrame, oversized: DataFrame)

  /** `fellegiSunter` with a block-size cap — the 100 TB guard rail.
    *
    * Blocked pair generation is Θ(Σ block²): one degenerate blocking
    * value (an empty string, a default date, a top-city key) turns
    * the whole job into that block's quadratic. Real linkage at scale
    * caps the block size and REPORTS what it skipped — the operator
    * must not silently degrade recall, and the report is the signal
    * to refine the blocking key (same contract as
    * `Dedup.minhashLshCandidates`' oversize-bucket report).
    *
    * `scores` = the fellegiSunter output restricted to records whose
    * block holds at most `maxBlock` records; `oversized` = one row
    * per skipped block (its key columns + `block_n`). The size census
    * is one aggregation on the blocking key; oversized keys are
    * rare by construction, so the anti-join back is broadcast-sized.
    */
  def fellegiSunterCapped(df: DataFrame, idCol: String,
                          blockCols: Seq[String],
                          fieldExprs: Seq[(String, String)],
                          m: Double = 0.95,
                          maxBlock: Int = 10000): FsCandidates = {
    require(maxBlock >= 2, s"maxBlock $maxBlock would emit no pairs")
    val weights = fieldWeights(df, fieldExprs, m)
    val proj = fsProjection(df, idCol, blockCols, fieldExprs)
    val oversized = proj.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("block_n"))
      .filter(col("block_n") > maxBlock)
    val kept = proj.join(broadcast(oversized.select(blockCols.map(col): _*)),
      blockCols, "left_anti")
    FsCandidates(pairAndScore(kept, weights, blockCols, fieldExprs),
      oversized)
  }

  private def fsProjection(df: DataFrame, idCol: String,
                           blockCols: Seq[String],
                           fieldExprs: Seq[(String, String)]): DataFrame =
    df.select(
      (col(idCol).as("__id") +: blockCols.map(col)) ++
        fieldExprs.map { case (name, ex) => expr(ex).as(s"__f_$name") }: _*)

  private def pairAndScore(proj: DataFrame, weights: DataFrame,
                           blockCols: Seq[String],
                           fieldExprs: Seq[(String, String)]): DataFrame = {
    val a = proj.as("a")
    val b = proj.as("b")
    val pairCond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && (col("a.__id") < col("b.__id"))
    val pairs = a.join(b, pairCond)
      .select(
        (Seq(col("a.__id").as("id_a"), col("b.__id").as("id_b")) ++
          fieldExprs.flatMap { case (name, _) =>
            Seq(col(s"a.__f_$name").as(s"__fa_$name"),
              col(s"b.__f_$name").as(s"__fb_$name"))
          }): _*)
    scorePairs(pairs.crossJoin(broadcast(weights)), fieldExprs,
      Seq(col("id_a"), col("id_b")))
  }
}
