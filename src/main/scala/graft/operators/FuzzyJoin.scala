package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching (entity resolution): candidate pairs must
  * share a cheap blocking key (first token, prefix, phonetic code…),
  * then exact Levenshtein confirms within `maxDist` — the classic
  * blocking-then-verify shape that turns an O(n²) string comparison
  * into per-block work. Levenshtein runs only INSIDE blocks, and the
  * self-join shuffles on the block key, so skew is governed by block
  * sizing (pick keys like the LSH buckets: small, many, reported —
  * compose with `Skew.keySkewReport` on the block column to audit).
  */
object FuzzyJoin {

  /** Self-pairs of `df` with equal block keys, id_a < id_b, distinct
    * strings, edit distance ≤ `maxDist`. `block` builds the blocking
    * key from the string column. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
                block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val p = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .withColumn("blk", block(col("s")))
    // cheap guards run before the DP: |len diff| bounds the distance,
    // and the threshold form early-exits its banded computation
    // (returns −1 past maxDist) — computed ONCE, reused as the output
    p.as("a").join(p.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist &&
          col("a.s") =!= col("b.s"))
      .withColumn("dist", levenshtein(col("a.s"), col("b.s"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.s").as("s_a"), col("b.s").as("s_b"), col("dist"))
  }

  /** The scale path for heavy-duplicate columns: compare DISTINCT
    * values only, carrying multiplicities. A 100 TB column with a
    * bounded vocabulary (names, labels, categories) collapses to its
    * value histogram in one aggregation; the quadratic leg then runs
    * over distinct values per block — row count stops mattering
    * entirely. `n_pairs` = cnt_a·cnt_b is the row-pair multiplicity
    * the id-level join would have produced. Pairs are value-ordered
    * (s_a < s_b). */
  def valuePairs(df: DataFrame, strCol: String,
                 block: Column => Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val v = df.groupBy(col(strCol).as("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("blk", block(col("s")))
    v.as("a").join(v.as("b"),
        col("a.blk") === col("b.blk") && col("a.s") < col("b.s") &&
          abs(length(col("a.s")) - length(col("b.s"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a.s"), col("b.s"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"),
        (col("a.cnt") * col("b.cnt")).as("n_pairs"), col("dist"))
  }

  /** Ed-Join-style q-gram prefix-filtered edit-distance self-join —
    * the UNBLOCKED counterpart of `valuePairs` with GUARANTEED recall:
    * no blocking-key assumption, every pair within `maxDist` is found.
    *
    * Theory (count + prefix filtering): strings with ed(a,b) ≤ d share
    * a positional-q-gram MULTISET overlap of ≥ max(|ga|,|gb|) − q·d
    * (each edit destroys ≤ q grams). Numbering repeated grams
    * ((gram, occurrence#) elements) turns multiset overlap into set
    * overlap, and the prefix-filter theorem then says: order elements
    * by a GLOBAL total order and any qualifying pair must collide
    * within each side's first |g| − τ_side + 1 = q·d + 1 elements — a
    * CONSTANT per string. Candidate generation is an equi-join on
    * those ≤ q·d+1 elements (ordered rarest-first so hot grams don't
    * pick the candidates); strings too short for a positive threshold
    * (len ≤ q·d+q−1) pair among themselves in a vocabulary-bounded
    * short leg. Exact Levenshtein (threshold form) verifies.
    *
    * Scale shape: distinct values only (heavy-duplicate columns
    * collapse first — `n_pairs` carries multiplicities); per-string
    * fan-out is the constant q·d+1; the element join shuffles on
    * (gram, occ) and its skew is governed by rarest-first ordering —
    * audit hot elements with `Skew.keySkewReport` on `g` if the
    * vocabulary is adversarial. Recall is 1.0 BY THEOREM, so the
    * oracle can be the exact quadratic join — the gate proves it.
    *
    * KNOWN LIMIT — low-entropy ID-like strings ("Customer#000012345"):
    * when every value shares the same scaffold, even the rarest
    * elements (say ("00", occ 4)) can have df ≈ n, and the candidate
    * join degrades toward n² (measured: 350 s on 15k customer names vs
    * sub-second on word vocabularies — the filter prunes NOTHING it
    * can't distinguish). That shape is exactly what `snmPairs` (sort
    * neighbors, bounded candidates) or `selfPairs` (block on the
    * discriminating substring) are for; this operator's home turf is
    * natural-language-ish vocabularies.
    */
  def editGramPairs(df: DataFrame, strCol: String, q: Int = 2,
                    maxDist: Int = 2): DataFrame = {
    require(q >= 1 && maxDist >= 1, s"q=$q maxDist=$maxDist")
    val shortMax = q * maxDist + q - 1 // gram threshold ≤ 0 at/below this
    val prefixLen = q * maxDist + 1
    val v = df.filter(col(strCol).isNotNull)
      .groupBy(col(strCol).as("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("s")))
    // (gram, occurrence#) elements per string, in string order
    val elems = Explodes.posNonEmpty(
        v.filter(col("len") >= q),
        expr(s"transform(sequence(1, len - ${q - 1}), i -> substring(s, i, $q))"),
        "__p", "g", col("s"), col("cnt"), col("len"))
      .withColumn("occ", row_number().over(
        Window.partitionBy("s", "g").orderBy("__p")))
    // rarest-first global element order; ties by (g, occ) for determinism
    val elemDf = elems.groupBy("g", "occ").agg(count(lit(1)).as("__df"))
    val prefix = elems.join(elemDf, Seq("g", "occ"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("s").orderBy(col("__df"), col("g"), col("occ"))))
      .filter(col("__rk") <= prefixLen)
      .select(col("s"), col("cnt"), col("len"), col("g"), col("occ"))
    // short×short pairs belong EXCLUSIVELY to the short leg (they'd
    // otherwise double-emit when their grams also collide)
    val gramCands = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.occ") === col("b.occ") &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist &&
          (col("a.len") > shortMax || col("b.len") > shortMax))
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.cnt").as("cnt_a"), col("b.cnt").as("cnt_b"))
      .distinct()
    val shorts = v.filter(col("len") <= shortMax)
    val shortCands = shorts.as("a").join(shorts.as("b"),
        col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= maxDist)
      .select(col("a.s").as("s_a"), col("b.s").as("s_b"),
        col("a.cnt").as("cnt_a"), col("b.cnt").as("cnt_b"))
    gramCands.unionAll(shortCands)
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("s_a"), col("s_b"),
        (col("cnt_a") * col("cnt_b")).as("n_pairs"), col("dist"))
  }

  /** Sorted-neighborhood method (SNM): order records by a sort key,
    * slide a `window`-row frame, verify pairs inside it — the third
    * classic ER candidate scheme next to blocking (`selfPairs`) and
    * gram filtering (`editGramPairs`). Recall is heuristic (a pair
    * sorting far apart is missed — that's SNM's documented trade);
    * the wins are bounded candidate count (n·(w−1) exactly) and
    * total insensitivity to block-size skew.
    *
    * Scale shape: the global index comes from the shared range-
    * partition + per-partition-offset skeleton (`Batching
    * .partitionOffsets` — offsets are one row per partition, never
    * data), NOT a single-task global window. Each row then emits
    * w−1 probe indices and candidates equi-join on the target index —
    * map-side expansion, one key-partitioned join, no inequality
    * join. Pairs are (lower index → id_a); `gap` is the rank
    * distance; exact Levenshtein (threshold form) verifies.
    */
  def snmPairs(df: DataFrame, idCol: String, strCol: String,
               window: Int, maxDist: Int,
               numPartitions: Int = 0): DataFrame = {
    require(window >= 2 && window <= 10000, s"window out of range: $window")
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"))
      .filter(col("s").isNotNull)
    val (withPid, offsetDf, _) = Batching.partitionOffsets(base,
      Seq(col("s"), col("id")), count(lit(1)), numPartitions)
    val w = Window.partitionBy("__pid").orderBy(col("s"), col("id"))
    val idx = withPid.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("__idx", col("__offset") + row_number().over(w))
      .select("id", "s", "__idx")
    val probes = Explodes.nonEmpty(idx,
      sequence(col("__idx") + 1, col("__idx") + (window - 1)), "__tgt",
      col("id").as("id_a"), col("s").as("s_a"), col("__idx"))
    probes.join(
        idx.select(col("id").as("id_b"), col("s").as("s_b"),
          col("__idx").as("__tgt")),
        Seq("__tgt"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
        (col("__tgt") - col("__idx")).as("gap"), col("dist"))
  }
}
