package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** Error-curve census for the cross-batch confirm in
  * `Dedup.lshIngestBatch`: the stored text is gone, so the confirm is
  * minhash AGREEMENT (drop when agreeing slots ≥ ceil(minJaccard·k)) —
  * an unbiased Jaccard estimator with ±1/√k standard error. This tool
  * MEASURES the decision's FP/FN against the exact n-gram Jaccard
  * (the same confirm the in-batch leg computes) across
  * k ∈ {16, 32, 64, 128}, by true-Jaccard band, so the scaladoc's
  * "size numHashes to the tolerance" is a recorded sizing rule, not an
  * assertion.
  *
  * Pair population (fixed across k so the comparison is paired):
  *  - NATURAL: MinHash-LSH candidates from the documents corpus at a
  *    permissive banding (k=16, bands=8 → rows=2), the real near-dup
  *    structure;
  *  - SYNTHETIC: one perturbed twin per corpus doc, token-replaced at
  *    a deterministic per-doc rate spanning 0–81%, guaranteeing
  *    occupancy of every Jaccard band around the 0.5 threshold (the
  *    natural corpus concentrates away from it).
  *
  * One k=128 signature pass serves every k: the slot coefficients
  * (a_i, b_i) depend only on the slot index (TextExpressions.scala
  * minhashSignature), so slots [0, k) of the 128-slot signature ARE
  * the k-slot signature — each smaller k is evaluated on exactly the
  * signature it would compute.
  *
  * Output: one JSON line per (threshold, k) for the pure estimator
  * (per-band counts, band width 0.05), plus one line per (threshold,
  * k, window-multiplier c) for the HYBRID router
  * (`lshIngestBatch(confirm = "hybrid")`): the estimator decides
  * pairs with agreement strictly outside the ±c/√k band around the
  * threshold, the exact Jaccard decides in-band pairs — so hybrid
  * errors are exactly the pairs that ESCAPE the band with a wrong
  * estimator call, and `routed_frac` is the fraction of collided
  * pairs that pay the exact kernel. Thresholds 0.5 AND 0.8 verify
  * the Φ(−|J−t|·√k) error model generalizes beyond the originally
  * measured t. Written to stdout and CONFIRM_CENSUS.json.
  * Usage: ConfirmCensus [sfDir] */
object ConfirmCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val minJs = Seq(0.5, 0.8)
    val windowCs = Seq(2.0, 4.0)
    val ks = Seq(16, 32, 64, 128)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    // deterministic perturbed twin: replace token i when
    // xxhash64(doc_id, i) mod 100 < 9·(doc_id mod 10) — rates 0..81%
    // in steps of 9, spreading true Jaccard across the spectrum
    val twins = base.select(
      (col("doc_id") + lit(10000000L)).as("doc_id"),
      concat_ws(" ", transform(TextFns.tokens(col("text")),
        (t, i) => when(
          pmod(xxhash64(col("doc_id"), i), lit(100L)) <
            pmod(col("doc_id"), lit(10L)) * lit(9L),
          concat(lit("zq"), i.cast("string"))).otherwise(t))).as("text"))
    val docs = base.unionAll(twins)

    val natural = Dedup.minhashLshCandidates(base, "text", "doc_id",
      numHashes = 16, bands = 8, shingleSize = 3, maxBucket = 4000)
      .pairs.select("id_a", "id_b")
    val synthetic = base.select(col("doc_id").as("id_a"),
      (col("doc_id") + lit(10000000L)).as("id_b"))
    val pairs = natural.unionAll(synthetic)

    // truth: the exact n-gram Jaccard the in-batch confirm computes
    val exact = Dedup.ngramJaccard(pairs, docs, "text", "doc_id", n = 3)
      .select("id_a", "id_b", "jaccard")

    val sigs = docs
      .filter(size(TextFns.tokens(col("text"))) >= 3)
      .select(col("doc_id"),
        TextFns.minhashSignatureNative(col("text"), 128, 3).as("mh"))
    val joined = exact
      .join(sigs.select(col("doc_id").as("id_a"), col("mh").as("__ma")),
        Seq("id_a"))
      .join(sigs.select(col("doc_id").as("id_b"), col("mh").as("__mb")),
        Seq("id_b"))
    def agreeUpTo(k: Int) = (0 until k).map(i =>
      when(col("__ma").getItem(i) === col("__mb").getItem(i), 1)
        .otherwise(0)).reduce(_ + _)
    val scored = joined.select(
      col("jaccard") +:
        ks.map(k => agreeUpTo(k).as(s"agree_$k")): _*)
      .withColumn("bin", least(floor(col("jaccard") * 20), lit(19L)))
      .localCheckpoint(true)

    val out = new StringBuilder
    for (minJ <- minJs; k <- ks) {
      val thr = math.ceil(minJ * k).toInt
      val d = scored.withColumn("dec", col(s"agree_$k") >= thr)
        .withColumn("pos", col("jaccard") >= minJ)
      val rows = d.groupBy("bin").agg(
        count(lit(1)).as("n"),
        sum(when(col("dec") && !col("pos"), 1L).otherwise(0L)).as("fp"),
        sum(when(!col("dec") && col("pos"), 1L).otherwise(0L)).as("fn"))
        .orderBy("bin").collect()
      val n = rows.map(_.getLong(1)).sum
      val nPos = d.filter(col("pos")).count()
      val fp = rows.map(_.getLong(2)).sum
      val fn = rows.map(_.getLong(3)).sum
      val bins = rows.map(r => f"""{"j_lo":${r.getLong(0) / 20.0}%.2f,""" +
        s""""n":${r.getLong(1)},"fp":${r.getLong(2)},"fn":${r.getLong(3)}}""")
        .mkString("[", ",", "]")
      val line = s"""{"mode":"estimator","k":$k,"min_jaccard":$minJ,""" +
        s""""agree_threshold":$thr,""" +
        s""""n_pairs":$n,"n_pos":$nPos,"fp":$fp,"fn":$fn,""" +
        f""""fp_rate_of_neg":${if (n - nPos == 0) 0.0 else fp.toDouble / (n - nPos)}%.4f,""" +
        f""""fn_rate_of_pos":${if (nPos == 0) 0.0 else fn.toDouble / nPos}%.4f,""" +
        s""""bins":$bins}"""
      println(line)
      out.append(line).append('\n')
      // hybrid router over the SAME pairs: exact decisions in the
      // band (errors impossible there), estimator outside — errors
      // are exactly band escapes with a wrong call; routed_frac is
      // the exact-kernel cost fraction
      windowCs.foreach { c =>
        val (lo, hi) = Dedup.hybridCuts(k, minJ, c / math.sqrt(k.toDouble))
        val inBand = col(s"agree_$k") >= lo && col(s"agree_$k") < hi
        val h = scored
          .withColumn("pos", col("jaccard") >= minJ)
          .withColumn("dec", (col(s"agree_$k") >= hi) ||
            (inBand && col("jaccard") >= minJ))
          .withColumn("routed", inBand)
        val agg = h.agg(
          count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("npos"),
          sum(when(col("dec") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("dec") && col("pos"), 1L).otherwise(0L)).as("fn"),
          sum(when(col("routed"), 1L).otherwise(0L)).as("routed")).head()
        val (hn, hnp, hfp, hfn, routed) = (agg.getLong(0), agg.getLong(1),
          agg.getLong(2), agg.getLong(3), agg.getLong(4))
        val hline = s"""{"mode":"hybrid","k":$k,"min_jaccard":$minJ,""" +
          f""""window_c":$c%.0f,"lo":$lo,"hi":$hi,""" +
          s""""n_pairs":$hn,"n_pos":$hnp,"fp":$hfp,"fn":$hfn,""" +
          s""""routed":$routed,""" +
          f""""routed_frac":${if (hn == 0) 0.0 else routed.toDouble / hn}%.4f}"""
        println(hline)
        out.append(hline).append('\n')
      }
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("CONFIRM_CENSUS.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
