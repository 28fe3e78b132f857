package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns
import graft.operators.Dedup

/** Scratch stage-by-stage timing of Dedup.prefixFilterPairs (q_d_prefix)
  * at a scale dir: the shingle projection, the df census, the
  * rank-window prefix build, the 4b alternative below, and the full
  * operator. Counts ride along so candidate growth is visible next to
  * time.
  *
  * FINDINGS (sf100, 2026-08-15, recorded in BASELINE.md):
  *  - the prefix build (df join + rank window over every token row) is
  *    the scale cost, and it is SHUFFLE-SORT I/O, not compute: jstack
  *    sampling shows TimSort/UnsafeExternalSorter + DiskBlockObjectWriter
  *    frames, and its wall time swings 57–107 s run-to-run with page-
  *    cache state while outputs are identical — single-node page-cache
  *    falloff, not a plan defect (solo min-of-2: sf10 10.4 s → sf100
  *    95.2 s = 9.2× for 10× data; the same shuffles spread across a
  *    real cluster's aggregate disk bandwidth).
  *  - stage 4b (hash-agg collect_list + per-row array_sort + prefix
  *    slice, exploding only the prefix) produces BITWISE-identical rows
  *    and was REJECTED by measurement: 9.4 s ≈ parity at sf10 but
  *    238 s vs 57 s at sf100 — 6M growing array<struct> aggregation
  *    buffers cost far more than the external sort they replace. Kept
  *    here so the negative result stays reproducible.
  * Usage: PrefixProf <sfDir> */
object PrefixProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "256")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val threshold = 0.8
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sets = Dedup.shingleSets(docs, "text", "doc_id", 3)
    time("1 shingleSets (projection only)") { noop(sets) }
    val e = sets.select(col("__id"), size(col("__set")).as("__sz"),
      explode_outer(col("__set")).as("__g"))
      .filter(col("__g").isNotNull)
    time("2 explode to token rows") { noop(e) }
    val dfreq = e.groupBy("__g").agg(count(lit(1)).as("__df"))
    time("3 df census (groupBy __g)") { noop(dfreq) }
    val w = Window.partitionBy("__id").orderBy(col("__df"), col("__g"))
    val prefixes = e.join(dfreq.hint("shuffle_hash"), Seq("__g"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <=
        col("__sz") - ceil(lit(threshold) * col("__sz")
          - lit(1e-12) * col("__sz")) + 1)
      .select(col("__id"), col("__g"), col("__sz"), col("__rn"))
    time("4 prefix build (df join + rank window)") { noop(prefixes) }
    println(s"   prefix rows: ${prefixes.count()}")
    // 4b: same output via hash-agg + per-row array sort (no global
    // external sort; only the prefix slice explodes)
    val prefLen = (col("__sz") - ceil(lit(threshold) * col("__sz")
      - lit(1e-12) * col("__sz")) + 1).cast("int")
    val prefixesB = e.join(dfreq.hint("shuffle_hash"), Seq("__g"))
      .groupBy("__id", "__sz")
      .agg(collect_list(struct(col("__df"), col("__g"))).as("__toks"))
      .select(col("__id"), col("__sz"),
        posexplode(slice(array_sort(col("__toks")), lit(1), prefLen)))
      .select(col("__id"), col("col.__g").as("__g"), col("__sz"),
        (col("pos") + 1).as("__rn"))
    time("4b prefix build (hash agg + array_sort + slice)") { noop(prefixesB) }
    println(s"   prefix rows (4b): ${prefixesB.count()}")
    val diff = prefixes.exceptAll(prefixesB).count() +
      prefixesB.exceptAll(prefixes).count()
    println(s"   4 vs 4b row diff: $diff")
    time("5 full prefixFilterPairs") {
      noop(Dedup.prefixFilterPairs(docs, "text", "doc_id", threshold, 3))
    }
    spark.stop()
  }
}
