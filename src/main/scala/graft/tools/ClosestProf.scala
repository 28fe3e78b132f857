package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, IntervalJoin}

/** Scratch leg-by-leg timing of Intervals.closest (q_j13) at a scale
  * dir — which of the three legs (binned overlap join, backward as-of,
  * forward as-of) pays the worst-in-suite sf100/sf10 ratio. Results
  * recorded in BASELINE.md; file kept for reproducibility.
  * Usage: ClosestProf <sfDir> */
object ClosestProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf10")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "64")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tbl(t: String) = spark.read.parquet(s"$dir/$t.parquet")
    val L = tbl("part").agg(greatest(lit(100000L), count(lit(1)) * 5))
      .collect()(0).getLong(0)
    val genes = tbl("part").select(
      col("p_partkey").as("g_id"), (col("p_partkey") % 23).as("chrom"),
      ((col("p_partkey") * 37) % L).as("g_start"),
      ((col("p_partkey") * 37) % L + 50 + col("p_size") * 10).as("g_end"))
    val segs = tbl("orders").select(
      col("o_orderkey").as("s_id"), (col("o_orderkey") % 23).as("chrom"),
      ((col("o_orderkey") * 53) % L).as("s_start"),
      ((col("o_orderkey") * 53) % L + 100 + col("o_orderkey") % 500).as("s_end"))
    def time(name: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val kc = Seq(col("chrom"))
    time("warm (count both)") {
      genes.groupBy("chrom").count().union(segs.groupBy("chrom").count())
    }
    time("overlap leg (binned join + min agg)") {
      IntervalJoin.overlapBinned(genes, segs, Seq("chrom"),
        "g_start", "g_end", "s_start", "s_end", binWidth = 1000)
        .groupBy(col("g_id")).agg(min(col("s_id")).as("__bid"))
    }
    val bBack = segs.groupBy((kc :+ col("s_end").as("__t")): _*)
      .agg(min(col("s_id")).as("__bid_r")).withColumn("__bt_r", col("__t"))
    time("backward as-of leg") {
      AsOfJoin.backward(
        genes.select((kc :+ col("g_id") :+ col("g_start").as("__t")): _*),
        bBack, Seq("chrom"), "__t", Seq("__bid_r", "__bt_r"))
    }
    val bFwd = segs.groupBy((kc :+ col("s_start").as("__t")): _*)
      .agg(min(col("s_id")).as("__bid_r")).withColumn("__bt_r", col("__t"))
    time("forward as-of leg") {
      AsOfJoin.forward(
        genes.select((kc :+ col("g_id") :+ col("g_end").as("__t")): _*),
        bFwd, Seq("chrom"), "__t", Seq("__bid_r", "__bt_r"))
    }
    time("full closest") {
      graft.operators.Intervals.closest(genes, segs, Seq("chrom"),
        "g_id", "g_start", "g_end", "s_id", "s_start", "s_end",
        binWidth = 1000)
    }
    spark.stop()
  }
}
