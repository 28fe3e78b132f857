package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the partial-aggregation volume knob on the two census rows
  * whose decade bytes grow Θ(distinct keys × map tasks) (r15 verdict
  * #5: q_j3_recon, q_v2_pivot_discrete — high-cardinality
  * `groupBy(l_suppkey, …)` over lineitem, where map-side combine
  * emits one partial row per (key, map task) and BOTH factors grow
  * ~10× per decade):
  *
  *   - `current`: the plain groupBy — partial agg before the
  *     exchange, Θ(keys × tasks) combine output shuffled;
  *   - `prepart`: `repartition(groupKey)` BEFORE the aggregation —
  *     hash-partitioning on a subset of the group keys satisfies the
  *     final agg's ClusteredDistribution, so the "partial" agg runs
  *     post-exchange and emits exactly one row per group; the shuffle
  *     instead carries the RAW projected rows.
  *
  * The contest is therefore (keys × tasks × partial-row) bytes vs
  * (input rows × projected-row) bytes. Each variant runs `passes`
  * times (min taken), results to a noop sink, one JSON line per
  * (query, variant) with seconds and shuffle-write bytes from a
  * per-run listener. Usage: PartialAggProbe [sfDir] [passes] */
object PartialAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

    def reconCurrent(): DataFrame = graft.operators.Reconcile.countMatch(
      lineitem, lineitem.filter(col("l_discount") > 0), Seq("l_suppkey"))
    def reconPrepart(): DataFrame = {
      // repartition both agg inputs by the key: each side's combine
      // then emits one row per key, and the outer join reuses the
      // partitioning
      def agg(df: DataFrame, as: String) =
        df.select("l_suppkey").repartition(col("l_suppkey"))
          .groupBy("l_suppkey").agg(count(lit(1)).as(as))
      agg(lineitem, "expected_count")
        .join(agg(lineitem.filter(col("l_discount") > 0),
          "observed_count"), Seq("l_suppkey"), "outer")
        .na.fill(0, Seq("expected_count", "observed_count"))
        .withColumn("mismatch",
          col("expected_count") =!= col("observed_count"))
    }
    def pivotCurrent(): DataFrame = {
      val agg = lineitem.groupBy("l_suppkey", "l_returnflag")
        .agg(count(lit(1)).cast("int").as("v"))
      graft.operators.Pivots.discrete(agg, "l_suppkey", "l_returnflag",
        "v", Seq("A", "N", "R"))
    }
    def pivotPrepart(): DataFrame = {
      val agg = lineitem.select("l_suppkey", "l_returnflag")
        .repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_returnflag")
        .agg(count(lit(1)).cast("int").as("v"))
      graft.operators.Pivots.discrete(agg, "l_suppkey", "l_returnflag",
        "v", Seq("A", "N", "R"))
    }

    val listener = new org.apache.spark.scheduler.SparkListener {
      val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val out = new StringBuilder
    for ((name, mk) <- Seq(
        "q_j3_recon.current" -> (() => reconCurrent()),
        "q_j3_recon.prepart" -> (() => reconPrepart()),
        "q_v2_pivot_discrete.current" -> (() => pivotCurrent()),
        "q_v2_pivot_discrete.prepart" -> (() => pivotPrepart()))) {
      var best = Double.MaxValue
      var bestSw = 0L
      (1 to passes).foreach { _ =>
        listener.shuffleWrite.set(0L)
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        // LiveListenerBus.waitUntilEmpty is private[spark] — same
        // reflective flush Bench uses for its io listener
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethods
            .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
            .fold(Thread.sleep(2000)) { m => m.invoke(bus); () }
        } catch { case _: Throwable => Thread.sleep(2000) }
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec < best) { best = sec; bestSw = listener.shuffleWrite.get }
      }
      val line = f"""{"query":"$name","sec":$best%.1f,""" +
        s""""shuffle_write_bytes":$bestSw,"sf_dir":"$dir"}"""
      println(line)
      out.append(line).append('\n')
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("PARTIALAGG_PROBE.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
