package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line on stdout.
  *
  * - sink is the `noop` writer so every projected column is actually
  *   computed (a `count()` would let Catalyst prune the work away)
  * - a warmup pass at sf0.001 first: JIT + whole-stage-codegen caches
  *   are process-wide, so per-query times at the target SF measure the
  *   plan, not the JVM cold start
  */
object Bench {

  /** A cramped heap (spark-submit's 1g default) turns the array-heavy
    * dedup queries into GC benchmarks. If this JVM was started small,
    * re-exec the same main with a sane heap and inherit stdio — the
    * JSON contract on stdout is unchanged. */
  private def ensureHeap(minBytes: Long = 3L << 30,
                         heap: String = "-Xmx8g"): Unit = {
    // only re-exec when the classpath is self-contained (plain java /
    // spark-submit); under an un-forked sbt run the classpath is the
    // sbt launcher and a child JVM could not resolve this class
    if (Runtime.getRuntime.maxMemory >= minBytes ||
        sys.env.contains("SPARK_GRAFT_NO_REEXEC") ||
        !System.getProperty("java.class.path", "").contains("spark")) return
    import scala.jdk.CollectionConverters._
    val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports")
        || a.startsWith("--enable-native-access"))
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val cmd = (Seq(javaBin, heap) ++ jvmOpts ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")).asJava
    val pb = new ProcessBuilder(cmd).inheritIO()
    pb.environment().put("SPARK_GRAFT_NO_REEXEC", "1")
    System.err.println(
      s"[bench] heap ${Runtime.getRuntime.maxMemory >> 20}m too small; re-exec with $heap")
    sys.exit(pb.start().waitFor())
  }

  def main(args: Array[String]): Unit = {
    ensureHeap()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle partitions are sized to the DATA, not the thread count:
    // at sf100 a 25 GB shuffle over 32 partitions is ~800 MB/partition
    // against ~1.2 GB of per-task execution memory — every sort/join
    // thrashes in spill, and AQE only COALESCES partitions (and splits
    // skewed JOIN sides), it never re-expands a uniformly-oversized
    // layout. Measured at sf100: the same binaries run q_j1_interval
    // 176 s at 32 partitions vs 18 s at 256. Default: one partition
    // per ~128 MB of on-disk input (the maxPartitionBytes scan
    // granularity), floored at the thread count so toy SFs keep the
    // driver's standard 32. SPARK_GRAFT_SHUFFLE_PARTITIONS overrides.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", {
      val inputBytes =
        try {
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(sfDir))
          try s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
          finally s.close()
        } catch { case _: Throwable => 0L }
      math.max(cpus.toInt, ((inputBytes + (128L << 20) - 1) >> 27).toInt).toString
    })
    System.err.println(s"[bench] heap=${Runtime.getRuntime.maxMemory >> 20}m " +
      s"cores=${Runtime.getRuntime.availableProcessors} cpus=$cpus " +
      s"shuffle=$shufflePartitions sf=$sfDir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // benchExtras rows (bare approx-sketch forms with no SQL-replayable
    // oracle) are timed here alongside the oracle-gated queries — the
    // correctness artifact stays zero-err while the cheap-twin
    // throughput claims stay measured
    val allQueries = SparkEntry.queries ++ SparkEntry.benchExtras
    def run(dir: String, name: String): Boolean =
      try {
        allQueries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      } finally {
        // Queries that pin frames (iterative graph ops, the
        // partitionOffsets family) have no unpersist hook through the
        // queries() signature; over 3 full passes the leaked blocks
        // add GC/evict pressure that shows up as drift in later
        // queries (q_g_triangles 2.0s solo vs 5.2s in-suite, round 7).
        // Each query builds its frames fresh, so clearing between
        // queries is safe — and the documented license of
        // groupedRankByRange's cache discipline. releasePins drains
        // the skeletons' pin registry (clearCache evicts the blocks
        // but wouldn't empty the queue).
        graft.operators.Batching.releasePins()
        spark.catalog.clearCache()
      }

    // optional comma-separated query filters for local iteration:
    // ONLY whitelists, SKIP blacklists (for full-suite scale runs that
    // must exclude the documented spec-output-quadratic rows)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val skip = sys.env.get("SPARK_GRAFT_SKIP")
      .map(_.split(",").toSet).getOrElse(Set.empty[String])
    val names = allQueries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)) && !skip(n))
    // skipped rows are recorded IN the artifact (every emitted JSON
    // line below) so a skip-run total can never be misread later as a
    // full-suite number. Queries excluded by the ONLY whitelist are
    // folded in too — an only-run's total is equally partial, and the
    // misread-proofing goal doesn't care which filter trimmed it.
    val skippedJson = allQueries.keys.toSeq.sorted
      .filterNot(names.contains)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      names.foreach(run(warmDir, _))

    // CALIBRATION PROBE: a fixed synthetic job (in-memory range -> md5
    // -> hash agg; no file I/O, no data dependence) timed after warmup
    // and recorded in the artifact, so cross-day totals can be
    // normalized mechanically — the same binaries have measured ~1.3×
    // ambient day-to-day bands on this host (BASELINE.md), and without
    // a probe every cross-round comparison needs manual adjudication.
    // min of two runs, same discipline as the query timings.
    def calibrationProbe(): Double = {
      import org.apache.spark.sql.functions._
      val t0 = System.nanoTime()
      spark.range(0L, 8L << 20, 1L, 32)
        .select((col("id") % 4096L).as("k"),
          md5(col("id").cast("string")).as("h"))
        .groupBy("k").agg(count(lit(1)).as("n"), min("h").as("mn"),
          max("h").as("mx"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calibrationProbe() // JIT warm for the probe's own codegen
    val calibration = math.min(calibrationProbe(), calibrationProbe())
    System.err.println(f"[bench] calibration $calibration%.3f s")

    // two timed passes, min per query: one GC/host stall shouldn't
    // masquerade as a plan regression. Per-query stderr progress so a
    // stalled query is identifiable live (the Verify lesson).
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      val ok = run(sfDir, name)
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name ${if (ok) "ok" else "FAIL"} $secs%.2f s")
      name -> (if (ok) secs else -1.0)
    }.toMap
    val (p1, p2) = (timedPass(), timedPass())
    val results = names.map { n =>
      val (a, b) = (p1(n), p2(n))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val cal = s""""calibration":${fmt(calibration)}"""
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$cal,"queries":$qs,"skipped":$skippedJson,"sf":"$sfDir"}"""
    // Persist the canonical full JSON (metric/value first) to a file —
    // the durable record every scale claim cites.
    val benchFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "BENCH_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(benchFile),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $benchFile: ${e.getMessage}")
    }
    // Stdout ordering for the driver's artifact, which keeps only the
    // LAST ~2000 chars of stdout: the FULL per-query map first (its
    // ~6 KB head may scroll past the window — BENCH_LOCAL.json holds
    // the durable copy), then a compact slowest-25 summary as the LAST
    // line, so a complete parseable JSON object with metric/value
    // always survives inside the tail window.
    println(s"""{"metric":"total","queries":$qs,"n_queries":${results.size},$cal,"skipped":$skippedJson,"sf":"$sfDir","unit":"sec","value":${fmt(total)}}""")
    val slowest = results.sortBy(-_._2).take(25)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$cal,"n_queries":${results.size},"skipped":$skippedJson,"queries":$slowest,"queries_truncated_to_slowest_25":true,"all_queries_file":"$benchFile","sf":"$sfDir"}""")
    spark.stop()
  }
}
