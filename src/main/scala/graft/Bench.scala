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

  /** Per-job-group I/O aggregates (bytes) — what the r13 verdict asked
    * for (#3): shuffle read/write, spill (memory+disk), input read,
    * and peak per-task execution memory, recorded per query so scale
    * anomalies (page-cache contention vs a real plan regression) are
    * adjudicated from the artifact instead of manual solo reruns. */
  private final class IoAgg {
    var shufRead = 0L; var shufWrite = 0L; var spillMem = 0L
    var spillDisk = 0L; var input = 0L; var peakMem = 0L; var tasks = 0L
  }

  /** Attributes task metrics to the query that ran them via the job
    * group (stage → group via onJobStart; groups are set around each
    * query run, tagged per timed pass so the recorded metrics match
    * the recorded min-time pass). Listener delivery is async — the
    * bus is drained once before the artifact is written. */
  private final class QueryMetricsListener
      extends org.apache.spark.scheduler.SparkListener {
    private val stageGroup =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val byGroup =
      new java.util.concurrent.ConcurrentHashMap[String, IoAgg]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val g = if (js.properties == null) null
              else js.properties.getProperty("spark.jobGroup.id")
      if (g != null)
        js.stageIds.foreach(sid => stageGroup.put(sid, g))
    }
    // prune on completion: bounds the map over a 260-query run and
    // stops a resubmitted attempt's tasks from double-counting into
    // the recorded pass (task-end events for an attempt precede its
    // stage-completed on the ordered bus; tasks of a LATER resubmit
    // of the same stage are then unattributed — an UNDERcount, noted
    // here, preferred over silent inflation of the min-time pass)
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      stageGroup.remove(sc.stageInfo.stageId); ()
    }
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val g = stageGroup.get(te.stageId)
      val m = te.taskMetrics
      if (g != null && m != null) {
        val a = byGroup.computeIfAbsent(g, _ => new IoAgg)
        a.synchronized {
          a.shufRead += m.shuffleReadMetrics.totalBytesRead
          a.shufWrite += m.shuffleWriteMetrics.bytesWritten
          a.spillMem += m.memoryBytesSpilled
          a.spillDisk += m.diskBytesSpilled
          a.input += m.inputMetrics.bytesRead
          a.peakMem = math.max(a.peakMem, m.peakExecutionMemory)
          a.tasks += 1
        }
      }
    }
  }

  /** Wait for queued listener events (async bus) before reading the
    * aggregates. `LiveListenerBus.waitUntilEmpty` is private[spark]
    * (public in bytecode) — reflection, with a sleep fallback. */
  private def drainListenerBus(spark: SparkSession): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .fold(Thread.sleep(2000)){ m => m.invoke(bus); () }
    } catch { case _: Throwable => Thread.sleep(2000) }

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
    val ioListener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(ioListener)
    def run(dir: String, name: String, group: String = "warm"): Boolean =
      try {
        spark.sparkContext.setJobGroup(group, group)
        allQueries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      } finally {
        spark.sparkContext.clearJobGroup()
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
    def timedPass(pass: Int): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      val ok = run(sfDir, name, s"$name@$pass")
      val secs = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name ${if (ok) "ok" else "FAIL"} $secs%.2f s")
      name -> (if (ok) secs else -1.0)
    }.toMap
    // SPARK_GRAFT_PASSES=1 for fourth-decade full sweeps (a 258-row
    // sf100 pass is ~95 min; r13-s2 measured in-suite numbers there
    // are page-cache-dominated anyway, so the second pass buys little)
    // — the artifact still records which discipline produced it via
    // the runbook entry in BASELINE.md
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val p1 = timedPass(1)
    val p2 = if (passes >= 2) timedPass(2) else p1
    val results = names.map { n =>
      val (a, b) = (p1(n), p2(n))
      n -> (if (a < 0) b else if (b < 0) a else math.min(a, b))
    }
    // per-query I/O from the pass whose time was recorded (work bytes
    // are plan-deterministic; SPILL is not — it belongs to the pass
    // the seconds came from)
    drainListenerBus(spark)
    val ioJson = names.flatMap { n =>
      val (a, b) = (p1(n), p2(n))
      val pass = if (b < 0 || (a >= 0 && a <= b)) 1 else 2
      Option(ioListener.byGroup.get(s"$n@$pass")).map { m =>
        "\"" + n + "\":{" +
          s""""shuffle_read":${m.shufRead},"shuffle_write":${m.shufWrite},""" +
          s""""spill_mem":${m.spillMem},"spill_disk":${m.spillDisk},""" +
          s""""input":${m.input},"peak_exec_mem":${m.peakMem},""" +
          s""""tasks":${m.tasks}}"""
      }
    }.mkString("{", ",", "}")
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the artifact declares the exact tree it measured — scale claims
    // cite versioned BENCH files, and "ran on the final tree" must be
    // checkable from the file itself, not from session notes
    val commit = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD").start()
      val sha = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      p.waitFor()
      // tracked files only: untracked bench artifacts (often written
      // by the sweep itself moments earlier) must not spend the
      // "-dirty" marker, which readers take to mean "unreproducible
      // source tree"
      val d = new ProcessBuilder("git", "status", "--porcelain",
        "--untracked-files=no").start()
      val dirty = scala.io.Source.fromInputStream(d.getInputStream)
        .mkString.trim.nonEmpty
      d.waitFor()
      if (sha.matches("[0-9a-f]{40}")) sha + (if (dirty) "-dirty" else "")
      else "unknown"
    } catch { case _: Exception => "unknown" }
    val cal = s""""calibration":${fmt(calibration)},"commit":"$commit""""
    // "io" rides only in the durable FILE artifact (per-query bytes ≈
    // 25 KB at 258 rows) — the stdout lines keep their tail-window
    // contract unchanged
    val full =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec",$cal,"queries":$qs,"io":$ioJson,"skipped":$skippedJson,"sf":"$sfDir"}"""
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
