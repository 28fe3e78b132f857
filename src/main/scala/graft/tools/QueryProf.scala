package graft.tools
import org.apache.spark.sql.SparkSession

/** Per-JOB profile of one declared query (optimization-round
  * measurement harness, guide §1): runs `graft.Bench`'s exact session
  * shape (same master/shuffle conf, same noop sink, warmup pass at
  * sf0.001 first so JIT/codegen caches are hot), then times each
  * Spark JOB the query submits, labeled by its call site — multi-job
  * operators (ingest loops, radix quantiles, iterative graph) show
  * WHERE their wall-clock goes instead of one opaque total.
  *
  * Usage: QueryProf <sfDir> <query[,query…]> [reps]
  */
object QueryProf {
  private final case class J(id: Int, desc: String, t0: Long,
                             var t1: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val p = js.properties
          val fromProps = if (p == null) null else {
            val d = p.getProperty("spark.job.description")
            if (d != null) d else p.getProperty("callSite.short")
          }
          val site = if (fromProps != null) fromProps
            else js.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobs.put(js.jobId, J(js.jobId, site, System.nanoTime()))
          order.add(js.jobId); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(je.jobId)
          if (j != null) j.t1 = System.nanoTime()
        }
      })

    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchExtras
    def run(dir: String, name: String): Unit =
      try {
        all(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      } catch { case e: Throwable =>
        System.err.println(s"[qprof] $name failed: ${e.getMessage}")
      } finally {
        graft.operators.Batching.releasePins()
        spark.catalog.clearCache()
      }

    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory)
      names.foreach(run(warmDir, _))

    for (name <- names; rep <- 1 to reps) {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      run(sfDir, name)
      val total = (System.nanoTime() - t0) / 1e9
      println(f"== $name rep $rep total $total%.2f s, ${order.size} jobs")
      import scala.jdk.CollectionConverters._
      val js = order.asScala.flatMap(id => Option(jobs.get(id)))
      var last = t0
      for (j <- js) {
        val gap = (j.t0 - last) / 1e9
        val dur = (math.max(j.t1, j.t0) - j.t0) / 1e9
        last = math.max(j.t1, j.t0)
        println(f"  job ${j.id}%3d  ${dur}%7.3f s  (gap ${gap}%6.3f s)  ${j.desc}")
      }
      val accounted = js.map(j => (math.max(j.t1, j.t0) - j.t0) / 1e9).sum
      println(f"  [sum jobs $accounted%.2f s of $total%.2f s]")
    }
    spark.stop()
  }
}
