package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-gate job profiler: runs one `SparkEntry.queries` gate with a job
  * listener and prints every Spark job's wall-clock plus the call site
  * that triggered it. Sequential-tx latency at local concurrency is
  * job-count-bound (TxLog doc), so "how many jobs and from where" is the
  * first question for any slow gate — this answers it without a UI.
  *
  * Usage: runMain graft.tools.Profile <gate> [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("ingest_cas")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PFIRST", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(gate)
    // warm-up at the smallest SF (same protocol as Bench)
    fn(spark, "/root/testdata/sf0.001").count()

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val p = Option(j.properties)
        def prop(k: String) = p.flatMap(q => Option(q.getProperty(k)))
        val site = prop("callSite.short")
          .orElse(prop("spark.job.description"))
          .orElse(prop("spark.sql.execution.root.id").map("sql:" + _))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), s"${j.stageIds.size}st $site"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, site) =>
          val ms = (System.nanoTime() - t0) / 1e6
          lines.add(f"job ${j.jobId}%4d ${ms}%8.1f ms  $site")
        }
      }
    })
    // best-of-3 like Bench: damp scheduler/GC noise; job lines kept from
    // the LAST run only (clear between runs)
    var best = Double.MaxValue; var n = 0L; var jobs = 0
    for (_ <- 1 to 3) {
      lines.clear()
      val t0 = System.nanoTime()
      n = fn(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      if (total < best) best = total
      jobs = lines.size
    }
    Thread.sleep(500) // let listener drain
    lines.forEach(println)
    println(f"GATE $gate rows=$n best=${best}%.2f s jobs=$jobs")
    spark.stop()
  }
}
