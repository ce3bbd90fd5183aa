package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch: profile MANY `SparkEntry.queries` gates in one JVM — the
  * per-gate sbt/JVM startup of [[Profile]]/[[ProfileGate]] dominates a
  * sweep, so this loops gates through one session with the same
  * warm-up + min-of-3 protocol as [[graft.Bench]] and prints, per gate:
  * the min wall, the job count / job-wall sum of the BEST run, task
  * count and shuffle bytes, and the driver/engine remainder.
  *
  * Usage: runMain graft.tools.ProfileMany <gate1,gate2,...> [sfDir]
  */
object ProfileMany {
  def main(args: Array[String]): Unit = {
    val gates = args.headOption.getOrElse("ingest_cas").split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-run counters, reset between runs; listener stays attached
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val nJobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobWallNs = new java.util.concurrent.atomic.AtomicLong()
    val nTasks = new java.util.concurrent.atomic.AtomicInteger()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.put(j.jobId, System.nanoTime()); nJobs.incrementAndGet(); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach(t0 => jobWallNs.addAndGet(System.nanoTime() - t0)); ()
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        nTasks.addAndGet(sc.stageInfo.numTasks)
        shufRead.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten); ()
      }
    })
    def reset(): Unit = { jobs.clear(); nJobs.set(0); jobWallNs.set(0); nTasks.set(0); shufRead.set(0); shufWrite.set(0) }

    println(f"${"gate"}%-26s ${"min_s"}%7s ${"jobs"}%5s ${"jobwall"}%8s ${"tasks"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s  runs")
    gates.foreach { g =>
      SparkEntry_queries.get(g) match {
        case None => println(s"$g: UNKNOWN gate")
        case Some(fn) =>
          try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
          val runs = (1 to 3).map { _ =>
            reset()
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val w = (System.nanoTime() - t0) / 1e9
            Thread.sleep(150) // drain listener bus
            (w, nJobs.get(), jobWallNs.get() / 1e9, nTasks.get(), shufRead.get(), shufWrite.get())
          }
          val best = runs.minBy(_._1)
          val runsStr = runs.map(r => f"${r._1}%.2f/${r._2}j").mkString(" ")
          println(f"$g%-26s ${best._1}%7.3f ${best._2}%5d ${best._3}%8.2f ${best._4}%6d ${best._5 / 1e6}%7.1f ${best._6 / 1e6}%7.1f  $runsStr")
      }
    }
    spark.stop()
  }

  private def SparkEntry_queries = graft.SparkEntry.queries
}
