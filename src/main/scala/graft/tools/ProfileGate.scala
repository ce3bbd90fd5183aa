package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: run any `SparkEntry.queries` gate with a listener that
  * buckets wall time per job description (batch ids stripped so phases
  * aggregate across micro-batches). Shows where a gate's wall goes —
  * labeled phases, unlabeled jobs, and the driver/engine remainder the
  * job times can't see. Overlapping jobs double-count against wall, so
  * read the remainder as a lower bound once phases run concurrently.
  *
  * Usage: runMain graft.tools.ProfileGate <gate> [sfDir]
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val gate = args.headOption.getOrElse("stream_join")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val agg = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Double)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("(none)")
        jobs.put(js.jobId, (desc, System.nanoTime())); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (desc, t0) =>
          val s = (System.nanoTime() - t0) / 1e9
          val key = "graft-[a-z]+-\\d+".r
            .replaceAllIn(desc, m => m.matched.replaceAll("-\\d+$", ""))
            .replaceAll("\\d{6,}", "<n>").replaceAll("id = [0-9a-f-]+", "id = <id>")
            .take(90)
          agg.synchronized {
            val (n, tot) = agg.getOrElse(key, (0, 0.0))
            agg.update(key, (n + 1, tot + s))
          }
        }
      }
    }

    val fn = graft.SparkEntry.queries(gate)
    fn(spark, "/root/testdata/sf0.001").count() // warm-up, unlistened

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = fn(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // listener-bus delivery is async: give trailing onJobEnd events time
    // to drain before reading, or the "remainder" line (the quantity
    // this tool exists to measure) is inflated by dropped jobs
    Thread.sleep(1000)
    spark.sparkContext.removeSparkListener(listener)

    println(f"== $gate $dir rows=$n wall=$wall%.3f s")
    val snapshot = agg.synchronized(agg.toSeq)
    val jobTotal = snapshot.map(_._2._2).sum
    snapshot.sortBy(-_._2._2).foreach { case (desc, (cnt, tot)) =>
      println(f"  $tot%7.3f s  ($cnt%3d jobs)  $desc")
    }
    println(f"  ${wall - jobTotal}%7.3f s  (driver/engine remainder)")
    spark.stop()
  }
}
