package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: per-job wall breakdown for the iterative graph gates, to
  * attribute the fixpoint constant (broadcast builds vs shuffles vs
  * checkpoint materialization). */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val stages = j.stageInfos.map(si => s"(${si.numTasks})").mkString("<")
        starts.put(j.jobId, (System.nanoTime(), stages))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 5) println(f"    job=${j.jobId}%-4d ${ms}%7.0f ms  $d")
        }
      }
    })
    def time(name: String)(f: => Long): Unit = {
      print(s"== $name warm\n")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"== $name run$i  ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    time("graph_pagerank")(
      graft.queries.RdfSetQueries.all("graph_pagerank")(spark, dir).count())
    spark.stop()
  }
}
