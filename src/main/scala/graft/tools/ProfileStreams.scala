package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Scratch: wall-time + engine-reported per-batch duration breakdown for
  * the streaming gates, to attribute their fixed constants (state-store
  * commits vs WAL vs planning vs the actual batch work). */
object ProfileStreams {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gates = if (args.length > 1) args.drop(1).toSet
      else Set("stream_dedup", "stream_join", "stream_sessions", "stream_matview")
    sys.env.get("GRAFT_DEBUG_PLAN").foreach(v => System.setProperty("graft.debug.plan", v))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(j.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
        val site = Option(j.properties).map(_.getProperty("callSite.long", "")).getOrElse("")
          .linesIterator.toSeq.headOption.getOrElse("")
        val stages = j.stageInfos.map(si => s"(${si.numTasks})").mkString("<")
        starts.put(j.jobId, (System.nanoTime(), s"$desc | $stages | ${site.take(90)}"))
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { case (t0, d) =>
          val ms = (System.nanoTime() - t0) / 1e6
          if (ms > 5) println(f"    job=${j.jobId}%-4d ${ms}%7.0f ms  $d")
        }
      }
    })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.map { case (k, v) => s"$k=$v" }.mkString(" ")
        val st = Option(p.stateOperators).toSeq.flatten.map { so =>
          s"[op=${so.operatorName} rows=${so.numRowsTotal} commit=${so.commitTimeMs}ms]"
        }.mkString(" ")
        println(s"  batch=${p.batchId} rows=${p.numInputRows} $dur $st")
      }
    })
    def time(name: String)(f: String => Long): Unit = {
      // run 1: warm-up at sf0.001 (JIT + codegen caches, not target IO);
      // runs 2-3 timed at the target dir
      print(s"== $name warm\n"); f("/root/testdata/sf0.001")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f(dir)
        println(f"== $name run$i  ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    import graft.streaming.IngestStream
    if (gates("stream_dedup"))
      time("stream_dedup")(d => IngestStream.dedupStream(spark, s"$d/documents.parquet").count())
    if (gates("stream_join"))
      time("stream_join")(d => IngestStream.streamJoin(spark, s"$d/events.parquet", 30).count())
    if (gates("stream_sessions"))
      time("stream_sessions")(d => IngestStream.sessions(spark, s"$d/events.parquet", 30).count())
    if (gates("stream_matview"))
      time("stream_matview")(d => graft.queries.SqlStreamQueries.all("stream_matview")(spark, d).count())
    if (gates("stream_matview_join"))
      time("stream_matview_join")(d => graft.queries.SqlStreamQueries.all("stream_matview_join")(spark, d).count())
    if (gates("stream_matview_sum"))
      time("stream_matview_sum")(d => graft.queries.SqlStreamQueries.all("stream_matview_sum")(spark, d).count())
    if (gates("stream_dedup_lsh"))
      time("stream_dedup_lsh")(d => IngestStream.lshDedupStream(spark, s"$d/documents.parquet").count())
    spark.stop()
  }
}
