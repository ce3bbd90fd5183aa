package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch: run the REAL `stream_dedup_lsh` gate (streaming engine and
  * all) with a listener that buckets wall time per job description, so
  * the per-batch phases (`graft-lsh-<batch> <phase>` labels set inside
  * `lshDedupStream`) and the unlabeled engine/stage jobs are separately
  * attributable — ProfileLshStream replicates the batch bodies but
  * cannot see engine overhead or the inter-job driver gaps. */
object ProfileLshGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
          // strip the batch id so phases aggregate across batches
          val key = desc.replaceAll("graft-lsh-\\d+", "graft-lsh")
          agg.synchronized {
            val (n, tot) = agg.getOrElse(key, (0, 0.0))
            agg.update(key, (n + 1, tot + s))
          }
        }
      }
    }

    // warm-up: full gate once at sf0.001 (JIT + codegen), unlistened
    graft.SparkEntry.queries("stream_dedup_lsh")(spark, "/root/testdata/sf0.001").count()

    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries("stream_dedup_lsh")(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    println(f"== stream_dedup_lsh $dir pairs=$n wall=$wall%.3f s")
    val jobTotal = agg.values.map(_._2).sum
    agg.toSeq.sortBy(-_._2._2).foreach { case (desc, (cnt, tot)) =>
      println(f"  $tot%7.3f s  ($cnt%3d jobs)  $desc")
    }
    println(f"  ${wall - jobTotal}%7.3f s  (driver/engine gaps — wall minus job time)")
    spark.stop()
  }
}
