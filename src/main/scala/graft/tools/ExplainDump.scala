package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump `.explain("formatted")` for a list of gates to files —
  * the optimization rounds' evidence artifact (`plans/r<N>/<gate>_<tag>.txt`).
  * Runs each gate once (the returned frame may be built by eager staging
  * work) and captures the FORMATTED plan of the returned DataFrame.
  *
  * Usage: runMain graft.tools.ExplainDump <gate1,gate2,...> <outDir> <tag> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val gates = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = args(1)
    val tag = if (args.length > 2) args(2) else "before"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    gates.foreach { g =>
      graft.SparkEntry.queries.get(g) match {
        case None => System.err.println(s"[explain] $g: unknown gate")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$outDir/${g}_$tag.txt"), plan)
            println(s"[explain] $g -> $outDir/${g}_$tag.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $g FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
