package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit helper (the .explain feedback loop the build brief
  * mandates): prints each named gate's formatted physical plan at the
  * given sf dir. `runMain graft.Explain q21 dedup_embedding_lsh` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"  explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
