package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Scratch: measured recall of hyperplane LSH at various probe counts. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.load(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(e, q, 10).select(col("qid"), col("cid"))
    for (p <- Seq(1, 5, 9, 17)) {
      val lsh = Similarity.hyperplaneLsh(e, q, 10, probes = p)
        .select(col("qid"), col("cid"))
      val hits = brute.join(lsh, Seq("qid", "cid"))
        .groupBy(col("qid")).agg(count(lit(1)).as("h"))
      val perQ = brute.select(col("qid")).distinct()
        .join(hits, Seq("qid"), "left")
        .select((coalesce(col("h"), lit(0L)) / 10.0).as("recall"))
      val r = perQ.agg(avg(col("recall")), min(col("recall"))).head()
      println(f"probes=$p%2d mean=${r.getDouble(0)}%.2f min=${r.getDouble(1)}%.2f")
    }
    spark.stop()
  }
}
