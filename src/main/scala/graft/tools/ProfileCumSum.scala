package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Scratch: the r12 two-pass prefix sum vs the single-window running sum
  * on a ONE-KEY corpus, across row counts — the measurement behind
  * clearing the r11 `weak` scale marks on the mixture stages.
  *
  * The window form puts every row of a partition key into ONE task: its
  * cost is a single-task sort of the whole key, which is fine at 10⁴
  * rows and fatal at 10¹¹. The two-pass form pays fixed overhead (range
  * sampling, a persisted slim projection, an eager materialization, a
  * broadcast) but its sort runs across all slices. This prints both
  * times per row count so SCALE.md can record the crossover — the claim
  * is NOT "two-pass is always faster", it is "two-pass is flat in the
  * key count and scales with slices, window is linear in the biggest
  * key".
  */
object ProfileCumSum {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(50000L, 1000000L, 5000000L, 20000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }
    // JVM/codegen warmup: both forms once, so the first table row is not
    // charged ~5 s of JIT (the usual first-Spark-query-in-a-JVM cost)
    {
      val wu = spark.range(10000).select(col("id").as("doc_id"),
        lit("all").as("source"), pmod(col("id"), lit(97L)).as("n_tokens"),
        Sampling.hashFraction(col("id"), "x").as("_draw"))
      Sampling.distributedCumSum(wu, Seq("source"),
        Seq(col("_draw"), col("doc_id")), col("n_tokens"), "cum")
        .agg(sum(col("cum"))).collect()
      val W = org.apache.spark.sql.expressions.Window
      wu.withColumn("cum", sum(col("n_tokens")).over(
        W.partitionBy(col("source")).orderBy(col("_draw"), col("doc_id"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)))
        .agg(sum(col("cum"))).collect()
    }
    println("rows       two-pass(s)  window(s)  (sums must agree)")
    for (n <- sizes) {
      // one key ("all"), deterministic-shuffle order like takeTokens
      // (the draw materialized as a column, as takeTokens does)
      val d = spark.range(n).select(col("id").as("doc_id"),
        lit("all").as("source"), pmod(col("id"), lit(997L)).as("n_tokens"),
        Sampling.hashFraction(col("id"), "x").as("_draw"))
      val (tTwo, sTwo) = time {
        Sampling.distributedCumSum(d, Seq("source"),
            Seq(col("_draw"), col("doc_id")),
            col("n_tokens"), "cum")
          .agg(sum(col("cum"))).collect()(0).getLong(0)
      }
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("source"))
        .orderBy(col("_draw"), col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val (tWin, sWin) = time {
        d.withColumn("cum", sum(col("n_tokens")).over(w))
          .agg(sum(col("cum"))).collect()(0).getLong(0)
      }
      require(sTwo == sWin, s"sum mismatch at n=$n: $sTwo vs $sWin")
      println(f"$n%-10d ${tTwo}%10.2f ${tWin}%10.2f")
    }
    spark.stop()
  }
}
