package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.bitemp.{Bitemp, TxLog}
import graft.sources.Tables

/** Phase-level timer for the interactive cas-tx path (scratch tool). */
object ProfileCas {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("P", "32")).config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("ingest_cas")(spark, "/root/testdata/sf0.001").count()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.remove(j.jobId)).foreach { t0 =>
          println(f"      job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%7.1f ms  ${spark.sparkContext.getLocalProperty("phase")}")
        }
    })
    (1 to 2).foreach { round =>
      def t[A](name: String)(f: => A): A = {
        spark.sparkContext.setLocalProperty("phase", name)
        val t0 = System.nanoTime(); val r = f
        println(f"[$round] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
      }
      Tables.invalidate(spark, dir); Tables.load(spark, dir, "events")
      val t0all = System.nanoTime()
      val t0 = java.time.LocalDateTime.parse("2024-02-01T00:00")
      val ev = Tables.load(spark, dir, "events")
        .filter(col("ts") < lit(java.time.LocalDateTime.parse("2024-01-11T00:00")))
      val puts = ev.select(
        lit("put").as("op"), col("user_id").cast("string").as("eid"),
        col("event_type").as("content_hash"), col("ts").as("start_vt"),
        lit(null).cast("timestamp_ntz").as("end_vt"),
        lit(null).cast("timestamp_ntz").as("at_vt"),
        lit(null).cast("string").as("expected_hash"), col("event_id").as("seq"))
      val (state1, _) = t("seed applyTx") {
        TxLog.applyTx(TxLog.emptyState(spark), puts, 0L, t0,
          Some(TxLog.TxShape(false, false, false)))
      }
      val snap = Bitemp.asOfTime(
        state1.filter(col("eid").cast("long") <= 10),
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")),
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")))
      val casOps = snap
        .select(lit("cas").as("op"), col("eid"),
          concat(col("content_hash"), lit("_v2")).as("content_hash"),
          lit(null).cast("timestamp_ntz").as("start_vt"),
          lit(null).cast("timestamp_ntz").as("end_vt"),
          lit(null).cast("timestamp_ntz").as("at_vt"),
          col("content_hash").as("expected_hash"), col("eid").cast("long").as("seq"))
      val (state2, _) = t("cas applyTx") {
        TxLog.applyTx(state1, casOps, 1L, t0.plusHours(1),
          Some(TxLog.TxShape(true, false, false)))
      }
      import scala.jdk.CollectionConverters._
      val badTx = spark.createDataFrame(List(
        org.apache.spark.sql.Row("match", "11", null, null, null, null, "WRONG_HASH", 1L),
        org.apache.spark.sql.Row("put", "999", "SHOULD_NOT_APPEAR",
          java.sql.Timestamp.valueOf("2024-02-01 00:00:00").toLocalDateTime,
          null, null, null, 2L)).asJava, TxLog.opSchema)
      val (st3, _) = t("bad applyTx") {
        TxLog.applyTx(state2, badTx, 2L, t0.plusHours(2),
          Some(TxLog.TxShape(true, false, false)))
      }
      t("final asOf") {
        Bitemp.asOfTime(st3,
            lit(java.time.LocalDateTime.parse("2024-03-01T00:00")),
            lit(java.time.LocalDateTime.parse("2024-03-01T00:00")))
          .select(col("eid"), col("content_hash")).count()
      }
      println(f"[$round] TOTAL          ${(System.nanoTime() - t0all) / 1e9}%6.3f s")
    }
    spark.stop()
  }
}
