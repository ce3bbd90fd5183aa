package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.bitemp.TxLog

/** Streaming ingestion (SURVEY §2.9): the reference's sequential indexer —
  * a strictly ordered fold of tx events into index state
  * (crux-core/src/crux/tx.clj:266-391) — re-expressed as Structured
  * Streaming `foreachBatch` with ONE writer: micro-batch id = tx id, ops
  * within a batch applied through [[TxLog.applyTx]] in batch order.
  *
  * State lives in a parquet "index store" directory, rewritten per batch
  * (copy-on-write snapshot — the checkpoint-sink shape of
  * crux-core/src/crux/checkpoint.clj). At scale the same foreachBatch body
  * targets a table format with MERGE/append instead of full rewrite; the
  * single-writer total order is what preserves the reference's semantics.
  */
object IngestStream {

  /** Start the single-writer ingest: `opsStream` rows follow
    * [[TxLog.opSchema]] (including intra-tx seq); each micro-batch
    * commits as one transaction. */
  def start(spark: SparkSession, opsStream: DataFrame, stateDir: String,
      checkpointDir: String,
      txTime: Long => java.time.LocalDateTime =
        _ => java.time.LocalDateTime.now(java.time.Clock.systemUTC())): StreamingQuery = {
    opsStream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ops: DataFrame, batchId: Long) =>
        val sp = ops.sparkSession
        val current = loadState(sp, stateDir)
        // ops carry their own intra-tx seq (opSchema) — no global-window
        // renumbering; a single unpartitioned sort would serialize at scale
        val (next, _) = TxLog.applyTx(current, ops, batchId, txTime(batchId))
        // copy-on-write snapshot commit (single writer => safe)
        val tmp = stateDir + ".tmp"
        next.write.mode("overwrite").parquet(tmp)
        val fs = new java.io.File(stateDir)
        deleteRec(fs)
        new java.io.File(tmp).renameTo(fs)
        ()
      }
      .start()
  }

  def loadState(spark: SparkSession, stateDir: String): DataFrame =
    if (new java.io.File(stateDir).isDirectory)
      spark.read.schema(TxLog.versionSchema).parquet(stateDir)
    else TxLog.emptyState(spark)

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete(); ()
  }

  /** Windowed streaming aggregation over the events stream (the stream-
    * query side Spark adds on top of the reference's ingest-only model):
    * tumbling-window counts per event type, complete mode. */
  def windowedCounts(spark: SparkSession, eventsPath: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file streams need a directory source; stage single files via symlink
    val src = new java.io.File(eventsPath)
    val eventsDir =
      if (src.isDirectory) eventsPath
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(src.getName), src.toPath.toAbsolutePath)
        d.toString
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(eventsDir)
      .withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    val agg = stream
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
    val name = "windowed_counts_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("total"))
  }
}
