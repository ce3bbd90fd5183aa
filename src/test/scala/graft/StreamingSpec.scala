package graft

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.TxLog
import graft.streaming.IngestStream

/** Single-writer streaming ingest: secondary-index hook (tx.clj:400-410)
  * and await-tx (api.clj:24-91) semantics. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("secondary sinks replay each committed tx; awaitTx sees the commit marker") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_stream_spec").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"; val ckDir = s"$base/ck"
    new java.io.File(opsDir).mkdirs()

    // two single-op tx files => two micro-batches
    Seq(("a", "v1"), ("b", "v2")).zipWithIndex.foreach { case ((eid, v), i) =>
      val stage = s"$base/stage$i"
      spark.createDataFrame(List(
        Row("put", eid, v, LocalDateTime.parse("2020-01-01T00:00").plusDays(i.toLong),
          null, null, null, 0L)).asJava, TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }

    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long)]() // (txId, opCount)
    val stream = spark.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1").parquet(opsDir)
    val q = IngestStream.start(spark, stream, stateDir, ckDir,
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      secondarySinks = Seq((ops: DataFrame, txId: Long) =>
        seen.synchronized { seen += ((txId, ops.count())); () }))
    q.awaitTermination()

    assert(IngestStream.awaitTx(stateDir, 1L, timeoutMs = 5000) >= 1L)
    assert(seen.sortBy(_._1).toList == List((0L, 1L), (1L, 1L)))
    val state = IngestStream.loadState(spark, stateDir)
    assert(state.count() == 2)
    intercept[java.util.concurrent.TimeoutException] {
      IngestStream.awaitTx(stateDir, 99L, timeoutMs = 300)
    }
  }

  test("decodeKafkaOps turns Kafka-shaped records into opSchema rows") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    // the exact column set readStream.format("kafka") yields
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    def rec(json: String, offset: Long) =
      Row(null, json.getBytes("UTF-8"), "tx-log", 0, offset,
        java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 0)
    val kafka = spark.createDataFrame(List(
      rec("""{"op":"put","eid":"a","content_hash":"v1","start_vt":"2020-01-01T00:00:00","seq":7}""", 0L),
      rec("""{"op":"delete","eid":"b","start_vt":"2020-01-02T00:00:00"}""", 1L),
      rec("""{"op":"cas","eid":"a","content_hash":"v2","at_vt":"2020-01-03T00:00:00","expected_hash":"v1"}""", 2L)
    ).asJava, kafkaSchema)

    val ops = IngestStream.decodeKafkaOps(kafka)
    assert(ops.schema == TxLog.opSchema)
    val byEidOp = ops.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(byEidOp(("put", "a")).getLong(7) == 7L)      // explicit seq wins
    assert(byEidOp(("delete", "b")).getLong(7) == 1L)   // offset fills in
    assert(byEidOp(("cas", "a")).getString(6) == "v1")  // expected_hash rides
    assert(byEidOp(("put", "a")).getAs[LocalDateTime]("start_vt") ==
      LocalDateTime.parse("2020-01-01T00:00"))

    // decoded ops apply through the same TxLog path as any other source
    val (st, aborted) = TxLog.applyTx(TxLog.emptyState(spark),
      ops.filter(ops("op") === "put"), 0L, LocalDateTime.parse("2020-06-01T00:00"))
    assert(!aborted && st.count() == 1)
  }
}
