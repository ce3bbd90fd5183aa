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
}
