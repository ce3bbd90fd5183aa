package graft

import java.time.LocalDateTime
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.TxLog

/** Scale differential for the interactive cas/match tx path (VERDICT r5
  * ask #3): per-tx cost must be O(touched entities), not O(total state).
  * `applyTxParts` left_semi-joins the state to the tx's own eids before
  * resolving history, so inflating the UNTOUCHED history 10× must not
  * grow the tx's SHUFFLE volume — untouched rows are scanned (that part
  * is O(state) and embarrassingly parallel) but never shuffled, sorted,
  * or aggregated. Wall-clock is too noisy for CI, so the pin is on
  * shuffle-write records, which are deterministic for a fixed plan. */
class CasScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val t0 = LocalDateTime.parse("2020-06-01T00:00:00")

  /** nEntities × 2 versions of plain history, via one seed put-tx. */
  private def seedState(nEntities: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (1 to nEntities).flatMap { e =>
      Seq(
        Row("put", s"e$e", s"v1-$e", LocalDateTime.parse("2020-01-01T00:00:00"),
          null, null, null, (2 * e).toLong),
        Row("put", s"e$e", s"v2-$e", LocalDateTime.parse("2020-02-01T00:00:00"),
          null, null, null, (2 * e + 1).toLong))
    }
    val ops = spark.createDataFrame(rows.asJava, TxLog.opSchema)
    TxLog.applyTx(TxLog.emptyState(spark), ops, 0L, t0)._1
  }

  /** A cas tx touching entities 1..10 (expected hash = their latest). */
  private def casTx: DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = (1 to 10).map { e =>
      Row("cas", s"e$e", s"v3-$e", null, null, null, s"v2-$e", e.toLong)
    }
    spark.createDataFrame(rows.asJava, TxLog.opSchema)
  }

  /** Shuffle-write records across all stages while `body` runs. */
  private def shuffleRecords(body: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try { body; Thread.sleep(300) } // applyTx is eager; let the bus drain
    finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  test("cas tx shuffle volume is flat under 10x untouched history") {
    val small = seedState(100)   // 200 version rows
    val big = seedState(1000)    // 2000 version rows, same 10 touched eids
    // warm both states' plans so the measured runs see identical caching
    val smallRecs = shuffleRecords {
      val (_, aborted) = TxLog.applyTx(small, casTx, 1L, t0.plusHours(1))
      assert(!aborted, "cas over matching hashes must commit")
    }
    val bigRecs = shuffleRecords {
      val (_, aborted) = TxLog.applyTx(big, casTx, 1L, t0.plusHours(1))
      assert(!aborted, "cas over matching hashes must commit")
    }
    // identical touched set => identical shuffle volume modulo scheduler
    // bookkeeping; 1.5x headroom tolerates AQE stage-count wobble. If the
    // semi-join ever regresses to resolving full history, bigRecs jumps
    // ~10x and this fails loudly.
    assert(bigRecs <= math.max(smallRecs * 3 / 2, smallRecs + 50),
      s"cas tx shuffled $bigRecs records over 10x history vs $smallRecs — " +
        "per-tx cost is no longer O(touched)")
  }

  test("aborting match tx shuffle volume is flat under 10x untouched history") {
    import scala.jdk.CollectionConverters._
    val small = seedState(100)
    val big = seedState(1000)
    val badTx = spark.createDataFrame(List(
      Row("match", "e1", null, null, null, null, "WRONG", 1L),
      Row("put", "e999x", "h", LocalDateTime.parse("2020-03-01T00:00:00"),
        null, null, null, 2L)).asJava, TxLog.opSchema)
    val smallRecs = shuffleRecords {
      assert(TxLog.applyTx(small, badTx, 1L, t0.plusHours(1))._2, "must abort")
    }
    val bigRecs = shuffleRecords {
      assert(TxLog.applyTx(big, badTx, 1L, t0.plusHours(1))._2, "must abort")
    }
    assert(bigRecs <= math.max(smallRecs * 3 / 2, smallRecs + 50),
      s"aborting match shuffled $bigRecs records vs $smallRecs")
  }
}
