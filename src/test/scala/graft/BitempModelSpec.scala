package graft

import java.time.LocalDateTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.{Bitemp, TxLog}

/** Generative cross-check of the DataFrame tx machinery against an
  * independent in-memory model of the reference's valid-time semantics
  * (crux-core/src/crux/tx.clj:59-98 put-delete-etxs; the generative-test
  * habit of crux's codec_test.clj applied to the subtlest operator).
  *
  * Model: a valid-time timeline `TreeMap[vt -> (value?, stampTx)]` where
  *  - put/delete without end writes at start and overwrites the contiguous
  *    future run of entries IDENTICAL (same physical version stamp) to the
  *    one visible at start;
  *  - put/delete with [start, end) overwrites every existing vt inside the
  *    range and re-instates the entry visible at end with its ORIGINAL
  *    stamp (tombstone if none).
  * Replaying ops for txs ≤ T yields ground truth for any basis (VT, T).
  */
class BitempModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val epoch = LocalDateTime.parse("2020-01-01T00:00:00")
  private def day(i: Int): LocalDateTime = epoch.plusDays(i.toLong)

  // ------------------------------------------------------------- the model
  private case class Entry(value: Option[String], stampTx: Long)
  private type Timeline = scala.collection.immutable.TreeMap[LocalDateTime, Entry]
  private val emptyTl: Timeline = scala.collection.immutable.TreeMap.empty

  private def visibleEntry(tl: Timeline, vt: LocalDateTime): Option[Entry] =
    tl.rangeTo(vt).lastOption.map(_._2)

  private case class Op(value: Option[String], start: LocalDateTime, end: Option[LocalDateTime])

  private def applyModel(tl: Timeline, op: Op, txId: Long): Timeline = op.end match {
    case None =>
      val vis = visibleEntry(tl, op.start)
      var out = tl.updated(op.start, Entry(op.value, txId))
      var stop = false
      tl.keysIteratorFrom(op.start).filter(_.isAfter(op.start)).foreach { k =>
        if (!stop && vis.contains(tl(k))) out = out.updated(k, Entry(op.value, txId))
        else stop = true
      }
      out
    case Some(end) =>
      val visEnd = visibleEntry(tl, end)
      var out = tl
      tl.keysIteratorFrom(op.start).takeWhile(_.isBefore(end)).foreach { k =>
        out = out.updated(k, Entry(op.value, txId))
      }
      out = out.updated(op.start, Entry(op.value, txId))
      out.updated(end, visEnd.getOrElse(Entry(None, txId)))
  }

  /** In-memory mirror of asOf's max-by-(vt, tx) + tombstone filter, for
    * exhaustive grid checks over collected rows. */
  private def asOfRows(rows: Seq[(LocalDateTime, LocalDateTime, Long, Option[String])],
      vt: LocalDateTime, maxTx: Long): Option[String] =
    rows.filter { case (v, _, tx, _) => !v.isAfter(vt) && tx <= maxTx }
      .sortBy { case (v, _, tx, _) => (v, tx) }
      .lastOption.flatMap(_._4)

  // -------------------------------------------------------------- the test
  private def runScenario(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val values = Vector("v1", "v2", "v3")
    val ops: Seq[Op] = (0 until 5).map { _ =>
      val start = day(rnd.nextInt(7))
      val isDelete = rnd.nextInt(5) == 0
      val v = if (isDelete) None else Some(values(rnd.nextInt(values.size)))
      val end = if (rnd.nextInt(5) < 2) Some(start.plusDays(1L + rnd.nextInt(3))) else None
      Op(v, start, end)
    }

    // DataFrame side: one op per tx, txId = index
    import scala.jdk.CollectionConverters._
    var state = TxLog.emptyState(spark)
    ops.zipWithIndex.foreach { case (op, i) =>
      val row = Row(if (op.value.isDefined) "put" else "delete", "e1",
        op.value.orNull, op.start, op.end.orNull, null, null, 0L)
      val opsDf = spark.createDataFrame(List(row).asJava, TxLog.opSchema)
      val (next, aborted) = TxLog.applyTx(state, opsDf, i.toLong, epoch.plusHours(i.toLong))
      assert(!aborted)
      state = next.localCheckpoint(true)
    }
    val collected = state.collect().toSeq.map { r =>
      (r.getAs[LocalDateTime]("vt"), r.getAs[LocalDateTime]("tt"),
        r.getAs[Long]("tx_id"), Option(r.getAs[String]("content_hash")))
    }

    // exhaustive grid: every basis tx × op-boundary vts (± 12h)
    val vts = ops.flatMap(o => o.start +: o.end.toSeq)
      .flatMap(t => Seq(t.minusHours(12), t, t.plusHours(12))).distinct
    for (t <- 0 until 5) {
      val tl = ops.take(t + 1).zipWithIndex
        .foldLeft(emptyTl) { case (acc, (op, i)) => applyModel(acc, op, i.toLong) }
      for (vt <- vts) {
        val expected = visibleEntry(tl, vt).flatMap(_.value)
        val actual = asOfRows(collected, vt, t.toLong)
        assert(actual == expected,
          s"seed=$seed basis=(vt=$vt, tx=$t) ops=$ops rows=$collected")
      }
    }

    // spot-check the real distributed operator on 3 random bases
    (0 until 3).foreach { _ =>
      val t = rnd.nextInt(5)
      val vt = vts(rnd.nextInt(vts.size))
      val tl = ops.take(t + 1).zipWithIndex
        .foldLeft(emptyTl) { case (acc, (op, i)) => applyModel(acc, op, i.toLong) }
      val expected = visibleEntry(tl, vt).flatMap(_.value)
      val actual = Bitemp.asOf(state, lit(vt), lit(t.toLong))
        .collect().headOption.map(_.getAs[String]("content_hash"))
      assert(actual == expected, s"asOf seed=$seed basis=(vt=$vt, tx=$t) ops=$ops")
    }
  }

  (1 to 6).foreach { seed =>
    test(s"random tx history matches the valid-time model (seed $seed)") {
      runScenario(seed)
    }
  }
}
