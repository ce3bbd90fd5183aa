package graft.bitemp

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Bounded ALL-DRIVER route for the INTERACTIVE transaction paths
  * ([[TxLog.applyTx]] and [[TxLog.applyBatch]]) — r15 VERDICT #4, the
  * same size-route pattern as the graph fixpoints and the suffix-index
  * probe: at interactive op counts the sequential tx fold is pure
  * scheduler latency (ingest_cas measured 16 jobs over 6 SQL execs for
  * three txs of ≤ 16k ops), so while BOTH the current state and the
  * batch's op list fit [[DefaultTxDriverRows]] (limit-bounded collects;
  * conf `spark.graft.txDriverRows`, 0 disables), the whole fold runs in
  * memory and the new state returns as a LocalRelation — zero jobs per
  * subsequent tx, because a LocalRelation collects without a job.
  *
  * SEMANTICS ARE NOT REIMPLEMENTED: the per-entity fold is the same
  * [[TxLogFold.foldEntity]] the distributed groupByKey fold runs (the
  * one implementation the randomized differential specs pin against the
  * sequential applyTx oracle); this object only adds the match/cas
  * precondition in its in-memory form — an exact mirror of
  * [[TxLog.applyTxParts]]' candidate model: resolved pre-tx history
  * (cand_seq −1) plus EARLIER same-tx writes (cand_seq < check seq),
  * visible = max by (vt, tx_id, cand_seq) at the basis, abort iff any
  * expected hash differs null-safely. TxDriverSpec pins the route ≡ the
  * conf-disabled distributed path on randomized cas/evict/range
  * programs.
  *
  * A 100 TB state (or a bulk tx) is over the bound after one bounded
  * collect and takes the unchanged distributed paths.
  */
private[graft] object TxDriver {

  /** State rows AND batch op rows must EACH fit this bound to route
    * driver-side. ~128k version rows ≈ a few tens of MB of driver heap —
    * the repo's bounded-artifact budget. Conf: `spark.graft.txDriverRows`
    * (0 disables — the differential spec's lever). */
  private[graft] val DefaultTxDriverRows: Long = 1L << 17

  private def bound(df: DataFrame): Long =
    graft.sources.SessionConf.boundFromConf(df.sparkSession,
      "spark.graft.txDriverRows", DefaultTxDriverRows, DefaultTxDriverRows)

  private def takeNOf(b: Long): Int =
    if (b >= Int.MaxValue - 1) Int.MaxValue else (b + 1L).toInt

  /** Bounded collect: None when over the bound. A LocalRelation input
    * (the previous driver-routed tx's state) materializes without a job. */
  private def collectBounded(df: DataFrame, b: Long): Option[Array[Row]] = {
    val takeN = takeNOf(b)
    val rows = df.limit(takeN).collect()
    if (rows.length >= takeN) None else Some(rows)
  }

  private final case class OpRow(op: String, eid: String, hash: Option[String],
      startVt: Option[LocalDateTime], endVt: Option[LocalDateTime],
      atVt: Option[LocalDateTime], expected: Option[String], seq: Long)

  private def opt[A](r: Row, i: Int): Option[A] =
    if (r.isNullAt(i)) None else Some(r.getAs[A](i))

  private def opRowsOf(rows: Array[Row],
      schema: org.apache.spark.sql.types.StructType): Array[OpRow] = {
    val (iOp, iEid, iH, iS, iE, iA, iX, iQ) = (schema.fieldIndex("op"),
      schema.fieldIndex("eid"), schema.fieldIndex("content_hash"),
      schema.fieldIndex("start_vt"), schema.fieldIndex("end_vt"),
      schema.fieldIndex("at_vt"), schema.fieldIndex("expected_hash"),
      schema.fieldIndex("seq"))
    rows.map(r => OpRow(r.getString(iOp), r.getString(iEid),
      opt[String](r, iH), opt[LocalDateTime](r, iS), opt[LocalDateTime](r, iE),
      opt[LocalDateTime](r, iA), opt[String](r, iX),
      if (r.isNullAt(iQ)) 0L else r.getLong(iQ)))
  }

  private implicit val ldtOrd: Ordering[LocalDateTime] = _ compareTo _

  private final case class V(vt: LocalDateTime, tt: LocalDateTime,
      txId: Long, hash: Option[String], tomb: Boolean)

  /** In-memory version store; one instance per routed call. */
  private final class MemState {
    val byEid = new scala.collection.mutable.HashMap[
      String, scala.collection.mutable.ArrayBuffer[V]]

    def seed(rows: Array[Row],
        schema: org.apache.spark.sql.types.StructType): Unit = {
      val (iE, iV, iT, iX, iH, iB) = (schema.fieldIndex("eid"),
        schema.fieldIndex("vt"), schema.fieldIndex("tt"),
        schema.fieldIndex("tx_id"), schema.fieldIndex("content_hash"),
        schema.fieldIndex("tombstone"))
      rows.foreach { r =>
        byEid.getOrElseUpdate(r.getString(iE),
          scala.collection.mutable.ArrayBuffer.empty[V]) +=
          V(r.getAs[LocalDateTime](iV), r.getAs[LocalDateTime](iT),
            r.getLong(iX), opt[String](r, iH), r.getBoolean(iB))
      }
    }

    /** Apply ONE transaction; returns true (state untouched) on a
      * match/cas abort. Mirrors [[TxLog.applyTx]]'s eager path exactly:
      * precondition first, then the fold, then evict-wins merge. */
    def applyOne(ops: Array[OpRow], txId: Long,
        txTime: LocalDateTime): Boolean = {
      val checks = ops.filter(o => o.op == "match" || o.op == "cas")
      if (checks.nonEmpty) {
        // candidates = resolved pre-tx history (cand_seq −1) + EARLIER
        // same-tx writes — applyTxParts' exact model, including the
        // documented deviation (range caps are not candidates)
        val txWrites = ops.iterator
          .filter(o => o.op == "put" || o.op == "delete" || o.op == "cas")
          .map { o =>
            val vt =
              if (o.op == "cas") o.atVt.orElse(o.startVt).getOrElse(txTime)
              else o.startVt.getOrElse(txTime)
            val h = if (o.op == "delete") None else o.hash
            (o.eid, vt, txId, h, o.seq)
          }.toArray
        val aborted = checks.exists { c =>
          val basis = c.atVt.orElse(c.startVt).getOrElse(txTime)
          val resolved = byEid.getOrElse(c.eid, Nil).groupBy(_.vt)
            .iterator.map { case (vt, vs) =>
              val w = vs.maxBy(_.txId)
              (vt, w.txId, -1L, w.hash)
            }
          val cands = resolved ++ txWrites.iterator
            .filter(w => w._1 == c.eid && w._5 < c.seq)
            .map(w => (w._2, w._3, w._5, w._4))
          val visible = cands.filter(t => !t._1.isAfter(basis))
            .maxByOption(t => (t._1, t._2, t._3))
            .flatMap(_._4)
          c.expected != visible // null-safe: None == None passes
        }
        if (aborted) return true
      }
      // the fold: identical FoldIn rows to applyPutDeleteTxs' op mapping
      // (cas → put at its basis vt, delete → null hash, evict → no vt),
      // run through the ONE shared foldEntity implementation
      val foldOps: Array[FoldIn] = ops.flatMap { o =>
        o.op match {
          case "evict" =>
            Some(FoldIn(o.eid, 1, None, Some(txTime), txId, None,
              tomb = false, "evict", None, o.seq))
          case "put" | "delete" | "cas" =>
            val isCas = o.op == "cas"
            val vt =
              if (isCas) o.atVt.orElse(o.startVt).getOrElse(txTime)
              else o.startVt.getOrElse(txTime)
            val h = if (o.op == "delete") None else o.hash
            Some(FoldIn(o.eid, 1, Some(vt), Some(txTime), txId, h,
              tomb = false, if (isCas) "put" else o.op, o.endVt, o.seq))
          case _ => None // match (and anything unknown) never folds
        }
      }
      val emitted = foldOps.groupBy(_.eid).iterator.flatMap {
        case (eid, eops) =>
          val hist = byEid.getOrElse(eid, Nil).iterator.map(v =>
            FoldIn(eid, 0, Some(v.vt), Some(v.tt), v.txId, v.hash, v.tomb,
              "", None, 0L))
          TxLogFold.foldEntity(hist ++ eops.iterator)
      }.toArray
      // evict wins over the same tx's writes (foldEntity already emits
      // nothing for an evicted entity); dropping the eid's rows IS the
      // distributed path's anti-join
      ops.iterator.filter(_.op == "evict").map(_.eid).toSet
        .foreach((e: String) => byEid.remove(e))
      emitted.foreach { r =>
        byEid.getOrElseUpdate(r.eid,
          scala.collection.mutable.ArrayBuffer.empty[V]) +=
          V(r.vt, r.tt, r.txId, r.hash, r.tomb)
      }
      false
    }

    def toDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import scala.jdk.CollectionConverters._
      val rows = byEid.iterator.flatMap { case (eid, vs) =>
        vs.iterator.map(v =>
          Row(eid, v.vt, v.tt, v.txId, v.hash.orNull, v.tomb))
      }.toList
      spark.createDataFrame(rows.asJava, TxLog.versionSchema)
    }
  }

  private def stateCols(state: DataFrame): DataFrame =
    state.select(TxLog.versionSchema.fieldNames.map(col).toSeq: _*)

  /** [[TxLog.applyTx]]'s driver route: Some((newState, aborted)) when
    * both the state and the tx fit the bound, None → distributed path. */
  private[bitemp] def tryApplyTx(state: DataFrame, ops: DataFrame,
      txId: Long, txTime: LocalDateTime): Option[(DataFrame, Boolean)] = {
    val b = bound(state)
    if (b <= 0) return None
    try {
      val opsSel = ops.select(TxLog.opSchema.fieldNames.map(col).toSeq: _*)
      val opRows = collectBounded(opsSel, b).getOrElse(return None)
      val stRows = collectBounded(stateCols(state), b).getOrElse(return None)
      val mem = new MemState
      mem.seed(stRows, TxLog.versionSchema)
      if (mem.applyOne(opRowsOf(opRows, TxLog.opSchema), txId, txTime))
        Some((state, true))
      else Some((mem.toDf(state.sparkSession), false))
    } catch {
      // a caller-shaped frame this route can't read (missing column,
      // exotic type) falls back to the distributed path, never fails
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }

  /** [[TxLog.applyBatch]]'s driver route: the WHOLE batch's op lists are
    * pulled in ONE bounded union job (tagged by tx index — the same
    * single-job discipline as applyBatch's classify pass) and the txs
    * fold sequentially in memory — semantically [[TxLog.applyBatchSeq]],
    * the differential oracle itself. */
  private[bitemp] def tryApplyBatch(state: DataFrame,
      txs: Seq[(Long, LocalDateTime, DataFrame)]): Option[DataFrame] = {
    val b = bound(state)
    if (b <= 0) return None
    try {
      val tagged = txs.zipWithIndex.map { case ((_, _, ops), i) =>
        ops.select(lit(i).as("_i") +:
          TxLog.opSchema.fieldNames.map(col).toSeq: _*)
      }.reduce(_ unionByName _)
      val opRows = collectBounded(tagged, b).getOrElse(return None)
      val stRows = collectBounded(stateCols(state), b).getOrElse(return None)
      val mem = new MemState
      mem.seed(stRows, TxLog.versionSchema)
      val taggedSchema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_i",
          org.apache.spark.sql.types.IntegerType) +: TxLog.opSchema.fields)
      val byTx = opRows.groupBy(_.getInt(0))
      txs.zipWithIndex.foreach { case ((txId, txTime, _), i) =>
        val rows = byTx.getOrElse(i, Array.empty[Row])
        // aborted txs leave state unchanged (applyBatch contract)
        mem.applyOne(opRowsOf(rows, taggedSchema), txId, txTime)
        ()
      }
      Some(mem.toDf(state.sparkSession))
    } catch {
      case _: org.apache.spark.sql.AnalysisException => None
    }
  }
}
