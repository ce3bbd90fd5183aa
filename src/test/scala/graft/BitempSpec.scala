package graft

import java.time.LocalDateTime
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.{Bitemp, TxLog}

/** Ports the reference's bitemporal golden corpus —
  * crux-test/test/crux/tx_test.clj:389-498 `test-put-delete-range-semantics`
  * (all 10 scenarios) plus match/cas/evict and as-of resolution semantics.
  */
class BitempSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def d(s: String): LocalDateTime = LocalDateTime.parse(s + "T00:00:00")

  /** One tx = one op: (value | null=delete, start-vt, end-vt?). */
  private def runScenario(txs: Seq[(Option[String], String, Option[String])]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val state = txs.zipWithIndex.foldLeft(TxLog.emptyState(spark)) {
      case (st, ((value, startVt, endVt), idx)) =>
        val op = Row(
          if (value.isDefined) "put" else "delete",
          "ivan", value.orNull, d(startVt), endVt.map(d).orNull, null, null, 0L)
        val ops = spark.createDataFrame(List(op).asJava, TxLog.opSchema)
        val (next, aborted) = TxLog.applyTx(st, ops, idx.toLong, d("2020-01-01").plusMinutes(idx.toLong))
        assert(!aborted)
        next.localCheckpoint(true)
    }
    state
  }

  private def history(state: DataFrame): Seq[(String, Long, Option[String])] =
    TxLog.resolvedHistory(state).orderBy("vt").collect().toSeq.map { r =>
      (r.getAs[LocalDateTime]("vt").toLocalDate.toString,
        r.getAs[Long]("tx_id"), Option(r.getAs[String]("content_hash")))
    }

  private def check(
      txs: Seq[(Option[String], String, Option[String])],
      expected: Seq[(String, Long, Option[String])]): Unit =
    assert(history(runScenario(txs)) == expected)

  test("put with range writes start and end tombstone") {
    check(
      Seq((Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-26", 0L, Some("26")), ("2019-11-29", 0L, None)))
  }

  test("re-instates the previous value at the end of the range") {
    check(
      Seq((Some("25"), "2019-11-25", None), (Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 1L, Some("26")),
        ("2019-11-29", 0L, Some("25"))))
  }

  test("delete a range") {
    check(
      Seq((Some("25"), "2019-11-25", None), (None, "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 1L, None),
        ("2019-11-29", 0L, Some("25"))))
  }

  test("override a range") {
    check(
      Seq((Some("25"), "2019-11-25", Some("2019-11-27")),
        (None, "2019-11-25", Some("2019-11-27")),
        (Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 1L, None), ("2019-11-26", 2L, Some("26")),
        ("2019-11-27", 2L, Some("26")), ("2019-11-29", 0L, None)))
  }

  test("merge a range") {
    check(
      Seq((Some("25"), "2019-11-25", Some("2019-11-27")),
        (Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 1L, Some("26")),
        ("2019-11-27", 1L, Some("26")), ("2019-11-29", 0L, None)))
  }

  test("shouldn't override the value at end-vt if there's one there") {
    check(
      Seq((Some("25"), "2019-11-25", None), (Some("29"), "2019-11-29", None),
        (Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 2L, Some("26")),
        ("2019-11-29", 1L, Some("29"))))
  }

  test("should re-instate 28 at the end of the range") {
    check(
      Seq((Some("25"), "2019-11-25", None), (Some("28"), "2019-11-28", None),
        (Some("26"), "2019-11-26", Some("2019-11-29"))),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 2L, Some("26")),
        ("2019-11-28", 2L, Some("26")), ("2019-11-29", 1L, Some("28"))))
  }

  test("26.1 should overwrite the full range") {
    check(
      Seq((Some("28"), "2019-11-28", None),
        (Some("26"), "2019-11-26", Some("2019-11-29")),
        (Some("26.1"), "2019-11-26", None)),
      Seq(("2019-11-26", 2L, Some("26.1")), ("2019-11-28", 2L, Some("26.1")),
        ("2019-11-29", 0L, Some("28"))))
  }

  test("27 should override the latter half of the range") {
    check(
      Seq((Some("25"), "2019-11-25", None),
        (Some("26"), "2019-11-26", Some("2019-11-29")),
        (Some("27"), "2019-11-27", None)),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 1L, Some("26")),
        ("2019-11-27", 2L, Some("27")), ("2019-11-29", 0L, Some("25"))))
  }

  test("27 should still override the latter half of the range") {
    check(
      Seq((Some("25"), "2019-11-25", None), (Some("28"), "2019-11-28", None),
        (Some("26"), "2019-11-26", Some("2019-11-29")),
        (Some("27"), "2019-11-27", None)),
      Seq(("2019-11-25", 0L, Some("25")), ("2019-11-26", 2L, Some("26")),
        ("2019-11-27", 3L, Some("27")), ("2019-11-28", 3L, Some("27")),
        ("2019-11-29", 1L, Some("28"))))
  }

  // --- asOf resolution semantics (index_store.clj:746-795) ---

  test("asOf picks latest (vt, tx) <= basis and hides tombstones") {
    val st = runScenario(Seq(
      (Some("25"), "2019-11-25", None),
      (Some("26"), "2019-11-26", None),
      (None, "2019-11-27", None)))
    def liveAt(vt: String, tx: Long): Seq[String] =
      Bitemp.asOf(st, lit(d(vt)), lit(tx)).collect().toSeq.map(_.getAs[String]("content_hash"))
    assert(liveAt("2019-11-25", 10) == Seq("25"))
    assert(liveAt("2019-11-26", 10) == Seq("26"))
    assert(liveAt("2019-11-28", 10) == Seq())          // deleted
    assert(liveAt("2019-11-28", 1) == Seq("26"))       // tx basis before delete
    assert(liveAt("2019-11-24", 10) == Seq())          // before any fact
    assert(liveAt("2019-11-26", 0) == Seq("25"))       // tx basis before correction
  }

  test("corrections: same vt, later tx wins") {
    val st = runScenario(Seq(
      (Some("a"), "2019-11-25", None),
      (Some("b"), "2019-11-25", None)))
    val live = Bitemp.asOf(st, lit(d("2019-11-26")), lit(99L))
      .collect().toSeq.map(_.getAs[String]("content_hash"))
    assert(live == Seq("b"))
    // history without corrections collapses to one row per vt
    assert(history(st) == Seq(("2019-11-25", 1L, Some("b"))))
  }

  // --- match / cas / evict (tx.clj:100-147) ---

  test("match aborts tx when hash differs, commits when equal") {
    import scala.jdk.CollectionConverters._
    val st0 = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    def tx(ops: Seq[Row], id: Long): (DataFrame, Boolean) =
      TxLog.applyTx(st0, spark.createDataFrame(ops.asJava, TxLog.opSchema), id, d("2020-02-01"))
    // match expecting wrong hash + a put => aborted, state unchanged
    val (st1, aborted1) = tx(Seq(
      Row("match", "ivan", null, null, null, d("2020-01-15"), "WRONG", 0L),
      Row("put", "ivan", "v2", d("2020-01-15"), null, null, null, 1L)), 10L)
    assert(aborted1 && history(st1) == history(st0))
    // match expecting the right hash => put lands
    val (st2, aborted2) = tx(Seq(
      Row("match", "ivan", null, null, null, d("2020-01-15"), "v1", 0L),
      Row("put", "ivan", "v2", d("2020-01-15"), null, null, null, 1L)), 11L)
    assert(!aborted2)
    assert(history(st2).contains(("2020-01-15", 11L, Some("v2"))))
    // match on a non-existent entity expecting nil => passes (nil==nil)
    val (_, aborted3) = tx(Seq(
      Row("match", "ghost", null, null, null, d("2020-01-15"), null, 0L),
      Row("put", "ghost", "g1", d("2020-01-15"), null, null, null, 1L)), 12L)
    assert(!aborted3)
  }

  test("match after same-tx range put (documented deviation, r4 advice)") {
    import scala.jdk.CollectionConverters._
    val st0 = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    def tx(ops: Seq[Row], id: Long): (DataFrame, Boolean) =
      TxLog.applyTx(st0, spark.createDataFrame(ops.asJava, TxLog.opSchema), id, d("2020-02-01"))
    // op0 writes v2 over [2020-01-01, 2020-02-01); op1 matches at a basis
    // AFTER the range's end. The reference's sequential apply would see
    // the version the end-vt cap restores (v1); this engine's candidate
    // model carries only start-vt content rows, so the match sees v2.
    // Pinned so a change in this shape is deliberate (TxLog doc comment).
    val (_, abortedNew) = tx(Seq(
      Row("put", "ivan", "v2", d("2020-01-01"), d("2020-02-01"), null, null, 0L),
      Row("match", "ivan", null, null, null, d("2020-03-01"), "v2", 1L)), 30L)
    assert(!abortedNew) // deviation: reference would abort here
    val (_, abortedOld) = tx(Seq(
      Row("put", "ivan", "v2", d("2020-01-01"), d("2020-02-01"), null, null, 0L),
      Row("match", "ivan", null, null, null, d("2020-03-01"), "v1", 1L)), 31L)
    assert(abortedOld) // deviation: reference would commit here
    // INSIDE the range both agree: the new content is visible
    val (_, abortedIn) = tx(Seq(
      Row("put", "ivan", "v2", d("2020-01-01"), d("2020-02-01"), null, null, 0L),
      Row("match", "ivan", null, null, null, d("2020-01-15"), "v2", 1L)), 32L)
    assert(!abortedIn)
  }

  test("cas puts new value only when current matches expected") {
    import scala.jdk.CollectionConverters._
    val st0 = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val (st1, ab1) = TxLog.applyTx(st0, spark.createDataFrame(List(
      Row("cas", "ivan", "v2", null, null, null, "v1", 0L)).asJava, TxLog.opSchema),
      20L, d("2020-02-01"))
    assert(!ab1)
    val live = Bitemp.asOf(st1, lit(d("2020-03-01")), lit(99L))
      .collect().toSeq.map(_.getAs[String]("content_hash"))
    assert(live == Seq("v2"))
    val (st2, ab2) = TxLog.applyTx(st0, spark.createDataFrame(List(
      Row("cas", "ivan", "v3", null, null, null, "NOPE", 0L)).asJava, TxLog.opSchema),
      21L, d("2020-02-01"))
    assert(ab2 && history(st2) == history(st0))
  }

  test("evict removes every version of the entity") {
    import scala.jdk.CollectionConverters._
    val st0 = runScenario(Seq(
      (Some("v1"), "2019-11-25", None), (Some("v2"), "2019-11-26", None)))
    val (st1, _) = TxLog.applyTx(st0, spark.createDataFrame(List(
      Row("evict", "ivan", null, null, null, null, null, 0L)).asJava, TxLog.opSchema),
      30L, d("2020-02-01"))
    assert(st1.count() == 0)
  }

  test("bitemp paper scenario (query_test.clj:1963, indexing-temporal-data paper)") {
    import scala.jdk.CollectionConverters._
    // doc content encoded as "entryPt|arrival|departure"
    def put(eid: String, doc: String, vt: String, seq: Long) =
      Row("put", eid, doc, d(vt), null, null, null, seq)
    val days: Seq[(Long, String, Seq[Row])] = Seq(
      (0L, "2018-12-31", Seq(
        put("p2", "SFO|2018-12-31|na", "2018-12-31", 0L),
        put("p3", "LA|2018-12-31|na", "2018-12-31", 1L))),
      (2L, "2019-01-02", Seq(put("p4", "NY|2019-01-02|na", "2019-01-02", 0L))),
      (3L, "2019-01-03", Seq(put("p4", "NY|2019-01-02|2019-01-03", "2019-01-03", 0L))),
      (4L, "2019-01-04", Seq(
        put("p1", "NY|2018-12-31|na", "2018-12-31", 0L),
        put("p1", "NY|2018-12-31|2019-01-03", "2019-01-03", 1L),
        put("p1", "LA|2019-01-04|na", "2019-01-04", 2L),
        put("p3", "LA|2018-12-31|2019-01-04", "2019-01-04", 3L))),
      (5L, "2019-01-05", Seq(put("p2", "SFO|2018-12-31|2018-12-31", "2019-01-05", 0L))),
      (7L, "2019-01-07", Seq(
        put("p3", "LA|2018-12-31|na", "2019-01-04", 0L),
        put("p3", "LA|2018-12-31|2019-01-07", "2019-01-07", 1L))),
      (8L, "2019-01-08", Seq(
        put("p3", "SFO|2019-01-08|na", "2019-01-08", 0L),
        put("p4", "LA|2019-01-08|na", "2019-01-08", 1L))),
      (9L, "2019-01-09", Seq(put("p3", "SFO|2019-01-08|2019-01-08", "2019-01-09", 0L))),
      (10L, "2019-01-10", Seq(put("p5", "LA|2019-01-10|na", "2019-01-10", 0L))),
      (11L, "2019-01-11", Seq(put("p7", "NY|2019-01-11|na", "2019-01-11", 0L))),
      (12L, "2019-01-12", Seq(put("p6", "NY|2019-01-12|na", "2019-01-12", 0L))))
    val state = TxLog.applyBatch(TxLog.emptyState(spark),
      days.map { case (id, day, rows) =>
        (id, d(day), spark.createDataFrame(rows.asJava, TxLog.opSchema))
      })
    // the paper's query: VT = day 2, TT = day 3's tx — p4 shows its
    // PRE-correction doc, the day-3 rewrite is future-valid-time
    val visible = Bitemp.asOfTime(state, lit(d("2019-01-02")), lit(d("2019-01-03")))
      .collect().toSet[Row].map(r => (r.getAs[String]("eid"), r.getAs[String]("content_hash")))
    assert(visible == Set(
      ("p2", "SFO|2018-12-31|na"),
      ("p3", "LA|2018-12-31|na"),
      ("p4", "NY|2019-01-02|na")))
    // current basis after day 12: corrections + later arrivals all land
    val now = Bitemp.asOfTime(state, lit(d("2019-01-12")), lit(d("2019-01-12")))
      .collect().toSet[Row].map(r => (r.getAs[String]("eid"), r.getAs[String]("content_hash")))
    assert(now == Set(
      ("p1", "LA|2019-01-04|na"),
      ("p2", "SFO|2018-12-31|2018-12-31"),
      ("p3", "SFO|2019-01-08|2019-01-08"),
      ("p4", "LA|2019-01-08|na"),
      ("p5", "LA|2019-01-10|na"),
      ("p6", "NY|2019-01-12|na"),
      ("p7", "NY|2019-01-11|na")))
  }

  test("tx fn: unknown name or throwing body aborts the tx, not the indexer") {
    import scala.jdk.CollectionConverters._
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val fnOp = spark.createDataFrame(List(
      Row("fn", "no-such-fn", "arg", null, null, null, null, 0L)).asJava, TxLog.opSchema)
    val (st1, aborted1) = TxLog.applyTxWithFns(st, fnOp, 10L, d("2020-01-01"), Map.empty)
    assert(aborted1 && st1.collect().toSet == st.collect().toSet)
    val boom: TxLog.TxFn = (_, _) => throw new RuntimeException("boom")
    val fnOp2 = spark.createDataFrame(List(
      Row("fn", "boom", "arg", null, null, null, null, 0L)).asJava, TxLog.opSchema)
    val (st2, aborted2) = TxLog.applyTxWithFns(st, fnOp2, 11L, d("2020-01-01"), Map("boom" -> boom))
    assert(aborted2 && st2.collect().toSet == st.collect().toSet)
  }

  test("tx fn emitting a nested fn op expands recursively") {
    import scala.jdk.CollectionConverters._
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val inner: TxLog.TxFn = (_, arg) => spark.createDataFrame(List(
      Row("put", "child", arg, d("2020-01-02"), null, null, null, 0L)).asJava, TxLog.opSchema)
    val outer: TxLog.TxFn = (_, arg) => spark.createDataFrame(List(
      Row("fn", "inner", arg, null, null, null, null, 0L)).asJava, TxLog.opSchema)
    val fnOp = spark.createDataFrame(List(
      Row("fn", "outer", "payload", null, null, null, null, 0L)).asJava, TxLog.opSchema)
    val (st1, aborted) = TxLog.applyTxWithFns(st, fnOp, 12L, d("2020-01-03"),
      Map("outer" -> outer, "inner" -> inner))
    assert(!aborted)
    val child = st1.filter(col("eid") === "child").collect()
    assert(child.length == 1 && child.head.getAs[String]("content_hash") == "payload")
  }

  test("tx fn sees earlier same-tx ops (tx_test.clj:713 tx-fn-sees-in-tx-query-results)") {
    import scala.jdk.CollectionConverters._
    // pre-tx: ivan = "1". Tx: put ivan = "2" (seq 0), then a doubling fn
    // (seq 1) that reads ivan from ITS snapshot and emits twice the value.
    // The reference's fn runs over the in-flight tx (sees "2" -> "22");
    // a fn over the pre-tx snapshot would see "1" -> "11".
    val st = runScenario(Seq((Some("1"), "2019-11-25", None)))
    val doubler: TxLog.TxFn = (snapshot, _) => {
      val v = snapshot.filter(col("eid") === "ivan")
        .select(col("content_hash")).collect().head.getString(0)
      spark.createDataFrame(List(
        Row("put", "ivan", v + v, d("2020-01-02"), null, null, null, 0L)).asJava,
        TxLog.opSchema)
    }
    val ops = spark.createDataFrame(List(
      Row("put", "ivan", "2", d("2020-01-01"), null, null, null, 0L),
      Row("fn", "doubler", null, null, null, null, null, 1L)).asJava, TxLog.opSchema)
    val (st1, aborted) = TxLog.applyTxWithFns(st, ops, 13L, d("2020-01-05"),
      Map("doubler" -> doubler))
    assert(!aborted)
    val live = Bitemp.asOf(st1, lit(d("2020-06-01")), lit(99L))
      .filter(col("eid") === "ivan").collect()
    assert(live.map(_.getAs[String]("content_hash")).toSeq == Seq("22"))
    // a later fn also sees a PRIOR fn's emitted ops (sequential rounds)
    val appender: TxLog.TxFn = (snapshot, _) => {
      val v = snapshot.filter(col("eid") === "ivan")
        .select(col("content_hash")).collect().head.getString(0)
      spark.createDataFrame(List(
        Row("put", "ivan", v + "x", d("2020-01-03"), null, null, null, 0L)).asJava,
        TxLog.opSchema)
    }
    val ops2 = spark.createDataFrame(List(
      Row("put", "ivan", "2", d("2020-01-01"), null, null, null, 0L),
      Row("fn", "doubler", null, null, null, null, null, 1L),
      Row("fn", "appender", null, null, null, null, null, 2L)).asJava, TxLog.opSchema)
    val (st2, aborted2) = TxLog.applyTxWithFns(st, ops2, 14L, d("2020-01-05"),
      Map("doubler" -> doubler, "appender" -> appender))
    assert(!aborted2)
    val live2 = Bitemp.asOf(st2, lit(d("2020-06-01")), lit(99L))
      .filter(col("eid") === "ivan").collect()
    assert(live2.map(_.getAs[String]("content_hash")).toSeq == Seq("22x"))
  }

  test("two txs at the same tx-time resolve by tx-id (tx_test.clj:307 bug 441)") {
    import scala.jdk.CollectionConverters._
    val t = d("2019-11-29")
    def put(v: String) = spark.createDataFrame(List(
      Row("put", "ivan", v, t, null, null, null, 0L)).asJava, TxLog.opSchema)
    val (st1, _) = TxLog.applyTx(TxLog.emptyState(spark), put("1"), 1L, t)
    val (st2, _) = TxLog.applyTx(st1, put("2"), 2L, t)
    // as-of at the shared instant: the higher tx id wins
    assert(Bitemp.asOf(st2, lit(t), lit(2L)).collect()
      .map(_.getAs[String]("content_hash")).toSeq == Seq("2"))
    // tx basis pinned to the first tx still sees the first value
    assert(Bitemp.asOf(st2, lit(t), lit(1L)).collect()
      .map(_.getAs[String]("content_hash")).toSeq == Seq("1"))
    // history WITH corrections keeps both rows, tx-id ordered
    val hist = Bitemp.history(st2, withCorrections = true)
      .orderBy(col("tx_id").desc).collect()
      .map(r => (r.getAs[Long]("tx_id"), r.getAs[String]("content_hash"))).toSeq
    assert(hist == Seq((2L, "2"), (1L, "1")))
  }

  test("checkpoint: retention prunes, torn snapshots ignored, restore round-trips") {
    import graft.bitemp.Checkpoint
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None), (Some("v2"), "2019-11-27", None)))
    val store = java.nio.file.Files.createTempDirectory("graft_ckpt_spec").toString
    Checkpoint.save(st, store, txId = 1L, keep = 2)
    Checkpoint.save(st, store, txId = 2L, keep = 2)
    Checkpoint.save(st, store, txId = 3L, keep = 2)
    assert(Checkpoint.completed(spark, store).map(_.txId).sorted == Seq(2L, 3L)) // keep=2 pruned tx 1
    // torn checkpoint: directory without _COMPLETE must be invisible
    new java.io.File(s"$store/checkpoint-9-123").mkdirs()
    assert(Checkpoint.latest(spark, store).get.txId == 3L)
    val restored = Checkpoint.restore(spark, store).get
    assert(restored.collect().toSet == st.collect().toSet)
  }

  test("checkpoint restore validates the manifest: a gutted-but-marked snapshot is rejected") {
    import graft.bitemp.Checkpoint
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val store = java.nio.file.Files.createTempDirectory("graft_ckpt_gut").toString
    Checkpoint.save(st, store, txId = 1L, keep = 2)
    val m2 = Checkpoint.save(st, store, txId = 2L, keep = 2)
    // gut the newest snapshot AFTER its _COMPLETE landed (the torn-dir GC
    // race the grace window can't fully close: a concurrent cleaner
    // deleted its data, then the marker write went through) — restore
    // must fall back to the older VALID snapshot, not trust the marker
    val gutted = new java.io.File(m2.path.stripPrefix("file:"))
    val part = gutted.listFiles().find(_.getName.endsWith(".parquet")).get
    assert(part.delete())
    assert(Checkpoint.latest(spark, store).get.txId == 1L,
      "gutted snapshot was trusted")
    val restored = Checkpoint.restore(spark, store).get
    assert(restored.collect().toSet == st.collect().toSet)
    // truncation (same name, different length) is caught too
    val m3 = Checkpoint.save(st, store, txId = 3L, keep = 3)
    val d3 = new java.io.File(m3.path.stripPrefix("file:"))
    val p3 = d3.listFiles().find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.write(p3.toPath, Array[Byte](1, 2, 3))
    assert(Checkpoint.latest(spark, store).get.txId == 1L,
      "truncated snapshot was trusted")
  }

  test("checkpoint torn-dir GC: fresh in-flight dirs survive, stale torn dirs go") {
    import graft.bitemp.Checkpoint
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val store = java.nio.file.Files.createTempDirectory("graft_ckpt_gc").toString
    val now = System.currentTimeMillis()
    // a concurrent save still writing parquet: stamped 10s before this
    // save, no _COMPLETE yet — must NOT be deleted (the r9 race: deleting
    // it would let its later _COMPLETE mark a gutted dir restorable)
    val inflight = new java.io.File(s"$store/checkpoint-7-${now - 10000}")
    inflight.mkdirs()
    // a genuinely torn dir from a crash a grace-window-plus ago: garbage
    val stale = new java.io.File(
      s"$store/checkpoint-5-${now - Checkpoint.TornDirGraceMillis - 60000}")
    stale.mkdirs()
    Checkpoint.save(st, store, txId = 10L, keep = 2)
    assert(inflight.exists(), "in-flight concurrent save dir was GC'd")
    assert(!stale.exists(), "stale torn dir survived GC")
    assert(Checkpoint.latest(spark, store).get.txId == 10L)
  }

  test("speculative rows are visible only through the forked basis") {
    import scala.jdk.CollectionConverters._
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val spec = spark.createDataFrame(List(
      Row("ivan", d("2019-11-26"), d("2020-06-01"), 100L, "v-spec", false)).asJava,
      TxLog.versionSchema)
    val forked = Bitemp.withSpeculative(st, spec)
    val liveForked = Bitemp.asOf(forked, lit(d("2019-11-27")), lit(100L))
      .collect().toSeq.map(_.getAs[String]("content_hash"))
    val liveBase = Bitemp.asOf(st, lit(d("2019-11-27")), lit(100L))
      .collect().toSeq.map(_.getAs[String]("content_hash"))
    assert(liveForked == Seq("v-spec") && liveBase == Seq("v1"))
  }

  test("evict wins over same-tx puts regardless of op order (tx_test.clj:1235, #1337)") {
    import scala.jdk.CollectionConverters._
    def put(eid: String, v: String, seq: Long) =
      Row("put", eid, v, null, null, null, null, seq)
    def evict(eid: String, seq: Long) =
      Row("evict", eid, null, null, null, null, null, seq)
    def tx(st: DataFrame, txId: Long, ops: Seq[Row]): DataFrame = {
      val (next, aborted) = TxLog.applyTx(st,
        spark.createDataFrame(ops.asJava, TxLog.opSchema), txId,
        d("2020-01-01").plusMinutes(txId))
      assert(!aborted)
      next.localCheckpoint(true)
    }
    def eids(st: DataFrame): Set[String] =
      TxLog.resolvedHistory(st).select("eid").collect().map(_.getString(0)).toSet
    // put then evict in one tx: b never existed; a untouched
    var st = tx(TxLog.emptyState(spark), 0L, Seq(put("a", "va", 0L)))
    st = tx(st, 1L, Seq(put("b", "vb", 0L), evict("b", 1L)))
    assert(eids(st) == Set("a"))
    // evict then re-put in one tx: still gone (the reference's known
    // #1337 wart — evict drops the tx's own later writes too; matched)
    st = tx(st, 2L, Seq(evict("a", 0L), put("a", "va2", 1L)))
    assert(eids(st).isEmpty)
    // a LATER tx re-adds normally
    st = tx(st, 3L, Seq(put("a", "va3", 0L)))
    assert(eids(st) == Set("a"))
    // the one-pass fold path agrees tx-for-tx
    def df(rows: Row*) = spark.createDataFrame(rows.asJava, TxLog.opSchema)
    val batched = TxLog.applyBatch(TxLog.emptyState(spark), Seq(
      (0L, d("2020-01-01"), df(put("a", "va", 0L))),
      (1L, d("2020-01-02"), df(put("b", "vb", 0L), evict("b", 1L))),
      (2L, d("2020-01-03"), df(evict("a", 0L), put("a", "va2", 1L))),
      (3L, d("2020-01-04"), df(put("a", "va3", 0L)))))
    val rows = TxLog.resolvedHistory(batched).collect()
    assert(rows.map(_.getAs[String]("eid")).toSet == Set("a"))
    assert(rows.map(_.getAs[String]("content_hash")).toSet == Set("va3"))
  }

  test("tx fn returning no ops leaves the rest of the tx intact (tx_test.clj:760, #457)") {
    import scala.jdk.CollectionConverters._
    val st = runScenario(Seq((Some("v1"), "2019-11-25", None)))
    val nilFn: TxLog.TxFn = (_, _) =>
      spark.createDataFrame(new java.util.ArrayList[Row](), TxLog.opSchema)
    val ops = spark.createDataFrame(List(
      Row("fn", "nil-fn", "arg", null, null, null, null, 0L),
      Row("put", "foo", "vfoo", d("2020-01-01"), null, null, null, 1L)).asJava,
      TxLog.opSchema)
    val (st1, aborted) = TxLog.applyTxWithFns(st, ops, 20L, d("2020-01-02"),
      Map("nil-fn" -> nilFn))
    assert(!aborted)
    val foo = st1.filter(col("eid") === "foo").collect()
    assert(foo.length == 1 && foo.head.getAs[String]("content_hash") == "vfoo")
  }
}
