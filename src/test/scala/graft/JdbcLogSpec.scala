package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.TxLog
import graft.sources.JdbcLog

/** crux-jdbc semantics over Derby embedded — ports of
  * crux-test/test/crux/jdbc_test.clj (happy-path tx log, docs retention /
  * eviction / resurrection) plus the tx-ordering contract the module's
  * auto-increment offset carries. */
class JdbcLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshUrl(): String = {
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc_spec").toString + "/db"
    val url = JdbcLog.derbyUrl(db)
    JdbcLog.setupSchema(url)
    url
  }

  test("happy path: submitted tx comes back from open-tx-log with its id and ops") {
    // jdbc_test.clj test-happy-path-jdbc-event-log
    val url = freshUrl()
    val (txId, txTime) = JdbcLog.submitTx(url,
      """[{"op":"put","eid":"origin-man","content_hash":"adam","start_vt":"2020-01-01T00:00:00.000000","seq":1}]""")
    assert(txId == 1L)
    assert(JdbcLog.latestSubmittedTx(url).contains(txId))
    val log = JdbcLog.openTxLog(spark, url, afterTxId = 0).collect()
    assert(log.length == 1)
    val r = log.head
    assert(r.getAs[Long]("tx_id") == txId)
    assert(r.getAs[java.time.LocalDateTime]("tx_time") != null)
    assert(r.getAs[String]("op") == "put")
    assert(r.getAs[String]("eid") == "origin-man")
    assert(r.getAs[String]("content_hash") == "adam")
    assert(r.getAs[java.time.LocalDateTime]("start_vt") ==
      java.time.LocalDateTime.parse("2020-01-01T00:00"))
    // the DB's clock stamped it; replay folds it into real state
    val state = JdbcLog.replay(spark, url, TxLog.emptyState(spark))
    assert(state.count() == 1)
    assert(txTime != null)
  }

  test("tx ordering: offsets strictly increase; open-tx-log after-id filters") {
    val url = freshUrl()
    val ids = (1 to 3).map { i =>
      JdbcLog.submitTx(url,
        s"""[{"op":"put","eid":"e$i","content_hash":"v$i","start_vt":"2020-01-0${i}T00:00:00.000000","seq":1}]""")._1
    }
    assert(ids == Seq(1L, 2L, 3L), ids.toString)
    assert(JdbcLog.latestSubmittedTx(url).contains(3L))
    val after1 = JdbcLog.openTxLog(spark, url, afterTxId = 1)
      .select("tx_id").collect().map(_.getLong(0)).sorted
    assert(after1.toSeq == Seq(2L, 3L))
    // offset order IS tx order: replay applies 1,2,3 and the resolved
    // state carries each put under its offset tx id
    val st = JdbcLog.replay(spark, url, TxLog.emptyState(spark))
    val byEid = st.collect().map(r => r.getAs[String]("eid") -> r.getAs[Long]("tx_id")).toMap
    assert(byEid == Map("e1" -> 1L, "e2" -> 2L, "e3" -> 3L))
  }

  test("docs retention: update-in-place, eviction tombstone, resurrection") {
    // jdbc_test.clj test-docs-retention
    val url = freshUrl()
    val hash = "somehash"
    JdbcLog.submitDocs(url, Seq(hash -> """{"id":"some-id","a":"b"}"""))
    assert(JdbcLog.fetchDocs(url, Seq(hash)) ==
      Map(hash -> """{"id":"some-id","a":"b"}"""))
    // compaction: re-submitting the same hash REPLACES the stored bytes
    JdbcLog.submitDocs(url, Seq(hash -> """{"some":"val"}"""))
    assert(JdbcLog.fetchDocs(url, Seq(hash)) == Map(hash -> """{"some":"val"}"""))
    // eviction: tombstone bytes + compacted flag
    JdbcLog.evictDocs(url, Seq(hash))
    assert(JdbcLog.fetchDocs(url, Seq(hash)) == Map(hash -> """{"evicted":true}"""))
    // resurrection: a fresh put of the same hash INSERTS a new live row
    // (the evicted row stays compacted) and fetch returns the doc again
    JdbcLog.submitDocs(url, Seq(hash -> """{"id":"some-id","a":"b"}"""))
    assert(JdbcLog.fetchDocs(url, Seq(hash)) ==
      Map(hash -> """{"id":"some-id","a":"b"}"""))
  }

  test("replay matches the direct applyBatch fold on the same ops") {
    val url = freshUrl()
    import scala.jdk.CollectionConverters._
    def opsDf(rows: List[org.apache.spark.sql.Row]) =
      spark.createDataFrame(rows.asJava, TxLog.opSchema)
    val vt = java.time.LocalDateTime.parse("2020-01-01T00:00")
    val tx1 = opsDf(List(
      org.apache.spark.sql.Row("put", "a", "v1", vt, null, null, null, 1L),
      org.apache.spark.sql.Row("put", "b", "v2", vt, null, null, null, 2L)))
    val tx2 = opsDf(List(
      org.apache.spark.sql.Row("delete", "a", null, vt.plusDays(1), null, null, null, 1L),
      org.apache.spark.sql.Row("put", "b", "v3", vt.plusDays(1), null, null, null, 2L)))
    val tx3 = opsDf(List(
      org.apache.spark.sql.Row("evict", "b", null, null, null, null, null, 1L)))
    Seq(tx1, tx2, tx3).foreach(ops =>
      JdbcLog.submitTx(url, JdbcLog.opsToJson(ops)))
    val viaJdbc = JdbcLog.replay(spark, url, TxLog.emptyState(spark))
      .select("eid", "vt", "content_hash", "tombstone")
      .collect().map(_.toSeq).toSet
    // the direct fold with the same tx ids / times the DB assigned
    val times = JdbcLog.openTxLog(spark, url)
      .select("tx_id", "tx_time").distinct().collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val direct = TxLog.applyBatch(TxLog.emptyState(spark),
      Seq((1L, times(1L), tx1), (2L, times(2L), tx2), (3L, times(3L), tx3)))
      .select("eid", "vt", "content_hash", "tombstone")
      .collect().map(_.toSeq).toSet
    assert(viaJdbc == direct)
    // survivors: only eid=a rows (b evicted) — the delete tombstone + put
    assert(viaJdbc.map(_.head).forall(_ == "a"))
  }

  test("replay with interleaved cas txs matches applyBatch (sequential branch)") {
    // the frame-fold fast path must break at check txs: put-run, then a
    // cas that succeeds, then a match that FAILS (tx aborts wholesale),
    // then another put-run — replay == applyBatch on the same schedule
    val url = freshUrl()
    import scala.jdk.CollectionConverters._
    def opsDf(rows: List[org.apache.spark.sql.Row]) =
      spark.createDataFrame(rows.asJava, TxLog.opSchema)
    val vt = java.time.LocalDateTime.parse("2020-01-01T00:00")
    val tx1 = opsDf(List(
      org.apache.spark.sql.Row("put", "a", "v1", vt, null, null, null, 1L)))
    val tx2 = opsDf(List(
      org.apache.spark.sql.Row("cas", "a", "v2", vt.plusDays(1), null, null, "v1", 1L)))
    val tx3 = opsDf(List(
      org.apache.spark.sql.Row("match", "a", null, null, null, vt.plusDays(1), "WRONG", 1L),
      org.apache.spark.sql.Row("put", "b", "never", vt.plusDays(2), null, null, null, 2L)))
    val tx4 = opsDf(List(
      org.apache.spark.sql.Row("put", "c", "v4", vt.plusDays(3), null, null, null, 1L)))
    val txs = Seq(tx1, tx2, tx3, tx4)
    txs.foreach(ops => JdbcLog.submitTx(url, JdbcLog.opsToJson(ops)))
    val viaJdbc = JdbcLog.replay(spark, url, TxLog.emptyState(spark))
      .select("eid", "vt", "content_hash", "tombstone")
      .collect().map(_.toSeq).toSet
    val times = JdbcLog.openTxLog(spark, url)
      .select("tx_id", "tx_time").distinct().collect()
      .map(r => r.getLong(0) -> r.getAs[java.time.LocalDateTime](1)).toMap
    val direct = TxLog.applyBatch(TxLog.emptyState(spark),
      txs.zipWithIndex.map { case (ops, i) => ((i + 1).toLong, times((i + 1).toLong), ops) })
      .select("eid", "vt", "content_hash", "tombstone")
      .collect().map(_.toSeq).toSet
    assert(viaJdbc == direct)
    // the cas applied (a → v2), the aborted match tx left no 'b'
    val hashes = viaJdbc.map(s => (s.head, s(2)))
    assert(hashes.contains(("a", "v2")), viaJdbc.toString)
    assert(!hashes.exists(_._1 == "b"), viaJdbc.toString)
    assert(hashes.contains(("c", "v4")), viaJdbc.toString)
  }

  test("paged replay (multi-chunk catch-up) equals the unpaged fold") {
    // driver-memory paging must be invisible to semantics: the same
    // put/cas/failed-match/put schedule replayed at chunkTxs small enough
    // to page (including a boundary that splits a check-free run AND one
    // that isolates every tx) matches the one-page answer exactly
    val url = freshUrl()
    import scala.jdk.CollectionConverters._
    def opsDf(rows: List[org.apache.spark.sql.Row]) =
      spark.createDataFrame(rows.asJava, TxLog.opSchema)
    val vt = java.time.LocalDateTime.parse("2020-01-01T00:00")
    val txs = Seq(
      opsDf(List(org.apache.spark.sql.Row("put", "a", "v1", vt, null, null, null, 1L))),
      opsDf(List(org.apache.spark.sql.Row("put", "b", "v2", vt, null, null, null, 1L))),
      opsDf(List(org.apache.spark.sql.Row("cas", "a", "v2", vt.plusDays(1), null, null, "v1", 1L))),
      opsDf(List(
        org.apache.spark.sql.Row("match", "a", null, null, null, vt.plusDays(1), "WRONG", 1L),
        org.apache.spark.sql.Row("put", "x", "never", vt.plusDays(2), null, null, null, 2L))),
      opsDf(List(org.apache.spark.sql.Row("put", "c", "v4", vt.plusDays(3), null, null, null, 1L))),
      opsDf(List(org.apache.spark.sql.Row("evict", "b", null, null, null, null, null, 1L))))
    txs.foreach(ops => JdbcLog.submitTx(url, JdbcLog.opsToJson(ops)))
    def resolved(chunk: Long) =
      JdbcLog.replay(spark, url, TxLog.emptyState(spark), chunkTxs = chunk)
        .select("eid", "vt", "content_hash", "tombstone")
        .collect().map(_.toSeq).toSet
    val onePage = resolved(chunk = 100L)
    assert(resolved(chunk = 1L) == onePage)  // every tx its own page
    assert(resolved(chunk = 4L) == onePage)  // boundary splits the tail run
    val hashes = onePage.map(s => (s.head, s(2)))
    assert(hashes.contains(("a", "v2")), onePage.toString)
    assert(!hashes.exists(h => h._1 == "b" || h._1 == "x"), onePage.toString)
  }

  test("subscribe drains submits into the state store; awaitTx works over JDBC") {
    val url = freshUrl()
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_jdbc_sub").toString + "/state"
    val sub = JdbcLog.subscribe(spark, url, stateDir, pollMs = 25,
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false)))
    try {
      // submit WHILE the subscriber is live — half before a drain window,
      // half after, so at least one poll tick sees a partial log
      val lastId = (1 to 6).map { i =>
        val (id, _) = JdbcLog.submitTx(url,
          s"""[{"op":"put","eid":"d${i % 3}","content_hash":"v$i","start_vt":"2020-01-0${i}T00:00:00.000000","seq":1}]""")
        if (i == 3) Thread.sleep(300)
        id
      }.last
      // await-tx over the JDBC transport: the subscriber's manifest
      // commits are the progress marker
      val latest = graft.streaming.IngestStream.awaitTx(stateDir, lastId,
        timeoutMs = 120000)
      assert(latest >= lastId)
      val folded = graft.streaming.IngestStream.loadState(spark, stateDir)
        .select("eid", "vt", "content_hash", "tombstone")
        .collect().map(_.toSeq).toSet
      val replayed = JdbcLog.replay(spark, url, TxLog.emptyState(spark))
        .select("eid", "vt", "content_hash", "tombstone")
        .collect().map(_.toSeq).toSet
      assert(folded == replayed)
      assert(folded.nonEmpty)
    } finally sub.cancel()
  }

  test("partitioned log scan reads every op exactly once") {
    val url = freshUrl()
    (1 to 10).foreach { i =>
      JdbcLog.submitTx(url,
        s"""[{"op":"put","eid":"e$i","content_hash":"v$i","start_vt":"2020-01-01T00:00:00.000000","seq":1},
             {"op":"put","eid":"f$i","content_hash":"w$i","start_vt":"2020-01-01T00:00:00.000000","seq":2}]""")
    }
    val log = JdbcLog.openTxLog(spark, url, afterTxId = 0, numPartitions = 4)
    assert(log.count() == 20)
    assert(log.select("eid").distinct().count() == 20)
    assert(log.groupBy("tx_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= 2).count() == 0)
  }
}
