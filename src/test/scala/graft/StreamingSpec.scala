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

  test("compaction folds the delta stack and leaves a replayable store") {
    // compaction_test.clj analogue: a compacted store must restore the
    // same state the uncompacted fold produces, and a RESTARTED stream
    // over the same log must skip committed txs and apply only new ones
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"; val ckDir = s"$base/ck"
    new java.io.File(opsDir).mkdirs()
    def opFile(i: Int, eid: String, v: String): Unit = {
      val stage = s"$base/stage$i"
      spark.createDataFrame(List(
        Row("put", eid, v, LocalDateTime.parse("2020-01-01T00:00").plusDays(i.toLong),
          null, null, null, 0L)).asJava, TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }
    (0 until 4).foreach(i => opFile(i, s"e$i", s"v$i"))
    def run(ck: String): Unit = {
      val stream = spark.readStream.schema(TxLog.opSchema)
        .option("maxFilesPerTrigger", "1").parquet(opsDir)
      IngestStream.start(spark, stream, stateDir, ck,
        txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
        compactEvery = 2).awaitTermination()
    }
    run(ckDir)
    // stack depth 2 forces a base rewrite: the live manifest must carry a
    // base snapshot, not 4 deltas
    val names = new java.io.File(stateDir).listFiles().map(_.getName)
    assert(names.exists(_.startsWith("base-")), names.mkString(","))
    val state = IngestStream.loadState(spark, stateDir)
      .select("eid", "vt", "content_hash", "tombstone")
    val expected = (0 until 4).map(i => (s"e$i", s"v$i")).toSet
    assert(state.collect().map(r => (r.getString(0), r.getString(2))).toSet == expected)
    // restart with a FRESH checkpoint over the same log: the commit-marker
    // replay guard must skip all 4 committed txs (no duplicate rows)...
    run(s"$base/ck2")
    assert(IngestStream.loadState(spark, stateDir).count() == 4)
    // ...and a new tx arriving after the restart still applies on top
    opFile(4, "e4", "v4")
    run(s"$base/ck3")
    val after = IngestStream.loadState(spark, stateDir)
    assert(after.count() == 5)
    assert(after.filter(org.apache.spark.sql.functions.col("eid") === "e4").count() == 1)
  }

  test("maintained type-count view equals recompute across put/delete/evict") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_mv_spec").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"
    val ckDir = s"$base/ck"; val viewDir = s"$base/view"
    new java.io.File(opsDir).mkdirs()
    def opFile(i: Int, rows: List[Row]): Unit = {
      val stage = s"$base/stage$i"
      spark.createDataFrame(rows.asJava, TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }
    val vt = LocalDateTime.parse("2020-01-01T00:00")
    // batch 0: three As, one B; batch 1: retype one A→B + delete one A;
    // batch 2: evict the B from batch 0
    opFile(0, List(
      Row("put", "e1", "A", vt, null, null, null, 0L),
      Row("put", "e2", "A", vt, null, null, null, 1L),
      Row("put", "e3", "A", vt, null, null, null, 2L),
      Row("put", "e4", "B", vt, null, null, null, 3L)))
    opFile(1, List(
      Row("put", "e1", "B", vt.plusDays(1), null, null, null, 0L),
      Row("delete", "e2", null, vt.plusDays(1), null, null, null, 1L)))
    opFile(2, List(Row("evict", "e4", null, null, null, null, null, 0L)))
    val stream = spark.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1").parquet(opsDir)
    IngestStream.start(spark, stream, stateDir, ckDir,
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(viewDir)).awaitTermination()
    val view = IngestStream.loadTypeCounts(spark, viewDir).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // survivors: e1=B, e3=A (e2 deleted, e4 evicted)
    assert(view == Map("A" -> 1L, "B" -> 1L), view.toString)
    // equivalence with a full recompute from the final store
    val recomputed = graft.bitemp.Bitemp.asOfTime(
        IngestStream.loadState(spark, stateDir),
        org.apache.spark.sql.functions.lit(LocalDateTime.parse("2099-01-01T00:00")),
        org.apache.spark.sql.functions.lit(LocalDateTime.parse("2099-01-01T00:00")))
      .groupBy("content_hash").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(view == recomputed, s"view=$view recomputed=$recomputed")
  }

  test("view delta log compacts into bases (keep-last-2) and a committed vdelta is not clobbered") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_mv_prune").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"
    val ckDir = s"$base/ck"; val viewDir = s"$base/view"
    new java.io.File(opsDir).mkdirs()
    val vt = LocalDateTime.parse("2020-01-01T00:00")
    (0 until 6).foreach { i =>
      val stage = s"$base/stage$i"
      spark.createDataFrame(List(
        Row("put", s"e$i", "T", vt.plusDays(i.toLong), null, null, null, 0L)).asJava,
        TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }
    // replay-idempotency guard: a crashed prior attempt COMMITTED tx 0's
    // view delta (parquet _SUCCESS present); maintenance must trust it
    // (skip the recompute), never clobber — the marker key X proves it
    // survived every later compaction
    val preSeeded = spark.createDataFrame(
      List(Row("T", 1L), Row("X", 1L)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("content_hash",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    preSeeded.coalesce(1).write.parquet(s"$viewDir/type_counts/vdelta-0")
    val stream = spark.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1").parquet(opsDir)
    IngestStream.start(spark, stream, stateDir, ckDir,
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(viewDir),
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false)),
      viewCompactEvery = 2).awaitTermination()
    // compactions at tx 1/3/5 → bases vbase-1/3/5; keep-last-2 keeps 3 and
    // 5, every subsumed delta is gone
    val dirs = new java.io.File(s"$viewDir/type_counts").listFiles()
      .filter(f => f.isDirectory && (f.getName.startsWith("vdelta-") ||
        f.getName.startsWith("vbase-"))).map(_.getName).sorted
    assert(dirs.toSet == Set("vbase-3", "vbase-5"), dirs.mkString(","))
    // ...and the maintained counts (seeded vdelta-0 = {T:1, X:1} + txs
    // 1..5's deltas) survive: 6 live T entities + the marker
    val view = IngestStream.loadTypeCounts(spark, viewDir).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(view == Map("T" -> 6L, "X" -> 1L), view.toString)
  }

  test("group-committed views: skipped flushes re-derive from the journal; reads catch up; evict forces a flush") {
    import scala.jdk.CollectionConverters._
    def stageOps(base: String, batches: List[List[Row]]): String = {
      val opsDir = s"$base/ops"
      new java.io.File(opsDir).mkdirs()
      batches.zipWithIndex.foreach { case (rows, i) =>
        val stage = s"$base/stage$i"
        spark.createDataFrame(rows.asJava, TxLog.opSchema)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
      }
      opsDir
    }
    def vdeltas(viewDir: String): Set[String] =
      new java.io.File(s"$viewDir/type_counts").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("vdelta-"))
        .map(_.getName).toSet
    def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vt = LocalDateTime.parse("2020-01-01T00:00")

    // A: flushEvery=3 over 4 txs → one flush (tx 2, a multi-tx journal
    // span); tx 3 stays unflushed and the READ catches it up exactly
    val baseA = java.nio.file.Files.createTempDirectory("graft_mv_gc_a").toString
    val opsA = stageOps(baseA, List(
      List(Row("put", "e1", "A", vt, null, null, null, 0L),
        Row("put", "e2", "A", vt, null, null, null, 1L),
        Row("put", "e3", "A", vt, null, null, null, 2L),
        Row("put", "e4", "B", vt, null, null, null, 3L)),
      List(Row("put", "e1", "B", vt.plusDays(1), null, null, null, 0L),
        Row("delete", "e2", null, vt.plusDays(1), null, null, null, 1L)),
      List(Row("put", "e5", "C", vt, null, null, null, 0L)),
      List(Row("put", "e6", "C", vt, null, null, null, 0L))))
    IngestStream.start(spark,
      spark.readStream.schema(TxLog.opSchema)
        .option("maxFilesPerTrigger", "1").parquet(opsA),
      s"$baseA/state", s"$baseA/ck",
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(s"$baseA/view"),
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false)),
      viewFlushEvery = 3).awaitTermination()
    assert(vdeltas(s"$baseA/view") == Set("vdelta-2"),
      vdeltas(s"$baseA/view").mkString(","))
    // generic loadView without catchUp serves the stored view — stale
    // (missing tx 3's e6) but now DETECTABLY so: the _viewmeta records
    // the owning state dir and the read WARNS about the unflushed tail
    // (it cannot rebuild an arbitrary ViewDef's rows)
    val warnBuf = new java.io.ByteArrayOutputStream()
    val stale = Console.withErr(warnBuf) {
      counts(IngestStream.loadView(spark, s"$baseA/view", "type_counts").get)
    }
    assert(stale == Map("A" -> 1L, "B" -> 2L, "C" -> 1L), stale.toString)
    assert(warnBuf.toString("UTF-8").contains("unflushed tail"),
      s"expected a staleness warning, got: ${warnBuf.toString("UTF-8")}")
    // loadTypeCounts' ViewDef is statically known: it auto-catches-up
    // from the _viewmeta's owning state dir — exact with no arguments
    val auto = counts(IngestStream.loadTypeCounts(spark, s"$baseA/view").get)
    assert(auto == Map("A" -> 1L, "B" -> 2L, "C" -> 2L), auto.toString)
    val caught = counts(IngestStream.loadView(spark, s"$baseA/view",
      "type_counts", catchUp = Some((s"$baseA/state", IngestStream.typeCountsView))).get)
    assert(caught == Map("A" -> 1L, "B" -> 2L, "C" -> 2L), caught.toString)

    // B: an evict tx flushes REGARDLESS of the cadence (its journal rows
    // vanish; flush-before-destroy), via the journal span builder
    val baseB = java.nio.file.Files.createTempDirectory("graft_mv_gc_b").toString
    val opsB = stageOps(baseB, List(
      List(Row("put", "e1", "A", vt, null, null, null, 0L),
        Row("put", "e2", "A", vt, null, null, null, 1L),
        Row("put", "e3", "A", vt, null, null, null, 2L),
        Row("put", "e4", "B", vt, null, null, null, 3L)),
      List(Row("evict", "e4", null, null, null, null, null, 0L))))
    IngestStream.start(spark,
      spark.readStream.schema(TxLog.opSchema)
        .option("maxFilesPerTrigger", "1").parquet(opsB),
      s"$baseB/state", s"$baseB/ck",
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(s"$baseB/view"),
      viewFlushEvery = 10).awaitTermination()
    assert(vdeltas(s"$baseB/view") == Set("vdelta-1"),
      vdeltas(s"$baseB/view").mkString(","))
    val afterEvict = counts(IngestStream.loadView(spark, s"$baseB/view",
      "type_counts", catchUp = Some((s"$baseB/state", IngestStream.typeCountsView))).get)
    assert(afterEvict == Map("A" -> 3L), afterEvict.toString)
  }

  test("a torn vdelta (no _SUCCESS) is deleted and recomputed; view IO rides the Hadoop FileSystem") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_mv_torn").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"
    val ckDir = s"$base/ck"
    // file:-scheme URI pins the Hadoop FileSystem route — java.io.File IO
    // would fail to resolve it (the r7 deployment-correctness flaw)
    val viewDir = s"file:$base/view"
    new java.io.File(opsDir).mkdirs()
    val vt = LocalDateTime.parse("2020-01-01T00:00")
    (0 until 2).foreach { i =>
      val stage = s"$base/stage$i"
      spark.createDataFrame(List(
        Row("put", s"e$i", "T", vt.plusDays(i.toLong), null, null, null, 0L)).asJava,
        TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }
    // a crash DURING tx 0's delta write left a torn dir: parquet data but
    // no _SUCCESS — the guard must DELETE it and recompute, not trust it
    val poison = spark.createDataFrame(
      List(Row("X", 99L)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("content_hash",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
    poison.coalesce(1).write.parquet(s"$base/view/type_counts/vdelta-0")
    assert(new java.io.File(s"$base/view/type_counts/vdelta-0/_SUCCESS").delete())
    val stream = spark.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1").parquet(opsDir)
    IngestStream.start(spark, stream, stateDir, ckDir,
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(viewDir),
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false))).awaitTermination()
    val view = IngestStream.loadTypeCounts(spark, viewDir).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(view == Map("T" -> 2L), view.toString)
  }

  test("join-shape matview (snapshot x static dim) equals recompute") {
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Files.createTempDirectory("graft_mv_join").toString
    val opsDir = s"$base/ops"; val stateDir = s"$base/state"
    val ckDir = s"$base/ck"; val viewDir = s"$base/view"
    new java.io.File(opsDir).mkdirs()
    val vt = LocalDateTime.parse("2020-01-01T00:00")
    def opFile(i: Int, rows: List[Row]): Unit = {
      val stage = s"$base/stage$i"
      spark.createDataFrame(rows.asJava, TxLog.opSchema)
        .coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
    }
    opFile(0, List(
      Row("put", "e1", "A", vt, null, null, null, 0L),
      Row("put", "e2", "A", vt, null, null, null, 1L),
      Row("put", "e3", "B", vt, null, null, null, 2L)))
    opFile(1, List(
      Row("put", "e1", "B", vt.plusDays(1), null, null, null, 0L),
      Row("delete", "e3", null, vt.plusDays(1), null, null, null, 1L)))
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val dim = spark.createDataFrame(List(
      Row("e1", "gold"), Row("e2", "silver"), Row("e3", "gold")).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("eid",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tier",
          org.apache.spark.sql.types.StringType)))).localCheckpoint(true)
    val tierView = IngestStream.ViewDef("tier_counts",
      keys = Seq("content_hash", "tier"),
      rows = snap => snap.join(broadcast(dim), Seq("eid")))
    val stream = spark.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1").parquet(opsDir)
    IngestStream.start(spark, stream, stateDir, ckDir,
      txTime = id => LocalDateTime.parse("2020-02-01T00:00").plusHours(id),
      matViewDir = Some(viewDir),
      views = Seq(IngestStream.typeCountsView, tierView)).awaitTermination()
    // survivors: e1=B(gold), e2=A(silver); e3 deleted
    val got = IngestStream.loadView(spark, viewDir, "tier_counts").get.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("B", "gold") -> 1L, ("A", "silver") -> 1L), got.toString)
    // the default view rode along in the same maintenance pass
    val types = IngestStream.loadTypeCounts(spark, viewDir).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("A" -> 1L, "B" -> 1L), types.toString)
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
