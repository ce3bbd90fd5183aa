package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** A Hadoop FileSystem registered under a custom `mock:` scheme —
  * RawLocalFileSystem re-badged, the standard Hadoop-test trick for
  * proving code is SCHEME-AGNOSTIC: if a component's IO round-trips
  * through `mock://`, it resolves its FileSystem from the path's scheme
  * via the Hadoop conf (`fs.<scheme>.impl`) and never assumes local
  * files — exactly how S3A/ABFS/GCS connectors plug in (their jars and
  * creds are the only delta; SURVEY §2.1 "cloud object stores"). */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

class SchemeFsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withMockScheme[A](f: => A): A = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mock.impl", classOf[MockSchemeFs].getName)
    f
  }

  test("checkpoint store IO is scheme-agnostic: save/GC/restore via mock://") {
    withMockScheme {
      import scala.jdk.CollectionConverters._
      val st = spark.createDataFrame(List(
        Row("e1", java.time.LocalDateTime.parse("2020-01-01T00:00"),
          java.time.LocalDateTime.parse("2020-02-01T00:00"), 1L, "h1", false)).asJava,
        graft.bitemp.TxLog.versionSchema)
      val local = java.nio.file.Files.createTempDirectory("graft_mockfs").toString
      val store = s"mock:$local/ckpt"
      val m1 = graft.bitemp.Checkpoint.save(st, store, txId = 1L, keep = 2)
      val m2 = graft.bitemp.Checkpoint.save(st, store, txId = 2L, keep = 2)
      assert(m1.path.startsWith("mock:") && m2.path.startsWith("mock:"))
      // enumeration, retention and the _COMPLETE marker all resolved the
      // FS from the mock scheme
      assert(graft.bitemp.Checkpoint.completed(spark, store).map(_.txId).sorted == Seq(1L, 2L))
      val restored = graft.bitemp.Checkpoint.restore(spark, store).get
      assert(restored.collect().toSeq == st.collect().toSeq)
      // a third save prunes to keep=2 through the same scheme
      graft.bitemp.Checkpoint.save(st, store, txId = 3L, keep = 2)
      assert(graft.bitemp.Checkpoint.latest(spark, store).get.txId == 3L)
      assert(graft.bitemp.Checkpoint.completed(spark, store).size == 2)
    }
  }

  test("parquet state round-trips through the mock scheme (the engine's write/scan path)") {
    withMockScheme {
      import spark.implicits._
      val local = java.nio.file.Files.createTempDirectory("graft_mockfs_pq").toString
      val dir = s"mock:$local/t"
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").parquet(dir)
      val back = spark.read.parquet(dir).orderBy(col("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(back == Seq((1L, "a"), (2L, "b")))
    }
  }

  test("matview delta log (vdelta/_SUCCESS fold) rides the mock scheme") {
    withMockScheme {
      import scala.jdk.CollectionConverters._
      val base = java.nio.file.Files.createTempDirectory("graft_mockfs_mv").toString
      val opsDir = s"$base/ops"
      new java.io.File(opsDir).mkdirs()
      val vt = java.time.LocalDateTime.parse("2020-01-01T00:00")
      (0 until 2).foreach { i =>
        val stage = s"$base/stage$i"
        spark.createDataFrame(List(
          Row("put", s"e$i", "T", vt.plusDays(i.toLong), null, null, null, 0L)).asJava,
          graft.bitemp.TxLog.opSchema)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val part = new java.io.File(stage).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$opsDir/b$i.parquet"))
      }
      // state store AND view delta log both behind the mock scheme: the
      // manifest commits, vdelta appends and the _SUCCESS-gated fold all
      // resolve their FileSystem from the path (r10 VERDICT #7 — the
      // file:-scheme StreamingSpec pin, now over a PLUGGED-IN scheme)
      val stateDir = s"mock:$base/state"; val viewDir = s"mock:$base/view"
      val stream = spark.readStream.schema(graft.bitemp.TxLog.opSchema)
        .option("maxFilesPerTrigger", "1").parquet(opsDir)
      graft.streaming.IngestStream.start(spark, stream, stateDir, s"$base/ck",
        txTime = id => java.time.LocalDateTime.parse("2020-02-01T00:00")
          .plusHours(id),
        matViewDir = Some(viewDir),
        txShape = Some(graft.bitemp.TxLog.TxShape(hasChecks = false,
          hasEvict = false, hasRanged = false))).awaitTermination()
      val view = graft.streaming.IngestStream.loadTypeCounts(spark, viewDir)
        .get.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(view == Map("T" -> 2L), view.toString)
      // the delta stack really lives behind mock://
      val fs = new org.apache.hadoop.fs.Path(viewDir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val deltas = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$viewDir/type_counts"))
        .map(_.getPath.getName).filter(_.startsWith("vdelta-"))
      assert(deltas.nonEmpty, "no vdelta dirs behind the mock scheme")
    }
  }

  test("LSH stream durable state rides mock://; a replayed batch reseeds from committed postings only") {
    withMockScheme {
      val docsPath = "/root/testdata/sf0.001/documents.parquet"
      val local = java.nio.file.Files.createTempDirectory("graft_mockfs_lsh").toString
      val state = s"mock:$local/lsh"
      val batch = graft.operators.Dedup
        .minhashLshPairs(spark.read.parquet(docsPath), 0.5)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def run() = graft.streaming.IngestStream
        .lshDedupStream(spark, docsPath, 0.5, stateDir = state)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(run() == batch)
      def postByBatch = spark.read.parquet(s"$state/post")
        .groupBy(col("batch_id")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val before = postByBatch
      val fs = new org.apache.hadoop.fs.Path(state)
        .getFileSystem(spark.sessionState.newHadoopConf())
      // crash simulation: batch 2's offset landed but its commit didn't —
      // the restarted query replays batch 2; the reseed must rebuild the
      // index from batches 0-1 ONLY (batch 2's pre-crash postings append
      // is on disk, and double-counting it would skew the verify)
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$state/ck/commits/2"), false))
      assert(run() == batch, "replayed-batch result diverged")
      // the replay really happened: batch 2's append landed a second
      // time (the reseed filter excluded the first), batches 0-1 didn't —
      // all through the mock scheme
      val after = postByBatch
      assert(after(2L) == 2 * before(2L) && after(0L) == before(0L) &&
        after(1L) == before(1L), s"before=$before after=$after")
    }
  }
}
