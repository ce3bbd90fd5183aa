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
}
