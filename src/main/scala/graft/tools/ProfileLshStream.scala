package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch: phase timing of the incremental LSH dedup stream's per-batch
  * work, replicated as a plain batch loop (no streaming engine) so each
  * stage's cost is attributable.
  *
  * `--flip [factor]` mode (r11, VERDICT r10 #3): inflate the sf0.1 corpus
  * `factor`× (each copy's tokens uniquely prefixed so copies are NOT
  * near-dups of each other — key volume scales, pair structure per copy
  * stays), run the REAL stream at 8 batches under three probe configs —
  * driver-index all the way, a cap that crosses MID-STREAM, distributed
  * from batch 0 — plus a restart-reseed replay, and print per-batch
  * trigger durations from the streaming listener. Evidence that the
  * size-routed probe behaves at realistic volumes, not just at the
  * differential spec's cap=1. */
object ProfileLshStream {

  private def runFlip(spark: SparkSession, dir: String, factor: Int): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val inflated = (0 until factor).map { c =>
      val d = docs.select((col("doc_id") * factor + c).as("doc_id"), col("text"))
      if (c == 0) d
      else d.withColumn("text", regexp_replace(col("text"), "(\\S+)", s"c${c}q$$1"))
    }.reduce(_ unionByName _)
    val path = java.nio.file.Files.createTempDirectory("graft_lsh_flip").toString + "/docs.parquet"
    inflated.coalesce(4).write.parquet(path)
    val nDocs = spark.read.parquet(path).count()
    val totalKeys = nDocs * 16
    println(s"inflated corpus: $nDocs docs, $totalKeys band-key rows")
    val batchDurs = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val d = e.progress.durationMs.getOrDefault("triggerExecution", -1L)
        batchDurs.put(e.progress.batchId, d.longValue()); ()
      }
    }
    spark.streams.addListener(listener)
    def run(name: String, cap: Long, state: String = null): Set[(Long, Long)] = {
      // temp-state runs share the session-memoized staging; the durable
      // runs stage under their stateDir (idempotently reused, so the
      // replay run finds the exact file paths its checkpoint references)
      batchDurs.clear()
      val t0 = System.nanoTime()
      val pairs = graft.streaming.IngestStream
        .lshDedupStream(spark, path, 0.5, nChunks = 8,
          maxDriverKeyRows = cap, stateDir = state)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val total = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val per = batchDurs.asScala.toSeq.sortBy(_._1)
        .map { case (b, ms) => f"b$b=${ms / 1000.0}%.2fs" }.mkString(" ")
      println(f"$name%-28s total=$total%6.2f s pairs=${pairs.size}  $per")
      pairs
    }
    // warm the kernels once at a small cap-free config
    run("warmup (driver probe)", 2000000L)
    val all = run("driver probe (cap 2M)", 2000000L)
    val mid = run(s"mid-stream flip (cap ${totalKeys / 2})", totalKeys / 2)
    val dist = run("distributed probe (cap 0)", 0L)
    assert(mid == all && dist == all, "probe configs diverged")
    // restart-reseed: run with durable state, delete the LAST commit, and
    // re-run — ONE replayed batch that must reseed the distributed index
    // from batches 0-6's postings
    val st = java.nio.file.Files.createTempDirectory("graft_lsh_flip_state").toString
    val seeded = run("durable run (driver probe)", 2000000L, st)
    // delete through the Hadoop FS (a bare java.io delete leaves the
    // checksum shadow file, and the replayed commit write then fails
    // FileAlreadyExists on the stale .crc)
    val fs = new org.apache.hadoop.fs.Path(st)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val last = fs.listStatus(new org.apache.hadoop.fs.Path(s"$st/ck/commits"))
      .map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong).max
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$st/ck/commits/$last"), false))
    val replayed = run("restart-reseed (1 batch replay)", 2000000L, st)
    assert(replayed == seeded && seeded == all, "reseed replay diverged")
    spark.streams.removeListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.exists(_.startsWith("--flip"))) {
      val factor = args.dropWhile(_ != "--flip").drop(1).headOption
        .flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(10)
      runFlip(spark, dir, factor)
      spark.stop()
      return
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (k, numHashes, bands, nChunks, tau) = (3, 64, 16, 3, 0.5)
    val rowsPerBand = numHashes / bands
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // warm-up pass over sf0.001 analog skipped; run twice, read 2nd
    for (round <- 1 to 2) {
      println(s"=== round $round")
      var idxCache: Option[DataFrame] = None
      var shCache: Option[DataFrame] = None
      (0 until nChunks).foreach { i =>
        println(s" batch $i")
        val batch = docs.filter(pmod(col("doc_id"), lit(nChunks)) === i)
        val shB = Dedup.shingles(batch, k).persist(lvl)
        val keysB = Dedup.bandKeyRows(
          Dedup.minhashSignatures(shB, numHashes), bands, rowsPerBand)
          .persist(lvl)
        t("materialize shB")(shB.count())
        t("materialize keysB")(keysB.count())
        val allKeys = idxCache.map(_.unionByName(keysB)).getOrElse(keysB)
        val cand = broadcast(keysB.as("a"))
          .join(allKeys.as("b"),
            col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(least(col("a.doc_id"), col("b.doc_id")).as("d1"),
            greatest(col("a.doc_id"), col("b.doc_id")).as("d2"))
          .distinct()
          .localCheckpoint(true)
        t("candidates")(println(s"   n=${cand.count()}"))
        val shAll = shCache.map(_.unionByName(shB)).getOrElse(shB)
        val candDocs = cand.select(col("d1").as("doc_id"))
          .unionByName(cand.select(col("d2").as("doc_id")))
        val shCand = shAll.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .localCheckpoint(true)
        t("shCand scan")(println(s"   shCand=${shCand.count()}"))
        val counts = broadcast(cand)
          .join(shCand.select(col("doc_id").as("d1"), col("shingle")), Seq("d1"))
          .join(broadcast(shCand.select(col("doc_id").as("d2"), col("shingle"))),
            Seq("d2", "shingle"))
          .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
        t("counts")(println(s"   counts=${counts.count()}"))
        val sizes = shCand.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        t("sizes")(println(s"   sizes=${sizes.count()}"))
        val pairs = counts
          .join(broadcast(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1"))), Seq("d1"))
          .join(broadcast(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2"))), Seq("d2"))
          .withColumn("jaccard", col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
          .filter(col("jaccard") >= tau)
          .select(col("d1"), col("d2"), col("jaccard"))
        t("jaccard joins")(println(s"   pairs=${pairs.count()}"))
        shCand.unpersist()
        idxCache = Some(allKeys); shCache = Some(shAll)
      }
    }
    spark.stop()
  }
}
