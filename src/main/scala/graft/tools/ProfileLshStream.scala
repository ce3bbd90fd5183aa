package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch: phase timing of the incremental LSH dedup stream's per-batch
  * work, replicated as a plain batch loop (no streaming engine) so each
  * stage's cost is attributable. */
object ProfileLshStream {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
