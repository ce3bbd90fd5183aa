package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, embedding cosine. Designed for the
  * 100 TB path:
  *
  *  - exact dedup is a hash groupBy (one shuffle, partial-agg);
  *  - n-gram Jaccard uses the inverted-index pair-count identity
  *    |A∩B| via a shuffle on shingle — never a naive O(n²) cross join;
  *  - MinHash banding turns near-dup search into an equi-join on band
  *    keys; candidates are then verified with exact Jaccard, so results
  *    equal the exhaustive answer with probability 1-(1-J^r)^b;
  *  - SimHash pairs use the pigeonhole band trick (hamming ≤ k ⇒ some
  *    chunk equal) to stay equi-join shaped;
  *  - embedding near-dup is exact cosine over candidate pairs (LSH
  *    bucketing for scale lives in [[Similarity]]).
  *
  * All hashes are engine-replayable (md5 / xxhash64 with literal seeds).
  */
object Dedup {

  /** Exact duplicates: canonical (min) id + count per content hash. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(lower(col(textCol))).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word k-shingles per doc: (doc_id, shingle).
    *
    * Kernel UDF, not `transform(sequence(...))`: Catalyst evaluates
    * higher-order functions interpreted per element, and the tokenize/
    * shingle explode dominates every dedup pipeline. Semantics are
    * byte-identical to the DuckDB oracle's CTE (lowercase, split on \s+,
    * drop empties, k-grams joined by ' ', distinct). */
  def shingles(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val shingleUdf = udf { (text: String) =>
      // Locale.ROOT: must lowercase exactly like Spark's lower() / the
      // DuckDB oracle regardless of the JVM default locale (tr/az dotless-i)
      val toks =
        if (text == null) Array.empty[String]
        else text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      if (toks.length < k) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        val sb = new java.lang.StringBuilder()
        while (i + k <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < k) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
          seen.add(sb.toString); i += 1
        }
        val out = new Array[String](seen.size)
        seen.toArray(out)
        out
      }
    }
    // small parquet inputs arrive as one partition; spread the rows so the
    // tokenize/shingle kernel evaluates in parallel (on a real 100 TB
    // layout the scan is already many-partition and this is ~free)
    val spread = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism,
      col(idCol))
    spread.select(col(idCol).as("doc_id"),
        explode(shingleUdf(col(textCol))).as("shingle"))
  }

  /** Exact n-gram Jaccard pairs ≥ tau via the inverted-index identity:
    * ONE self-join on shingle → pair counts c = |A∩B| directly (no
    * separate candidate pass), then J = c/(|A|+|B|-c). */
  def ngramJaccardPairs(docs: DataFrame, tau: Double, k: Int = 3): DataFrame = {
    // persist: the tokenize/shingle explode feeds both self-join sides plus
    // the size aggregation (same reasoning as minhashLshPairs)
    val sh = shingles(docs, k).persist()
    val counts = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    jaccardFromCounts(sh, counts, tau)
  }

  private def jaccardFromCounts(sh: DataFrame, counts: DataFrame, tau: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    counts
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), Seq("d2"))
      .withColumn("jaccard", col("c").cast("double") / (col("sz1") + col("sz2") - col("c")))
      .filter(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("jaccard"))
  }

  /** Exact Jaccard for given candidate pairs, filtered to ≥ tau. */
  def jaccardOfPairs(sh: DataFrame, candidates: DataFrame, tau: Double): DataFrame = {
    val counts = candidates
      .join(sh.select(col("doc_id").as("d1"), col("shingle")), Seq("d1"))
      .join(sh.select(col("doc_id").as("d2"), col("shingle")), Seq("d2", "shingle"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("c"))
    jaccardFromCounts(sh, counts, tau)
  }

  /** MinHash signatures: numHashes seeded xxhash64 minima over shingles —
    * one aggregation, partial-agg friendly. */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(xxhash64(lit(i), col("shingle"))).as(s"m$i"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs from banded minhash signatures. */
  def lshCandidates(sig: DataFrame, bands: Int = 16, rows: Int = 4): DataFrame = {
    val bandKeys = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((lit(1000 + b) +: (0 until rows).map(r => col(s"m${b * rows + r}"))): _*).as("key"))
    }
    val exploded = sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
  }

  /** MinHash+LSH near-dup pairs, exact-Jaccard verified (≥ tau).
    * The shingle relation is cached: it feeds signature computation AND
    * candidate verification (3 consumers), and recomputing the tokenize/
    * shingle explode dominates otherwise. */
  def minhashLshPairs(docs: DataFrame, tau: Double, k: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val sh = shingles(docs, k).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = lshCandidates(minhashSignatures(sh, numHashes), bands, numHashes / bands)
    jaccardOfPairs(sh, cand, tau)
  }

  /** 60-bit SimHash per doc from md5-derived token hashes (md5 so the
    * oracle can replay it; 15 hex chars = 60 bits fits a signed long). */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      bits: Int = 60): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val bitSums = (0 until bits).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$i")
    }
    val agg = toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until bits).map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs: pigeonhole chunk join (4×15-bit chunks) then
    * exact hamming filter. Complete for hamming ≤ 3; wider thresholds keep
    * the same candidate rule (documented approximation). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sig = simhash(docs)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("j"), shiftright(col("simhash"), j * 15).bitwiseAND(32767).as("chunk"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.j").as("j"), col("ck.chunk").as("chunk"))
    chunks.as("a").join(chunks.as("b"),
        col("a.j") === col("b.j") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.simhash").as("h1"), col("b.simhash").as("h2")).distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** Exact embedding cosine near-dup pairs ≥ tau.
    *
    * Brute force done the Spark way: broadcast the (normalized) vector
    * matrix, stream the corpus once, primitive-array dot kernel per
    * partition — no 12.5M-row joined relation ever materializes, and the
    * kernel is JIT-compiled (measured ~20× over expression-tree dots).
    * Requires the matrix to fit in a broadcast (~0.5 GB per 1M×64 floats);
    * beyond that use [[Similarity.hyperplaneLsh]] bucketing — that is the
    * 100 TB path.
    *
    * Arithmetic is the same left-to-right double fold as the DuckDB
    * oracle; rounding matches Spark's round() (HALF_UP).
    */
  def embeddingCosinePairs(emb: DataFrame, tau: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
    val local: Array[(Long, Array[Double])] =
      vecs.collect().map { case (id, v) => (id, v.toArray) }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(local)

    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    vecs.flatMap { case (id, v) =>
      val a = v.toArray
      val n2a = dotArr(a, a)
      val all = bc.value
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
      var j = 0
      while (j < all.length) {
        val (bid, b) = all(j)
        if (bid > id) {
          val cos = round6(dotArr(a, b) / math.sqrt(n2a * dotArr(b, b)))
          if (cos >= tau) out += ((id, bid, cos))
        }
        j += 1
      }
      out
    }.toDF("v1", "v2", "cosine")
  }
}
