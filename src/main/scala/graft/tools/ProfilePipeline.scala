package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, Similarity, TextAnalysis}

/** Scratch: END-TO-END corpus-prep pipeline throughput at 10× sf0.1 —
  * the operators the gates pin individually, composed the way a real
  * training-data run chains them, with per-stage wall time and doc/token
  * survival counts. Evidence that the stages compose without
  * rematerialization pathologies (each stage consumes the previous
  * stage's checkpointed frame; nothing re-derives upstream work).
  *
  * Chain (the C4/CCNet/RefinedWeb order): URL canonicalization +
  * host-frequency cap → line-level dedup → quality/C4 filters → exact
  * dedup → ExactSubstr span cut (suffix-array pass, r12 — before
  * MinHash so universal boilerplate can't skew near-dup similarity) →
  * MinHash-LSH near-dup clustering (keep canonical) → mixture weights →
  * per-source token-budget cut; then the SEMANTIC leg (r12)
  * at the same 10× volume: embedding inflation → SemDeDup
  * (keep-the-outlier) → IVF-PQ decontamination-style probe of an eval
  * set against the deduped corpus. Also prints the r12 one-source A/B:
  * the two-pass prefix sum vs the r11 single-window form, the
  * measurement behind clearing the `weak` scale marks.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.filterNot(_.startsWith("--"))
      .getOrElse("/root/testdata/sf0.1")
    val factor = args.dropWhile(_ != "--factor").drop(1).headOption
      .flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // inflate: copy c keeps per-copy dup structure, copies are not
    // near-dups of each other (unique token prefix); decorate with URLs
    // (doc_id-derived hosts) and shared boilerplate lines so the URL and
    // line stages have real work
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val inflated = (0 until factor).map { c =>
      val d = docs0.select((col("doc_id") * factor + c).as("doc_id"),
        col("text"), col("lang"), col("source"))
      if (c == 0) d
      // mutate only tokens >= 4 chars: stopwords (all <= 3 chars) survive,
      // so the quality/C4 stage sees realistic text, while most 3-gram
      // shingles contain >= 1 mutated token and copies stay below the
      // near-dup threshold against each other
      else d.withColumn("text", regexp_replace(col("text"), "(\\S{4,})", s"c${c}q$$1"))
    }.reduce(_ unionByName _)
      .withColumn("url", concat(lit("https://WWW.Host"),
        (col("doc_id") % 500).cast("string"), lit(".Example.COM:443/d/"),
        col("doc_id").cast("string"), lit("?utm_source=crawl&id="),
        col("doc_id").cast("string")))
      .withColumn("text", concat(lit("Subscribe to our newsletter\n"),
        col("text"),
        // in-LINE boilerplate: the line is unique per doc (id prefix), so
        // line-level dedup cannot remove it — only the ExactSubstr pass
        // catches the repeated 20-token span inside it
        lit("\nRead doc "), col("doc_id").cast("string"),
        lit(" disclaimer: this content is provided as is without warranty" +
          " of any kind either express or implied including fitness for" +
          " a particular purpose"),
        lit("\n(c) 2024 Example Corp")))
    val path = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/docs.parquet"
    inflated.coalesce(8).write.parquet(path)
    val corpus = spark.read.parquet(path)
    println(s"corpus: ${corpus.count()} docs (factor $factor over $dir)")

    var totalSec = 0.0
    def stage(name: String)(f: => DataFrame): DataFrame = {
      val t0 = System.nanoTime()
      val out = f.localCheckpoint(true)
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      totalSec += sec
      println(f"  $name%-34s ${sec}%7.2f s  -> $n%8d rows")
      out
    }

    // 1. URL keys + host cap (≤ factor×avg docs/host keeps ~all; cap at
    //    80 bites on the 500-host decoration)
    val capped = stage("url canon + host cap (80/host)") {
      val keys = Sampling.hostCap(corpus, maxPerHost = 80)
      corpus.join(keys.filter(col("kept")).select(col("doc_id")), Seq("doc_id"))
    }
    // 2. corpus-wide line dedup (boilerplate collapses to first occurrence)
    val lineDeduped = stage("line-level dedup") {
      capped.join(Dedup.lineDedup(capped)
          .select(col("doc_id"), col("text_dedup")), Seq("doc_id"))
        .drop("text").withColumnRenamed("text_dedup", "text")
    }
    // 3. quality + C4 keep flags
    val filtered = stage("quality + C4 filters") {
      val q = TextAnalysis.qualityScore(lineDeduped)
        .select(col("doc_id"), col("quality"))
      val c4 = TextAnalysis.c4Filters(lineDeduped)
        .select(col("doc_id"), col("keep"))
      lineDeduped.join(q, Seq("doc_id")).join(c4, Seq("doc_id"))
        .filter(col("keep") && col("quality") > 0.2)
        .drop("keep", "quality")
    }
    // 3b. trained quality classifier at 10× (r13) — the GPT-3 recipe:
    //     heuristic labels → exact-ridge hashed linear model → score the
    //     whole corpus; reported as fit+score wall and label agreement
    //     (report-only: the pipeline's row flow stays the heuristic
    //     filter so stage numbers compare across rounds)
    locally {
      val t0 = System.nanoTime()
      val lab = TextAnalysis.qualityScore(lineDeduped)
        .select(col("doc_id"), (col("quality") > 0.2).as("lab"))
      val labeled = lineDeduped.select(col("doc_id"), col("text"))
        .join(lab, Seq("doc_id"))
      val w = TextAnalysis.classifierTrain(labeled, col("lab"), buckets = 16)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val scored = TextAnalysis.classifierScore(labeled, w, buckets = 16,
        thresholdNano = 500000000L)
      val agree = scored.join(lab, Seq("doc_id"))
        .filter(col("predicted") === col("lab")).count()
      val n = lab.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val label = "trained classifier (fit + score)"
      println(f"  $label%-34s ${sec}%7.2f s  -> agreement $agree/$n")
    }
    // 4. exact dedup (keep the canonical copy of byte-identical docs)
    val exactDeduped = stage("exact dedup") {
      filtered.join(Dedup.exact(filtered)
          .select(col("keep_id").as("doc_id")), Seq("doc_id"))
    }
    // 4b. SHARED suffix index (r13): ONE prefix-doubling build over
    //     corpus ∪ benchmark feeds BOTH the ExactSubstr cut and the
    //     substring decontamination — r12 paid the dominant index build
    //     once per consumer. The synthetic benchmark is ~1/500 of the
    //     corpus with verbatim corpus text inside (guaranteed
    //     contamination hits) under fresh ids.
    // the synthetic eval set strips the universal disclaimer decoration:
    // a real benchmark is clean prose, and a ≥16-token span present in
    // EVERY corpus doc would (correctly!) flag the whole corpus
    val benchDocs = exactDeduped.filter(col("doc_id") % 499 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(lit("eval question: "), regexp_replace(col("text"),
          "disclaimer: this content is provided as is without warranty" +
            " of any kind either express or implied including fitness for" +
            " a particular purpose", "")).as("text"))
    val allDocs = exactDeduped.select(col("doc_id"), col("text"))
      .unionByName(benchDocs)
    val tIdx = System.nanoTime()
    val idx = Dedup.buildSuffixIndex(allDocs, maxLen = 16)
    val idxSec = (System.nanoTime() - tIdx) / 1e9
    totalSec += idxSec
    println(f"  ${"suffix index build (corpus+bench)"}%-34s ${idxSec}%7.2f s  -> shared artifact")
    // ExactSubstr cut (r12): remove tokens covered by ≥16-token spans
    // duplicated WITHIN the corpus (restrictToDocs — benchmark text must
    // not count as corpus duplication). Runs BEFORE MinHash on purpose:
    // the decoration's in-line boilerplate (unique line prefix, so line
    // dedup cannot touch it) dominates every doc's shingle set and blows
    // the LSH candidate generation up quadratically (measured 145 s vs
    // ~15 s at this volume) — cutting universal spans first is what
    // keeps near-dup similarity about content, not boilerplate.
    val spanCut = stage("ExactSubstr cut (>=16-token spans)") {
      val cut = idx.cut(exactDeduped, minLen = 16, restrictToDocs = true)
      exactDeduped.drop("text")
        .join(cut.select(col("doc_id"), col("text_dedup").as("text"),
          col("n_removed")), Seq("doc_id"))
    }
    println(s"    (docs with spans cut: ${spanCut.filter(col("n_removed") > 0).count()})")
    // substring decontamination from the SAME index — the second
    // consumer that previously triggered a full rebuild
    val decon = stage("substr decontamination (shared idx)") {
      idx.decontaminate(allDocs, col("doc_id") >= 1000000000L, minLen = 16)
        .filter(col("contaminated"))
    }
    idx.release()
    val afterCut = spanCut.drop("n_removed")
      .join(decon.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // 5. near-dup clustering, keep canonical per cluster
    val nearDeduped = stage("minhash-LSH near-dup + canonical") {
      val pairs = Dedup.minhashLshPairs(afterCut, 0.5)
      afterCut.join(
        Dedup.clusterAssign(afterCut, pairs)
          .filter(col("is_canonical")).select(col("doc_id")), Seq("doc_id"))
    }
    // 6. mixture weights + token-budget cut per source
    val cut = stage("mix weights + token budget") {
      val budgets = Sampling.mixWeights(nearDeduped).collect()
        .map(r => r.getAs[String]("source") ->
          math.max(r.getAs[Long]("n_tokens") / 2, 1L)).toMap
      Sampling.takeTokens(nearDeduped, budgets, defaultBudget = Long.MaxValue)
        .filter(col("kept"))
    }
    // budget-true total: the straddler doc counts at its truncate_to,
    // not its full length — summing raw n_tokens would overstate the
    // budgeted corpus by up to one doc per source
    val tokens = cut.agg(sum(
      when(col("truncate_to") > 0, col("truncate_to")).otherwise(col("n_tokens"))))
      .collect()(0).getLong(0)

    // ---- semantic leg (r12): embeddings at the same 10× volume ----
    // copies c>0 nudge ONE dimension by a copy-dependent delta: each
    // original spawns a cluster of near-identical copies (real SemDeDup
    // work) while distinct originals stay apart (the fixture's vectors
    // are near-uniform, pairwise cosine well below the threshold)
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val embInflated = (0 until factor).map { c =>
      val d = emb0.select((col("vec_id") * factor + c).as("vec_id"), col("embedding"))
      if (c == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          when(i === 0, x + lit(c * 1e-3)).otherwise(x)))
    }.reduce(_ unionByName _)
    val epath = java.nio.file.Files.createTempDirectory("graft_pipe_emb").toString + "/emb.parquet"
    embInflated.coalesce(8).write.parquet(epath)
    val embCorpus = spark.read.parquet(epath)
    println(s"embedding corpus: ${embCorpus.count()} vectors (factor $factor)")
    // 7. SemDeDup: cluster, drop all but the outlier per near-dup group
    val semKept = stage("semDedup (keep outliers)") {
      val flags = Dedup.semDedup(embCorpus, tau = 0.97, nlist = 32, iters = 3)
      embCorpus.join(flags.filter(col("keep")).select(col("vec_id")), Seq("vec_id"))
    }
    // 8. IVF-PQ decontamination-style probe: the eval set (the first 20
    //    originals) searches the deduped corpus; hits at cosine ≥ 0.95
    //    are the "too close to eval" rows a pipeline would scrub
    val contam = stage("IVF-PQ decontamination probe") {
      val queries = embCorpus
        .filter(col("vec_id") < 20L * factor && col("vec_id") % factor === 0)
      val cells = Similarity.kmeansAssign(semKept, nlist = 32, iters = 3)
      val books = Similarity.pqTrain(semKept, m = 16, ks = 16, iters = 3)
      val enc = Similarity.pqEncode(cells, books)
      Similarity.ivfPqTopK(enc, queries, books, k = 10, nprobe = 4, rerank = 100)
        .filter(col("cosine") >= 0.95)
    }
    println(f"pipeline total ${totalSec}%.2f s; final corpus ${cut.count()} docs, " +
      f"$tokens budgeted tokens; semantic leg kept ${semKept.count()} vectors, " +
      f"${contam.count()} contamination hits")

    // ---- mixture-stage scaling A/B (r12): two-pass prefix sum vs the
    // r11 single-window form on a ONE-SOURCE corpus — the window form
    // funnels every row into one task's sort; the two-pass spreads the
    // same exact computation across the session's shuffle partitions
    {
      val one = nearDeduped.withColumn("source", lit("all"))
        .select(col("doc_id"), col("source"), col("text"))
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val twoPassSec = time {
        Sampling.takeTokens(one, Map.empty, defaultBudget = Long.MaxValue)
          .agg(sum(col("cum_tokens"))).collect()
        ()
      }
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("source"))
        .orderBy(Sampling.hashFraction(col("doc_id"), "budget"), col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val windowSec = time {
        one.select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .agg(sum(col("cum_tokens"))).collect()
        ()
      }
      println(f"one-source token-budget A/B: two-pass ${twoPassSec}%.2f s " +
        f"(${spark.sessionState.conf.numShufflePartitions} slices) vs " +
        f"single-window ${windowSec}%.2f s (1 task)")
    }
    spark.stop()
  }
}
