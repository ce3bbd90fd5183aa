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
  * host-frequency cap → line-level dedup → quality/C4 filters →
  * classifier fit on a takeTokens-budgeted label sample + corpus score
  * + filter (4096-bucket CG, r14 — train→score→cut as one chain) →
  * exact dedup → ExactSubstr span cut (suffix-array pass, r12 — before
  * MinHash so universal boilerplate can't skew near-dup similarity) →
  * benchmark-refresh A/B (r14: external query over the saved artifact
  * vs joint rebuild) → MinHash-LSH near-dup clustering (keep canonical)
  * → mixture weights → per-source token-budget cut; then the SEMANTIC leg (r12)
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
      // hosts scale WITH the corpus (500·factor hosts ⇒ ~100 docs/host
      // at any factor): a fixed 500-host decoration made hostCap(80)
      // clamp every factor to the same 40k survivors, silently turning
      // the "100×" chain into a 40k-doc run (r15 catch — exactly the
      // silent-cap class the no-silent-caps rule exists for)
      .withColumn("url", concat(lit("https://WWW.Host"),
        (col("doc_id") % (500 * factor)).cast("string"),
        lit(".Example.COM:443/d/"),
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
    // release-as-you-go (r15: the 100× run OOM'd an 8 GB driver because
    // the chain held EVERY stage's checkpoint blocks to the end — a real
    // pipeline drops a stage's input once the next stage materializes)
    def drop(dfs: DataFrame*): Unit =
      dfs.foreach(graft.sources.SessionCache.release)

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
    drop(capped)
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
    // 3b. trained quality classifier at 10× — r14: PRODUCTION width
    //     (4096 hashed features through the size-routed CG solve) and IN
    //     the chain (r13 ask #6): the LABEL SOURCE is a token-budgeted
    //     sample drawn through takeTokens (real pipelines label a small
    //     budgeted subset, not the corpus), the fit runs on that sample,
    //     the model scores the full filtered corpus, and its predictions
    //     gate what flows into dedup and the final budget cut —
    //     train → score → cut as one chain. Labels: top-half quality
    //     (median split → genuinely mixed classes).
    val tClf = System.nanoTime()
    val labelSample = Sampling.takeTokens(
        lineDeduped.withColumn("source", lit("all")),
        Map("all" -> 400000L))
      .filter(col("kept")).select(col("doc_id"))
      .join(lineDeduped.select(col("doc_id"), col("text")), Seq("doc_id"))
    val qScores = TextAnalysis.qualityScore(labelSample)
      .select(col("doc_id"), col("quality"))
    // empty-sample guard (r14 ADVICE): a tiny input dir or an all-filtered
    // corpus makes approxQuantile return an empty array — fail with a
    // message naming the cause instead of an IndexOutOfBoundsException
    val qMedArr = qScores.stat.approxQuantile("quality", Array(0.5), 0.001)
    require(qMedArr.nonEmpty,
      "classifier stage: the token-budgeted label sample is empty " +
        "(input dir too small or every doc filtered) — nothing to train on")
    val qMed = qMedArr(0)
    val clfLab = qScores.select(col("doc_id"), (col("quality") > qMed).as("lab"))
    val clfLabeled = labelSample.join(clfLab, Seq("doc_id"))
    val clfW = TextAnalysis.classifierTrain(clfLabeled, col("lab"),
        buckets = 4096)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val clfFitSec = (System.nanoTime() - tClf) / 1e9
    totalSec += clfFitSec
    locally {
      val agree = TextAnalysis.classifierScore(clfLabeled, clfW,
          buckets = 4096, thresholdNano = 500000000L)
        .join(clfLab, Seq("doc_id"))
        .filter(col("predicted") === col("lab")).count()
      val n = clfLab.count()
      val label = "classifier fit (4096, budget sample)"
      println(f"  $label%-36s ${clfFitSec}%7.2f s  -> sample agreement $agree/$n")
    }
    drop(lineDeduped)
    // 3c. the trained model scores the FULL filtered corpus (same raw-
    //     text distribution it was fit on — scoring precedes the span
    //     cut, the GPT-3 order) and its predictions gate the rest of
    //     the pipeline
    val clfKept = stage("classifier score + filter (4096)") {
      filtered.join(
        TextAnalysis.classifierScore(filtered, clfW, buckets = 4096,
            thresholdNano = 500000000L)
          .filter(col("predicted")).select(col("doc_id")), Seq("doc_id"))
    }
    drop(filtered)
    // 4. exact dedup (keep the canonical copy of byte-identical docs)
    val exactDeduped = stage("exact dedup") {
      clfKept.join(Dedup.exact(clfKept)
          .select(col("keep_id").as("doc_id")), Seq("doc_id"))
    }
    drop(clfKept)
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
    // ---- benchmark-refresh A/B (r14 ask #1): a NEW eval set arrives
    // AFTER the corpus index was built. Option A re-pays the joint
    // corpus∪bench build (the only r13 path); option B queries the SAVED
    // corpus-only artifact with decontaminateExternal. The artifact's
    // one-time cost (build + save incl. vocab/pairmap derivation) is
    // printed separately — it amortizes over every later refresh AND
    // every other index consumer.
    locally {
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val disclaimer = "disclaimer: this content is provided as is without" +
        " warranty of any kind either express or implied including fitness" +
        " for a particular purpose"
      val bench2 = exactDeduped.filter(col("doc_id") % 503 === 0)
        .select((col("doc_id") + 2000000000L).as("doc_id"),
          concat(lit("fresh eval: "),
            regexp_replace(col("text"), disclaimer, "")).as("text"))
      val corpusOnly = exactDeduped.select(col("doc_id"), col("text"))
      var idxC: Dedup.SuffixIndex = null
      val buildSec = time { idxC = Dedup.buildSuffixIndex(corpusOnly, maxLen = 16) }
      val saveDir = java.nio.file.Files
        .createTempDirectory("graft_sufidx10x").toString
      val saveSec = time { Dedup.saveSuffixIndex(idxC, saveDir) }
      idxC.release()
      var extN = 0L
      val extSec = time {
        val loaded = Dedup.loadSuffixIndex(spark, saveDir)
        extN = loaded.decontaminateExternal(bench2, minLen = 16)
          .filter(col("contaminated")).count()
      }
      var jointN = 0L
      val jointSec = time {
        val all2 = corpusOnly.unionByName(bench2)
        val j = Dedup.buildSuffixIndex(all2, maxLen = 16)
        jointN = j.decontaminate(all2, col("doc_id") >= 2000000000L,
          minLen = 16).filter(col("contaminated")).count()
        j.release()
      }
      println(f"  benchmark-refresh A/B: artifact one-time ${buildSec}%.2f s" +
        f" build + ${saveSec}%.2f s save; refresh = external query" +
        f" ${extSec}%.2f s vs joint rebuild ${jointSec}%.2f s" +
        f" ($extN vs $jointN contaminated" +
        (if (extN == jointN) ", identical)" else ", MISMATCH)"))
      // ---- corpus-append A/B (r15 ask #1): the corpus GROWS ~10%.
      // Option A re-pays the full single-index build (buildSec above —
      // same corpus, already measured); option B appends ONE delta
      // shard to a sharded federation and serves the same external
      // query federated (exact: per-shard per-doc union). The
      // federation build itself is the one-time migration cost.
      val oldC = corpusOnly.filter(col("doc_id") % 10 =!= 0)
      val deltaC = corpusOnly.filter(col("doc_id") % 10 === 0)
      var fed0: Dedup.ShardedSuffixIndex = null
      val fedBuildSec = time {
        fed0 = Dedup.buildShardedSuffixIndex(oldC, nShards = 4, maxLen = 16)
      }
      var fed1: Dedup.ShardedSuffixIndex = null
      val appendSec = time { fed1 = Dedup.appendSuffixShard(fed0, deltaC) }
      var fedN = 0L
      val fedQSec = time {
        fedN = fed1.decontaminateExternal(bench2, minLen = 16)
          .filter(col("contaminated")).count()
      }
      fed1.release()
      println(f"  corpus-append A/B: federation one-time ${fedBuildSec}%.2f s" +
        f" (4 shards, 90%% corpus); +10%% docs = delta-shard build" +
        f" ${appendSec}%.2f s vs full rebuild ${buildSec}%.2f s;" +
        f" federated external query ${fedQSec}%.2f s vs single-index" +
        f" ${extSec}%.2f s ($fedN vs $extN contaminated" +
        (if (fedN == extN) ", identical)" else ", MISMATCH)"))
    }
    drop(exactDeduped)
    val afterCut = spanCut.drop("n_removed")
      .join(decon.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // 5. near-dup clustering, keep canonical per cluster
    val nearDeduped = stage("minhash-LSH near-dup + canonical") {
      val pairs = Dedup.minhashLshPairs(afterCut, 0.5)
      afterCut.join(
        Dedup.clusterAssign(afterCut, pairs)
          .filter(col("is_canonical")).select(col("doc_id")), Seq("doc_id"))
    }
    drop(spanCut, decon)
    // 6. mixture weights + token-budget cut per source
    val cut = stage("mix weights + token budget") {
      val budgets = Sampling.mixWeights(nearDeduped).collect()
        .map(r => r.getAs[String]("source") ->
          math.max(r.getAs[Long]("n_tokens") / 2, 1L)).toMap
      Sampling.takeTokens(nearDeduped, budgets, defaultBudget = Long.MaxValue)
        .filter(col("kept"))
    }
    // ---- mixture-stage scaling A/B (r12): two-pass prefix sum vs the
    // r11 single-window form on a ONE-SOURCE corpus — the window form
    // funnels every row into one task's sort; the two-pass spreads the
    // same exact computation across the session's shuffle partitions.
    // Runs HERE (before nearDeduped's blocks are released — a released
    // localCheckpoint has no lineage to recompute from, so the r15
    // release-as-you-go pass made the old end-of-run placement a
    // use-after-release crash); the result line prints with the other
    // A/Bs at the end.
    val (twoPassSec, windowSec) = locally {
      val one = nearDeduped.withColumn("source", lit("all"))
        .select(col("doc_id"), col("source"), col("text"))
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val tp = time {
        Sampling.takeTokens(one, Map.empty, defaultBudget = Long.MaxValue)
          .agg(sum(col("cum_tokens"))).collect()
        ()
      }
      val W = org.apache.spark.sql.expressions.Window
      val w = W.partitionBy(col("source"))
        .orderBy(Sampling.hashFraction(col("doc_id"), "budget"), col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val ws = time {
        one.select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
          .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
          .agg(sum(col("cum_tokens"))).collect()
        ()
      }
      (tp, ws)
    }
    drop(nearDeduped)
    // budget-true total: the straddler doc counts at its truncate_to,
    // not its full length — summing raw n_tokens would overstate the
    // budgeted corpus by up to one doc per source
    val tokensRow = cut.agg(sum(
      when(col("truncate_to") > 0, col("truncate_to")).otherwise(col("n_tokens"))))
      .collect()(0)
    val tokens = if (tokensRow.isNullAt(0)) 0L else tokensRow.getLong(0)

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
    // 7b. nlist∝n A/B: the 100× run surfaced semDedup's Σn_c² wall at
    //     FIXED nlist (cells hold factor× more vectors, pair work grows
    //     ~factor²). The published recipe scales cluster count with
    //     corpus size (constant expected cell occupancy) — same tau,
    //     same keep-the-outlier semantics, near-dup groups still fall
    //     inside one cell (near-identical copies k-means together
    //     regardless of nlist), so the dedup decision is materially the
    //     same while pair work returns to ~linear. Measured against
    //     stage 7's fixed-nlist time; kept counts printed for the
    //     sameness check.
    locally {
      val t0 = System.nanoTime()
      val flags2 = Dedup.semDedup(embCorpus, tau = 0.97,
        nlist = math.max(32, 32 * factor / 10), iters = 3)
      val kept2 = flags2.filter(col("keep")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      totalSec += sec
      drop(flags2)
      val label = "semDedup (nlist scaled ~n) A/B"
      println(f"  $label%-36s ${sec}%7.2f s  -> kept $kept2 (vs fixed-nlist ${semKept.count()})")
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
    // ---- multimodal leg (r15): perceptual dedup at corpus scale ----
    // decode+hash throughput on the REAL codecs at full volume (one PNG
    // + one WAV per final-corpus doc), then pairing on PLANTED hash
    // fixtures: the gate fixtures' 21-class generators are deliberately
    // tiny-keyed (oracle-replayable) and would make pair output
    // quadratic at this volume, so the scale leg plants bounded dup
    // groups instead — every odd id reuses its even neighbor's hash
    // with ≤ 3 bits flipped (group size 2, pairs ≈ n/2), the shape a
    // real corpus has. Same for video: clip id's frame set {id..id+4}
    // overlaps its +1 neighbor in 4 of 6 distinct frames (J = 2/3).
    import graft.operators.Multimodal
    val mmIds = cut.select(col("doc_id"))
    val mmHashed = stage("mm decode+hash (PNG+WAV per doc)") {
      Multimodal.dHash(spark, Multimodal.grayMediaFromDocuments(spark, mmIds))
        .select(col("media_id"), col("dhash").as("h"))
        .unionByName(
          Multimodal.aHash(spark, Multimodal.toneMediaFromDocuments(spark, mmIds))
            .select(col("media_id"), col("ahash").as("h")))
    }
    drop(mmHashed)
    val planted = mmIds.select(col("doc_id").as("media_id"),
      xxhash64(col("doc_id") - pmod(col("doc_id"), lit(2)))
        .bitwiseXOR(when(pmod(col("doc_id"), lit(2)) === 1,
          pmod(col("doc_id"), lit(7))).otherwise(lit(0L)))
        .as("dhash"))
    val imgPairs = stage("banded Hamming pairing (planted dups)") {
      Multimodal.phashPairs(planted, maxHamming = 3)
    }
    drop(imgPairs)
    val vframes = mmIds.select(col("doc_id").as("media_id"),
      explode(sequence(col("doc_id"), col("doc_id") + 4)).as("fkey"))
      .select(col("media_id"), md5(col("fkey").cast("string")).as("frame_md5"))
    val vidPairs = stage("video frame-set Jaccard (planted)") {
      Multimodal.videoDupPairs(vframes, minJaccard = 0.6)
    }
    drop(vidPairs)

    println(f"pipeline total ${totalSec}%.2f s; final corpus ${cut.count()} docs, " +
      f"$tokens budgeted tokens; semantic leg kept ${semKept.count()} vectors, " +
      f"${contam.count()} contamination hits")

    println(f"one-source token-budget A/B: two-pass ${twoPassSec}%.2f s " +
      f"(${spark.sessionState.conf.numShufflePartitions} slices) vs " +
      f"single-window ${windowSec}%.2f s (1 task)")
    spark.stop()
  }
}
