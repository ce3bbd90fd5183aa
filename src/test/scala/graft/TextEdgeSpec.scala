package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, TextAnalysis}

/** Degenerate-document edges (r9 review): empty/whitespace-only docs are
  * routine in web corpora and must SCORE, not crash — Spark 4 runs ANSI
  * by default, so an unguarded ratio is a DIVIDE_BY_ZERO job failure;
  * and text with no language markers is "unknown", not "en". */
class TextEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val degenerate = Seq((1L, ""), (2L, "   \t\n "), (3L, "one")).toDF("doc_id", "text")

  test("quality / repetition / c4 / dup-span survive zero-token docs") {
    val q = TextAnalysis.qualityScore(degenerate).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(q(1L) == 0.0 && q(2L) == 0.0)
    val rep = TextAnalysis.repetitionStats(degenerate).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("distinct_ratio")).toMap
    assert(rep(1L) == 0.0 && rep(3L) == 1.0)
    val c4 = TextAnalysis.c4Filters(degenerate).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("too_short")).toMap
    assert(c4(1L) && c4(3L))
    val ds = Dedup.dupSpanStats(degenerate).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("dup_ratio")).toMap
    assert(ds(1L) == 0.0 && ds(3L) == 0.0)
  }

  test("langId labels marker-free text unknown, not en") {
    val df = Seq((1L, "the of and to a"), (2L, "пример текста без маркеров"),
      (3L, "")).toDF("doc_id", "text")
    val pred = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("predicted")).toMap
    assert(pred(1L) == "en")
    assert(pred(2L) == "unknown", pred.toString)
    assert(pred(3L) == "unknown")
  }

  test("piiScan counts agree with the redaction precedence") {
    // the address contains an IP-shaped substring; the email mask
    // consumes it, so n_ips must be 0 (counts reconcile with redacted)
    val df = Seq((1L, "mail user@10.1.2.3.example.org now")).toDF("doc_id", "text")
    val r = TextAnalysis.piiScan(df).collect().head
    assert(r.getAs[Long]("n_emails") == 1L)
    assert(r.getAs[Long]("n_ips") == 0L, r.toString)
    assert(!r.getAs[String]("redacted").contains("<IP>"))
  }

  test("minhashLshPairs rejects a non-tiling banding loudly") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Dedup.minhashLshPairs(docs, 0.5, bands = 100))
  }
}
