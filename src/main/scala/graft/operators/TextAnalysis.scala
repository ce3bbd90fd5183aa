package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language-ID (marker-word heuristic), quality scoring, fingerprinting.
  * All expressions are codegen'd built-ins (no UDFs) and use only exact /
  * correctly-rounded arithmetic so DuckDB oracles match bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens of lowercased text, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style BPE pre-tokenization pattern: English contractions,
    * optionally space-prefixed letter / digit / punctuation runs.
    * Restricted to the regex subset where Java (Spark executors) and
    * RE2 (the DuckDB oracle) agree exactly — leftmost-first alternation,
    * ASCII classes, no lookahead — so counts match bit-for-bit.
    */
  val bpePattern: String = "'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  /** BPE-ish sub-word-boundary tokens (pre-merge); codegen'd, no UDF. */
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(bpePattern), lit(0))

  /** Number of BPE-ish pre-tokens — the scale-relevant "how many tokens
    * is this corpus" estimator (one regex pass, no materialized array). */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpePattern))

  /** Marker words per language for the n-gram/stopword language heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "und", "ist", "das", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "zh" -> Seq("的", "是", "在", "了"))

  /** Count of tokens (with multiplicity) that appear in `markers`. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(markers.toArray), t)))

  /** Language prediction: argmax of marker hits, fixed priority order on
    * ties (en > de > es > fr > zh). Returns (score columns..., predicted). */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    val scored = langMarkers.foldLeft(df.withColumn("_toks", t)) {
      case (d, (lang, markers)) => d.withColumn(s"score_$lang", markerHits(col("_toks"), markers))
    }
    val scores = langMarkers.map { case (l, _) => col(s"score_$l") }
    val best = greatest(scores: _*)
    // WHEN chain in declaration order = fixed tie-break priority
    val pred = langMarkers.reverse.foldLeft(lit("unknown")) {
      case (elseCol, (lang, _)) => when(col(s"score_$lang") === best, lit(lang)).otherwise(elseCol)
    }
    scored.withColumn("predicted", pred).drop("_toks")
  }

  /** Quality components + a [0,1] score from exact rational arithmetic
    * (no transcendentals — libm differs across engines). */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col(textCol), "\\s", "")).cast("long"))
      .withColumn("avg_token_len", col("n_alpha").cast("double") / col("n_tokens"))
      .withColumn("stop_hits", markerHits(t, langMarkers.head._2).cast("long"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tokens"))
      .withColumn("quality",
        least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.5 +
          least(col("stop_ratio") * 5.0, lit(1.0)) * 0.5)
  }

  /** Content fingerprint: md5 of the lowercased text (content-defined
    * rolling-hash winnowing is in [[Dedup.simhash]] / shingling). */
  def fingerprint(text: Column): Column = md5(lower(text))
}
