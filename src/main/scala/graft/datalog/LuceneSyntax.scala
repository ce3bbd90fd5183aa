package graft.datalog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Lucene classic-QueryParser subset, compiled to Catalyst columns.
  *
  * The reference's `text-search` / `wildcard-text-search` parse their
  * pattern with Lucene's `QueryParser` over a `StandardAnalyzer`
  * (crux-lucene/src/crux/lucene.clj:135-144, 176-182), and the multi-field
  * module's `lucene-text-search` parses full `field:term` query strings
  * (crux-lucene/src/crux/lucene/multi_field.clj:39-43). This object
  * re-implements the commonly-used slice of that syntax:
  *
  *   - analyzed terms (`Ivan` — lowercased, matched against tokens)
  *   - wildcards (`Iv*n`, `Iv?n` — normalized, matched per-token; like
  *     Lucene, a pure wildcard query contributes a CONSTANT score 1.0,
  *     see lucene_test.clj "Scores": `ivan*` yields score 1.0)
  *   - phrases (`"hello world"` — consecutive analyzed tokens)
  *   - boolean operators `AND`/`OR`/`NOT`/`&&`/`||`, `+`/`-` prefixes,
  *     parenthesised groups (classic QueryParser occur semantics:
  *     MUST / SHOULD / MUST_NOT, default operator OR)
  *   - `field:term` / `field:"a phrase"` (multi-field module only; an
  *     unfielded term there parses against the empty default field and
  *     matches nothing, multi_field_test.clj "firstname Fred")
  *   - `\` escapes (`person\/surname:Smith`)
  *   - fuzzy `term~` / `term~N` (r5: Damerau-Levenshtein ≤ N — an
  *     adjacent transposition counts as ONE edit, matching Lucene's
  *     FuzzyQuery; AUTO edits from term length)
  *   - ranges `[a TO b]` / `{a TO b}` (r4: lexicographic over analyzed
  *     tokens, `*` endpoints open; constant-score like Lucene's default
  *     TermRangeQuery rewrite)
  *   - boosts `expr^2.5` (r4: score multiplier on the preceding clause)
  *
  * Scoring (r4): term and phrase leaves score with Lucene's BM25
  * formula (BM25Similarity, k1=1.2 b=0.75):
  * `ln(1 + (N - df + 0.5)/(df + 0.5)) * tf / (tf + k1*(1 - b + b*dl/avgdl))`
  * over corpus stats (N, avgdl, per-leaf df) the planner aggregates from
  * the same attribute corpus Lucene would have indexed; wildcard leaves
  * contribute a constant 1.0 (MultiTermQuery constant-score rewrite),
  * and a BooleanQuery sums its matching positive clauses. dl is the
  * byte4-quantized token count (r5, [[quantizeDl]]) exactly as Lucene
  * stores it in the one-byte norm; the only remaining deviation
  * (SURVEY §2.2) is double-vs-float arithmetic, sub-ULP at float
  * precision.
  *
  * Tokenization mirrors StandardAnalyzer on the data this engine targets:
  * lowercase, split on any non-alphanumeric run.
  */
object LuceneSyntax {

  sealed trait Occur
  case object Must extends Occur
  case object Should extends Occur
  case object MustNot extends Occur

  sealed trait Node
  /** `text` is analyzer-normalized (lowercased) but keeps `*`/`?`. */
  final case class TermQ(field: Option[String], text: String) extends Node
  final case class PhraseQ(field: Option[String], words: Seq[String]) extends Node
  final case class BoolQ(clauses: Seq[(Occur, Node)]) extends Node
  /** `term~` / `term~N` (r5): Damerau-Levenshtein distance ≤ maxEdits
    * (transposition = 1 edit, like FuzzyQuery). Like Lucene's AUTO mode,
    * a bare `~` maps the edit budget to the term length (0 for <3 chars,
    * 1 for 3-5, 2 beyond). */
  final case class FuzzyQ(field: Option[String], text: String, maxEdits: Int) extends Node
  /** `field:[a TO b]` / `{a TO b}` (r4): lexicographic token range;
    * `*` as an endpoint means open. */
  final case class RangeQ(field: Option[String], lo: Option[String],
      hi: Option[String], incLo: Boolean, incHi: Boolean) extends Node
  /** `expr^2.5` (r4): score multiplier, matching unchanged. */
  final case class BoostQ(node: Node, boost: Double) extends Node

  // ------------------------------------------------------------------ lexer

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok // NOT / ! / leading '-'
  private case object PlusOp extends Tok
  private final case class FieldTok(name: String) extends Tok // `name:`
  private final case class TermTok(text: String) extends Tok
  private final case class PhraseTok(words: Seq[String]) extends Tok
  private final case class FuzzyTok(text: String, maxEdits: Int) extends Tok
  private final case class RangeTok(lo: Option[String], hi: Option[String],
      incLo: Boolean, incHi: Boolean) extends Tok
  private final case class BoostTok(boost: Double) extends Tok // binds to previous clause

  private def fail(q: String, why: String): Nothing =
    throw new IllegalArgumentException(s"Cannot parse '$q': $why")

  /** Chars that end a bare term (QueryParser syntax chars; `+`/`-` are
    * operators only at a clause boundary, so mid-term they stay term
    * chars — `3-MEDIUM` is one term). */
  private def isTermEnd(c: Char): Boolean =
    c.isWhitespace || "()\":!&|^~[]{}".indexOf(c) >= 0

  private def lex(q: String): List[Tok] = {
    val toks = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { toks += LParen; i += 1 }
      else if (c == ')') { toks += RParen; i += 1 }
      else if (c == '!') { toks += NotOp; i += 1 }
      else if (c == '+') { toks += PlusOp; i += 1 }
      else if (c == '-') { toks += NotOp; i += 1 }
      else if (c == '&' && i + 1 < n && q.charAt(i + 1) == '&') { toks += AndOp; i += 2 }
      else if (c == '|' && i + 1 < n && q.charAt(i + 1) == '|') { toks += OrOp; i += 2 }
      else if (c == '"') {
        val end = q.indexOf('"', i + 1)
        if (end < 0) fail(q, "unterminated phrase")
        toks += PhraseTok(analyze(q.substring(i + 1, end)))
        i = end + 1
      } else if (c == '[' || c == '{') {
        // range query `[a TO b]` / `{a TO b}` (endpoints analyzed; * = open)
        // NEAREST closing char of either style ends this range — ranges of
        // both styles may coexist in one query (`a:[1 TO 3] AND b:{x TO y}`)
        // and the inclusivity char is whichever actually closes this one
        val close = if (c == '[') ']' else '}'
        val closeCands = Seq(q.indexOf(']', i + 1), q.indexOf('}', i + 1)).filter(_ >= 0)
        if (closeCands.isEmpty) fail(q, "unterminated range")
        val endIdx = closeCands.min
        val incLo = c == '['
        val incHi = q.charAt(endIdx) == ']'
        val body = q.substring(i + 1, endIdx).trim.split("\\s+TO\\s+")
        if (body.length != 2) fail(q, "range needs 'lo TO hi'")
        def endpoint(s: String): Option[String] =
          if (s == "*") None else Some(normalizeWildcard(s))
        toks += RangeTok(endpoint(body(0)), endpoint(body(1)), incLo, incHi)
        i = endIdx + 1
        val _ = close // inclusivity comes from the actual closing char
      } else if (c == '^') {
        // boost: `^2`, `^0.5` — applies to the preceding clause
        var j = i + 1
        while (j < n && (q.charAt(j).isDigit || q.charAt(j) == '.')) j += 1
        if (j == i + 1) fail(q, "boost needs a number")
        toks += BoostTok(q.substring(i + 1, j).toDouble)
        i = j
      } else if (c == '~') {
        fail(q, "fuzzy operator needs a preceding term")
      } else {
        // bare term, with \ escapes; may be a field prefix if it ends at ':'
        val sb = new StringBuilder
        while (i < n && !isTermEnd(q.charAt(i))) {
          val ch = q.charAt(i)
          if (ch == '\\') {
            if (i + 1 >= n) fail(q, "dangling escape")
            sb.append(q.charAt(i + 1)); i += 2
          } else { sb.append(ch); i += 1 }
        }
        val text = sb.toString
        if (text.isEmpty) fail(q, s"unexpected character '${q.charAt(i)}'")
        if (i < n && q.charAt(i) == ':') { toks += FieldTok(text); i += 1 }
        else if (i < n && q.charAt(i) == '~') {
          // fuzzy: `term~` (AUTO edits from length) or `term~N`
          var j = i + 1
          while (j < n && q.charAt(j).isDigit) j += 1
          val edits =
            if (j == i + 1) { // AUTO: FuzzyQuery.defaultMaxEdits by length
              val len = text.length
              if (len < 3) 0 else if (len <= 5) 1 else 2
            } else q.substring(i + 1, j).toInt
          if (edits > 2) fail(q, "fuzzy supports at most 2 edits")
          toks += FuzzyTok(normalizeWildcard(text), edits)
          i = j
        } else text match {
          case "AND" => toks += AndOp
          case "OR" => toks += OrOp
          case "NOT" => toks += NotOp
          case t => toks += TermTok(t)
        }
      }
    }
    toks.toList
  }

  // ----------------------------------------------------------------- parser

  /** StandardAnalyzer-ish: lowercase, split on non-alphanumeric runs. */
  def analyze(s: String): Seq[String] =
    s.toLowerCase.split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)

  /** Analyzer `normalize` for wildcard terms: lowercase, keep `*`/`?`. */
  private def normalizeWildcard(s: String): String = s.toLowerCase

  def parse(q: String): Node = {
    val toks = lex(q)
    if (toks.isEmpty) fail(q, "empty query")
    val (node, rest) = parseBool(q, toks)
    if (rest.nonEmpty) fail(q, s"unexpected trailing input")
    node
  }

  /** Classic QueryParser clause-list semantics: default occur SHOULD;
    * `AND` promotes both neighbours to MUST, `OR` leaves SHOULD,
    * `+`/`-`/`NOT` pin the next clause's occur explicitly. */
  private def parseBool(q: String, toks0: List[Tok]): (Node, List[Tok]) = {
    var toks = toks0
    val clauses = scala.collection.mutable.ListBuffer[(Occur, Node)]()
    var pending: Option[Occur] = None // from +/-/NOT
    var fromOp: Option[Occur] = None // from AND/OR conjunction
    var progressed = false
    while (toks.nonEmpty && toks.head != RParen) {
      toks.head match {
        case AndOp =>
          if (clauses.isEmpty) fail(q, "AND with no left operand")
          if (clauses.last._1 == Should) clauses(clauses.size - 1) = (Must, clauses.last._2)
          fromOp = Some(Must); toks = toks.tail
        case OrOp =>
          if (clauses.isEmpty) fail(q, "OR with no left operand")
          fromOp = Some(Should); toks = toks.tail
        case NotOp => pending = Some(MustNot); toks = toks.tail
        case PlusOp => pending = Some(Must); toks = toks.tail
        case BoostTok(b) =>
          if (clauses.isEmpty) fail(q, "boost with no preceding clause")
          clauses(clauses.size - 1) =
            (clauses.last._1, BoostQ(clauses.last._2, b))
          toks = toks.tail
        case _ =>
          val (node, rest) = parsePrimary(q, toks)
          clauses += ((pending.orElse(fromOp).getOrElse(Should), node))
          pending = None; fromOp = None; toks = rest; progressed = true
      }
    }
    if (pending.nonEmpty || fromOp.nonEmpty) fail(q, "dangling operator")
    if (!progressed || clauses.isEmpty) fail(q, "no clauses")
    (if (clauses.size == 1 && clauses.head._1 == Should) clauses.head._2
     else BoolQ(clauses.toList), toks)
  }

  private def parsePrimary(q: String, toks: List[Tok]): (Node, List[Tok]) = toks match {
    case LParen :: rest =>
      val (node, rest2) = parseBool(q, rest)
      rest2 match {
        case RParen :: tail => (node, tail)
        case _ => fail(q, "unbalanced parenthesis")
      }
    case FieldTok(f) :: TermTok(t) :: rest => (TermQ(Some(f), normalizeWildcard(t)), rest)
    case FieldTok(f) :: PhraseTok(ws) :: rest => (PhraseQ(Some(f), ws), rest)
    case FieldTok(f) :: FuzzyTok(t, e) :: rest => (FuzzyQ(Some(f), t, e), rest)
    case FieldTok(f) :: RangeTok(lo, hi, il, ih) :: rest => (RangeQ(Some(f), lo, hi, il, ih), rest)
    case FieldTok(_) :: _ => fail(q, "field with no term")
    case TermTok(t) :: rest => (TermQ(None, normalizeWildcard(t)), rest)
    case PhraseTok(ws) :: rest => (PhraseQ(None, ws), rest)
    case FuzzyTok(t, e) :: rest => (FuzzyQ(None, t, e), rest)
    case RangeTok(lo, hi, il, ih) :: rest => (RangeQ(None, lo, hi, il, ih), rest)
    case other => fail(q, s"unexpected token $other")
  }

  /** All field names referenced by fielded leaves. */
  def fields(node: Node): Set[String] = node match {
    case TermQ(f, _) => f.toSet
    case PhraseQ(f, _) => f.toSet
    case FuzzyQ(f, _, _) => f.toSet
    case RangeQ(f, _, _, _, _) => f.toSet
    case BoostQ(n, _) => fields(n)
    case BoolQ(cs) => cs.flatMap(c => fields(c._2)).toSet
  }

  // --------------------------------------------------------------- compiler

  final case class Compiled(matches: Column, score: Column)

  /** BM25 corpus statistics: doc count, average doc length (tokens), and
    * per-scored-leaf document frequency keyed by [[leafKey]]. */
  final case class Bm25Stats(ndocs: Column, avgdl: Column, df: Map[String, Column])

  private val K1 = 1.2
  private val B = 0.75

  private def hasWildcard(t: String): Boolean = t.exists(c => c == '*' || c == '?')

  /** Maximal literal (wildcard-free) runs of a wildcard pattern, longest
    * first — cheap `contains` prefilters that run before the verifying
    * regex (the inverted-prefilter idea: most tokens fail a substring
    * test far faster than a regex). `?` breaks a run like `*` does. */
  private[graft] def literalRuns(t: String): Seq[String] =
    t.split("[*?]+").toSeq.filter(_.length >= 2).sortBy(-_.length)

  /** Stable key for a scored (non-wildcard term / phrase) leaf. Includes
    * the field so entity-level (per-field) df stats never collide across
    * fields sharing a term. */
  def leafKey(n: Node): Option[String] = n match {
    case TermQ(f, t) if !hasWildcard(t) => Some("t " + f.getOrElse("") + " " + t)
    case PhraseQ(f, ws) => Some("p " + f.getOrElse("") + " " + ws.mkString(" "))
    case _ => None
  }

  /** Distinct scored leaves of a query, keyed — the df aggregation the
    * planner runs is one sum per entry. */
  def statLeaves(node: Node): Seq[(String, Node)] = {
    val buf = scala.collection.mutable.LinkedHashMap[String, Node]()
    def walk(n: Node): Unit = n match {
      case BoolQ(cs) => cs.foreach(c => walk(c._2))
      case BoostQ(inner, _) => walk(inner)
      case lf => leafKey(lf).foreach(k => if (!buf.contains(k)) buf(k) = lf)
    }
    walk(node)
    buf.toSeq
  }

  /** "This doc contains the leaf" — the df term of the stats aggregation,
    * over a token array column. */
  def leafContains(n: Node, toks: Column): Column = n match {
    case TermQ(_, t) => array_contains(toks, t)
    case PhraseQ(_, ws) =>
      concat(lit(" "), array_join(toks, " "), lit(" "))
        .contains(" " + ws.mkString(" ") + " ")
    case _: BoolQ => throw new IllegalArgumentException("leafContains over BoolQ")
  }

  /** Raw term frequency of a leaf within a token array. */
  private def leafTf(n: Node, toks: Column): Column = n match {
    case TermQ(_, t) => size(filter(toks, _ === lit(t))).cast("double")
    case PhraseQ(_, ws) =>
      val needle = " " + ws.mkString(" ") + " "
      regexp_count(concat(lit(" "), array_join(toks, " "), lit(" ")),
        lit(java.util.regex.Pattern.quote(needle))).cast("double")
    case _: BoolQ => throw new IllegalArgumentException("leafTf over BoolQ")
  }

  /** Lucene's one-byte doc-length norm round trip
    * (`SmallFloat.byte4ToInt(intToByte4(dl))`, BM25Similarity computes its
    * norm cache from the DECODED byte) as a closed-form column: lengths
    * 0..23 ride in the byte's free values exactly; above that `dl - 24`
    * keeps its top 4 bits (values below 8 are int4-subnormal, also exact
    * — hence the single `< 32` guard). avgdl stays exact, as in Lucene
    * (sumTotalTermFreq / docCount from the field stats, not norms). */
  def quantizeDl(dl: Column): Column = {
    val d = dl.cast("double")
    val x = d - lit(24.0)
    val p = pow(lit(2.0), floor(log2(x)) - lit(3.0))
    when(d < lit(32.0), d).otherwise(lit(24.0) + floor(x / p) * p)
  }

  /** Lucene BM25Similarity: idf * tf / (tf + k1*(1 - b + b*dl'/avgdl))
    * with dl' the byte4-quantized doc length ([[quantizeDl]] — r5 parity;
    * the remaining deviation vs Lucene is double-vs-float arithmetic,
    * sub-ULP at float precision). Public column form — the join-based
    * bound text search computes the same score with per-token df columns
    * instead of a stats map. */
  def bm25Score(tf: Column, dl: Column, df: Column,
      ndocs: Column, avgdl: Column): Column = {
    val idf = log(lit(1.0) +
      (ndocs.cast("double") - df.cast("double") + lit(0.5)) /
        (df.cast("double") + lit(0.5)))
    val ad = greatest(coalesce(avgdl.cast("double"), lit(1.0)), lit(1e-9))
    idf * tf / (tf + lit(K1) * (lit(1.0 - B) + lit(B) * quantizeDl(dl) / ad))
  }

  /** A leaf with no df stat falls back to df=0 — this only happens when
    * the caller skipped the stats pass because the score is unbound, so
    * the expression is never evaluated. */
  private def bm25(key: String, tf: Column, dl: Column, stats: Bm25Stats): Column =
    bm25Score(tf, dl, stats.df.getOrElse(key, lit(0L)), stats.ndocs, stats.avgdl)

  private[graft] def wildcardRegex(t: String): String = {
    val sb = new StringBuilder("^")
    t.foreach {
      case '*' => sb.append(".*")
      case '?' => sb.append('.')
      case c if "\\.[]{}()^$|+".indexOf(c) >= 0 => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append('$').toString
  }

  /** Analyzed token array of a string value column. */
  def tokens(value: Column): Column =
    filter(split(lower(value), "[^\\p{L}\\p{N}]+"), t => t =!= "")

  /** Conservative raw-value prefilter: `matches(value)` implies
    * `prefilter(value)`. Every analyzed token is a substring of the
    * lowercased value, so a term/phrase-word/wildcard-literal-run match
    * implies a cheap `contains` hit — applied as a filter BEFORE the
    * tokenizing scan, it short-circuits the split+array work for the
    * vast majority of non-matching rows (the inverted-prefilter shape;
    * MUST_NOT clauses contribute nothing, staying conservative). */
  def prefilter(node: Node, value: Column, defaultField: String): Column = {
    // lower()+contains measured faster than (?i)-literal rlike here
    // (UTF8String.toLowerCase is cheap; Java regex case-folding is not)
    val lv = lower(value)
    def p(n: Node): Column = n match {
      case TermQ(Some(f), _) if f != defaultField => lit(false)
      case PhraseQ(Some(f), _) if f != defaultField => lit(false)
      case TermQ(_, t) if hasWildcard(t) =>
        literalRuns(t).map(lv.contains(_)).reduceOption(_ && _).getOrElse(lit(true))
      case TermQ(_, t) => lv.contains(t)
      case PhraseQ(_, ws) =>
        ws.map(lv.contains(_)).reduceOption(_ && _).getOrElse(lit(true))
      case BoostQ(inner, _) => p(inner)
      case _: FuzzyQ | _: RangeQ => lit(true) // no cheap containment test
      case BoolQ(cs) =>
        val musts = cs.collect { case (Must, n2) => p(n2) }
        val shoulds = cs.collect { case (Should, n2) => p(n2) }
        if (musts.nonEmpty) musts.reduce(_ && _)
        else shoulds.reduceOption(_ || _).getOrElse(lit(true))
    }
    p(node)
  }

  /** Leaf match + score over a pre-computed token array column.
    * Score: term/phrase = BM25 against the supplied corpus stats;
    * wildcard = constant 1.0 (Lucene MultiTermQuery constant-score
    * rewrite). */
  private def leaf(node: Node, toks: Column, stats: Bm25Stats): Compiled = node match {
    case TermQ(_, t) if hasWildcard(t) =>
      val re = wildcardRegex(t)
      val runs = literalRuns(t)
      // substring prefilter short-circuits the regex for most tokens
      // (codegen And evaluates the right side only when the left is true)
      val m = exists(toks, tok =>
        runs.foldRight(tok.rlike(re))((r, acc) => tok.contains(r) && acc))
      Compiled(m, lit(1.0))
    case FuzzyQ(_, t, maxEdits) =>
      // constant score, like every MultiTermQuery under constant-score
      // rewrite; Damerau-Levenshtein (transposition = 1 edit) matching
      // Lucene FuzzyQuery — native expression, see FuzzyTokenMatch
      if (maxEdits == 0) Compiled(array_contains(toks, t), lit(1.0))
      else {
        graft.functions.GraftFunctions.register(
          org.apache.spark.sql.SparkSession.active) // idempotent
        Compiled(call_function("fuzzy_token_match", toks, lit(t), lit(maxEdits)),
          lit(1.0))
      }
    case RangeQ(_, lo, hi, incLo, incHi) =>
      val inRange = (tok: Column) => {
        val loOk = lo.map(l => if (incLo) tok >= lit(l) else tok > lit(l))
          .getOrElse(lit(true))
        val hiOk = hi.map(h => if (incHi) tok <= lit(h) else tok < lit(h))
          .getOrElse(lit(true))
        loOk && hiOk
      }
      Compiled(exists(toks, inRange), lit(1.0))
    case BoostQ(inner, b) =>
      val c = leaf(inner, toks, stats)
      Compiled(c.matches, c.score * lit(b))
    case lf @ (TermQ(_, _) | PhraseQ(_, _)) =>
      val key = leafKey(lf).get
      Compiled(leafContains(lf, toks),
        bm25(key, leafTf(lf, toks), size(toks), stats))
    case b: BoolQ => compileBool(b, n => leaf(n, toks, stats))
  }

  /** BooleanQuery match: all MUSTs, no MUST_NOTs, and (a MUST exists or
    * some SHOULD matches). Score: sum of matching positive leaves. */
  private def compileBool(b: BoolQ, leafC: Node => Compiled): Compiled = {
    val compiled = b.clauses.map { case (o, n) => (o, leafC(n)) }
    val musts = compiled.collect { case (Must, c) => c }
    val shoulds = compiled.collect { case (Should, c) => c }
    val nots = compiled.collect { case (MustNot, c) => c }
    val mustOk = musts.map(_.matches).reduceOption(_ && _).getOrElse(lit(true))
    val notOk = nots.map(!_.matches).reduceOption(_ && _).getOrElse(lit(true))
    val shouldOk =
      if (musts.nonEmpty) lit(true)
      else shoulds.map(_.matches).reduceOption(_ || _).getOrElse(lit(false))
    val positives = musts ++ shoulds
    val score = positives
      .map(c => when(c.matches, c.score).otherwise(lit(0.0)))
      .reduceOption(_ + _).getOrElse(lit(0.0))
    Compiled(mustOk && notOk && shouldOk, score)
  }

  /** Single-value compile (core-module `text-search`): the query's default
    * field is the given attribute; a fielded leaf naming any OTHER field
    * can never match this attribute's (a, v) docs. `toks` is the
    * pre-analyzed token array of the value (the planner reuses it in the
    * stats aggregation); `stats` carries the corpus BM25 statistics. */
  def compileValue(node: Node, toks: Column, defaultField: String,
      stats: Bm25Stats): Compiled = {
    def wrongField(n: Node): Boolean = n match {
      case TermQ(Some(f), _) => f != defaultField
      case PhraseQ(Some(f), _) => f != defaultField
      case FuzzyQ(Some(f), _, _) => f != defaultField
      case RangeQ(Some(f), _, _, _, _) => f != defaultField
      case _ => false
    }
    def c(n: Node): Compiled = n match {
      case lf if wrongField(lf) => Compiled(lit(false), lit(0.0))
      case BoostQ(inner, _) if wrongField(inner) => Compiled(lit(false), lit(0.0))
      case b: BoolQ => compileBool(b, c)
      case other => leaf(other, toks, stats)
    }
    c(node)
  }

  /** Entity-level compile (multi-field `lucene-text-search`): each field's
    * values are a collected array column; an unfielded leaf parses against
    * the empty default field and matches nothing
    * (multi_field_test.clj "firstname Fred" => no results). BM25 per
    * field: tf sums over the entity's values, dl is the entity's total
    * token count for the field (Lucene concatenates multi-valued fields;
    * phrases still match within one value — no cross-value positions). */
  def compileEntity(node: Node, fieldVals: Map[String, Column],
      stats: Map[String, Bm25Stats]): Compiled = {
    def c(n: Node): Compiled = n match {
      case b: BoolQ => compileBool(b, c)
      case BoostQ(inner, bst) =>
        val inC = c(inner)
        Compiled(inC.matches, inC.score * lit(bst))
      case TermQ(None, _) | PhraseQ(None, _) | FuzzyQ(None, _, _) |
          RangeQ(None, _, _, _, _) => Compiled(lit(false), lit(0.0))
      case lf =>
        val f = (lf match {
          case TermQ(Some(ff), _) => ff
          case PhraseQ(Some(ff), _) => ff
          case FuzzyQ(Some(ff), _, _) => ff
          case RangeQ(Some(ff), _, _, _, _) => ff
          case _ => throw new IllegalStateException
        })
        fieldVals.get(f) match {
          case None => Compiled(lit(false), lit(0.0))
          case Some(vals) =>
            val constScore = lf match {
              case TermQ(_, t) => hasWildcard(t)
              case _: FuzzyQ | _: RangeQ => true
              case _ => false
            }
            if (constScore) {
              val st = stats.getOrElse(f, Bm25Stats(lit(0L), lit(1.0), Map.empty))
              val m = exists(vals, v => leaf(lf, tokens(v), st).matches)
              Compiled(coalesce(m, lit(false)), lit(1.0))
            } else {
              val key = leafKey(lf).get
              val m = exists(vals, v => leafContains(lf, tokens(v)))
              val tf = aggregate(vals, lit(0.0),
                (acc, v) => acc + leafTf(lf, tokens(v)))
              val dl = aggregate(vals, lit(0L),
                (acc, v) => acc + size(tokens(v)).cast("long"))
              Compiled(coalesce(m, lit(false)),
                coalesce(bm25(key, tf, dl, stats(f)), lit(0.0)))
            }
        }
    }
    c(node)
  }

  /** Per-entity total token count of a multi-valued field — the dl used
    * by the entity-level stats aggregation (must mirror compileEntity). */
  def entityFieldDl(vals: Column): Column =
    aggregate(vals, lit(0L), (acc, v) => acc + size(tokens(v)).cast("long"))

  /** Per-entity "any value contains leaf" — the df term of the
    * entity-level stats aggregation. */
  def entityLeafContains(n: Node, vals: Column): Column =
    coalesce(exists(vals, v => leafContains(n, tokens(v))), lit(false))
}
