package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.datalog.{FactSource, Planner, Tagged}

/** SPARQL front-end — the reference's SPARQL → Datalog compiler
  * (labs/crux-rdf/src/crux/sparql.clj: "Only handles a subset of
  * SPARQL"), re-expressed without RDF4J's parser: a hand-rolled parser
  * for the same subset the reference's own test suite exercises
  * (crux-test/test/crux/sparql_test.clj — the Apache Jena ARQ tutorial
  * queries):
  *
  *   - PREFIX declarations, `SELECT ?vars` / `SELECT *`, basic graph
  *     patterns over `<iri>` / `prefix:name` predicates
  *   - FILTER comparisons (`< <= > >= = !=`), `FILTER regex(?v, "re",
  *     "flags")` (sparql.clj maps regex to `re-find` with inline flags)
  *   - OPTIONAL groups with local FILTERs (sparql.clj:119-145 compiles
  *     LeftJoin to an or-join that binds `:crux.sparql/optional` when the
  *     right side has no match — same marker here)
  *   - LIMIT / OFFSET / ORDER BY
  *
  * Predicate IRIs shorten to their local name, matching
  * [[graft.sources.Rdf.loadNTriples]]'s attribute mapping.
  *
  * Spark shape: the required pattern plans through the Datalog planner;
  * each OPTIONAL group plans independently and LEFT-joins on the shared
  * vars (the relational form of LeftJoin — no correlated re-execution).
  * An optional var whose type family differs from the marker keyword is
  * lifted to the tagged mixed-family representation ([[Tagged]]), so
  * `[23, :crux.sparql/optional]` heterogeneity survives typed columns.
  */
object Sparql {

  // -------------------------------------------------------------- parsing

  /** `plus` marks an arbitrary-length path `<p>+` — compiled to the same
    * recursive rule pair the reference generates
    * (sparql.clj:282-307 `collect-arbritrary-path-rules`; `<p>*`'s
    * zero-length marker semantics are not ported). */
  private final case class Pattern(s: String, p: String, o: String, plus: Boolean = false)
  /** one FILTER: its datalog clause text, the ?vars it reads, and a
    * DataFrame-level Column builder for the post-join path (a top-level
    * filter over an OPTIONAL-bound var applies AFTER the left join —
    * null operands make the comparison null, dropping the row, which is
    * SPARQL's unbound-is-error-is-removed semantics). */
  private final case class Filt(clause: String, vars: Seq[String],
      post: () => Column)
  private final case class Opt(patterns: Seq[Pattern], filters: Seq[Filt])
  private final case class Parsed(
      selectVars: Seq[String],
      patterns: Seq[Pattern], filters: Seq[Filt], optionals: Seq[Opt],
      orderBy: Seq[(String, Boolean)], limit: Option[Long], offset: Option[Long])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"Cannot parse SPARQL: $msg")

  /** Tokenize preserving <iri>, "literal", ?var, prefixed names, braces,
    * dots and parens. */
  private def tokenize(q: String): List[String] = {
    val toks = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '#' && (i == 0 || q.charAt(i - 1) != '<')) { // comment to EOL
        while (i < n && q.charAt(i) != '\n') i += 1
      } else if (c == '<') {
        val e = q.indexOf('>', i)
        if (e < 0) fail("unterminated IRI")
        var tok = q.substring(i, e + 1)
        i = e + 1
        // property-path modifier sticks to the IRI token
        if (i < n && (q.charAt(i) == '+' || q.charAt(i) == '*')) { tok += q.charAt(i); i += 1 }
        toks += tok
      } else if (c == '"') {
        val sb = new StringBuilder("\"")
        i += 1
        while (i < n && q.charAt(i) != '"') {
          if (q.charAt(i) == '\\' && i + 1 < n) { sb.append(q.charAt(i)).append(q.charAt(i + 1)); i += 2 }
          else { sb.append(q.charAt(i)); i += 1 }
        }
        if (i >= n) fail("unterminated string literal")
        sb.append('"'); i += 1
        // optional ^^<datatype> sticks to the literal token; a @lang tag
        // is consumed and DROPPED — the N-Triples loader stores the bare
        // lexical value (Rdf.ObjLit), so matching ignores language tags
        if (i + 1 < n && q.charAt(i) == '^' && q.charAt(i + 1) == '^') {
          val e = q.indexOf('>', i)
          if (e < 0) fail("unterminated datatype IRI")
          sb.append(q.substring(i, e + 1)); i = e + 1
        } else if (i < n && q.charAt(i) == '@') {
          i += 1
          while (i < n && (q.charAt(i).isLetterOrDigit || q.charAt(i) == '-')) i += 1
        }
        toks += sb.toString
      } else if ("{}().,;".indexOf(c) >= 0) { toks += c.toString; i += 1 }
      else {
        // a '.' ends the token (the standard `?o.` triple terminator —
        // gluing it on would mint a DIFFERENT variable and silently
        // cross-join) unless the next char is a digit (decimal literal)
        val start = i
        def dotStops = q.charAt(i) == '.' &&
          !(i + 1 < n && q.charAt(i + 1).isDigit)
        while (i < n && !q.charAt(i).isWhitespace &&
          "{}()<\",;".indexOf(q.charAt(i)) < 0 && !(q.charAt(i) == '.' && dotStops)) i += 1
        toks += q.substring(start, i)
      }
    }
    toks.toList
  }

  private def parse(q: String): Parsed = {
    var toks = tokenize(q)
    var prefixes = Map.empty[String, String]
    while (toks.nonEmpty && toks.head.equalsIgnoreCase("PREFIX")) {
      toks match {
        case _ :: name :: iri :: rest if name.endsWith(":") && iri.startsWith("<") =>
          prefixes += (name.dropRight(1) -> iri.stripPrefix("<").stripSuffix(">"))
          toks = rest
        case _ => fail("bad PREFIX declaration")
      }
    }
    if (toks.isEmpty || !toks.head.equalsIgnoreCase("SELECT")) fail("expected SELECT")
    toks = toks.tail
    // DISTINCT is accepted and has no separate effect: datalog set
    // semantics dedup every result (sparql.clj: Distinct is the default)
    if (toks.nonEmpty && toks.head.equalsIgnoreCase("DISTINCT")) toks = toks.tail
    val selectVars = scala.collection.mutable.ListBuffer[String]()
    var star = false
    while (toks.nonEmpty && (toks.head.startsWith("?") || toks.head == "*")) {
      if (toks.head == "*") star = true else selectVars += toks.head
      toks = toks.tail
    }
    if (toks.nonEmpty && toks.head.equalsIgnoreCase("WHERE")) toks = toks.tail
    if (toks.isEmpty || toks.head != "{") fail("expected { after SELECT/WHERE")
    toks = toks.tail

    /** local name of an IRI or prefixed name (Rdf.loadNTriples mapping) */
    def localName(t: String): String = {
      val iri =
        if (t.startsWith("<")) t.stripPrefix("<").stripSuffix(">")
        else {
          val i = t.indexOf(':')
          if (i < 0) fail(s"expected IRI or prefixed name, got $t")
          val pfx = t.take(i)
          prefixes.getOrElse(pfx, fail(s"undeclared prefix $pfx")) + t.drop(i + 1)
        }
      val trimmed = iri.reverse.dropWhile(_ == '/').reverse
      val cut = math.max(trimmed.lastIndexOf('/'), trimmed.lastIndexOf('#'))
      trimmed.drop(cut + 1)
    }

    def stripTypedLit(t: String): String = {
      val i = t.indexOf("\"^^")
      if (i >= 0) {
        val lex = t.substring(1, i)
        val dt = t.substring(i + 3) // the <datatype IRI> alone — deciding
        // on the WHOLE token would misfire on lexical values ("clint")
        if (dt.contains("integer") || dt.contains("long") || dt.contains("int")) lex
        else if (dt.contains("double") || dt.contains("decimal") || dt.contains("float")) lex
        else "\"" + lex + "\""
      } else t
    }

    def term(t: String): String =
      if (t.startsWith("?")) t
      else if (t.startsWith("\"")) stripTypedLit(t) // "25"^^<...#integer> -> 25
      else if (t.startsWith("_:")) "\"" + t + "\""
      else if (t.matches("[+-]?[0-9.]+")) t
      else "\"" + localName(t) + "\"" // IRI object → local-name string value

    val patterns = scala.collection.mutable.ListBuffer[Pattern]()
    val filters = scala.collection.mutable.ListBuffer[Filt]()
    val optionals = scala.collection.mutable.ListBuffer[Opt]()

    /** operand for the post-join Column path: ?var → column, else the
      * stripped literal (bare number / quoted string). */
    def operandCol(t: String): Column =
      if (t.startsWith("?")) col(t.stripPrefix("?"))
      else {
        val st = stripTypedLit(t)
        if (st.startsWith("\"")) lit(st.stripPrefix("\"").stripSuffix("\""))
        else if (st.contains(".") || st.contains("e") || st.contains("E")) lit(st.toDouble)
        else lit(st.toLong)
      }

    /** FILTER body → [[Filt]]; consumes tokens. */
    def parseFilter(ts0: List[String]): (Filt, List[String]) = ts0 match {
      case f :: "(" :: v :: "," :: rest if f.equalsIgnoreCase("regex") =>
        // regex(?v, "re"[, "flags"])
        rest match {
          case re :: "," :: flags :: ")" :: tail =>
            var fl = flags.stripPrefix("\"").stripSuffix("\"")
            var body = re.stripPrefix("\"").stripSuffix("\"")
            // SPARQL 'q' = literal matching (no Java inline equivalent):
            // quote the pattern instead; an empty flag set must not emit
            // the invalid inline group "(?)"
            if (fl.contains("q")) {
              body = java.util.regex.Pattern.quote(body); fl = fl.replace("q", "")
            }
            val prefix = if (fl.isEmpty) "" else s"(?$fl)"
            (Filt(s"""[(re-find "$prefix$body" $v)]""", Seq(v),
              () => col(v.stripPrefix("?")).rlike(prefix + body)), tail)
          case re :: ")" :: tail =>
            val body = re.stripPrefix("\"").stripSuffix("\"")
            (Filt(s"""[(re-find ${re} $v)]""", Seq(v),
              () => col(v.stripPrefix("?")).rlike(body)), tail)
          case _ => fail("bad regex filter")
        }
      case "(" :: l :: op :: r :: ")" :: tail if Set("<", "<=", ">", ">=", "=", "!=")(op) =>
        val lt = if (l.startsWith("?")) l else stripTypedLit(l)
        val rt = if (r.startsWith("?")) r else stripTypedLit(r)
        val vars = Seq(l, r).filter(_.startsWith("?"))
        def postCol(): Column = {
          val (lc, rc) = (operandCol(l), operandCol(r))
          op match {
            case "<" => lc < rc; case "<=" => lc <= rc
            case ">" => lc > rc; case ">=" => lc >= rc
            case "=" => lc === rc; case "!=" => lc =!= rc
          }
        }
        (Filt(s"[($op $lt $rt)]", vars, postCol _), tail)
      case other => fail(s"unsupported FILTER: ${other.take(6).mkString(" ")}")
    }

    def parseGroupBody(into: (Pattern => Unit, Filt => Unit), allowOptional: Boolean): Unit = {
      val (addP, addF) = into
      var done = false
      while (!done) toks match {
        case "}" :: rest => toks = rest; done = true
        case "." :: rest => toks = rest
        case f :: rest if f.equalsIgnoreCase("FILTER") =>
          val (clause, tail) = parseFilter(rest)
          addF(clause); toks = tail
        case o :: "{" :: rest if o.equalsIgnoreCase("OPTIONAL") =>
          if (!allowOptional) fail("nested OPTIONAL unsupported")
          toks = rest
          val ps = scala.collection.mutable.ListBuffer[Pattern]()
          val fs = scala.collection.mutable.ListBuffer[Filt]()
          parseGroupBody((ps += _, fs += _), allowOptional = false)
          optionals += Opt(ps.toList, fs.toList)
        case s :: p :: o :: rest =>
          val subj = if (s.startsWith("?")) s else term(s)
          if (p.endsWith("*")) fail("zero-length property paths (<p>*) unsupported")
          val plus = p.endsWith("+")
          addP(Pattern(subj, localName(if (plus) p.dropRight(1) else p), term(o), plus))
          toks = rest
        case other => fail(s"unexpected tokens: ${other.take(4).mkString(" ")}")
      }
    }
    parseGroupBody((patterns += _, filters += _), allowOptional = true)

    var orderBy = Seq.empty[(String, Boolean)]
    var limit: Option[Long] = None
    var offset: Option[Long] = None
    while (toks.nonEmpty) toks match {
      case ob :: by :: rest if ob.equalsIgnoreCase("ORDER") && by.equalsIgnoreCase("BY") =>
        toks = rest
        val obs = scala.collection.mutable.ListBuffer[(String, Boolean)]()
        var going = true
        while (going) toks match {
          case d :: "(" :: v :: ")" :: rest2 if d.equalsIgnoreCase("DESC") =>
            obs += ((v, false)); toks = rest2
          case d :: "(" :: v :: ")" :: rest2 if d.equalsIgnoreCase("ASC") =>
            obs += ((v, true)); toks = rest2
          case v :: rest2 if v.startsWith("?") => obs += ((v, true)); toks = rest2
          case _ => going = false
        }
        orderBy = obs.toList
      case l :: nv :: rest if l.equalsIgnoreCase("LIMIT") => limit = Some(nv.toLong); toks = rest
      case o :: nv :: rest if o.equalsIgnoreCase("OFFSET") => offset = Some(nv.toLong); toks = rest
      case other => fail(s"unexpected trailing tokens: ${other.take(4).mkString(" ")}")
    }

    val allVars = (patterns.flatMap(p => Seq(p.s, p.o)) ++
      optionals.flatMap(_.patterns.flatMap(p => Seq(p.s, p.o))))
      .filter(_.startsWith("?")).distinct
    Parsed(if (star) allVars.toList else selectVars.toList,
      patterns.toList, filters.toList, optionals.toList, orderBy, limit, offset)
  }

  // ------------------------------------------------------------- planning

  private def varName(v: String) = v.stripPrefix("?")

  private def datalogFor(patterns: Seq[Pattern], filters: Seq[Filt],
      find: Seq[String]): String = {
    val clauses = patterns.map { p =>
      if (p.plus) s"(${p.p}-PLUS ${p.s} ${p.o})" else s"[${p.s} :${p.p} ${p.o}]"
    } ++ filters.map(_.clause)
    // the reference's PLUS rule pair, verbatim (sparql.clj:293-298)
    val rules = patterns.filter(_.plus).map(_.p).distinct.flatMap(a => Seq(
      s"[(${a}-PLUS ?s ?o) [?s :$a ?o]]",
      s"[(${a}-PLUS ?s ?o) [?s :$a ?t] (${a}-PLUS ?t ?o)]"))
    val rulesPart = if (rules.isEmpty) "" else s"\n :rules [${rules.mkString("\n          ")}]"
    s"{:find [${find.mkString(" ")}]\n :keys [${find.map(varName).mkString(" ")}]$rulesPart\n :where [${clauses.mkString("\n          ")}]}"
  }

  /** Marker value the reference binds for unmatched OPTIONALs
    * (sparql.clj:137 `::optional` → `:crux.sparql/optional`). */
  val OptionalMarker = ":crux.sparql/optional"

  def query(spark: SparkSession, source: FactSource, sparql: String): DataFrame = {
    val p = parse(sparql)
    require(p.patterns.nonEmpty, "SPARQL query needs at least one required pattern")
    val baseVars = p.patterns.flatMap(pt => Seq(pt.s, pt.o)).filter(_.startsWith("?")).distinct
    // filters whose vars the required pattern binds push into its datalog;
    // one reading an OPTIONAL-bound var applies AFTER the left joins
    // (null operands null the comparison and drop the row — SPARQL's
    // unbound-in-FILTER semantics)
    val (baseFilters, postFilters) =
      p.filters.partition(_.vars.forall(baseVars.contains))
    var df = Planner.q(spark, source, datalogFor(p.patterns, baseFilters, baseVars))
    // BOUND accumulates across groups: a var first bound by an earlier
    // OPTIONAL is a JOIN key for the next one, not a fresh column
    var bound = baseVars
    val freshTyped = scala.collection.mutable.ListBuffer[(String, org.apache.spark.sql.types.DataType)]()
    for (opt <- p.optionals) {
      val optVars = opt.patterns.flatMap(pt => Seq(pt.s, pt.o)).filter(_.startsWith("?")).distinct
      val shared = optVars.filter(bound.contains)
      require(shared.nonEmpty, "OPTIONAL group shares no vars with the required pattern")
      val fresh = optVars.filterNot(bound.contains)
      val optDf = Planner.q(spark, source, datalogFor(opt.patterns, opt.filters, optVars))
      df = df.join(optDf, shared.map(varName), "left")
      fresh.foreach(v => freshTyped += ((v, optDf.schema(varName(v)).dataType)))
      bound = bound ++ fresh
    }
    postFilters.foreach { f =>
      f.vars.foreach(v => require(bound.contains(v),
        s"FILTER reads $v, which no pattern binds"))
      df = df.filter(f.post())
    }
    // unmatched rows bind the reference's marker keyword AFTER the post
    // filters (a marker must read as unbound to a filter, not compare);
    // non-string optional vars become tagged mixed-family values to
    // carry it — a column that is ALREADY tagged passes through
    for ((v, dt) <- freshTyped) {
      val n = varName(v)
      df =
        if (dt == StringType)
          df.withColumn(n, coalesce(col(n), lit(OptionalMarker)))
        else if (Tagged.isTagged(dt))
          df.withColumn(n,
            coalesce(col(n), Tagged.lift(lit(OptionalMarker), StringType)))
        else df.withColumn(n,
          when(col(n).isNotNull, Tagged.lift(col(n), dt))
            .otherwise(Tagged.lift(lit(OptionalMarker), StringType)))
    }
    // ORDER BY may read vars outside the projection (legal SPARQL): keep
    // them through the dedup (set semantics then includes the order keys
    // — the price of ordering a deduped projection by a dropped var),
    // sort, and project last
    val orderVars = p.orderBy.map(_._1).filterNot(p.selectVars.contains)
    val out = df.select((p.selectVars ++ orderVars).map(v => col(varName(v))): _*)
    val deduped = out.distinct() // Datalog set semantics (sparql.clj: Distinct is the default)
    val ordered =
      if (p.orderBy.isEmpty) deduped
      else deduped.orderBy(p.orderBy.map { case (v, asc) =>
        if (asc) col(varName(v)).asc else col(varName(v)).desc }: _*)
    val projected =
      if (orderVars.isEmpty) ordered
      else ordered.select(p.selectVars.map(v => col(varName(v))): _*)
    val offset = p.offset.fold(projected)(o => projected.offset(o.toInt))
    p.limit.fold(offset)(l => offset.limit(l.toInt))
  }
}
