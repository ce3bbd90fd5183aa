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
  private final case class Opt(patterns: Seq[Pattern], filters: Seq[String])
  private final case class Parsed(
      selectVars: Seq[String], distinct: Boolean,
      patterns: Seq[Pattern], filters: Seq[String], optionals: Seq[Opt],
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
        // optional ^^<datatype> / @lang sticks to the literal token
        if (i + 1 < n && q.charAt(i) == '^' && q.charAt(i + 1) == '^') {
          val e = q.indexOf('>', i)
          if (e < 0) fail("unterminated datatype IRI")
          sb.append(q.substring(i, e + 1)); i = e + 1
        }
        toks += sb.toString
      } else if ("{}().,;".indexOf(c) >= 0) { toks += c.toString; i += 1 }
      else {
        val start = i
        while (i < n && !q.charAt(i).isWhitespace && "{}()<\",;".indexOf(q.charAt(i)) < 0) i += 1
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
    var distinct = false
    if (toks.nonEmpty && toks.head.equalsIgnoreCase("DISTINCT")) { distinct = true; toks = toks.tail }
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

    def term(t: String): String =
      if (t.startsWith("?") || t.startsWith("\"")) t
      else if (t.startsWith("_:")) "\"" + t + "\""
      else if (t.matches("[+-]?[0-9.]+")) t
      else "\"" + localName(t) + "\"" // IRI object → local-name string value

    val patterns = scala.collection.mutable.ListBuffer[Pattern]()
    val filters = scala.collection.mutable.ListBuffer[String]()
    val optionals = scala.collection.mutable.ListBuffer[Opt]()

    /** FILTER body → datalog pred clause text; consumes tokens. */
    def parseFilter(ts0: List[String]): (String, List[String]) = ts0 match {
      case f :: "(" :: v :: "," :: rest if f.equalsIgnoreCase("regex") =>
        // regex(?v, "re"[, "flags"])
        rest match {
          case re :: "," :: flags :: ")" :: tail =>
            val fl = flags.stripPrefix("\"").stripSuffix("\"")
            (s"""[(re-find "(?$fl)${re.stripPrefix("\"").stripSuffix("\"")}" $v)]""", tail)
          case re :: ")" :: tail =>
            (s"""[(re-find ${re} $v)]""", tail)
          case _ => fail("bad regex filter")
        }
      case "(" :: l :: op :: r :: ")" :: tail if Set("<", "<=", ">", ">=", "=", "!=")(op) =>
        val lt = if (l.startsWith("?")) l else stripTypedLit(l)
        val rt = if (r.startsWith("?")) r else stripTypedLit(r)
        (s"[($op $lt $rt)]", tail)
      case other => fail(s"unsupported FILTER: ${other.take(6).mkString(" ")}")
    }

    def stripTypedLit(t: String): String = {
      val i = t.indexOf("\"^^")
      if (i >= 0) {
        val lex = t.substring(1, i)
        if (t.contains("integer") || t.contains("long") || t.contains("int")) lex
        else if (t.contains("double") || t.contains("decimal") || t.contains("float")) lex
        else "\"" + lex + "\""
      } else t
    }

    def parseGroupBody(into: (Pattern => Unit, String => Unit), allowOptional: Boolean): Unit = {
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
          val fs = scala.collection.mutable.ListBuffer[String]()
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
    Parsed(if (star) allVars.toList else selectVars.toList, distinct,
      patterns.toList, filters.toList, optionals.toList, orderBy, limit, offset)
  }

  // ------------------------------------------------------------- planning

  private def varName(v: String) = v.stripPrefix("?")

  private def datalogFor(patterns: Seq[Pattern], filters: Seq[String],
      find: Seq[String]): String = {
    val clauses = patterns.map { p =>
      if (p.plus) s"(${p.p}-PLUS ${p.s} ${p.o})" else s"[${p.s} :${p.p} ${p.o}]"
    } ++ filters
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
    var df = Planner.q(spark, source, datalogFor(p.patterns, p.filters, baseVars))
    for (opt <- p.optionals) {
      val optVars = opt.patterns.flatMap(pt => Seq(pt.s, pt.o)).filter(_.startsWith("?")).distinct
      val shared = optVars.filter(baseVars.contains)
      require(shared.nonEmpty, "OPTIONAL group shares no vars with the required pattern")
      val fresh = optVars.filterNot(baseVars.contains)
      val optDf = Planner.q(spark, source, datalogFor(opt.patterns, opt.filters, optVars))
      df = df.join(optDf, shared.map(varName), "left")
      // unmatched rows bind the reference's marker keyword; non-string
      // optional vars become tagged mixed-family values to carry it
      for (v <- fresh) {
        val n = varName(v)
        val dt = optDf.schema(n).dataType
        df =
          if (dt == StringType)
            df.withColumn(n, coalesce(col(n), lit(OptionalMarker)))
          else df.withColumn(n,
            when(col(n).isNotNull, Tagged.lift(col(n), dt))
              .otherwise(Tagged.lift(lit(OptionalMarker), StringType)))
      }
    }
    val out = df.select(p.selectVars.map(v => col(varName(v))): _*)
    val deduped = out.distinct() // Datalog set semantics (sparql.clj: Distinct is the default)
    val ordered =
      if (p.orderBy.isEmpty) deduped
      else deduped.orderBy(p.orderBy.map { case (v, asc) =>
        if (asc) col(varName(v)).asc else col(varName(v)).desc }: _*)
    val offset = p.offset.fold(ordered)(o => ordered.offset(o.toInt))
    p.limit.fold(offset)(l => offset.limit(l.toInt))
  }
}
