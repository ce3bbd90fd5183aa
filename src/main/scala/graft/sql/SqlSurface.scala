package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.Bitemp
import graft.sources.Tables

/** The SQL query surface (SURVEY §2.8, §3.2). The reference routes SQL
  * through Calcite converter rules into Datalog
  * (crux-sql/src/crux/CruxRules.java:25-38); here `spark.sql` IS the
  * engine — the only reference-specific behavior to re-express is:
  *
  *  - catalog registration of the typed tables (the schema-doc concept,
  *    crux-sql/src/crux/calcite.clj:456-465);
  *  - the temporal prefix `VALIDTIME ('…') [TRANSACTIONTIME ('…')]`
  *    stripped from the SQL text and applied as the snapshot basis
  *    (calcite.clj:51-72 `prepare-sql`): the bitemporal `events_current`
  *    view is resolved as-of that basis before the query runs.
  */
object SqlSurface {

  // one temporal-prefix token: keyword + ('literal') or (number), rest
  private val PrefixToken =
    """(?is)^\s*(VALIDTIME|TRANSACTIONTIME|TRANSACTIONID)\s*\(\s*(?:'([^']*)'|(\d+))\s*\)\s*(.*)$""".r

  /** Prefix timestamp literal, reference-tolerant (prepare-sql reads
    * RFC3339): `2016-12-01`, `2016-12-01 10:13:30`, `2016-12-01T10:13:30`
    * and a trailing `Z` all parse; anything else fails with the offending
    * keyword named. Basis values are UTC instants like the NTZ columns
    * they compare against. */
  private def parseTs(kw: String, s: String): java.time.LocalDateTime = {
    if (s == null || s.isEmpty) throw new IllegalArgumentException(
      s"$kw needs a quoted timestamp literal")
    val t0 = s.trim.stripSuffix("Z")
    val t = if (t0.contains("T") || t0.contains(" ")) t0.replace(" ", "T")
      else t0 + "T00:00:00"
    try java.time.LocalDateTime.parse(t)
    catch { case e: java.time.format.DateTimeParseException =>
      throw new IllegalArgumentException(s"$kw: cannot parse timestamp '$s'", e) }
  }

  private def utcNow(): java.time.LocalDateTime =
    java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)

  /** Register all parquet tables plus the bitemporal `events_current` view
    * resolved at (vt, tt | tx-id), then run the SQL. Like the reference's
    * prepare-sql (calcite.clj:51-72), the prefix keywords `VALIDTIME ('…')`
    * / `TRANSACTIONTIME ('…')` / `TRANSACTIONID (n)` are parsed in a loop:
    * any order, any subset (TRANSACTIONTIME and TRANSACTIONID compose by
    * intersecting — both restrict the visible versions). The no-prefix
    * default basis is the current UTC time on both axes (the NTZ columns
    * hold UTC instants; future-valid-dated facts are not visible by
    * default, matching the reference).
    *
    * The snapshot registers under a PER-QUERY view name and the SQL text's
    * `events_current` references rewrite to it — concurrent queries on one
    * session (the HTTP pool) must not see each other's basis through a
    * shared view name. Analysis is eager, so the view drops after
    * `spark.sql` returns. */
  /** @param args positional `?` parameters — the JDBC prepared-statement
    *   surface (crux-sql/test/crux/calcite_test.clj:422-427); Spark's
    *   parameterized-SQL binding does the substitution. */
  def query(spark: SparkSession, dir: String, sql: String,
      args: Array[Any] = Array.empty): DataFrame = {
    Tables.registerAll(spark, dir)
    var rest = sql
    var vt: Option[java.time.LocalDateTime] = None
    var tt: Option[java.time.LocalDateTime] = None
    var txId: Option[Long] = None
    var more = true
    while (more) rest match {
      case PrefixToken(kw, str, num, tail) =>
        kw.toUpperCase(java.util.Locale.ROOT) match {
          case "VALIDTIME" => vt = Some(parseTs("VALIDTIME", str))
          case "TRANSACTIONTIME" => tt = Some(parseTs("TRANSACTIONTIME", str))
          case "TRANSACTIONID" =>
            val operand = Option(num).orElse(Option(str).filter(_.nonEmpty))
              .getOrElse(throw new IllegalArgumentException(
                "TRANSACTIONID needs a numeric transaction id"))
            txId = Some(try operand.toLong catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"TRANSACTIONID: not a transaction id: '$operand'")
            })
        }
        rest = tail
      case _ => more = false
    }
    val hasPrefix = vt.isDefined || tt.isDefined || txId.isDefined
    val viewName = "events_current_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // double-quoted sections lex as STRING LITERALS when ANSI-ident mode
    // is off but as IDENTIFIERS under ANSI doubleQuotedIdentifiers — the
    // rewriter must follow the session's lexing or a "events_current"
    // reference would be skipped (unresolved relation) in ANSI-ident
    // mode. Read the EFFECTIVE conf value (no fallback): a "false"
    // fallback would shadow Spark 4's built-in ansi.enabled=true default
    def confBool(k: String) =
      (try spark.conf.get(k) catch { case _: Exception => "false" })
        .equalsIgnoreCase("true")
    val dqIdents = confBool("spark.sql.ansi.enabled") &&
      confBool("spark.sql.ansi.doubleQuotedIdentifiers")
    val (rewritten, refsCurrent) =
      rewriteTableRefs(rest, "events_current", viewName, dqIdents)
    if (!hasPrefix && !refsCurrent)
      return if (args.isEmpty) spark.sql(rest) else spark.sql(rest, args)
    registerCurrent(spark, dir, viewName, vt.getOrElse(utcNow()), tt, txId)
    try if (args.isEmpty) spark.sql(rewritten) else spark.sql(rewritten, args)
    finally { spark.catalog.dropTempView(viewName); () }
  }

  /** Rewrite whole-word, case-insensitive occurrences of identifier `table`
    * to `replacement`, skipping regions where the name is DATA, not a table
    * reference: single-quoted string literals ('' escapes), double-quoted
    * LITERALS (Spark's default lexing; pass `dqIdentifiers = true` to
    * follow ANSI doubleQuotedIdentifiers mode, where they are references),
    * `--` line comments and bracketed comments. Backtick-quoted
    * identifiers ARE references and are rewritten, with doubled-backtick
    * escapes honored (`ab``cd` is the identifier ab`cd — closing at the
    * first backtick of the pair desynced the scanner, r10 advice). A
    * blanket `replaceAll("\\bevents_current\\b")` silently changed literal
    * values inside the query text (r9 advice). Returns (rewritten,
    * foundRef). */
  private[graft] def rewriteTableRefs(sql: String, table: String,
      replacement: String, dqIdentifiers: Boolean = false): (String, Boolean) = {
    val out = new java.lang.StringBuilder(sql.length + 32)
    val n = sql.length
    var i = 0
    var found = false
    def isWord(c: Char) = c == '_' || Character.isLetterOrDigit(c)
    // quoted identifier: doubled quote chars escape; compare the
    // UNESCAPED inner text, emit the original region verbatim on a
    // non-match (qc = '`' always, '"' in ANSI-ident mode)
    def quotedIdent(qc: Char): Unit = {
      var k = i + 1
      val inner = new java.lang.StringBuilder()
      var closed = false
      while (k < n && !closed) {
        val c = sql.charAt(k)
        if (c == qc) {
          if (k + 1 < n && sql.charAt(k + 1) == qc) { inner.append(qc); k += 2 }
          else { closed = true; k += 1 }
        } else { inner.append(c); k += 1 }
      }
      if (inner.toString.equalsIgnoreCase(table)) {
        out.append(qc).append(replacement).append(qc); found = true
      } else out.append(sql, i, k)
      i = k
    }
    while (i < n) {
      sql.charAt(i) match {
        case '"' if dqIdentifiers => quotedIdent('"')
        case q @ ('\'' | '"') => // string literal (Spark lexes both as
          // strings by default); '' doubling AND backslash both escape
          var k = i + 1
          var closed = false
          while (k < n && !closed) {
            val c = sql.charAt(k)
            if (c == '\\' && k + 1 < n) k += 2
            else if (c == q) {
              if (k + 1 < n && sql.charAt(k + 1) == q) k += 2
              else { closed = true; k += 1 }
            } else k += 1
          }
          out.append(sql, i, k); i = k
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' => // line comment
          var k = i + 2
          while (k < n && sql.charAt(k) != '\n') k += 1
          out.append(sql, i, k); i = k
        case '/' if i + 2 < n && sql.charAt(i + 1) == '*' && sql.charAt(i + 2) == '+' =>
          // optimizer HINT block: /*+ BROADCAST(events_current) */ names
          // relations semantically — its references must be rewritten
          // along with the FROM clause or Spark drops the hint as
          // unresolved (hints don't nest)
          val close = sql.indexOf("*/", i + 3)
          val k = if (close < 0) n else close + 2
          val inner = sql.substring(i + 3, if (close < 0) n else close)
          val (rewrittenInner, f) =
            rewriteTableRefs(inner, table, replacement, dqIdentifiers)
          if (f) found = true
          out.append("/*+").append(rewrittenInner)
          if (close >= 0) out.append("*/")
          i = k
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          // bracketed comment — Spark supports NESTING (SPARK-28880),
          // so track depth instead of jumping to the first */
          var k = i + 2
          var depth = 1
          while (k < n && depth > 0) {
            if (k + 1 < n && sql.charAt(k) == '/' && sql.charAt(k + 1) == '*') { depth += 1; k += 2 }
            else if (k + 1 < n && sql.charAt(k) == '*' && sql.charAt(k + 1) == '/') { depth -= 1; k += 2 }
            else k += 1
          }
          out.append(sql, i, k); i = k
        case '`' => quotedIdent('`') // backtick ident: a real table ref
        case c if isWord(c) => // consume a whole identifier/word atomically
          var k = i
          while (k < n && isWord(sql.charAt(k))) k += 1
          val word = sql.substring(i, k)
          if (word.equalsIgnoreCase(table)) { out.append(replacement); found = true }
          else out.append(word)
          i = k
        case c => out.append(c); i += 1
      }
    }
    (out.toString, found)
  }

  private def registerCurrent(spark: SparkSession, dir: String,
      viewName: String, vt: java.time.LocalDateTime,
      tt: Option[java.time.LocalDateTime], txId: Option[Long]): Unit = {
    val versions0 = graft.queries.BitempQueries.versionsFromEvents(spark, dir)
    // tt and txId COMPOSE: each is a restriction of the visible versions
    // on the transaction axis (a tt basis alongside a tx-id basis was
    // silently dropped before r9)
    val versions = tt match {
      case Some(t) if txId.isDefined => versions0.filter(col("tt") <= lit(t))
      case _ => versions0
    }
    val snap = (txId, tt) match {
      case (Some(id), _) => Bitemp.asOf(versions, lit(vt), lit(id))
      case (None, t) => Bitemp.asOfTime(versions, lit(vt),
        lit(t.getOrElse(utcNow())))
    }
    snap.createOrReplaceTempView(viewName)
  }
}
