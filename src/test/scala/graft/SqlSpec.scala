package graft

import org.apache.spark.sql.{AnalysisException, DataFrame, Row}
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.SqlSurface

/** Ports of the reference's SQL-surface corpus —
  * crux-sql/test/crux/calcite_test.clj. The reference maps schema docs
  * (`:crux.sql.table/query` datalog + `:crux.sql.table/columns`) onto
  * Calcite tables; here the analogous mapping is a Spark temp view (for a
  * query-backed table, literally a datalog-planned DataFrame registered as
  * the view). Queries run through [[SqlSurface.query]], so table
  * registration, temporal-prefix parsing, and positional `?` parameters
  * all take the production path.
  *
  * Deviations: Calcite's JDBC `{fn CONCAT(...)}` escape syntax and
  * `TRUNCATE(x, d)` are not in Spark's dialect (plain CONCAT is);
  * error texts differ (Spark's UNRESOLVED_COLUMN vs Calcite's
  * "Column not found"), asserted by column name instead.
  */
class SqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def q(sql: String, args: Array[Any] = Array.empty): DataFrame =
    SqlSurface.query(spark, dir, sql, args)

  private def rows(sql: String): Seq[Seq[Any]] =
    q(sql).collect().toSeq.map(_.toSeq)

  private def registerPerson(): Unit = {
    import spark.implicits._
    Seq(
      (":ivan", "Ivan", "Earth", 21L, true),
      (":malcolm", "Malcolm", "Mars", 25L, false))
      .toDF("id", "name", "homeworld", "age", "alive")
      .createOrReplaceTempView("person")
  }

  test("count / projection / case-insensitive identifiers (calcite_test.clj:139-157)") {
    registerPerson()
    assert(rows("SELECT count(*) as N FROM PERSON") == Seq(Seq(2L)))
    assert(rows("SELECT PERSON.NAME FROM PERSON").toSet ==
      Set(Seq("Ivan"), Seq("Malcolm")))
    assert(rows("select person.name from person").toSet ==
      Set(Seq("Ivan"), Seq("Malcolm")))
  }

  test("order by / multiple and wildcard columns (calcite_test.clj:171-200)") {
    registerPerson()
    assert(rows("SELECT PERSON.NAME FROM PERSON ORDER BY NAME DESC") ==
      Seq(Seq("Malcolm"), Seq("Ivan")))
    assert(rows("SELECT PERSON.NAME,PERSON.HOMEWORLD FROM PERSON").toSet ==
      Set(Seq("Ivan", "Earth"), Seq("Malcolm", "Mars")))
    val wild = q("SELECT * FROM PERSON")
    assert(wild.columns.toSeq == Seq("id", "name", "homeworld", "age", "alive"))
    assert(wild.collect().toSet == Set(
      Row(":ivan", "Ivan", "Earth", 21L, true),
      Row(":malcolm", "Malcolm", "Mars", 25L, false)))
  }

  test("equals / in / and / or operands (calcite_test.clj:192-221)") {
    registerPerson()
    assert(rows("SELECT NAME FROM PERSON WHERE NAME = 'Ivan'") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE NAME <> 'Ivan'") == Seq(Seq("Malcolm")))
    assert(rows("SELECT NAME FROM PERSON WHERE 'Ivan' = NAME") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE 'Ivan' = 'Ivan'").size == 2)
    assert(rows("SELECT NAME FROM PERSON WHERE NAME in ('Ivan')") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE NAME = 'Ivan' AND HOMEWORLD = 'Earth'") ==
      Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE NAME = 'Ivan' OR AGE = 25").toSet ==
      Set(Seq("Ivan"), Seq("Malcolm")))
  }

  test("numeric ranges and order-by-age (calcite_test.clj:223-244)") {
    registerPerson()
    assert(rows("SELECT PERSON.NAME,PERSON.AGE FROM PERSON WHERE AGE = 21") ==
      Seq(Seq("Ivan", 21L)))
    assert(rows("SELECT NAME FROM PERSON WHERE AGE > 21") == Seq(Seq("Malcolm")))
    assert(rows("SELECT NAME FROM PERSON WHERE 23 > AGE") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE AGE >= 21").size == 2)
    assert(rows("SELECT NAME FROM PERSON WHERE AGE < 22") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE AGE <= 21") == Seq(Seq("Ivan")))
    assert(rows("SELECT PERSON.NAME FROM PERSON ORDER BY AGE ASC") ==
      Seq(Seq("Ivan"), Seq("Malcolm")))
  }

  test("like / substring / unknown column (calcite_test.clj:246-256)") {
    registerPerson()
    assert(rows("SELECT NAME FROM PERSON WHERE NAME LIKE 'Iva%'") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE NAME LIKE 'Iva%' OR NAME LIKE 'Mal%'").size == 2)
    assert(rows("SELECT SUBSTRING(NAME,1,3) AS NAME FROM PERSON WHERE NAME = 'Ivan'") ==
      Seq(Seq("Iva")))
    val ex = intercept[AnalysisException](q("SELECT NOCNOLUMN FROM PERSON").collect())
    assert(ex.getMessage.contains("NOCNOLUMN"))
  }

  test("booleans (calcite_test.clj:258-266)") {
    registerPerson()
    assert(rows("SELECT NAME FROM PERSON WHERE ALIVE = TRUE") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE ALIVE = FALSE") == Seq(Seq("Malcolm")))
    assert(rows("SELECT NAME FROM PERSON WHERE NAME IS NOT NULL OR ALIVE = TRUE").size == 2)
  }

  test("filter calcs, nested arithmetic (calcite_test.clj:268-298)") {
    import spark.implicits._
    Seq((":ivan", "Ivan", 42L, 21L), (":malcolm", "Malcolm", 22L, 10L))
      .toDF("id", "name", "age", "years_worked").createOrReplaceTempView("person")
    assert(rows("SELECT PERSON.NAME,PERSON.AGE FROM PERSON WHERE AGE = (YEARS_WORKED * 2)")
      .map(_.head) == Seq("Ivan"))
    assert(rows("SELECT PERSON.NAME,PERSON.AGE FROM PERSON WHERE AGE = (2 + (YEARS_WORKED * 2))")
      .map(_.head) == Seq("Malcolm"))
  }

  test("column equality / null semantics (calcite_test.clj:355-368)") {
    import spark.implicits._
    Seq((":ivan", "Ivan", Some("Ivan"), 21L), (":malcolm", "Malcolm", Some("Mars"), 25L))
      .toDF("id", "name", "homeworld", "age").createOrReplaceTempView("person")
    assert(rows("SELECT PERSON.NAME FROM PERSON WHERE NAME = HOMEWORLD") == Seq(Seq("Ivan")))
    Seq((":ivan", "Ivan", None: Option[String], 21L), (":malcolm", "Malcolm", Some("Mars"), 25L))
      .toDF("id", "name", "homeworld", "age").createOrReplaceTempView("person")
    assert(rows("SELECT PERSON.NAME FROM PERSON WHERE HOMEWORLD IS NULL") == Seq(Seq("Ivan")))
    assert(rows("SELECT PERSON.NAME FROM PERSON WHERE HOMEWORLD IS NOT NULL") == Seq(Seq("Malcolm")))
    assert(rows("SELECT PERSON.NAME FROM PERSON WHERE 'FOO' IS NOT NULL").size == 2)
  }

  test("cardinality-many column explodes to rows (calcite_test.clj:370-393)") {
    import spark.implicits._
    // the reference's index yields one row per (e, a, v): a set-valued
    // homeworld surfaces as multiple rows — model with explode
    Seq((":ivan", "Ivan", Seq("Earth"), 21L), (":malcolm", "Malcolm", Seq("Mars", "Earth"), 25L))
      .toDF("id", "name", "homeworld", "age")
      .select(org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.col("name"),
        org.apache.spark.sql.functions.explode($"homeworld").as("homeworld"),
        org.apache.spark.sql.functions.col("age"))
      .createOrReplaceTempView("person")
    assert(rows("SELECT * FROM PERSON WHERE HOMEWORLD = 'Earth'")
      .map(_(1).toString).sorted == Seq("Ivan", "Malcolm"))
    assert(rows("SELECT * FROM PERSON").map(_(1).toString).sorted ==
      Seq("Ivan", "Malcolm", "Malcolm"))
  }

  test("limit and offset (calcite_test.clj:395-420)") {
    import spark.implicits._
    (0 until 20).map(i => (s":ivan$i", "Ivan", 21L))
      .toDF("id", "name", "age").createOrReplaceTempView("person")
    assert(rows("SELECT * FROM PERSON WHERE NAME='Ivan'").size == 20)
    assert(rows("SELECT * FROM PERSON WHERE NAME='Ivan' LIMIT 10").size == 10)
    assert(rows("SELECT * FROM PERSON WHERE NAME='Ivan' LIMIT 10 OFFSET 15").size == 5)
  }

  test("prepared statements with positional params (calcite_test.clj:422-427)") {
    import spark.implicits._
    Seq((":ivan", "Ivan", "Earth", 21L), (":malcolm", " Malcolm", "Mars", 25L))
      .toDF("id", "name", "homeworld", "age").createOrReplaceTempView("person")
    assert(rows("SELECT HOMEWORLD FROM PERSON WHERE NAME = 'Ivan'") == Seq(Seq("Earth")))
    assert(q("SELECT HOMEWORLD FROM PERSON WHERE NAME = ?", Array("Ivan"))
      .collect().toSeq == Seq(Row("Earth")))
    assert(q("SELECT HOMEWORLD FROM PERSON WHERE TRIM(NAME) = ?", Array("Ivan"))
      .collect().toSeq == Seq(Row("Earth")))
    assert(q("SELECT NAME FROM PERSON WHERE AGE > ?", Array(23))
      .collect().toSeq == Seq(Row(" Malcolm")))
  }

  test("multi-key sort (calcite_test.clj:429-449)") {
    import spark.implicits._
    Seq((":ivan", "Ivan", "Earth", 21L), (":malcolm", "Malcolm", "Mars", 25L),
      (":fred", "Fred", "Mars", 90L))
      .toDF("id", "name", "homeworld", "age").createOrReplaceTempView("person")
    assert(rows("SELECT NAME FROM PERSON ORDER BY NAME").map(_.head) ==
      Seq("Fred", "Ivan", "Malcolm"))
    assert(rows("SELECT NAME FROM PERSON ORDER BY NAME DESC").map(_.head) ==
      Seq("Malcolm", "Ivan", "Fred"))
    assert(rows("SELECT NAME FROM PERSON ORDER BY HOMEWORLD DESC, AGE").map(_.head) ==
      Seq("Malcolm", "Fred", "Ivan"))
    assert(rows("SELECT NAME FROM PERSON ORDER BY HOMEWORLD DESC, AGE DESC").map(_.head) ==
      Seq("Fred", "Malcolm", "Ivan"))
  }

  test("timestamp / float / decimal columns (calcite_test.clj:451-468)") {
    import spark.implicits._
    val born = java.sql.Timestamp.valueOf("2010-07-01 00:00:00")
    Seq((":human/ivan", "Ivan", born, 1.0f, BigDecimal("1.3")))
      .toDF("id", "name", "born", "afloat", "adecimal")
      .createOrReplaceTempView("person")
    val r = q("SELECT * FROM PERSON").collect()
    assert(r.length == 1 && r(0).getAs[String]("id") == ":human/ivan" &&
      r(0).getAs[java.sql.Timestamp]("born") == born)
    assert(rows("SELECT NAME FROM PERSON WHERE ADECIMAL = 1.3") == Seq(Seq("Ivan")))
    assert(rows("SELECT NAME FROM PERSON WHERE BORN = TIMESTAMP '2010-07-01 00:00:00'") ==
      Seq(Seq("Ivan")))
  }

  test("inner / projected / triple / calc / left-outer joins (calcite_test.clj:487-600)") {
    import spark.implicits._
    Seq((":person/ivan", "Ivan", "earth", 25L), (":person/malcolm", "Malcolm", "mars", 21L))
      .toDF("id", "name", "planet", "age").createOrReplaceTempView("person")
    Seq((":planet/earth", "earth", "Hot", 42L))
      .toDF("id", "name", "climate", "age").createOrReplaceTempView("planet")
    Seq((":ship/enterprise", "enterprise", "Ivan", 13L))
      .toDF("id", "name", "captain", "decks").createOrReplaceTempView("ship")

    assert(rows("SELECT * FROM PERSON INNER JOIN PLANET ON PERSON.PLANET = PLANET.NAME") ==
      Seq(Seq(":person/ivan", "Ivan", "earth", 25L, ":planet/earth", "earth", "Hot", 42L)))
    assert(rows("SELECT PERSON.ID, PERSON.NAME AS PERSON, PLANET.NAME AS PLANET " +
      "FROM PERSON INNER JOIN PLANET ON PERSON.PLANET = PLANET.NAME") ==
      Seq(Seq(":person/ivan", "Ivan", "earth")))
    assert(rows("SELECT * FROM PERSON " +
      "INNER JOIN PLANET ON PERSON.PLANET = PLANET.NAME " +
      "INNER JOIN SHIP ON SHIP.CAPTAIN = PERSON.NAME") ==
      Seq(Seq(":person/ivan", "Ivan", "earth", 25L, ":planet/earth", "earth", "Hot", 42L,
        ":ship/enterprise", "enterprise", "Ivan", 13L)))
    assert(rows("SELECT * FROM PERSON INNER JOIN PLANET ON PLANET.AGE = (2 * PERSON.AGE)")
      .map(_(1)) == Seq("Malcolm"))
    assert(rows("SELECT PERSON.NAME FROM PERSON LEFT OUTER JOIN PLANET " +
      "ON PERSON.PLANET = PLANET.NAME").map(_.head.toString).sorted == Seq("Ivan", "Malcolm"))
  }

  test("datalog-query-backed table (calcite_test.clj:602-614)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    // the schema doc's :crux.sql.table/query IS a datalog query — here
    // planned by the datalog planner and registered as the view
    val quads = spark.createDataFrame(Seq(
      Row(":person/ivan", "name", "Ivan"), Row(":person/ivan", "planet", "earth"),
      Row(":person/igor", "name", "Igor"), Row(":person/igor", "planet", "not-earth")).asJava,
      StructType(Seq(StructField("e", StringType), StructField("a", StringType),
        StructField("v_str", StringType))))
    val src = new graft.datalog.QuadSource(quads, Map("name" -> "v_str", "planet" -> "v_str"))
    graft.datalog.Planner.q(spark, src,
      """{:find [?id ?name ?planet]
          :keys [id name planet]
          :where [[?id :name ?name] [?id :planet ?planet] [?id :planet "earth"]]}""")
      .createOrReplaceTempView("person")
    assert(rows("SELECT * FROM PERSON").toSet ==
      Set(Seq(":person/ivan", "Ivan", "earth")))
  }

  test("arithmetic and built-in fns (calcite_test.clj:616-655)") {
    import spark.implicits._
    Seq((":human/ivan", " Ivan ", "earth", 21L))
      .toDF("id", "name", "homeworld", "age").createOrReplaceTempView("person")
    assert(rows("SELECT (AGE / 2) AS AGE FROM PERSON").head.head.toString.toDouble == 10.5 ||
      rows("SELECT (AGE DIV 2) AS AGE FROM PERSON") == Seq(Seq(10L)))
    assert(rows("SELECT (AGE * 2) AS AGE FROM PERSON") == Seq(Seq(42L)))
    assert(rows("SELECT (AGE + 2) AS AGE FROM PERSON") == Seq(Seq(23L)))
    assert(rows("SELECT (AGE - 2) AS AGE FROM PERSON") == Seq(Seq(19L)))
    assert(rows("SELECT mod(AGE, 6) AS AGE FROM PERSON") == Seq(Seq(3L)))
    assert(rows("SELECT mod((AGE + 2), 6) AS AGE FROM PERSON") == Seq(Seq(5L)))
    assert(rows("SELECT LOWER(NAME) AS LNAME FROM PERSON") == Seq(Seq(" ivan ")))
    assert(rows("SELECT UPPER(NAME) AS LNAME FROM PERSON") == Seq(Seq(" IVAN ")))
    assert(rows("SELECT INITCAP(HOMEWORLD) AS PLANET FROM PERSON") == Seq(Seq("Earth")))
    assert(rows("SELECT LOWER(' IVAN ') AS LNAME FROM PERSON") == Seq(Seq(" ivan ")))
    assert(rows("SELECT INITCAP(LOWER(HOMEWORLD)) AS PLANET FROM PERSON") == Seq(Seq("Earth")))
    assert(rows("SELECT TRIM(NAME) AS NAME2 FROM PERSON") == Seq(Seq("Ivan")))
    // plain CONCAT (Calcite's {fn CONCAT} JDBC escape is not in the dialect)
    assert(rows("SELECT TRIM(CONCAT(NAME, 'qs')) AS NAME2 FROM PERSON") == Seq(Seq("Ivan qs")))
    assert(rows("SELECT CEIL(AGE) AS AGE FROM PERSON") == Seq(Seq(21L)))
    assert(rows("SELECT NAME FROM PERSON WHERE CEIL(AGE) = 21").nonEmpty)
    assert(rows("SELECT CEIL(1.1) FROM PERSON").head.head.toString.toDouble == 2.0)
    assert(rows("SELECT FLOOR(1.1) FROM PERSON").head.head.toString.toDouble == 1.0)
  }

  test("temporal prefix composes with the parameterized surface") {
    // VALIDTIME prefix + positional param through one call
    val r = q("VALIDTIME ('2024-01-15T00:00:00') " +
      "SELECT COUNT(*) AS n FROM events_current WHERE tx_id > ?", Array(0))
    assert(r.collect().length == 1)
  }

  test("temporal prefix literal forms and error contract (r9)") {
    def n(sql: String): Long = q(sql).collect().head.getLong(0)
    val base = n("VALIDTIME ('2024-01-15T00:00:00') SELECT COUNT(*) AS n FROM events_current")
    // reference-tolerant forms (prepare-sql reads RFC3339): space
    // separator, date-only, trailing Z — all the same basis
    assert(n("VALIDTIME ('2024-01-15 00:00:00') SELECT COUNT(*) AS n FROM events_current") == base)
    assert(n("VALIDTIME ('2024-01-15') SELECT COUNT(*) AS n FROM events_current") == base)
    assert(n("VALIDTIME ('2024-01-15T00:00:00Z') SELECT COUNT(*) AS n FROM events_current") == base)
    // malformed prefixes name the keyword instead of NPE/raw parse errors
    val e1 = intercept[IllegalArgumentException](q("VALIDTIME (2024) SELECT 1"))
    assert(e1.getMessage.contains("VALIDTIME"))
    val e2 = intercept[IllegalArgumentException](q("TRANSACTIONID ('') SELECT 1"))
    assert(e2.getMessage.contains("TRANSACTIONID"))
  }

  test("TRANSACTIONTIME and TRANSACTIONID compose by intersecting (r9)") {
    def n(sql: String): Long = q(sql).collect().head.getLong(0)
    val vt = "VALIDTIME ('2024-03-01T00:00:00') "
    val byId = n(vt + "TRANSACTIONID (800) SELECT COUNT(*) AS n FROM events_current")
    // an early tt basis must RESTRICT the id-based snapshot (it was
    // silently dropped when both were given)
    val both = n(vt + "TRANSACTIONTIME ('2024-01-05T00:00:00') TRANSACTIONID (800) " +
      "SELECT COUNT(*) AS n FROM events_current")
    assert(both < byId, s"tt+txId ($both) must restrict txId-only ($byId)")
  }

  test("view rewrite leaves string literals and comments untouched (r10)") {
    // the r9 regex rewrite changed 'events_current' occurrences INSIDE
    // string literals/comments; the scanner must rewrite only references
    val row = q("""VALIDTIME ('2024-01-15T00:00:00')
      SELECT 'events_current' AS lit, COUNT(*) AS n -- events_current comment
      FROM events_current /* refs events_current */""").collect().head
    assert(row.getString(0) == "events_current", row.getString(0))
    assert(row.getLong(1) > 0)
    // scanner unit surface: literals skipped (incl. '' escape), backtick
    // identifiers rewritten, words containing the name untouched
    import graft.sql.SqlSurface.rewriteTableRefs
    assert(rewriteTableRefs("SELECT 'events_current' FROM t", "events_current", "V")._1
      == "SELECT 'events_current' FROM t")
    assert(rewriteTableRefs("SELECT 'it''s events_current' FROM events_current",
      "events_current", "V")._1 == "SELECT 'it''s events_current' FROM V")
    assert(rewriteTableRefs("SELECT * FROM `events_current`", "events_current", "V")._1
      == "SELECT * FROM `V`")
    assert(rewriteTableRefs("SELECT events_current_old FROM events_current_old",
      "events_current", "V") == ("SELECT events_current_old FROM events_current_old", false))
    assert(rewriteTableRefs("SELECT \"events_current\" FROM t", "events_current", "V")._2 == false)
    // backslash-escaped quote inside a literal must not desync the scan
    assert(rewriteTableRefs("SELECT 'a\\'b events_current' FROM events_current",
      "events_current", "V")._1 == "SELECT 'a\\'b events_current' FROM V")
    // nested bracketed comments (SPARK-28880): the scanner must not exit
    // at the inner close and lex the outer tail as code
    assert(rewriteTableRefs("/* o /* i */ don't */ SELECT * FROM events_current",
      "events_current", "V")._1 == "/* o /* i */ don't */ SELECT * FROM V")
    // optimizer hints name relations semantically — their references are
    // rewritten with the FROM clause or Spark drops the hint unresolved
    assert(rewriteTableRefs(
      "SELECT /*+ BROADCAST(events_current) */ * FROM events_current",
      "events_current", "V")._1 == "SELECT /*+ BROADCAST(V) */ * FROM V")
  }

  test("view rewrite: randomized segment programs rewrite exactly the references (r10)") {
    // constructive differential: each program is assembled from typed
    // segments whose expected rewrite is known BY CONSTRUCTION, so the
    // scanner is checked against ground truth rather than itself —
    // literals ('' and backslash escapes), double-quoted literals, line
    // and (nested) block comments, backtick identifiers, hint blocks,
    // reference words, decoy words containing the name as a substring
    import graft.sql.SqlSurface.rewriteTableRefs
    val T = "events_current"; val R = "v_12345"
    (0 until 200).foreach { trial =>
      val rnd = new scala.util.Random(7100 + trial)
      val segs = Seq.newBuilder[(String, String, Boolean)] // (in, want, isRef)
      val nSegs = 1 + rnd.nextInt(12)
      (0 until nSegs).foreach { _ =>
        rnd.nextInt(10) match {
          case 0 => segs += ((T, R, true))                       // bare reference
          case 1 => segs += ((s"${T}_old", s"${T}_old", false))  // substring decoy
          case 2 =>                                              // single-quoted literal
            val body = Seq(s"x $T y", s"it''s $T", s"a\\' $T")(rnd.nextInt(3))
            segs += ((s"'$body'", s"'$body'", false))
          case 3 => segs += ((s""""d $T q"""", s""""d $T q"""", false))
          case 4 =>                                              // line comment (ends the line)
            segs += ((s"-- c $T tail\n", s"-- c $T tail\n", false))
          case 5 =>                                              // block comment, maybe nested
            val inner = if (rnd.nextBoolean()) s"/* $T */" else T
            segs += ((s"/* o $inner t */", s"/* o $inner t */", false))
          case 6 =>                                              // hint block: refs rewritten
            segs += ((s"/*+ BROADCAST($T) */", s"/*+ BROADCAST($R) */", true))
          case 7 => segs += ((s"`$T`", s"`$R`", true))           // backtick identifier
          case 8 => segs += (("FROM tbl WHERE x < 3", "FROM tbl WHERE x < 3", false))
          case 9 =>                                              // doubled-backtick escape:
            // `ab``<T>``cd` is ONE identifier (ab`<T>`cd ≠ T) — the r10
            // scanner closed at the escape's first backtick and desynced
            segs += ((s"`ab``$T``cd`", s"`ab``$T``cd`", false))
        }
      }
      val built = segs.result()
      val in = built.map(_._1).mkString(" ")
      val want = built.map(_._2).mkString(" ")
      val wantFound = built.exists(_._3)
      assert(rewriteTableRefs(in, T, R) == ((want, wantFound)),
        s"trial $trial\nin:   $in\ngot:  ${rewriteTableRefs(in, T, R)}\nwant: ($want, $wantFound)")
    }
  }

  test("view rewrite: doubled-backtick escapes and ANSI double-quoted identifiers (r11)") {
    import graft.sql.SqlSurface.rewriteTableRefs
    val T = "events_current"; val R = "V"
    // escape pair inside a quoted identifier must not desync the scanner:
    // everything AFTER the escaped identifier still rewrites correctly
    assert(rewriteTableRefs(s"SELECT * FROM `ab``cd` JOIN $T", T, R) ==
      ((s"SELECT * FROM `ab``cd` JOIN $R", true)))
    // an escaped identifier that UNESCAPES to the table name is a match
    assert(rewriteTableRefs("SELECT * FROM `x``y`", "x`y", R) ==
      ((s"SELECT * FROM `$R`", true)))
    // default lexing: double quotes are string literals, never references
    assert(rewriteTableRefs(s"""SELECT * FROM "$T"""", T, R) ==
      ((s"""SELECT * FROM "$T"""", false)))
    // ANSI doubleQuotedIdentifiers mode: they ARE references ("" escapes)
    assert(rewriteTableRefs(s"""SELECT * FROM "$T"""", T, R,
      dqIdentifiers = true) == ((s"""SELECT * FROM "$R"""", true)))
    assert(rewriteTableRefs(s"""SELECT * FROM "ab""cd" JOIN $T""", T, R,
      dqIdentifiers = true) == ((s"""SELECT * FROM "ab""cd" JOIN $R""", true)))
    // single-quoted literals stay literals in both modes
    assert(rewriteTableRefs(s"SELECT '$T' FROM t", T, R,
      dqIdentifiers = true) == ((s"SELECT '$T' FROM t", false)))
  }

  test("per-query snapshot views do not leak into the catalog (r9)") {
    q("VALIDTIME ('2024-01-15T00:00:00') SELECT COUNT(*) AS n FROM events_current").collect()
    val leaked = spark.catalog.listTables().collect()
      .filter(_.name.startsWith("events_current_"))
    assert(leaked.isEmpty, leaked.map(_.name).mkString(","))
  }
}
