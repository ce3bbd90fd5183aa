package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{LuceneSyntax, Planner, QuadSource}

/** Ports of the reference's Lucene full-text module tests —
  * crux-lucene/test/crux/lucene_test.clj (core `text-search` /
  * `wildcard-text-search`) and
  * crux-lucene/test/crux/lucene/multi_field_test.clj
  * (`lucene-text-search` field-qualified query strings).
  *
  * Scores (r4): term/phrase leaves use Lucene's BM25 formula over corpus
  * stats aggregated from the attribute corpus; wildcard leaves stay a
  * constant 1.0 (constant-score rewrite, exactly 1.0 in lucene_test.clj
  * "Scores"). r5: dl round-trips through the one-byte SmallFloat norm
  * exactly as Lucene stores it, so absolute scores match to float
  * precision (the remaining delta is double-vs-float arithmetic).
  */
class LuceneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def quadSource(facts: Seq[(String, String, String)]): QuadSource = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_str", StringType)))
    val rows = facts.map { case (e, a, v) => Row(e, a, v) }
    val df = spark.createDataFrame(rows.asJava, schema)
    new QuadSource(df, facts.map(_._2).distinct.map(_ -> "v_str").toMap)
  }

  private def run(src: QuadSource, q: String, args: Any*): Set[Seq[Any]] =
    Planner.q(spark, src, q, args: _*).collect().toSet[Row].map(_.toSeq)

  private lazy val ivanSrc = quadSource(Seq(("ivan", "name", "Ivan")))

  // ------------------------------------------------------------ lucene_test

  test("empty database returns empty (lucene_test.clj:25-27)") {
    import org.apache.spark.sql.types._
    val empty = new QuadSource(
      spark.createDataFrame(new java.util.ArrayList[Row](),
        StructType(Seq(StructField("e", StringType), StructField("a", StringType),
          StructField("v_str", StringType)))),
      Map("name" -> "v_str"))
    assert(run(empty, """[:find ?e :where [[(text-search :name "Ivan") [[?e]]]]]""").isEmpty)
  }

  test("can search string (lucene_test.clj:29-52)") {
    assert(run(ivanSrc, """[:find ?e :where [[(text-search :name "Ivan") [[?e]]]]]""") ==
      Set(Seq("ivan")))
    // bad spec: attr position must be a keyword
    assertThrows[IllegalArgumentException] {
      run(ivanSrc, """[:find ?e :where [[(text-search "Wot" "Ivan") [[?e]]]]]""")
    }
    // fuzzy (prefix wildcard)
    assert(run(ivanSrc, """[:find ?e :where [[(text-search :name "Iv*") [[?e]]]]]""") ==
      Set(Seq("ivan")))
  }

  test("single-char wildcard Iv?n (lucene_test.clj:54-60)") {
    val src = quadSource(Seq(("ivan", "name", "Ivan"), ("ivan2", "name", "Ivbn")))
    assert(run(src, """[:find ?e :where [[(text-search :name "Iv?n") [[?e]]]]]""") ==
      Set(Seq("ivan"), Seq("ivan2")))
  }

  test("wildcard scores are constant 1.0 (lucene_test.clj:84-96 'Scores')") {
    val src = quadSource(Seq(
      ("test0", "name", "ivon"), ("test1", "name", "ivan"),
      ("test2", "name", "testivantest"), ("test3", "name", "testing"),
      ("test4", "name", "ivanpost")))
    assert(run(src,
      """[:find ?e ?v ?score :where [[(text-search :name "ivan*") [[?e ?v ?score]]]]]""") ==
      Set(Seq("test1", "ivan", 1.0), Seq("test4", "ivanpost", 1.0)))
  }

  test("BM25 rank order: both-terms > rare-term > common-term, shorter > longer") {
    // corpus: 'rare' appears in 1 doc, 'common' in 4; d-both matches both
    val src = quadSource(Seq(
      ("d-both", "t", "rare common"),
      ("d-common1", "t", "common alpha"),
      ("d-common2", "t", "common beta"),
      ("d-common3", "t", "common gamma delta epsilon zeta eta theta"),
      ("d-none", "t", "alpha beta")))
    val rows = run(src,
      """[:find ?e ?score :where [[(text-search :t "rare common") [[?e ?v ?score]]]]]""")
      .map { case Seq(e, s) => e.toString -> s.asInstanceOf[Double] }.toMap
    assert(!rows.contains("d-none"))
    // matching both terms beats any single-term match
    assert(rows("d-both") > rows.filterKeys(_ != "d-both").values.max)
    // same tf, same dl: equal scores for equal-length single-term docs
    assert(rows("d-common1") == rows("d-common2"))
    // longer doc scores lower for the same term (dl normalization)
    assert(rows("d-common3") < rows("d-common1"))
    // rarer term contributes a higher idf than a common one: a doc
    // matching only 'rare' would outrank an equal-length doc matching
    // only 'common' — check via the idf ordering embedded in d-both
    val src2 = quadSource(Seq(
      ("r1", "t", "rare x"), ("c1", "t", "common x"),
      ("c2", "t", "common y"), ("c3", "t", "common z")))
    val rows2 = run(src2,
      """[:find ?e ?score :where [[(text-search :t "rare common") [[?e ?v ?score]]]]]""")
      .map { case Seq(e, s) => e.toString -> s.asInstanceOf[Double] }.toMap
    assert(rows2("r1") > rows2("c1"))
  }

  test("BM25 score is the documented formula (deterministic check)") {
    // one matching doc out of two: N=2, df=1, avgdl=(2+2)/2=2, dl=2, tf=1
    val src = quadSource(Seq(("a", "t", "hello world"), ("b", "t", "other text")))
    val rows = run(src,
      """[:find ?e ?score :where [[(text-search :t "hello") [[?e ?v ?score]]]]]""")
    val expected = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5)) *
      1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 2.0 / 2.0))
    assert(rows == Set(Seq("a", expected)))
  }

  test("doc length quantizes through the one-byte norm like Lucene (r5)") {
    // 41 tokens: SmallFloat byte4 round trip gives 24 + ((41-24) >> 1 << 1)
    // = 40 — the score must use 40, not the exact 41
    val longText = "hello " + (0 until 40).map(i => s"w$i").mkString(" ")
    val src = quadSource(Seq(("long", "t", longText), ("b", "t", "other text")))
    val rows = run(src,
      """[:find ?e ?score :where [[(text-search :t "hello") [[?e ?v ?score]]]]]""")
    val avgdl = (41.0 + 2.0) / 2.0 // avgdl stays EXACT (field stats, not norms)
    val expected = math.log(1.0 + (2 - 1 + 0.5) / (1 + 0.5)) *
      1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 40.0 / avgdl))
    assert(rows == Set(Seq("long", expected)))
    // short docs (< 32 tokens) ride in the byte's exact range: unchanged
    assert(LuceneSyntax.analyze("hello world").size == 2)
  }

  test("cardinality many (lucene_test.clj:98-110)") {
    val src = quadSource(Seq(
      ("ivan", "foo", "atar"), ("ivan", "foo", "abar"), ("ivan", "foo", "nomatch")))
    assert(run(src, """[:find ?e ?v :where [[(text-search :foo "atar") [[?e ?v]]]]]""") ==
      Set(Seq("ivan", "atar")))
    assert(run(src, """[:find ?e ?v :where [[(text-search :foo "a?ar") [[?e ?v]]]]]""") ==
      Set(Seq("ivan", "atar"), Seq("ivan", "abar")))
  }

  test("search across attributes + non-existent field (lucene_test.clj:112-139)") {
    assert(run(ivanSrc,
      """[:find ?e ?v ?a :where [[(wildcard-text-search "Ivan") [[?e ?v ?a]]]]]""") ==
      Set(Seq("ivan", "Ivan", ":name")))
    // no match against a non-existent field: {} not an error
    assert(run(ivanSrc,
      """[:find ?e ?v :where [[(text-search :non-field "Ivan") [[?e ?v]]]]]""").isEmpty)
    // multiple a/vs, trailing _ binding ignored
    val two = quadSource(Seq(("ivan", "name", "Ivan"), ("ivan", "surname", "Ivan")))
    assert(run(two,
      """[:find ?e ?v ?a :where [[(wildcard-text-search "Ivan") [[?e ?v ?a _]]]]]""") ==
      Set(Seq("ivan", "Ivan", ":name"), Seq("ivan", "Ivan", ":surname")))
  }

  test("multiple entities with same a/v (lucene_test.clj:141-163, bug 1428)") {
    val src = quadSource(Seq(
      ("ivan1", "name", "Ivan"), ("ivan2", "name", "Ivan"), ("ivan3", "name", "Ivan1")))
    assert(run(src, """[:find ?e :where [[(text-search :name "Iv*") [[?e]]]]]""") ==
      Set(Seq("ivan1"), Seq("ivan2"), Seq("ivan3")))
    assert(run(src, """[:find ?e :where [[(wildcard-text-search "Iv*") [[?e]]]]]""") ==
      Set(Seq("ivan1"), Seq("ivan2"), Seq("ivan3")))
  }

  test("namespaced attributes (lucene_test.clj:222-227)") {
    val src = quadSource(Seq(("real-ivan-2", "myns/name", "Ivan")))
    assert(run(src,
      """[:find ?e ?v :where [[(text-search :myns/name "Ivan") [[?e ?v]]]]]""") ==
      Set(Seq("real-ivan-2", "Ivan")))
  }

  test("analyzed terms are case-insensitive token matches") {
    val src = quadSource(Seq(("e1", "name", "Ivan Bob"), ("e2", "name", "bob")))
    // "Ivan Bob" tokenizes to [ivan, bob]; term Bob matches both entities
    assert(run(src, """[:find ?e :where [[(text-search :name "Bob") [[?e]]]]]""") ==
      Set(Seq("e1"), Seq("e2")))
    // token match, not substring: "van" matches nothing
    assert(run(src, """[:find ?e :where [[(text-search :name "van") [[?e]]]]]""").isEmpty)
  }

  // ------------------------------------------------- boolean operators / phrases

  private lazy val boolSrc = quadSource(Seq(
    ("fred", "firstname", "Fred"), ("fred", "surname", "Smith"),
    ("ivan", "firstname", "Ivan"), ("ivan", "surname", "Smith"),
    ("derek", "firstname", "Derek"), ("derek", "surname", "Jones"),
    ("doc1", "body", "hello wide world"), ("doc2", "body", "world hello")))

  test("AND / OR / NOT over one attribute (QueryParser occur semantics)") {
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "hello AND world") [[?e]]]]]""") ==
      Set(Seq("doc1"), Seq("doc2")))
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "wide OR missing") [[?e]]]]]""") ==
      Set(Seq("doc1")))
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "hello AND NOT wide") [[?e]]]]]""") ==
      Set(Seq("doc2")))
    // default operator is OR
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "wide missing") [[?e]]]]]""") ==
      Set(Seq("doc1")))
    // +required -prohibited
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "+hello -wide") [[?e]]]]]""") ==
      Set(Seq("doc2")))
  }

  test("phrase query matches consecutive analyzed tokens") {
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "\"hello wide\"") [[?e]]]]]""") ==
      Set(Seq("doc1")))
    assert(run(boolSrc, """[:find ?e :where [[(text-search :body "\"hello world\"") [[?e]]]]]""").isEmpty)
  }

  // -------------------------------------------------------- multi_field_test

  test("multi-field lucene queries (multi_field_test.clj:13-24)") {
    assert(run(boolSrc,
      """[:find ?e :where [[(lucene-text-search "firstname: Fred") [[?e]]]]]""") ==
      Set(Seq("fred")))
    assert(run(boolSrc,
      """[:find ?e :where [[(lucene-text-search "firstname:James OR surname:smith") [[?e]]]]]""") ==
      Set(Seq("fred"), Seq("ivan")))
    assert(run(boolSrc,
      """[:find ?e :where [[(lucene-text-search "firstname:James OR surname:preston") [[?e]]]]]""").isEmpty)
  }

  test("format-arg bindings (multi_field_test.clj:26-39)") {
    assert(run(boolSrc,
      """[:find ?e :in [?surname] :where [[(lucene-text-search "surname: %s" ?surname) [[?e]]]]]""",
      "Smith") == Set(Seq("fred"), Seq("ivan")))
    assert(run(boolSrc,
      """[:find ?e :in [?surname ?firstname]
         :where [[(lucene-text-search "surname: %s AND firstname: %s" ?surname ?firstname) [[?e]]]]]""",
      "Smith", "Fred") == Set(Seq("fred")))
  }

  test("namespaced keywords via escape (multi_field_test.clj:41-48)") {
    val src = quadSource(Seq(("ivan", "person/surname", "Smith")))
    assert(run(src,
      """[:find ?e :where [[(lucene-text-search "person\\/surname: Smith") [[?e]]]]]""") ==
      Set(Seq("ivan")))
  }

  test("malformed query throws Cannot parse (multi_field_test.clj:70-74)") {
    val ex = intercept[IllegalArgumentException] {
      run(boolSrc, """[:find ?e :where [[(lucene-text-search "+12!") [[?e]]]]]""")
    }
    assert(ex.getMessage.contains("Cannot parse"))
  }

  test("query string from :in; unfielded terms match nothing (multi_field_test.clj:76-100)") {
    assert(run(boolSrc,
      """[:find ?e :in [?s] :where [[(lucene-text-search ?s) [[?e]]]]]""",
      "firstname: Fred") == Set(Seq("fred")))
    // "firstname Fred" parses as two default-field terms -> no match
    assert(run(boolSrc,
      """[:find ?e :in [?s] :where [[(lucene-text-search ?s) [[?e]]]]]""",
      "firstname Fred").isEmpty)
    assert(run(boolSrc,
      """[:find ?e :in [?s] :where [[(lucene-text-search ?s) [[?e]]]]]""",
      "firstname:James OR surname:smith") == Set(Seq("fred"), Seq("ivan")))
    // non-string query value
    val ex = intercept[IllegalArgumentException] {
      run(boolSrc, """[:find ?e :in [?s] :where [[(lucene-text-search ?s) [[?e]]]]]""",
        Long.box(1L))
    }
    assert(ex.getMessage.contains("must be String"))
  }

  test("dynamically-constructed OR fields (multi_field_test.clj:102-117)") {
    val q = Seq("firstname", "surname").map(f => s"$f:Fre*").mkString(" OR ")
    assert(run(boolSrc,
      """[:find ?e :in [?s] :where [[(lucene-text-search ?s) [[?e]]]]]""", q) ==
      Set(Seq("fred")))
  }

  // ------------------------------------------------------------- parser unit

  test("query string from clause bindings, per-tuple (lucene_test.clj:390-407)") {
    val src = quadSource(Seq(
      ("fred", "firstname", "Fred"), ("fred", "surname", "Smith"),
      ("james", "firstname", "James"), ("james", "escape-text", "firstname:James")))
    // search string computed by a predicate clause from :in
    assert(run(src,
      """[:find ?e :in ?s :where [[(str ?s "e*") ?s2]
          [(wildcard-text-search ?s2) [[?e]]]]]""", "Fr") == Set(Seq("fred")))
    // search string bound by a TRIPLE clause (per-tuple evaluation)
    assert(run(src,
      """[:find ?e ?v :where [[?x :firstname ?q]
          [(text-search :firstname ?q) [[?e ?v]]]]]""") ==
      Set(Seq("fred", "Fred"), Seq("james", "James")))
    // non-string search value: reference error contract
    val err = intercept[IllegalArgumentException] {
      run(src,
        """[:find ?v :in ?input :where [[(wildcard-text-search ?input) [[?e ?v]]]]]""",
        1L)
    }
    assert(err.getMessage.contains("Lucene text search values must be String"))
  }

  test("fuzzy, range and boost syntax (r4)") {
    val src = quadSource(Seq(
      ("ivan", "name", "ivan"), ("ivon", "name", "ivon"),
      ("bob", "name", "bob"), ("dmitri", "name", "dmitri")))
    // explicit edit budget: ivan~1 matches ivan + ivon
    assert(run(src, """[:find ?e :where [[(text-search :name "ivan~1") [[?e]]]]]""") ==
      Set(Seq("ivan"), Seq("ivon")))
    // AUTO edits: 4-char term => 1 edit
    assert(run(src, """[:find ?e :where [[(text-search :name "ivan~") [[?e]]]]]""") ==
      Set(Seq("ivan"), Seq("ivon")))
    // bob~ is 3 chars => 1 edit, no 1-edit neighbours here except itself
    assert(run(src, """[:find ?e :where [[(text-search :name "bob~") [[?e]]]]]""") ==
      Set(Seq("bob")))
    // TRANSPOSITION = one edit (Lucene FuzzyQuery / Damerau semantics, r5):
    // ivna~1 reaches ivan with a single adjacent swap (plain Levenshtein
    // would need 2 edits and miss it)
    assert(run(src, """[:find ?e :where [[(text-search :name "ivna~1") [[?e]]]]]""") ==
      Set(Seq("ivan")))
    // unrestricted Damerau (matches duckdb damerau_levenshtein): the
    // transposed pair may be edited again — ca~2 reaches abc
    assert(graft.functions.FuzzyOps.within("ca", "abc", 2))
    assert(!graft.functions.FuzzyOps.within("ca", "abc", 1))
    assert(graft.functions.FuzzyOps.within("a cat", "an act", 2))
    // both range bracket styles in ONE query lex independently (the r4
    // lexer took the farthest closing char and mis-sliced this)
    assert(run(src,
      """[:find ?e :where [[(text-search :name "[bob TO dmitri] OR {i TO j}") [[?e]]]]]""") ==
      Set(Seq("bob"), Seq("dmitri"), Seq("ivan"), Seq("ivon")))
    // lexicographic range over analyzed tokens, inclusive/exclusive ends
    assert(run(src, """[:find ?e :where [[(text-search :name "[bob TO ivan]") [[?e]]]]]""") ==
      Set(Seq("bob"), Seq("dmitri"), Seq("ivan")))
    assert(run(src, """[:find ?e :where [[(text-search :name "{bob TO ivan}") [[?e]]]]]""") ==
      Set(Seq("dmitri")))
    assert(run(src, """[:find ?e :where [[(text-search :name "[i TO *]") [[?e]]]]]""") ==
      Set(Seq("ivan"), Seq("ivon")))
    // boost scales the matching clause's score; wildcard leaf scores 1.0
    val scored = run(src,
      """[:find ?e ?s :where [[(text-search :name "iv*^3") [[?e ?v ?s]]]]]""")
      .map { case Seq(e, s) => e.toString -> s.asInstanceOf[Double] }.toMap
    assert(scored == Map("ivan" -> 3.0, "ivon" -> 3.0))
    // boosted term still outranks unboosted term in a SHOULD list
    val both = run(src,
      """[:find ?e ?s :where [[(text-search :name "ivan^5 bob") [[?e ?v ?s]]]]]""")
      .map { case Seq(e, s) => e.toString -> s.asInstanceOf[Double] }.toMap
    assert(both("ivan") > both("bob"))
  }

  test("bound text search: >1000 distinct plain patterns run as a join (r5)") {
    // r4's per-binding driver loop threw its 1000-combo cap here; plain
    // single-token patterns now run as one tokenize-both-sides equi-join
    // with an unbounded domain
    val facts = (1 to 1200).map(i => (s"e$i", "name", s"tok$i"))
    val src = quadSource(facts)
    val got = run(src,
      """[:find ?e2 :where [[?e1 :name ?n]
          [(text-search :name ?n) [[?e2]]]]]""")
    assert(got.size == 1200)
    // each pattern matches exactly its own entity
    assert(got == (1 to 1200).map(i => Seq[Any](s"e$i")).toSet)
  }

  test("bound text search: mixed plain + syntax patterns agree with per-value eval (r5)") {
    val src = quadSource(Seq(
      ("ivan", "name", "Ivan"), ("ivona", "name", "Ivona"),
      ("bob", "name", "Bob"),
      // the patterns live in their own attribute: one plain, one wildcard
      ("p1", "pat", "ivan"), ("p2", "pat", "Iv*")))
    val got = run(src,
      """[:find ?p ?e :where [[?x :pat ?p]
          [(text-search :name ?p) [[?e ?v]]]]]""")
    assert(got == Set(
      Seq[Any]("ivan", "ivan"),
      Seq[Any]("Iv*", "ivan"), Seq[Any]("Iv*", "ivona")))
    // scored: plain patterns through the join path score identically to
    // the literal-pattern stats path
    val viaBound = run(src,
      """[:find ?e ?s :where [[?x :pat ?p] [(= ?p "ivan")]
          [(text-search :name ?p) [[?e ?v ?s]]]]]""")
    val viaLit = run(src,
      """[:find ?e ?s :where [[(text-search :name "ivan") [[?e ?v ?s]]]]]""")
    assert(viaBound == viaLit)
  }

  test("bound text search: >1000 distinct wildcard patterns run as a join (r6)") {
    // single-token wildcard patterns now join distributively too (broadcast
    // regex join, constant score 1.0) — an unbounded pattern domain no
    // longer trips the driver-loop cap
    val facts = (1 to 1200).map(i => (s"e$i", "name", s"tok${i}x")) ++
      (1 to 1200).map(i => (s"p$i", "pat", s"tok$i?"))
    val src = quadSource(facts)
    val got = run(src,
      """[:find ?p ?e :where [[?x :pat ?p]
          [(text-search :name ?p) [[?e ?v]]]]]""")
    assert(got.size == 1200)
    assert(got.take(3).forall { case Seq(p, e) =>
      p.toString.startsWith("tok") && e.toString.startsWith("e") })
    // scored: wildcard matches carry Lucene's constant-score 1.0, same as
    // the literal-pattern path
    val scored = run(quadSource(Seq(
        ("ivan", "name", "Ivan"), ("ivona", "name", "Ivona"),
        ("p", "pat", "Iv*"))),
      """[:find ?e ?s :where [[?x :pat ?p]
          [(text-search :name ?p) [[?e ?v ?s]]]]]""")
    assert(scored == Set(Seq[Any]("ivan", 1.0), Seq[Any]("ivona", 1.0)))
  }

  test("parser rejects dangling operators and unbalanced syntax") {
    for (bad <- Seq("name AND", "OR x", "(a b", "\"unterminated", "a ~2", "f:"))
      assertThrows[IllegalArgumentException](LuceneSyntax.parse(bad))
  }

  test("wildcard regex translation escapes regex metachars") {
    assert(LuceneSyntax.wildcardRegex("a.b*c?") == "^a\\.b.*c.$")
  }
}
