package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Ports of the reference's Datalog e2e corpus, tranche 2 —
  * crux-test/test/crux/query_test.clj deftests not covered by
  * [[DatalogSpec]]/[[RulesSpec]]/[[DatascriptSpec]]: the basic-query
  * family, `:args` queries, not/or/mixing, predicate expressions,
  * index unification, get-attr, multi-valued attributes, numeric
  * ranges, and the GitHub-issue regression suite.
  *
  * Fixture model: schemaless quads with string eids (crux ids are
  * opaque, codec.clj:540-608 — keyword ids are carried in their
  * canonical ":name" form, SURVEY §1.2). Nil-valued facts are quad
  * rows with a null value column (issue 1487 semantics).
  */
class QueryCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import org.apache.spark.sql.types._
  import scala.jdk.CollectionConverters._

  /** Build a QuadSource from docs; every doc also gets a `crux.db/id`
    * fact. Iterable values explode to one fact per element (set
    * semantics); `null` is a nil-valued fact. */
  private def src(docs: (String, Map[String, Any])*): QuadSource = {
    final case class Q(e: String, a: String, v: Any)
    val quads = docs.flatMap { case (e, m) =>
      (m + ("crux.db/id" -> (e: Any))).toSeq.flatMap {
        case (a, vs: Iterable[_]) => vs.map(v => Q(e, a, v))
        case (a, v) => Seq(Q(e, a, v))
      }
    }
    def fam(v: Any): Option[String] = v match {
      case null => None
      case _: String => Some("v_str")
      case _: Long | _: Int => Some("v_num")
      case _: Double => Some("v_dbl")
      case _: Boolean => Some("v_bool")
      case _: java.time.LocalDateTime => Some("v_ts")
      case other => throw new IllegalStateException(s"no family for $other")
    }
    val attrTypes = quads.groupBy(_.a).map { case (a, qs) =>
      val fams = qs.flatMap(q => fam(q.v)).toSet
      a -> (if (fams.size > 1) QuadSource.Mixed else fams.headOption.getOrElse("v_str"))
    }
    val rows = quads.map { q =>
      Row(q.e, q.a,
        q.v match { case s: String => s; case _ => null },
        q.v match { case l: Long => l; case i: Int => i.toLong; case _ => null },
        q.v match { case d: Double => d; case _ => null },
        q.v match { case t: java.time.LocalDateTime => t; case _ => null },
        q.v match { case b: Boolean => b; case _ => null })
    }
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_str", StringType), StructField("v_num", LongType),
      StructField("v_dbl", DoubleType), StructField("v_ts", TimestampNTZType),
      StructField("v_bool", BooleanType)))
    new QuadSource(spark.createDataFrame(rows.asJava, schema), attrTypes)
  }

  private def run(s: QuadSource, q: String, args: Any*): Set[Seq[Any]] =
    Planner.q(spark, s, q, args: _*).collect().toSet[Row].map(_.toSeq)

  private def runList(s: QuadSource, q: String, args: Any*): Seq[Seq[Any]] =
    Planner.q(spark, s, q, args: _*).collect().toSeq.map(_.toSeq)

  private def count(s: QuadSource, q: String, args: Any*): Long =
    Planner.q(spark, s, q, args: _*).count()

  // ------------------------------------------------------- basic query

  private lazy val ivanPetr = src(
    ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":petr" -> Map("name" -> "Petr", "last-name" -> "Petrov"))

  private lazy val ivanPetrSmith = src(
    ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":petr" -> Map("name" -> "Petr", "last-name" -> "Petrov"),
    ":smith" -> Map("name" -> "Smith", "last-name" -> "Smith"))

  test("basic query by field / entity / multiple terms (query_test.clj:19)") {
    assert(run(ivanPetr, """{:find [name] :where [[e :name "Ivan"] [e :name name]]}""") ==
      Set(Seq("Ivan")))
    assert(run(ivanPetr, """{:find [e] :where [[e :name "Petr"]]}""") == Set(Seq(":petr")))
    assert(run(ivanPetr,
      """{:find [name last-name]
         :where [[e :name name] [e :last-name last-name]
                 [e :name "Ivan"] [e :last-name "Ivanov"]]}""") ==
      Set(Seq("Ivan", "Ivanov")))
    // negate on a subsequent non-matching clause
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name "Ivan"] [e :last-name "Ivanov-does-not-match"]]}""").isEmpty)
    assert(run(ivanPetr, """{:find [name] :where [[e :name name]]}""") ==
      Set(Seq("Ivan"), Seq("Petr")))
    // query across fields for same value (+ with the value passed in)
    assert(run(ivanPetrSmith,
      """{:find [p1] :where [[p1 :name name] [p1 :last-name name]]}""") == Set(Seq(":smith")))
    assert(run(ivanPetrSmith,
      """{:find [p1] :where [[p1 :name name] [p1 :last-name name] [p1 :name "Smith"]]}""") ==
      Set(Seq(":smith")))
  }

  test("returning maps: :keys/:strs/:syms name columns; arity mismatch throws (query_test.clj:66)") {
    val df = Planner.q(spark, ivanPetr,
      """{:find [?name ?last-name] :keys [user/name user/last-name]
         :where [[e :name ?name] [e :last-name ?last-name]]}""")
    assert(df.columns.toSeq == Seq("user/name", "user/last-name"))
    assert(df.collect().toSet[Row].map(_.toSeq) ==
      Set(Seq("Ivan", "Ivanov"), Seq("Petr", "Petrov")))
    val df2 = Planner.q(spark, ivanPetr,
      """{:find [?name ?last-name] :strs [name last-name]
         :where [[e :name ?name] [e :last-name ?last-name]]}""")
    assert(df2.columns.toSeq == Seq("name", "last-name"))
    assertThrows[IllegalArgumentException] {
      Planner.q(spark, ivanPetr,
        """{:find [name last-name] :keys [name]
           :where [[e :name name] [e :last-name last-name]]}""").collect()
    }
  }

  // ------------------------------------------------------- :args maps

  test("query with :args: value / entity / both positions (query_test.clj:105)") {
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name]] :args [{:name "Ivan"}]}""") == Set(Seq(":ivan")))
    assert(run(ivanPetr,
      """{:find [name] :where [[e :name name]] :args [{:e :ivan} {:e :petr}]}""") ==
      Set(Seq("Ivan"), Seq("Petr")))
    assert(run(ivanPetr,
      """{:find [name last-name]
         :where [[e :name name] [e :last-name last-name]]
         :args [{:e :ivan} {:e :petr}]}""") ==
      Set(Seq("Ivan", "Ivanov"), Seq("Petr", "Petrov")))
    // both entity and value position
    assert(run(ivanPetr,
      """{:find [name] :where [[e :name name]] :args [{:e :ivan :name "Ivan"}]}""") ==
      Set(Seq("Ivan")))
    assert(run(ivanPetr,
      """{:find [name] :where [[e :name name]] :args [{:e :ivan :name "Petr"}]}""").isEmpty)
    // several argument tuples
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name]] :args [{:name "Ivan"} {:name "Petr"}]}""") ==
      Set(Seq(":ivan"), Seq(":petr")))
    // args + literal clause
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name] [e :last-name "Ivanov"]]
         :args [{:name "Ivan"} {:name "Petr"}]}""") == Set(Seq(":ivan")))
    // non-existent argument value
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name]] :args [{:name "Bob"}]}""").isEmpty)
    // empty args vector constrains nothing
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name]] :args []}""") ==
      Set(Seq(":ivan"), Seq(":petr")))
    // tuple arguments
    assert(run(ivanPetr,
      """{:find [e] :where [[e :name name] [e :last-name last-name]]
         :args [{:name "Ivan" :last-name "Ivanov"} {:name "Petr" :last-name "Petrov"}]}""") ==
      Set(Seq(":ivan"), Seq(":petr")))
  }

  test("predicates over :args alone (query_test.clj:182)") {
    assert(run(ivanPetr,
      """{:find [name] :where [[(re-find #"I" name)]]
         :args [{:name "Ivan"} {:name "Petr"}]}""") == Set(Seq("Ivan")))
    assert(run(ivanPetr,
      """{:find [name] :where [[(re-find #"I" name)] [(= last-name "Ivanov")]]
         :args [{:name "Ivan" :last-name "Ivanov"} {:name "Petr" :last-name "Petrov"}]}""") ==
      Set(Seq("Ivan")))
    assert(run(ivanPetr,
      """{:find [name] :where [[(string? name)]]
         :args [{:name "Ivan"} {:name "Petr"}]}""") == Set(Seq("Ivan"), Seq("Petr")))
    assert(run(ivanPetr,
      """{:find [name last-name] :where [[(not= last-name name)]]
         :args [{:name "Ivan" :last-name "Ivanov"} {:name "Petr" :last-name "Petrov"}]}""") ==
      Set(Seq("Ivan", "Ivanov"), Seq("Petr", "Petrov")))
    assert(run(ivanPetr,
      """{:find [name] :where [[(number? name)]]
         :args [{:name "Ivan"} {:name "Petr"}]}""").isEmpty)
    assert(run(ivanPetr,
      """{:find [name] :where [(not [(string? name)])]
         :args [{:name "Ivan"} {:name "Petr"}]}""").isEmpty)
    // range constraints on args
    assert(run(ivanPetr,
      """{:find [age] :where [[(>= age 21)]] :args [{:age 20}]}""").isEmpty)
    assert(run(ivanPetr,
      """{:find [age] :where [[(>= age 21)]] :args [{:age 22}]}""") == Set(Seq(22L)))
  }

  test("args and :in combine by unification (query_test.clj:287)") {
    assert(run(ivanPetr,
      """{:find [x] :in [[x ...]] :args [{:x 1} {:x 2}]}""", Seq(2L, 3L)) ==
      Set(Seq(2L)))
  }

  test("where clause is optional with :in (query_test.clj:283)") {
    assert(run(ivanPetr, """{:find [x] :in [x]}""", 1L) == Set(Seq(1L)))
  }

  test("in-binding vars must be distinct (query_test.clj:293)") {
    assertThrows[IllegalArgumentException] {
      run(ivanPetr, """{:find [x] :in [[x x]]}""", Seq(Seq(1L, 1L)))
    }
  }

  // ----------------------------------------------- joins / keywords / blanks

  test("multiple results (query_test.clj:301)") {
    val s = src(":p1" -> Map("name" -> "Ivan", "last-name" -> "1"),
      ":p2" -> Map("name" -> "Ivan", "last-name" -> "2"))
    assert(count(s, """{:find [e] :where [[e :name "Ivan"]]}""") == 2)
  }

  test("query using keyword values (query_test.clj:307)") {
    val s = src(":p1" -> Map("name" -> "Ivan", "sex" -> ":male"),
      ":p2" -> Map("name" -> "Petr", "sex" -> ":male"),
      ":p3" -> Map("name" -> "Doris", "sex" -> ":female"),
      ":p4" -> Map("name" -> "Jane", "sex" -> ":female"))
    assert(run(s, """{:find [name] :where [[e :name name] [e :sex :male]]}""") ==
      Set(Seq("Ivan"), Seq("Petr")))
    assert(run(s, """{:find [name] :where [[e :name name] [e :sex :female]]}""") ==
      Set(Seq("Doris"), Seq("Jane")))
  }

  test("join across entities (query_test.clj:332)") {
    val s = src(
      ":p1" -> Map("name" -> "Ivan", "age" -> 21L, "salary" -> 100L),
      ":p2" -> Map("name" -> "Petr", "age" -> 22L, "salary" -> 100L),
      ":p3" -> Map("name" -> "Sergei", "age" -> 23L, "salary" -> 100L),
      ":p4" -> Map("name" -> "Denis", "age" -> 24L, "salary" -> 100L),
      ":p5" -> Map("name" -> "Denis", "age" -> 25L, "salary" -> 100L))
    assert(count(s, """{:find [p1] :where [[p1 :name name] [p1 :age age] [p1 :salary salary]]}""") == 5)
    // cartesian product without unification
    assert(count(s, """{:find [p1 p2] :where [[p1 :name] [p2 :name]]}""") == 25)
    assert(count(s, """{:find [p1 p2] :where [[p1 :name "Ivan"] [p2 :name]]}""") == 5)
    assert(count(s, """{:find [p1] :where [[p1 :name "Ivan"] [p2 :name "does-not-match"]]}""") == 0)
    // every person joins once, plus 2 more Denis-Denis matches
    assert(count(s, """{:find [p1 p2] :where [[p1 :name name] [p2 :name name]]}""") == 7)
  }

  test("join over two attributes (query_test.clj:362)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
      ":petr" -> Map("name" -> "Petr", "follows" -> Set("Ivanov")))
    assert(run(s, """{:find [e2] :where [[e :last-name last-name] [e2 :follows last-name] [e :name "Ivan"]]}""") ==
      Set(Seq(":petr")))
  }

  test("blanks (query_test.clj:371)") {
    val s = src(":p1" -> Map("name" -> "Ivan"), ":p2" -> Map("name" -> "Petr"),
      ":p3" -> Map("name" -> "Sergei"))
    assert(run(s, """{:find [name] :where [[_ :name name]]}""") ==
      Set(Seq("Ivan"), Seq("Petr"), Seq("Sergei")))
  }

  test("exceptions on unknown variables (query_test.clj:378)") {
    assertThrows[IllegalArgumentException] {
      run(ivanPetr, """{:find [bah] :where [[e :name]]}""")
    }
    assertThrows[IllegalArgumentException] {
      run(ivanPetr, """{:find [x] :where [[x :name] [(+ 1 bah)]]}""")
    }
    assertThrows[IllegalArgumentException] {
      run(ivanPetr, """{:find [e] :where [[e :name v] [(> 2 x)]]}""")
    }
  }

  // ------------------------------------------------------------- not / or

  private lazy val notFixture = src(
    ":ivan-ivanov-1" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":ivan-ivanov-2" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":ivan-ivanovtov-1" -> Map("name" -> "Ivan", "last-name" -> "Ivannotov"))

  test("not with literal v (query_test.clj:446)") {
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"] (not [e :last-name "Ivanov"])]}""") == 1)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] (not [e :last-name "Ivanov"])]}""") == 1)
    assert(count(notFixture,
      """{:find [e] :where [[e :name "Ivan"] (not [e :last-name "Ivanov"])]}""") == 1)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"] (not [e :last-name "Ivannotov"])]}""") == 2)
    // multiple clauses in not
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"]
                            (not [e :last-name "Ivannotov"] [e :name "Ivan"])]}""") == 2)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"]
                            (not [e :last-name "Ivannotov"] [(string? name)])]}""") == 2)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"]
                            (not [e :last-name "Ivannotov"] [(number? name)])]}""") == 3)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"]
                            (not [e :last-name "Ivannotov"] [e :name "Bob"])]}""") == 3)
  }

  test("not with variable v and literal entities (query_test.clj:504)") {
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"] (not [e :name name])]}""") == 0)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] (not [e :name name])]}""") == 0)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] [:ivan-ivanovtov-1 :last-name i-name]
                            (not [e :last-name i-name])]}""") == 2)
    assert(count(notFixture,
      """{:find [e] :where [[e :name name] (not [:ivan-ivanov-1 :name name])]}""") == 0)
    assert(count(notFixture,
      """{:find [e] :where [[e :last-name last-name] (not [:ivan-ivanov-1 :last-name last-name])]}""") == 1)
  }

  private lazy val orFixture = src(
    ":p1" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":p2" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":p3" -> Map("name" -> "Ivan", "last-name" -> "Ivannotov"),
    ":p4" -> Map("name" -> "Bob", "last-name" -> "Controlguy"))

  test("or query (query_test.clj:527)") {
    assert(count(orFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"]
                            (or [e :last-name "Ivanov"] [e :last-name "Ivannotov"])]}""") == 3)
    assert(count(orFixture,
      """{:find [e] :where [(or [e :last-name "Ivanov"] [e :last-name "Ivannotov"]
                                [e :last-name "Controlguy"])]}""") == 4)
    assert(count(orFixture,
      """{:find [e] :where [(or [e :last-name "Controlguy"])
                            (or [e :last-name "Ivanov"] [e :last-name "Ivannotov"])]}""") == 0)
    assert(count(orFixture,
      """{:find [e] :where [(or [e :last-name "Ivanov"]) (or [e :last-name "Ivannotov"])]}""") == 0)
    assert(count(orFixture,
      """{:find [e] :where [[e :last-name "Controlguy"]
                            (or [e :last-name "Ivanov"] [e :last-name "Ivannotov"])]}""") == 0)
    assert(count(orFixture,
      """{:find [e] :where [[e :name name] (or [e :last-name "Ivanov"] [e :name "Bob"])]}""") == 3)
    // single-clause or
    assert(count(orFixture,
      """{:find [e] :where [[e :name name] [e :name "Ivan"] (or [e :last-name "Ivanov"])]}""") == 2)
  }

  test("or with and-branch binding a default (query_test.clj:581)") {
    assert(run(orFixture,
      """{:find [name l]
         :where [[e :name name] [e :name "Ivan"]
                 (or (and [e :last-name "Ivanov"] [e :last-name l])
                     (and [(identity e)] [(identity :optional) l]))]}""") ==
      Set(Seq("Ivan", "Ivanov"), Seq("Ivan", ":optional")))
  }

  test("or can use and (query_test.clj:588)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "sex" -> ":male"),
      ":bob" -> Map("name" -> "Bob", "sex" -> ":male"),
      ":ivana" -> Map("name" -> "Ivana", "sex" -> ":female"))
    assert(run(s,
      """{:find [name] :where [[e :name name]
                               (or [e :sex :female] (and [e :sex :male] [e :name "Ivan"]))]}""") ==
      Set(Seq("Ivan"), Seq("Ivana")))
    assert(run(s, """{:find [e] :where [(or [e :name "Ivan"])]}""") == Set(Seq(":ivan")))
    assert(run(s,
      """{:find [name] :where [[e :name name] (or (and [e :sex :female] [e :name "Ivan"]))]}""").isEmpty)
  }

  test("ors must use same vars (query_test.clj:611)") {
    assertThrows[IllegalArgumentException] {
      run(ivanPetr,
        """{:find [e] :where [[e :name name]
                              (or [e1 :last-name "Ivanov"] [e2 :last-name "Ivanov"])]}""")
    }
    assertThrows[IllegalArgumentException] {
      run(ivanPetr,
        """{:find [x] :where [(or-join [x] [e1 :last-name "Ivanov"])]}""")
    }
  }

  test("ors can introduce new bindings (query_test.clj:627)") {
    val s = src(":petr" -> Map("name" -> "Petr", "last-name" -> "Smith", "sex" -> ":male"),
      ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "sex" -> ":male"),
      ":ivanova" -> Map("name" -> "Ivanova", "last-name" -> "Ivanov", "sex" -> ":female"))
    assert(run(s,
      """{:find [?p2] :where [(or (and [?p2 :name "Petr"] [?p2 :sex :female])
                                  (and [?p2 :last-name "Ivanov"] [?p2 :sex :male]))]}""") ==
      Set(Seq(":ivan")))
  }

  test("not-join (query_test.clj:639)") {
    val s = src(":p1" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
      ":p2" -> Map("name" -> "Malcolm", "last-name" -> "Ofsparks"),
      ":p3" -> Map("name" -> "Dominic", "last-name" -> "Monroe"))
    assert(run(s,
      """{:find [name] :where [[e :name name] (not-join [e] [e :last-name "Monroe"])]}""") ==
      Set(Seq("Ivan"), Seq("Malcolm")))
    assert(run(s,
      """{:find [name] :where [[e :name name]
                               (not-join [e] [e :last-name last-name] [(= last-name "Monroe")])]}""") ==
      Set(Seq("Ivan"), Seq("Malcolm")))
    assert(run(s,
      """{:find [name] :where [[e :name name]
                               (not-join [e] [e :last-name last-name] [(not= last-name "Monroe")])]}""") ==
      Set(Seq("Dominic")))
  }

  test("mixing not and or (query_test.clj:665)") {
    val s = src(":p1" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
      ":p2" -> Map("name" -> "Derek", "last-name" -> "Ivanov"),
      ":p3" -> Map("name" -> "Bob", "last-name" -> "Ivannotov"),
      ":p4" -> Map("name" -> "Fred", "last-name" -> "Ivannotov"))
    assert(run(s,
      """{:find [name] :where [[e :name name] (or [e :last-name "Ivanov"] (not [e :name "Bob"]))]}""") ==
      Set(Seq("Ivan"), Seq("Derek"), Seq("Fred")))
    assert(run(s,
      """{:find [name] :where [[e :name name] (not (or [e :last-name "Ivanov"] [e :name "Bob"]))]}""") ==
      Set(Seq("Fred")))
  }

  // ------------------------------------------------- predicate expressions

  private lazy val predFixture = src(
    ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "age" -> 30L),
    ":bob" -> Map("name" -> "Bob", "last-name" -> "Ivanov", "age" -> 40L),
    ":dominic" -> Map("name" -> "Dominic", "last-name" -> "Monroe", "age" -> 50L))

  test("predicate expressions: ranges and var-var (query_test.clj:684)") {
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [e :age age] [(< age 50)]]}""") ==
      Set(Seq("Ivan"), Seq("Bob")))
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [e :age age] [(>= age 50)]]}""") ==
      Set(Seq("Dominic")))
    assert(count(predFixture,
      """{:find [name age1 name2 age2]
         :where [[e :name name] [e :age age1] [e2 :name name2] [e2 :age age2]
                 [(<= age1 age2)]]}""") == 6)
    assert(run(predFixture,
      """{:find [name1 name2] :where [[e :name name1] [e2 :name name2] [(> name1 name2)]]}""") ==
      Set(Seq("Ivan", "Dominic"), Seq("Ivan", "Bob"), Seq("Dominic", "Bob")))
  }

  test("predicate expressions: re-find, entity var, several vars (query_test.clj:724)") {
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [(re-find #"o" name)]]}""") ==
      Set(Seq("Bob"), Seq("Dominic")))
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [(re-find #"X" name)]]}""").isEmpty)
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] (not [(re-find #"o" name)])]}""") ==
      Set(Seq("Ivan")))
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [(= :ivan e)]]}""") == Set(Seq("Ivan")))
    assert(run(predFixture,
      """{:find [e] :where [[e :last-name last-name] [(= "Ivanov" last-name)]]}""") ==
      Set(Seq(":bob"), Seq(":ivan")))
    assert(run(predFixture,
      """{:find [e] :where [[e :last-name last-name] [e :age age]
                            [(= "Ivanov" last-name)] [(= 30 age)]]}""") == Set(Seq(":ivan")))
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [e :age age] [(= 40 age)]
                               [(re-find #"o" name)] [(not= age name)]]}""") == Set(Seq("Bob")))
    assert(run(predFixture,
      """{:find [e last-name] :where [[e :last-name last-name] [e :age age]
                                      [(re-find #"ov$" last-name)] (not [(= age 30)])]}""") ==
      Set(Seq(":bob", "Ivanov")))
    assert(run(predFixture,
      """{:find [name] :where [[e :name name] [e :age age]
                               [(re-find #"o" name)] [(= age name)]]}""").isEmpty)
  }

  test("predicate return bindings (query_test.clj:784)") {
    assert(run(predFixture,
      """{:find [name half-age] :where [[e :name name] [e :age age] [(quot age 2) half-age]]}""") ==
      Set(Seq("Dominic", 25L), Seq("Ivan", 15L), Seq("Bob", 20L)))
    // join order rearranged so arguments are bound
    assert(run(predFixture,
      """{:find [name half-age] :where [[e :name name] [e :age real-age]
                                        [(quot real-age 2) half-age]]}""") ==
      Set(Seq("Dominic", 25L), Seq("Ivan", 15L), Seq("Bob", 20L)))
    // binding more than once intersects
    assert(run(predFixture,
      """{:find [name half-age] :where [[e :name name] [e :age real-age]
                                        [(quot real-age 2) half-age]
                                        [(- real-age 15) half-age]]}""") ==
      Set(Seq("Ivan", 15L)))
    // bound result feeds a range predicate
    assert(run(predFixture,
      """{:find [name half-age] :where [[e :name name] [e :age real-age]
                                        [(quot real-age 2) half-age] [(> half-age 20)]]}""") ==
      Set(Seq("Dominic", 25L)))
  }

  // --------------------------------------------- multi-valued attributes

  private lazy val friendsFixture = src(
    ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "age" -> 30L,
      "friends" -> Set(":bob", ":dominic")),
    ":bob" -> Map("name" -> "Bob", "last-name" -> "Ivanov", "age" -> 40L,
      "friends" -> Set(":ivan", ":dominic")),
    ":dominic" -> Map("name" -> "Dominic", "last-name" -> "Monroe", "age" -> 50L,
      "friends" -> Set(":bob")))

  test("attributes with multiple values (query_test.clj:814)") {
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f]]}""") ==
      Set(Seq(":bob"), Seq(":dominic")))
    assert(run(friendsFixture,
      """{:find [i] :where [[i :name "Ivan"] [i :friends :bob]]}""") == Set(Seq(":ivan")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [d :name "Dominic"] [d :friends f]]}""") ==
      Set(Seq(":bob")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [(= f :bob)]]}""") == Set(Seq(":bob")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [(not= f :bob)]]}""") ==
      Set(Seq(":dominic")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [(== f :bob)]]}""") == Set(Seq(":bob")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [(== f #{:bob :dominic})]]}""") ==
      Set(Seq(":bob"), Seq(":dominic")))
    assert(run(friendsFixture,
      """{:find [f] :where [[i :name "Ivan"] [i :friends f] [(!= f :bob)]]}""") ==
      Set(Seq(":dominic")))
    assert(run(friendsFixture,
      """{:find [i f] :where [[i :name "Ivan"] [i :friends f] (not [(= f :bob)])]}""") ==
      Set(Seq(":ivan", ":dominic")))
  }

  // ------------------------------------------------- idents / join bugs

  private lazy val mentorFixture = src(
    ":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"),
    ":petr" -> Map("name" -> "Petr", "last-name" -> "Petrov", "mentor" -> ":ivan"))

  test("idents as entities (query_test.clj:878)") {
    assert(run(mentorFixture, """{:find [p] :where [[i :name "Ivan"] [p :mentor i]]}""") ==
      Set(Seq(":petr")))
    assert(run(mentorFixture, """{:find [p] :where [[p :mentor i] [i :name "Ivan"]]}""") ==
      Set(Seq(":petr")))
    assert(run(mentorFixture, """{:find [n] :where [[:ivan :name n]]}""") == Set(Seq("Ivan")))
    assert(run(mentorFixture, """{:find [n] :where [[:petr :mentor i] [i :name n]]}""") ==
      Set(Seq("Ivan")))
    assert(run(mentorFixture,
      """{:find [n] :where [[p :name "Petr"] [p :mentor i] [i :name n]]}""") == Set(Seq("Ivan")))
    assert(run(mentorFixture, """{:find [n] :where [[p :mentor i] [i :name n]]}""") ==
      Set(Seq("Ivan")))
    assert(run(mentorFixture, """{:find [i] :where [[p :name "Petr"] [p :mentor i]]}""") ==
      Set(Seq(":ivan")))
    assert(run(mentorFixture, """{:find [n] :where [[i :name n] [:petr :mentor i]]}""") ==
      Set(Seq("Ivan")))
    assert(run(mentorFixture, """{:find [n] :where [[:ivan :mentor x] [x :name n]]}""").isEmpty)
    assert(run(mentorFixture, """{:find [n] :where [[x :name n] [:ivan :mentor x]]}""").isEmpty)
    // literal entity and literal value
    assert(run(mentorFixture,
      """{:find [found?] :where [[:ivan :name "Ivan"] [(identity true) found?]]}""") ==
      Set(Seq(true)))
    assert(run(mentorFixture,
      """{:find [found?] :where [[:ivan :name "Bob"] [(identity true) found?]]}""").isEmpty)
  }

  test("join and seek bugs (query_test.clj:936)") {
    for (q <- Seq(
      """{:find [i] :where [[p :name "Petrov"] [p :mentor i]]}""",
      """{:find [p] :where [[p :name "Pet"]]}""",
      """{:find [p] :where [[p :name "I"]]}""",
      """{:find [p] :where [[p :name "Petrov"]]}""",
      """{:find [i] :where [[p :name "Pet"] [p :mentor i]]}""",
      """{:find [p] :where [[p :name "Ivan"] [p :mentor i]]}""",
      """{:find [i] :where [[p :name "Ivan"] [p :mentor i]]}"""))
      assert(run(mentorFixture, q).isEmpty, q)
  }

  test("queries with variables only (query_test.clj:972)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "mentor" -> ":petr"),
      ":petr" -> Map("name" -> "Petr", "mentor" -> ":oleg"),
      ":oleg" -> Map("name" -> "Oleg", "mentor" -> ":ivan"))
    assert(run(s,
      """{:find [e1 n1 e2 n2] :where [[e1 :name n1] [e2 :mentor e1] [e2 :name n2]]}""") ==
      Set(Seq(":oleg", "Oleg", ":petr", "Petr"),
        Seq(":ivan", "Ivan", ":oleg", "Oleg"),
        Seq(":petr", "Petr", ":ivan", "Ivan")))
  }

  test("index unification (query_test.clj:984)") {
    assert(run(mentorFixture,
      """{:find [p1 p2] :where [[p1 :name "Petr"] [p2 :mentor i] [(== p1 p2)]]}""") ==
      Set(Seq(":petr", ":petr")))
    assert(run(mentorFixture,
      """{:find [p1 p2] :where [[p1 :name "Petr"] [p2 :mentor i] [(== p1 i)]]}""").isEmpty)
    assert(run(mentorFixture,
      """{:find [p1 p2] :where [[p1 :name "Petr"] [p2 :mentor i] [(!= p1 i)]]}""") ==
      Set(Seq(":petr", ":petr")))
    assert(run(mentorFixture,
      """{:find [p1 p2] :where [[p1 :name "Petr"] [p2 :mentor i] [(!= p1 p2)]]}""").isEmpty)
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name "Petr"] [p :mentor i] [(== p i)]]}""").isEmpty)
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(== n "Petr")]]}""") == Set(Seq(":petr")))
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(!= n "Petr")]]}""") == Set(Seq(":ivan")))
    assert(run(mentorFixture,
      """{:find [n] :where [[p :name n] [(== p :petr)]]}""") == Set(Seq("Petr")))
    assert(run(mentorFixture,
      """{:find [n] :where [[i :name n] [(!= i :petr)]]}""") == Set(Seq("Ivan")))
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(== n #{"Petr" "Ivan"})]]}""") ==
      Set(Seq(":petr"), Seq(":ivan")))
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(!= n #{"Petr"})]]}""") == Set(Seq(":ivan")))
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(== n #{})]]}""").isEmpty)
    assert(run(mentorFixture,
      """{:find [p] :where [[p :name n] [(!= n #{})]]}""") ==
      Set(Seq(":petr"), Seq(":ivan")))
  }

  // ------------------------------------------------------------ get-attr

  test("get-attr (query_test.clj:1054)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "age" -> 21L,
      "friends" -> Set(":petr", ":oleg")))
    assert(run(s,
      """{:find [e age] :where [[e :name "Ivan"] [(get-attr e :age) [age ...]]]}""") ==
      Set(Seq(":ivan", 21L)))
    assert(run(s,
      """{:find [e age] :where [[e :name "Oleg"] [(get-attr e :age) [age ...]]]}""").isEmpty)
    assert(run(s,
      """{:find [e age] :where [[e :name "Ivan"] [(get-attr e :age) [age ...]] [(> age 30)]]}""").isEmpty)
    assert(run(s,
      """{:find [e friend] :where [[e :name "Ivan"] [(get-attr e :friends) [friend ...]]]}""") ==
      Set(Seq(":ivan", ":petr"), Seq(":ivan", ":oleg")))
    assert(run(s,
      """{:find [e email] :where [[e :name "Ivan"] [(get-attr e :email) [email ...]]]}""").isEmpty)
    // optional found attribute: default ignored when present
    assert(run(s,
      """{:find [e age] :where [[e :name "Ivan"] [(get-attr e :age 0) [age ...]]]}""") ==
      Set(Seq(":ivan", 21L)))
    // use as predicate
    assert(run(s,
      """{:find [e] :where [[e :name "Ivan"] [(get-attr e :name)]]}""") == Set(Seq(":ivan")))
    assert(run(s,
      """{:find [e] :where [[e :name "Ivan"] [(get-attr e :email)]]}""").isEmpty)
    // optional not-found attribute: default binds
    assert(run(s,
      """{:find [e email] :where [[e :name "Ivan"] [(get-attr e :email "N/A") [email ...]]]}""") ==
      Set(Seq(":ivan", "N/A")))
    assert(run(s,
      """{:find [e email] :where [[e :name "Ivan"] [(get-attr e :email nil) [email ...]]]}""") ==
      Set(Seq(":ivan", null)))
  }

  // ------------------------------------------------------- numeric ranges

  test("simple numeric range search incl. inversion edge cases #612 (query_test.clj:1439)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "age" -> 21L),
      ":petr" -> Map("name" -> "Petr", "last-name" -> "Petrov", "age" -> 18L))
    assert(run(s, """{:find [i] :where [[i :age age] [(> age 20)]]}""") == Set(Seq(":ivan")))
    assert(run(s, """{:find [i] :where [[i :age age] [(> age 21)]]}""").isEmpty)
    assert(run(s, """{:find [i] :where [[i :age age] [(>= age 21)]]}""") == Set(Seq(":ivan")))
    assert(run(s, """{:find [i] :where [[i :age age] [(< age 20)]]}""") == Set(Seq(":petr")))
    assert(run(s, """{:find [i] :where [[i :age age] [(< age 18)]]}""").isEmpty)
    assert(run(s, """{:find [i] :where [[i :age age] [(<= age 18)]]}""") == Set(Seq(":petr")))
    assert(run(s, """{:find [age] :where [[:petr :age age] [(<= age 18)]]}""") == Set(Seq(18L)))
    // reversed symbol and value
    assert(run(s, """{:find [i] :where [[i :age age] [(<= 20 age)]]}""") == Set(Seq(":ivan")))
    assert(run(s, """{:find [i] :where [[i :age age] [(>= 20 age)]]}""") == Set(Seq(":petr")))
    assert(run(s, """{:find [i] :where [[i :age age] [(<= 21 age)]]}""") == Set(Seq(":ivan")))
    assert(run(s, """{:find [i] :where [[i :age age] [(> 18 age)]]}""").isEmpty)
  }

  test("multiple values / sanitise join (query_test.clj:1490)") {
    val s = src(":ivan" -> Map("name" -> "Ivan"),
      ":oleg" -> Map("name" -> "Oleg"),
      ":petr" -> Map("name" -> "Petr", "follows" -> Set(":ivan", ":oleg")))
    assert(run(s, """{:find [x] :where [[i :name "Petr"] [i :follows x]]}""") ==
      Set(Seq(":ivan"), Seq(":oleg")))
    assert(run(s, """{:find [i] :where [[x :name "Ivan"] [i :follows x]]}""") ==
      Set(Seq(":petr")))
    val s2 = src(":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"))
    assert(run(s2,
      """{:find [e2] :where [[e :last-name "Ivanov"] [e :last-name name1] [e2 :last-name name1]]}""") ==
      Set(Seq(":ivan")))
  }
}
