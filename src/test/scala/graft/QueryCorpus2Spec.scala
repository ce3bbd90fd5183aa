package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Ports of the reference's Datalog e2e corpus, tranche 3 — the
  * GitHub-issue regression deftests and the remaining Racket-Datalog
  * examples from crux-test/test/crux/query_test.clj.
  *
  * `test-racket-datalog-fib` is ported below (r4): pure-computation
  * recursive rules evaluate per binding, top-down and memoized
  * (Planner.evalTopDown), exactly the reference's execution model for
  * rules with no data clauses.
  *
  * Not ported (documented deviations):
  *  - `datascript-test-issue-180` (`[(?pred ?a)]` var in fn position):
  *    predicate symbols are compile-time here.
  *  - `hashing-quoted-lists-1197`: list VALUES are exploded to
  *    multi-valued facts in the quad model, not hashed as one value.
  *  - lazy/open-q index-order assertions in
  *    `range-constraint-ordering-behaviours` (result order without
  *    :order-by is undefined over a shuffled relation; the eager set
  *    semantics are ported).
  */
class QueryCorpus2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import org.apache.spark.sql.types._
  import scala.jdk.CollectionConverters._

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

  /** Unwrap tagged mixed-family structs back to their value. */
  private def decode(v: Any): Any = v match {
    case r: Row if r.schema != null &&
        r.schema.fieldNames.sameElements(Array("t", "b", "n", "d", "s")) =>
      (r.getAs[Integer]("t"): Any) match {
        case null => null
        case 4 => r.get(1)
        case 5 => r.get(2)
        case 7 => r.get(3)
        case 8 => r.get(4)
      }
    case other => other
  }

  private def run(s: QuadSource, q: String, args: Any*): Set[Seq[Any]] =
    Planner.q(spark, s, q, args: _*).collect().toSet[Row].map(_.toSeq.map(decode))

  private def runList(s: QuadSource, q: String, args: Any*): Seq[Seq[Any]] =
    Planner.q(spark, s, q, args: _*).collect().toSeq.map(_.toSeq.map(decode))

  private val empty = src()

  // -------------------------------------------------- racket datalog

  private lazy val edges = src(
    ":a" -> Map("edge" -> ":b"), ":b" -> Map("edge" -> ":c"),
    ":c" -> Map("edge" -> ":d"), ":d" -> Map("edge" -> ":a"))

  private val allPairs: Set[Seq[Any]] =
    (for (x <- Seq(":a", ":b", ":c", ":d"); y <- Seq(":a", ":b", ":c", ":d"))
      yield Seq[Any](x, y)).toSet

  test("racket datalog path — right recursion (query_test.clj:3013)") {
    assert(run(edges,
      """{:find [x y] :where [(path x y)]
         :rules [[(path x y) [x :edge y]]
                 [(path x y) [x :edge z] (path z y)]]}""") == allPairs)
  }

  test("racket datalog revpath — left recursion (query_test.clj:3048)") {
    assert(run(edges,
      """{:find [x y] :where [(path x y)]
         :rules [[(path x y) [x :edge y]]
                 [(path x y) (path x z) [z :edge y]]]}""") == allPairs)
  }

  // ------------------------------------------------ issue regressions

  test("query limits, bug #71 (query_test.clj:1740)") {
    val s = src(":p1" -> Map("last-name" -> "Ivanov"),
      ":p2" -> Map("last-name" -> "Petrov"), ":p3" -> Map("last-name" -> "Ivanov"))
    assert(Planner.q(spark, s,
      """{:find [l] :where [[_ :last-name l]] :limit 2}""").count() == 2)
  }

  test("self-join, bug #93 (query_test.clj:1752)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "friend" -> ":ivan", "boss" -> ":petr"),
      ":petr" -> Map("name" -> "Petr"))
    assert(run(s, """{:find [b] :where [[e :friend e] [e :boss b]]}""") ==
      Set(Seq(":petr")))
  }

  test("or-join with non-existing attribute and mixed types, bug #146 (query_test.clj:1761)") {
    val inst1980 = java.time.LocalDateTime.of(1980, 1, 1, 0, 0)
    val s = src(
      ":ivan" -> Map("name" -> "Ivan", "extra" -> "Petr", "age" -> 20L),
      ":oleg" -> Map("name" -> "Oleg", "extra" -> inst1980, "age" -> 30L),
      ":petr" -> Map("name" -> "Petr", "age" -> 40L))
    val res = run(s,
      """{:find [n x a e]
         :where [[e :name n] [e :age a] [e :crux.db/id e]
                 (or-join [e x]
                          [e :extra x]
                          (and [(identity :none) x] (not [e :extra])))]}""")
    val ts1980 = java.sql.Timestamp.from(java.time.Instant.parse("1980-01-01T00:00:00Z"))
    assert(res == Set(
      Seq("Ivan", "Petr", 20L, ":ivan"),
      Seq("Oleg", ts1980, 30L, ":oleg"),
      Seq("Petr", ":none", 40L, ":petr")))
  }

  test("args never matching any facts, bug #247 (query_test.clj:1781)") {
    assert(run(empty,
      """{:find [?x] :where [[?x :name]] :args [{:?x "Clojure"}]}""").isEmpty)
  }

  test("empty args map, bug #314 (query_test.clj:1787)") {
    assert(run(empty,
      """{:find [e] :where [[e :crux.db/id _]] :args [{}]}""").isEmpty)
  }

  test("or over equal stringified bindings, bug #949 (query_test.clj:1727)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "age" -> 30L))
    assert(run(s,
      """{:find [e name]
         :where [[e :name name] [(get-attr e :age) age]
                 (or [(= x y)])
                 [(str age) x] [(str age) y]]}""") == Set(Seq(":ivan", "Ivan")))
  }

  test("failing predicates at top level regardless of order (query_test.clj:3145)") {
    assert(run(empty,
      """{:find [f] :where [[(identity 4) f] [(identity false)]]}""").isEmpty)
    assert(run(empty,
      """{:find [f] :where [[(identity false)] [(identity 4) f]]}""").isEmpty)
  }

  test("literal rule arguments, bug #507 (query_test.clj:3159)") {
    assert(run(empty,
      """{:find [f] :where [(foo 4 f)]
         :rules [[(foo n f) [(<= 6 n)] [(identity n) f]]]}""").isEmpty)
    // predicates work for non-numeric comparables too
    assert(run(empty,
      """{:find [f] :where [(foo #inst "2019" f)]
         :rules [[(foo n f) [(<= #inst "2020" n)] [(identity n) f]]]}""").isEmpty)
  }

  test("function returns bind to falsy values (query_test.clj:2844)") {
    assert(run(empty, """{:find [b] :where [[(identity false) b]]}""") ==
      Set(Seq(false)))
    assert(run(empty, """{:find [b] :where [[(identity nil) b]]}""") ==
      Set(Seq(null)))
    assert(run(empty, """{:find [b] :where [[(identity true) b]]}""") ==
      Set(Seq(true)))
  }

  test("any value as entity id — opaque string ids (query_test.clj:2862)") {
    // crux ids are opaque (codec.clj:540-608); non-keyword ids are carried
    // as their canonical string form here
    val s = src(
      "ivan@example.com" -> Map("name" -> "Ivan"),
      "42" -> Map("name" -> "Petr"),
      "true" -> Map("name" -> "Oleg",
        "friends" -> Seq("ivan@example.com", "42", "3.14")),
      "3.14" -> Map("name" -> "Pi", "boss" -> "ivan@example.com"))
    assert(run(s, """{:find [name] :where [["ivan@example.com" :name name]]}""") ==
      Set(Seq("Ivan")))
    assert(run(s, """{:find [name] :where [["42" :name name]]}""") == Set(Seq("Petr")))
    assert(run(s, """{:find [name] :where [["true" :name name]]}""") == Set(Seq("Oleg")))
    assert(run(s, """{:find [name] :where [["3.14" :name name]]}""") == Set(Seq("Pi")))
    assert(run(s,
      """{:find [boss name] :where [[boss :name name] [pi :boss boss] [pi :name "Pi"]]}""") ==
      Set(Seq("ivan@example.com", "Ivan")))
    assert(run(s,
      """{:find [name] :where [["true" :friends f] [f :name name]]}""") ==
      Set(Seq("Ivan"), Seq("Petr"), Seq("Pi")))
  }

  test("keyword id to entity transition, bug #351 (query_test.clj:3336)") {
    val s = src(
      ":se.id/ASE" -> Map("se/currency" -> ":currency/usd"),
      ":ids/ticker-1000" -> Map("ticker/price" -> 67L,
        "ticker/market" -> ":se.id/ASE", "ticker/foo" -> ":bar"))
    assert(run(s,
      """{:find [p]
         :where [[e :crux.db/id someid] [e :ticker/price p] [(= p 67)]
                 [e :ticker/market m2] [m2 :se/currency :currency/usd]]}""").nonEmpty)
  }

  test("order-by var must be returned from :find, bug #418 (query_test.clj:3352)") {
    val s = src(":one" -> Map("val" -> 1L), ":two" -> Map("val" -> 2L),
      ":three" -> Map("val" -> 3L))
    assert(runList(s,
      """{:find [e v] :where [[x :crux.db/id e] [x :val v]]
         :order-by [[v :desc]]}""").map(_.head) == Seq(":three", ":two", ":one"))
    assert(runList(s,
      """{:find [e v] :where [[x :crux.db/id e] [x :val v]]
         :order-by [[v :asc]]}""").map(_.head) == Seq(":one", ":two", ":three"))
    assertThrows[IllegalArgumentException] {
      runList(s,
        """{:find [e] :where [[x :crux.db/id e] [x :val v]] :order-by [[v :asc]]}""")
    }
  }

  test("nil attribute in a clause is malformed, bug #453 (query_test.clj:3403)") {
    assertThrows[IllegalArgumentException] {
      run(src(":id" -> Map("this" -> ":that")), """{:find [e] :where [[_ nil e]]}""")
    }
  }

  test("range predicate against Long/MIN_VALUE, bug #545 (query_test.clj:3433)") {
    assert(run(empty,
      """{:find [offset] :where [[e :offset offset] [(> offset -9223372036854775808)]] :limit 1}""").isEmpty)
    assert(run(empty,
      """{:find [offset] :where [[e :offset offset] [(= e :foo)]] :limit 1}""").isEmpty)
  }

  test("result cardinality: set unless ordered, bag when ordered, bug #972 (query_test.clj:3449)") {
    val s = src(
      ":ii" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "age" -> 20L),
      ":pp" -> Map("name" -> "Petr", "last-name" -> "Petrov", "age" -> 20L),
      ":ip" -> Map("name" -> "Ivan", "last-name" -> "Petrov", "age" -> 25L),
      ":pi" -> Map("name" -> "Petr", "last-name" -> "Ivanov", "age" -> 30L))
    assert(run(s, """{:find [a] :where [[_ :age a]]}""") ==
      Set(Seq(30L), Seq(25L), Seq(20L)))
    assert(runList(s,
      """{:find [a] :where [[e :age a]] :order-by [[a :desc]]}""") ==
      Seq(Seq(30L), Seq(25L), Seq(20L), Seq(20L)))
  }

  test("args rows with nil values unify with nil facts, bug #697 (query_test.clj:3469)") {
    val s = src(
      ":foo-some-bar-nil" -> Map("bar" -> null, "foo" -> true),
      ":foo-nil-bar-some" -> Map("bar" -> true, "foo" -> null),
      ":foo-some-bar-some" -> Map("foo" -> true, "bar" -> true))
    assert(run(s,
      """{:find [e] :where [[e :foo f] [e :bar g]]
         :args [{f true, g true} {f true, g nil} {f nil, g true}]}""") ==
      Set(Seq(":foo-some-bar-nil"), Seq(":foo-nil-bar-some"), Seq(":foo-some-bar-some")))
  }

  test("binds against false and nil args, bug #885 (query_test.clj:3497)") {
    val s = src(
      ":foo" -> Map("name" -> "foo", "flag?" -> false),
      ":bar" -> Map("name" -> "bar", "flag?" -> true),
      ":baz" -> Map("name" -> "baz", "flag?" -> null))
    assert(run(s,
      """{:find [?name flag?] :where [[?id :name ?name] [?id :flag? flag?]]
         :args [{flag? false}]}""") == Set(Seq("foo", false)))
    assert(run(s,
      """{:find [?name flag?] :where [[?id :name ?name] [?id :flag? flag?]]
         :args [{flag? true}]}""") == Set(Seq("bar", true)))
    assert(run(s,
      """{:find [?name flag?] :where [[?id :name ?name] [?id :flag? flag?]]
         :args [{flag? nil}]}""") == Set(Seq("baz", null)))
  }

  test("unused args still bind, bug #882 (query_test.clj:3517)") {
    val s = src(":foo" -> Map("name" -> "foo"))
    assert(run(s,
      """{:find [?name foo] :where [[?id :name ?name]] :args [{foo false}]}""") ==
      Set(Seq("foo", false)))
    assert(run(s,
      """{:find [?name foo] :where [[?id :name ?name]] :args [{foo true}]}""") ==
      Set(Seq("foo", true)))
    assert(run(s,
      """{:find [?name foo] :where [[?id :name ?name]] :args [{foo nil}]}""") ==
      Set(Seq("foo", null)))
  }

  test("leaf vars and ors (query_test.clj:3535)") {
    val s = src(":foo" -> Map("field1" -> 1L, "field2" -> 2L))
    assert(run(s,
      """{:find [?id] :where [[?id :field1 ?field1] [?id :field2 ?field2]
                              (or (and [(boolean ?field2)]))]
         :args []}""") == Set(Seq(":foo")))
  }

  test("bound rule vars, bug #946 (query_test.clj:3543)") {
    val chain = (0 until 100).map { id =>
      id.toString -> Map[String, Any]("child" -> (id + 1).toString,
        "name" -> s"$id-${id + 1}")
    }
    val s = src(chain: _*)
    val expected: Set[Seq[Any]] =
      (51 until 100).map(id => Seq[Any](s"$id-${id + 1}")).toSet
    for (rules <- Seq(
      """[[(child-of p c) [p :child c]]
         [(child-of p c) [p :child c1] (child-of c1 c)]]""",
      """[[(child-of [p] c) [p :child c]]
         [(child-of [p] c) [p :child c1] (child-of c1 c)]]"""))
      assert(run(s,
        s"""{:find [child-name]
            :where [[parent :crux.db/id] (child-of parent child) [child :name child-name]]
            :rules $rules
            :args [{:parent "50"}]}""") == expected, rules)
  }

  test("multiple joins with inequality, bug #443 (query_test.clj:3609)") {
    val docs = (for (x <- 0 until 5; y <- 0 until 10)
      yield s":id${x * 1000 + y}" -> Map[String, Any]("x" -> x.toLong, "y" -> y.toLong)) :+
      (":match" -> Map[String, Any]("x" -> 4L, "y" -> 8L))
    val s = src(docs: _*)
    assert(run(s,
      """{:find [e1 e2 x y]
         :where [[e1 :x x] [e1 :y y] [e2 :x x] [e2 :y y] [(!= e1 e2)]]}""") ==
      Set(Seq(":id4008", ":match", 4L, 8L), Seq(":match", ":id4008", 4L, 8L)))
  }

  test("falsey values bind through rules and or-join (query_test.clj:3646)") {
    val s = src(":a" -> Map("att" -> null), ":b" -> Map("att" -> ":foo"),
      ":c" -> Map("att" -> false), ":d" -> Map[String, Any]())
    assert(run(s,
      """{:find [?e]
         :where [[?e :att ?v]
                 [(any? ?v)]
                 (or [(nil? ?v)] [(false? ?v)] [(some? ?v)])
                 (or-join [?v] (is-truthy? ?v) [(!= :foo ?v)])]
         :rules [[(is-false? [?v]) [(false? ?v)]]
                 [(is-nil? [?v]) [(nil? ?v)]]
                 [(is-truthy? [?v]) (not (is-nil? ?v)) (not (is-false? ?v))]]}""") ==
      Set(Seq(":a"), Seq(":b"), Seq(":c")))
  }

  test("nil in entity position yields nothing, bug #1486 (query_test.clj:3699)") {
    val s = src(":e1" -> Map("foo" -> null), ":e2" -> Map("foo" -> null))
    assert(run(s, """{:find [?v] :where [[nil :foo ?v]]}""").isEmpty)
    assert(run(s, """{:find [?v] :where [[#{nil} :foo ?v]]}""").isEmpty)
  }

  test("literal nil only matches nil facts, bug #1487 (query_test.clj:3713)") {
    val s = src(":e1" -> Map("foo" -> null), ":e2" -> Map("foo" -> 2L))
    assert(run(s, """{:find [?e] :where [[?e :foo]]}""") ==
      Set(Seq(":e1"), Seq(":e2")))
    assert(run(s, """{:find [?e] :where [[?e :foo _]]}""") ==
      Set(Seq(":e1"), Seq(":e2")))
    assert(run(s, """{:find [?e] :where [[?e :foo nil]]}""") == Set(Seq(":e1")))
    assert(run(s, """{:find [?e] :where [[?e :foo #{nil}]]}""") == Set(Seq(":e1")))
    assert(run(s, """{:find [?e] :where [[?e :foo #{nil 2}]]}""") ==
      Set(Seq(":e1"), Seq(":e2")))
    assert(run(s, """{:find [?e] :where [[?e :foo #{}]]}""").isEmpty)
  }

  test("range constraint eager set semantics (query_test.clj:3780)") {
    val s = src(
      ":a" -> Map("i" -> -7L, "j" -> 30L),
      ":b" -> Map("i" -> 14L, "j" -> 25L),
      ":c" -> Map("i" -> 14L, "j" -> 14L),
      ":d" -> Map("i" -> 25L, "j" -> 14L),
      ":e" -> Map("i" -> 30L, "j" -> -7L))
    assert(run(s, """{:find [e] :where [[e :i i] [(> i -10)]]}""") ==
      Set(Seq(":a"), Seq(":b"), Seq(":c"), Seq(":d"), Seq(":e")))
    // deduplicated set over the value var
    assert(run(s, """{:find [i] :where [[e :i i] [(> i -10)]]}""") ==
      Set(Seq(-7L), Seq(14L), Seq(25L), Seq(30L)))
    // range constraints combine
    assert(run(s, """{:find [e] :where [[e :i i] [(> i -6)] [(> i -10)] [(< i 24)]]}""") ==
      Set(Seq(":b"), Seq(":c")))
  }

  test("basic rules: args, bound args, nesting, branches, arity errors (query_test.clj:1513)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov", "age" -> 21L),
      ":petr" -> Map("name" -> "Petr", "last-name" -> "Petrov", "age" -> 18L))
    val over21 = """:rules [[(over-twenty-one? age) [(>= age 21)]]]"""
    assert(run(s, s"""{:find [i] :where [[i :age age] (over-twenty-one? age)] $over21}""") ==
      Set(Seq(":ivan")))
    // rules directly on :args
    assert(run(s, s"""{:find [age] :where [(over-twenty-one? age)] :args [{:age 21}] $over21}""") ==
      Set(Seq(21L)))
    assert(run(s, s"""{:find [age] :where [(over-twenty-one? age)] :args [{:age 20}] $over21}""").isEmpty)
    // required-bound args
    assert(run(s, """{:find [i] :where [[i :age age] (over-twenty-one? age)]
      :rules [[(over-twenty-one? [age]) [(>= age 21)]]]}""") == Set(Seq(":ivan")))
    // different variable name from body
    assert(run(s, """{:find [i] :where [[i :age age] (over-twenty-one? age)]
      :rules [[(over-twenty-one? x) [(>= x 21)]]]}""") == Set(Seq(":ivan")))
    // nested rules
    assert(run(s, """{:find [i] :where [[i :age age] (over-twenty-one? age)]
      :rules [[(over-twenty-one? x) (over-twenty-one-internal? x)]
              [(over-twenty-one-internal? y) [(>= y 21)]]]}""") == Set(Seq(":ivan")))
    // multiple arguments
    assert(run(s, """{:find [i] :where [[i :age age] (over-age? age 21)]
      :rules [[(over-age? [age] required-age) [(>= age required-age)]]]}""") ==
      Set(Seq(":ivan")))
    // multiple branches + not over a rule
    assert(run(s, """{:find [i] :where [(is-ivan-or-bob? i)]
      :rules [[(is-ivan-or-bob? i) [i :name "Ivan"] [i :last-name "Ivanov"]]
              [(is-ivan-or-bob? i) [i :name "Bob"]]]}""") == Set(Seq(":ivan")))
    assert(run(s, """{:find [name] :where [[i :name name] (not (is-ivan-or-bob? i))]
      :rules [[(is-ivan-or-bob? i) [i :name "Ivan"]]
              [(is-ivan-or-bob? i) [i :name "Bob"]]]}""") == Set(Seq("Petr")))
    assert(run(s, """{:find [i] :where [(is-ivan-or-petr? i)]
      :rules [[(is-ivan-or-petr? i) [i :name "Ivan"]]
              [(is-ivan-or-petr? i) [i :name "Petr"]]]}""") ==
      Set(Seq(":ivan"), Seq(":petr")))
    // wrong arity is an error
    assertThrows[IllegalArgumentException] {
      run(s, """{:find [i] :where [[i :age age] (over-twenty-one? i age)]
        :rules [[(over-twenty-one? x) [(>= x 21)]]]}""")
    }
    // mismatched arities across branches is an error
    assertThrows[IllegalArgumentException] {
      run(s, """{:find [i] :where [[i :age age] (is-ivan-or-petr? i name)]
        :rules [[(is-ivan-or-petr? i name) [i :name "Ivan"]]
                [(is-ivan-or-petr? i) [i :name "Petr"]]]}""")
    }
  }

  test("lookup by value among many, bug #70 (query_test.clj:1640)") {
    val docs = (":ivan" -> Map[String, Any]("name" -> "Ivan", "last-name" -> "Ivanov",
      "age" -> 30L)) +: (0 until 1000).map(i => s":p$i" -> Map[String, Any]("age" -> 20L))
    val s = src(docs: _*)
    assert(run(s, """{:find [i] :where [[i :age 30]]}""") == Set(Seq(":ivan")))
    assert(Planner.q(spark, s, """{:find [i] :where [[i :age 20]] :limit 1}""").count() == 1)
  }

  test("range + join over small and large sets, bug #348 (query_test.clj:1662)") {
    val docs = (0 until 100).map(n => s":ivan-$n" -> Map[String, Any](
      "name" -> "Ivan", "name1" -> "Ivan", "number-1" -> n.toLong)) ++
      (0 until 2000).map(n => s":oleg-$n" -> Map[String, Any](
        "name" -> "Oleg", "name1" -> "Oleg", "number-2" -> n.toLong))
    val s = src(docs: _*)
    assert(run(s, """{:find [e] :where [[e :number-1 a] [e :name n] [(<= a 50)] [(>= a 50)]]}""") ==
      Set(Seq(":ivan-50")))
    assert(run(s, """{:find [e] :where [[e :number-2 a] [e :name n] [(<= a 500)] [(>= a 500)]]}""") ==
      Set(Seq(":oleg-500")))
  }

  test("range constraint via args, bug #906 (query_test.clj:1701)") {
    val s = src((0 until 2000).map(n => s":oleg-$n" -> Map[String, Any](
      "name" -> "Oleg", "number" -> n.toLong)): _*)
    assert(run(s, """{:find [e] :where [[e :number a] [e :name n] [(>= a 1999)]]}""") ==
      Set(Seq(":oleg-1999")))
    assert(run(s, """{:find [e] :where [[e :number a] [e :name n] [(>= a b)]]
      :args [{:b 1999}]}""") == Set(Seq(":oleg-1999")))
  }

  test("range constraints over an offer table, bug #505 (query_test.clj:1798)") {
    // the reference's bare `:limit 1` relies on index iteration order;
    // over an unordered relation that row is arbitrary, so each case
    // pins the expected row with an extra equality
    val s = src((0 until 500).map(i => s":id-$i" -> Map[String, Any]("offer" -> i.toLong)): _*)
    val cases: Seq[(Set[Seq[Any]], String)] = Seq(
      (Set(Seq(2L)), """{:find [i] :where [[_ :offer i] [(= i 2)]] :limit 1}"""),
      (Set(Seq(0L)), """{:find [i] :where [[_ :offer i] [(< i 10)] [(= i 0)]] :limit 1}"""),
      (Set.empty[Seq[Any]], """{:find [i] :where [[_ :offer i] [(< i -100)]] :limit 1}"""),
      (Set(Seq(50L)), """{:find [i] :where [[_ :offer i] [(>= i 50)] [(= i 50)]] :limit 1}"""),
      (Set(Seq(0L)), """{:find [i] :where [[_ :offer i] [(<= i 5)] [(= i 0)]] :limit 1}"""),
      (Set(Seq(0L)), """{:find [i] :where [[_ :offer i] [(> i -100)] [(= i 0)]] :limit 1}"""))
    for ((expected, query) <- cases)
      assert(run(s, query) == expected, query)
  }

  test("primary vs secondary attribute lookup, bug #287 (query_test.clj:1841)") {
    val s = src((0 until 500).map(n => s":ivan-$n" -> Map[String, Any](
      "name" -> "Ivan", "id" -> n.toLong)): _*)
    assert(run(s, """{:find [e] :where [[e :crux.db/id :ivan-1]]}""") == Set(Seq(":ivan-1")))
    assert(run(s, """{:find [e] :where [[e :id 3]]}""") == Set(Seq(":ivan-3")))
  }

  test("circular deps through identity rebinding, bug #1523 (query_test.clj:3863)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "foo" -> ":foo"),
      ":foo" -> Map("bar" -> ":bar"))
    assert(run(s,
      """{:find [?a-name ?bar]
         :where [[?a :name ?a-name] [?a :foo ?foo-val]
                 [(identity ?foo-val) ?foo] [?foo :bar ?bar]]}""") ==
      Set(Seq("Ivan", ":bar")))
  }

  test("racket datalog fib: top-down computational recursion (query_test.clj:3181)") {
    val s = src(":x" -> Map("name" -> "x"))
    val fibRules = """
      :rules [[(fib n f) [(<= n 1)] [(identity n) f]]
              [(fib n f) [(> n 1)]
               [(- n 1) n1] [(- n 2) n2]
               (fib n1 f1) (fib n2 f2)
               [(+ f1 f2) f]]]"""
    // constant input: (fib 10 f) => 55
    assert(run(s, s"""{:find [f] :where [(fib 10 f)] $fibRules}""") == Set(Seq(55L)))
    // input bound via :args (per-binding top-down over the outer domain)
    assert(run(s, s"""{:find [f] :where [(fib n f)] :args [{:n 10}] $fibRules}""") ==
      Set(Seq(55L)))
    // both args constant: pure existence check
    assert(run(s, s"""{:find [?nm] :where [[?e :name ?nm] (fib 6 8)] $fibRules}""") ==
      Set(Seq("x")))
    assert(run(s, s"""{:find [?nm] :where [[?e :name ?nm] (fib 6 9)] $fibRules}""").isEmpty)
  }

  test("top-down rules: mutual recursion over pure computation (even/odd)") {
    val s = src(":x" -> Map("name" -> "x"))
    val rules = """
      :rules [[(is-even n) [(= n 0)]]
              [(is-even n) [(> n 0)] [(- n 1) m] (is-odd m)]
              [(is-odd n) [(> n 0)] [(- n 1) m] (is-even m)]]"""
    assert(run(s, s"""{:find [?nm] :where [[?e :name ?nm] (is-even 10)] $rules}""") ==
      Set(Seq("x")))
    assert(run(s, s"""{:find [?nm] :where [[?e :name ?nm] (is-even 7)] $rules}""").isEmpty)
  }
}
