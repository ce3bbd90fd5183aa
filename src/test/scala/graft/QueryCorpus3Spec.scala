package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Ports of the reference's Datalog e2e corpus, tranche 4 (r4) — the
  * deftests of crux-test/test/crux/query_test.clj that had no spec-level
  * port yet. Plan-introspection tests (`query-plan-for`
  * :vars-in-join-order — test-binds-args-before-entities:3484,
  * test-cardinality-join-order-avoids-cross-product:3582,
  * picks-more-selective-join-order:3741) port as RESULT-correctness
  * checks: join ordering is Catalyst's job here (SURVEY §4), so the
  * observable contract is the answer, not the variable order.
  *
  * Still not ported: test-byte-array-values:1127 (binary value family —
  * out of scope with Nippy blobs, SURVEY §1.2), lazy open-q index-order
  * assertions, timeout/snapshot lifecycle tests (node-runtime concerns).
  */
class QueryCorpus3Spec extends AnyFunSuite {
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

  private def run(s: QuadSource, q: String, args: Any*): Set[Seq[Any]] =
    Planner.q(spark, s, q, args: _*).collect().toSet[Row].map(_.toSeq)

  test("sanitise join: same var through three clauses (query_test.clj:1505)") {
    val s = src(":ivan" -> Map("name" -> "Ivan", "last-name" -> "Ivanov"))
    assert(run(s, """{:find [e2]
                      :where [[e :last-name "Ivanov"]
                              [e :last-name name1]
                              [e2 :last-name name1]]}""") == Set(Seq(":ivan")))
  }

  test("symmetric recursion (query_test.clj:2381 test-rules-with-recursion-2)") {
    val s = src("1" -> Map("follow" -> "2"), "2" -> Map("follow" -> "3"))
    assert(run(s, """{:find [?e1 ?e2]
                      :where [(follow ?e1 ?e2)]
                      :rules [[(follow ?e1 ?e2) [?e1 :follow ?e2]]
                              [(follow ?e1 ?e2) (follow ?e2 ?e1)]]}""") ==
      Set(Seq("1", "2"), Seq("2", "3"), Seq("2", "1"), Seq("3", "2")))
  }

  test("calling a rule twice with different constants (query_test.clj:2393 bug 44)") {
    // the reference's test passes a (constantly true) fn via :args; fn
    // values aren't data here, so the adapted body keeps the shape (same
    // rule, two constant args, one matching) — the bug was a rule-cache
    // collision, which this still exercises
    val s = src("1" -> Map("attr" -> "a"))
    assert(run(s, """{:find [?p]
                      :where [(rule ?p "a") (rule ?p "b")]
                      :rules [[(rule ?p ?x) [?p :attr ?x]]]}""").isEmpty)
    assert(run(s, """{:find [?p]
                      :where [(rule ?p "a") (rule ?p "a")]
                      :rules [[(rule ?p ?x) [?p :attr ?x]]]}""") == Set(Seq("1")))
  }

  test("rules with false/boolean arguments (query_test.clj:2433, datascript 218)") {
    val s = src("1" -> Map("attr" -> true), "2" -> Map("attr" -> false))
    val rules = """:rules [[(is ?id ?val) [?id :attr ?val]]]"""
    assert(run(s, s"""{:find [?id] :where [(is ?id true)] $rules}""") == Set(Seq("1")))
    assert(run(s, s"""{:find [?id] :where [(is ?id false)] $rules}""") == Set(Seq("2")))
  }

  test("datascript predicate corpus (query_test.clj:2651)") {
    val s = src(
      "1" -> Map("name" -> "Ivan", "age" -> 10L),
      "2" -> Map("name" -> "Ivan", "age" -> 20L),
      "3" -> Map("name" -> "Oleg", "age" -> 10L),
      "4" -> Map("name" -> "Oleg", "age" -> 20L))
    // plain predicate
    assert(run(s, """{:find [?e ?a] :where [[?e :age ?a] [(> ?a 10)]]}""") ==
      Set(Seq("2", 20L), Seq("4", 20L)))
    // join in predicate over entity ids (canonical strings order like the
    // reference's numeric ids for these single-digit keys)
    assert(run(s, """{:find [?e ?e2] :where [[?e :name] [?e2 :name] [(< ?e ?e2)]]}""") ==
      Set(Seq("1", "2"), Seq("1", "3"), Seq("1", "4"),
        Seq("2", "3"), Seq("2", "4"), Seq("3", "4")))
    // join with extra symbols
    assert(run(s, """{:find [?e ?e2]
                      :where [[?e :age ?a] [?e2 :age ?a2] [(< ?e ?e2)]]}""") ==
      Set(Seq("1", "2"), Seq("1", "3"), Seq("1", "4"),
        Seq("2", "3"), Seq("2", "4"), Seq("3", "4")))
    // empty result
    assert(run(s, """{:find [?e ?e2]
                      :where [[?e :name "Ivan"] [?e2 :name "Oleg"] [(= ?e ?e2)]]}""").isEmpty)
    // pred over const, true / false
    assert(run(s, """{:find [?e]
                      :where [[?e :name "Ivan"] [?e :age 20] [(= ?e "2")]]}""") ==
      Set(Seq("2")))
    assert(run(s, """{:find [?e]
                      :where [[?e :name "Ivan"] [?e :age 20] [(= ?e "1")]]}""").isEmpty)
  }

  test("symbol resolution via the scalar-fn registry (query_test.clj:2722)") {
    // the reference resolves any allowlisted namespaced symbol; here the
    // extension point is Planner.registerFunction (SURVEY §2.10)
    Planner.registerFunction("sample-query-fn")(_ =>
      org.apache.spark.sql.functions.lit(42L))
    val s = src(":x" -> Map("name" -> "x"))
    assert(run(s, """{:find [?x]
                      :where [[?e :name] [(crux.query-test/sample-query-fn) ?x]]}""") ==
      Set(Seq(42L)))
  }

  test("cardinality join order avoids cross product — result level (query_test.clj:3582)") {
    val docs = (0 until 100).flatMap { n =>
      Seq(
        s":dummy-$n" -> Map[String, Any]("my-name" -> n.toString),
        s":ivan-$n" -> Map[String, Any]("my-name" -> "Ivan", "my-number" -> n.toLong),
        s":oleg-$n" -> Map[String, Any]("my-name" -> "Oleg", "my-number" -> n.toLong))
    }
    val s = src(docs: _*)
    val res = run(s, """{:find [e1]
                         :where [[e1 :my-name "Ivan"] [e2 :my-name "Oleg"]
                                 [e1 :my-number n] [e2 :my-number n]]}""")
    assert(res == (0 until 100).map(n => Seq(s":ivan-$n": Any)).toSet)
  }

  test("selective join order — result level (query_test.clj:3741)") {
    val docs = (0 until 1000).map(i =>
      s":p-$i" -> Map[String, Any]("name" -> s"person-$i", "type" -> "person")) :+
      (":extra" -> Map[String, Any]("type" -> "extra type"))
    val s = src(docs: _*)
    assert(run(s, """{:find [?e ?name] :in [?name ?type]
                      :where [[?e :name ?name] [?e :type ?type]]}""",
      "person-17", "person") == Set(Seq(":p-17", "person-17")))
  }

  test("rules binding through swapped recursive args (query_test.clj:3876, issue 1569)") {
    // the REFERENCE's own assertion is commented out with "FIXME this
    // returns all the B's too" — its recursion guard over-returns. The
    // least fixpoint of P(s,e) ← next(s,e) | next(s,i) ∧ P(e,i) on the
    // 4-cycle is base ∪ self-loops ONLY (deriving any other pair needs an
    // ungrounded infinite chain), so P(node, :a-1) = {:a-4 (base),
    // :a-1 (self-loop)} — what the semi-naive fixpoint here computes.
    // The commented-out expectation {:a-1..:a-4} is not Datalog-derivable.
    val docs = Seq(
      ":a-1" -> Map[String, Any]("next" -> ":a-2"),
      ":a-2" -> Map[String, Any]("next" -> ":a-3"),
      ":a-3" -> Map[String, Any]("next" -> ":a-4"),
      ":a-4" -> Map[String, Any]("next" -> ":a-1"),
      ":b-1" -> Map[String, Any]("next" -> ":b-2"),
      ":b-2" -> Map[String, Any]("next" -> ":b-3"),
      ":b-3" -> Map[String, Any]("next" -> ":b-4"),
      ":b-4" -> Map[String, Any]("next" -> ":b-5"),
      ":b-5" -> Map[String, Any]("next" -> ":b-1"))
    val s = src(docs: _*)
    assert(run(s, """{:find [node]
                      :where [[end :crux.db/id :a-1] (pointsTo node end)]
                      :rules [[(pointsTo start end) [start :next end]]
                              [(pointsTo start end)
                               [start :next intermediate]
                               (pointsTo end intermediate)]]}""") ==
      Set(Seq(":a-1"), Seq(":a-4")))
  }
}
