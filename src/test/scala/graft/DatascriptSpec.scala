package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Ports of the DataScript-derived not/or corpus
  * (crux-test/test/crux/query_test.clj:2106-2290 — datascript-test-not,
  * -not-join, -not-impl-edge-cases, -or, -or-join) over the 6-person
  * fixture (query_test.clj:2098-2104). Entity ids are strings here.
  */
class DatascriptSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val source: QuadSource = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val people = Seq(
      ("1", "Ivan", 10L), ("2", "Ivan", 20L), ("3", "Oleg", 10L),
      ("4", "Oleg", 20L), ("5", "Ivan", 10L), ("6", "Ivan", 20L))
    val rows = people.flatMap { case (id, name, age) =>
      Seq(Row(id, "name", name, null), Row(id, "age", null, age))
    }
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_str", StringType), StructField("v_num", LongType)))
    new QuadSource(spark.createDataFrame(rows.asJava, schema),
      Map("name" -> "v_str", "age" -> "v_num"))
  }

  private def q1(where: String): Set[String] =
    Planner.q(spark, source, s"[:find ?e :where [$where]]")
      .collect().toSet[Row].map(_.getString(0))

  private def q2(find: String, where: String): Set[Seq[Any]] =
    Planner.q(spark, source, s"[:find $find :where [$where]]")
      .collect().toSet[Row].map(_.toSeq)

  test("datascript not (query_test.clj:2106)") {
    assert(q1("""[?e :name] (not [?e :name "Ivan"])""") == Set("3", "4"))
    assert(q1("""[?e :name] (not [?e :name "Ivan"] [?e :age 10])""") ==
      Set("2", "3", "4", "6"))
    assert(q1("""[?e :name] (not [?e :name "Ivan"]) (not [?e :age 10])""") == Set("4"))
    // full exclude
    assert(q1("""[?e :name] (not [?e :age])""") == Set.empty[String])
    // not-intersecting rels
    assert(q1("""[?e :name "Ivan"] (not [?e :name "Oleg"])""") ==
      Set("1", "2", "5", "6"))
    // exclude empty set
    assert(q1("""[?e :name] (not [?e :name "Ivan"] [?e :name "Oleg"])""") ==
      Set("1", "2", "3", "4", "5", "6"))
    // nested excludes
    assert(q1("""[?e :name] (not [?e :name "Ivan"] (not [?e :age 10]))""") ==
      Set("1", "3", "4", "5"))
  }

  test("datascript not-join (query_test.clj:2148)") {
    assert(q2("?e ?a",
      """[?e :name] [?e :age ?a] (not-join [?e] [?e :name "Oleg"] [?e :age ?a])""") ==
      Set(Seq("1", 10L), Seq("2", 20L), Seq("5", 10L), Seq("6", 20L)))
    assert(q2("?e ?a",
      """[?e :name] [?e :age ?a] [?e :age 10]
         (not-join [?e] [?e :name "Oleg"] [?e :age 10] [?e :age ?a])""") ==
      Set(Seq("1", 10L), Seq("5", 10L)))
  }

  test("datascript not impl edge cases (query_test.clj:2171)") {
    assert(q1("""[?e :name "Oleg"] [?e :age 10] (not [?e :age 20])""") == Set("3"))
    assert(q1("""[?e :name "Oleg"] [?e :age 10] (not [?e :age 10])""") == Set.empty[String])
    assert(q1("""[?e :name "Oleg"] (not [?e :age 10])""") == Set("4"))
    // 2 rels \ 2 rels
    assert(q2("?e ?e2",
      """[?e :name "Ivan"] [?e2 :name "Ivan"] (not [?e :age 10] [?e2 :age 20])""") ==
      Set(Seq("2", "1"), Seq("6", "5"), Seq("1", "1"), Seq("2", "2"), Seq("5", "5"),
        Seq("6", "6"), Seq("2", "5"), Seq("1", "5"), Seq("2", "6"), Seq("6", "1"),
        Seq("5", "1"), Seq("6", "2")))
    // 2 rels \ rel + const
    assert(q2("?e ?e2",
      """[?e :name "Ivan"] [?e2 :name "Oleg"] (not [?e :age 10] [?e2 :age 20])""") ==
      Set(Seq("2", "3"), Seq("1", "3"), Seq("2", "4"), Seq("6", "3"), Seq("5", "3"),
        Seq("6", "4")))
    // 2 rels \ 2 consts
    assert(q2("?e ?e2",
      """[?e :name "Oleg"] [?e2 :name "Oleg"] (not [?e :age 10] [?e2 :age 20])""") ==
      Set(Seq("4", "3"), Seq("3", "3"), Seq("4", "4")))
  }

  test("datascript or (query_test.clj:2220)") {
    assert(q1("""(or [?e :name "Oleg"] [?e :age 10])""") == Set("1", "3", "4", "5"))
    assert(q1("""(or [?e :name "Oleg"] [?e :age 30])""") == Set("3", "4"))
    assert(q1("""(or [?e :name "Petr"] [?e :age 30])""") == Set.empty[String])
    assert(q1("""[?e :name "Ivan"] (or [?e :name "Oleg"] [?e :age 10])""") ==
      Set("1", "5"))
    // join with 2 vars (entity constants in e position)
    assert(q1("""[?e :age ?a]
                 (or (and [?e :name "Ivan"] ["1" :age ?a])
                     (and [?e :name "Oleg"] ["2" :age ?a]))""") ==
      Set("1", "5", "4"))
  }

  test("datascript aggregates over literal relations (query_test.clj:2735)") {
    def one(q: String): Seq[Any] =
      Planner.q(spark, source, q).collect().toSeq.map(_.toSeq).head
    // multiple aggregates; grouping folds DISTINCT tuples first
    assert(one("""[:find (sum ?heads) (min ?heads) (max ?heads) (count ?heads) (count-distinct ?heads)
                  :where [[(identity [["Cerberus" 3] ["Medusa" 1] ["Cyclops" 1] ["Chimera" 1]]) [[?monster ?heads]]]]]""") ==
      Seq(6L, 1L, 3L, 4L, 2L))
    // grouping
    assert(Planner.q(spark, source,
      """[:find ?color (max ?x) (min ?x)
         :where [[(identity [["red" 1] ["red" 2] ["red" 3] ["red" 4] ["red" 5]
                             ["blue" 7] ["blue" 8]]) [[?color ?x]]]]]""")
      .collect().toSet[Row].map(_.toSeq) ==
      Set(Seq("red", 5L, 1L), Seq("blue", 8L, 7L)))
    // grouping with min-N / max-N
    val grouped = Planner.q(spark, source,
      """[:find ?color (max 3 ?x) (min 3 ?x)
         :where [[(identity [["red" 1] ["red" 2] ["red" 3] ["red" 4] ["red" 5]
                             ["blue" 7] ["blue" 8]]) [[?color ?x]]]]]""")
      .collect().toSet[Row].map(r => (r.getString(0),
        r.getSeq[Long](1).toList, r.getSeq[Long](2).toList))
    assert(grouped == Set(("red", List(5L, 4L, 3L), List(1L, 2L, 3L)),
      ("blue", List(8L, 7L), List(7L, 8L))))
    // avg / median over a collection binding
    assert(one("""[:find (avg ?x) :where [[(identity [10 15 20 35 75]) [?x ...]]]]""") ==
      Seq(31.0))
    assert(one("""[:find (median ?x) :where [[(identity [10 15 20 35 75]) [?x ...]]]]""") ==
      Seq(20.0))
  }

  test("datascript or-join (query_test.clj:2255)") {
    assert(q1("""(or-join [?e] [?e :name ?n] (and [?e :age ?a] [?e :name ?n]))""") ==
      Set("1", "2", "3", "4", "5", "6"))
    assert(q1("""[(identity "1") ?e]
                 (or-join [[?e]] [?e :name ?n] (and [?e :age ?a] [?e :name ?n]))""") ==
      Set("1"))
    // or-join vars shadow outer vars not in the var list
    assert(q1("""[?e :name ?a] [?e2 :name ?a]
                 (or-join [?e] (and [?e :age ?a] [?e2 :age ?a]))""") ==
      Set("1", "2", "3", "4", "5", "6"))
  }
}
