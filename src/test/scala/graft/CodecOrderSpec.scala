package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Port of the reference's cross-family value-ordering semantics —
  * codec_test.clj:94 `test-ordering-of-values` checks that sorting values
  * by their encoded index bytes equals sorting by natural order, where the
  * leading value-type-id byte puts families in fixed order:
  * bool(4) < long(5)/double(6) < date(7) < string(8) (codec.clj:81-99).
  *
  * Here a `QuadSource.Mixed` attribute binds a tagged struct (t, b, n, d, s)
  * and Spark's native struct ordering/comparison reproduces that order.
  * Deviation (SURVEY §2.2): the long/double tags are merged into one
  * numeric family compared numerically — the reference's Clojure
  * predicates compare numerics numerically too.
  */
class CodecOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** One mixed attr :val spanning all four families, plus a plain string
    * attr :name for cross-source unification. */
  private lazy val source: QuadSource = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val rows = Seq[(String, String, Any)](
      ("e-false", "val", false), ("e-true", "val", true),
      ("e-one", "val", 1L), ("e-pi", "val", 2.5d), ("e-ten", "val", 10L),
      ("e-date", "val", ts("2020-05-01 00:00:00")),
      ("e-aaa", "val", "aaa"), ("e-zzz", "val", "zzz"),
      ("n1", "name", "aaa"), ("n2", "name", "bob")
    ).map {
      case (e, a, v: Boolean) => Row(e, a, Boolean.box(v), null, null, null, null)
      case (e, a, v: Long) => Row(e, a, null, Long.box(v), null, null, null)
      case (e, a, v: Double) => Row(e, a, null, null, Double.box(v), null, null)
      case (e, a, v: java.sql.Timestamp) => Row(e, a, null, null, null, v, null)
      case (e, a, v: String) => Row(e, a, null, null, null, null, v)
      case (e, a, v) => throw new IllegalArgumentException(s"$e $a $v")
    }
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_bool", BooleanType), StructField("v_num", LongType),
      StructField("v_dbl", DoubleType), StructField("v_ts", TimestampType),
      StructField("v_str", StringType)))
    new QuadSource(spark.createDataFrame(rows.asJava, schema),
      Map("val" -> QuadSource.Mixed, "name" -> "v_str"))
  }

  private def run(q: String, args: Any*): Set[Seq[Any]] =
    Planner.q(spark, source, q, args: _*).collect().toSet[Row].map(_.toSeq)

  private def runList(q: String): Seq[Any] =
    Planner.q(spark, source, q).collect().toSeq.map(_.get(0))

  test("order-by follows codec tag order: bool < number < date < string") {
    assert(runList(
      """[:find ?e ?v :order-by [[?v :asc]] :where [[?e :val ?v]]]""") ==
      Seq("e-false", "e-true", "e-one", "e-pi", "e-ten", "e-date", "e-aaa", "e-zzz"))
    assert(runList(
      """[:find ?e ?v :order-by [[?v :desc]] :where [[?e :val ?v]]]""") ==
      Seq("e-zzz", "e-aaa", "e-date", "e-ten", "e-pi", "e-one", "e-true", "e-false"))
  }

  test("cross-family range predicates resolve per-row in tag order") {
    // strings sort after every number: (< ?v "m") admits bools, numbers,
    // dates, and the strings below "m"
    assert(run("""[:find ?e :where [[?e :val ?v] [(< ?v "m")]]]""").map(_.head) ==
      Set("e-false", "e-true", "e-one", "e-pi", "e-ten", "e-date", "e-aaa"))
    // numbers sort after bools: (< ?v 10) admits bools and smaller numbers
    assert(run("""[:find ?e :where [[?e :val ?v] [(< ?v 10)]]]""").map(_.head) ==
      Set("e-false", "e-true", "e-one", "e-pi"))
    assert(run("""[:find ?e :where [[?e :val ?v] [(> ?v 5)]]]""").map(_.head) ==
      Set("e-ten", "e-date", "e-aaa", "e-zzz"))
  }

  test("literal patterns and equality filter inside the right family") {
    assert(run("""[:find ?e :where [[?e :val 2.5]]]""") == Set(Seq("e-pi")))
    assert(run("""[:find ?e :where [[?e :val "aaa"]]]""") == Set(Seq("e-aaa")))
    assert(run("""[:find ?e :where [[?e :val true]]]""") == Set(Seq("e-true")))
    // long/double merged numeric family: 1 matches 1L
    assert(run("""[:find ?e :where [[?e :val 1]]]""") == Set(Seq("e-one")))
    // set literal
    assert(run("""[:find ?e :where [[?e :val #{"zzz" 10}]]]""").map(_.head) ==
      Set("e-zzz", "e-ten"))
  }

  test("mixed var unifies with a plain single-family var") {
    // [e :val ?v] [e2 :name ?v]: only string-family vals can unify
    assert(run(
      """[:find ?e ?e2 :where [[?e :val ?v] [?e2 :name ?v]]]""") ==
      Set(Seq("e-aaa", "n1")))
  }

  test("equality and disequality predicates over two mixed vars") {
    assert(run(
      """[:find ?a ?b :where [[?a :val ?x] [?b :val ?y]
           [(< ?x ?y)] [(>= ?y "zzz")]]]""").map(_.take(2)) ==
      Set(Seq("e-false", "e-zzz"), Seq("e-true", "e-zzz"), Seq("e-one", "e-zzz"),
        Seq("e-pi", "e-zzz"), Seq("e-ten", "e-zzz"), Seq("e-date", "e-zzz"),
        Seq("e-aaa", "e-zzz")))
  }

  test("min/max aggregates respect tag order") {
    val res = Planner.q(spark,
      source, """[:find (max ?v) (min ?v) :where [[?e :val ?v]]]""").collect()
    assert(res.length == 1)
    val mx = res(0).getStruct(0)
    val mn = res(0).getStruct(1)
    assert(mx.getAs[String]("s") == "zzz") // greatest family present: string
    assert(mn.getAs[Boolean]("b") == false) // least family present: bool
  }

  test("text-search over a mixed-family attr matches its string values (r4 advice)") {
    // strings under a mixed attr ARE in the reference's Lucene index
    // (lucene.clj:200-207 indexes every string value) — the tagged
    // struct's `s` field is the searchable projection
    def run(q: String): Set[Seq[Any]] =
      Planner.q(spark, source, q).collect().toSet[Row].map(_.toSeq)
    assert(run("""[:find ?e ?v :where [[(text-search :val "zzz") [[?e ?v]]]]]""") ==
      Set(Seq("e-zzz", "zzz")))
    assert(run("""[:find ?e :where [[(text-search :val "a*") [[?e]]]]]""") ==
      Set(Seq("e-aaa")))
    // wildcard-text-search scans mixed attrs alongside plain string attrs
    assert(run("""[:find ?e ?v ?a :where [[(wildcard-text-search "aaa") [[?e ?v ?a]]]]]""") ==
      Set(Seq("e-aaa", "aaa", ":val"), Seq("n1", "aaa", ":name")))
  }
}
