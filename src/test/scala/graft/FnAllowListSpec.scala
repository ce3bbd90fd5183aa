package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{lit, pmod}
import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, QuadSource}

/** Ports of crux-test/test/crux/query_fn_allowlist_test.clj — the
  * engine-level `:fn-allow-list` option (enforcement
  * crux-core/src/crux/query.clj:1272-1283): built-in fns are the default
  * allowlist and always resolve; non-built-in fns resolve only when the
  * configured list contains their full symbol, bare name, or namespace;
  * anything else raises the reference's exact error. Here the config is
  * `Planner.withFnAllowList` / the `GraftNode(fnAllowList = …)` option,
  * and "resolvable symbol" means registered via `Planner.registerFunction`
  * (the SURVEY §2.10 extension point).
  */
class FnAllowListSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  import org.apache.spark.sql.types._
  import scala.jdk.CollectionConverters._

  Planner.registerFunction("multiple-of-three?")(args => pmod(args.head, lit(3)) === 0)
  Planner.registerFunction("multiple-of-seven?")(args => pmod(args.head, lit(7)) === 0)

  private def src(): QuadSource = {
    val schema = StructType(Seq(
      StructField("e", StringType), StructField("a", StringType),
      StructField("v_num", LongType)))
    val rows = Seq(Row(":x", "age", 21L))
    new QuadSource(spark.createDataFrame(rows.asJava, schema),
      Map("age" -> "v_num"))
  }

  private def run(allow: Option[Seq[String]], q: String): Set[Seq[Any]] =
    Planner.withFnAllowList(allow) {
      Planner.q(spark, src(), q, Seq(21L, 22L)).collect().toSet[Row].map(_.toSeq)
    }

  private val inClause = "{:find [age] :in [[age ...]] :where [%s]}"

  test("default allowlist: built-ins pass under an empty list (test-default-allow-list)") {
    assert(run(Some(Nil), inClause.format("[(odd? age)]")) == Set(Seq(21L)))
  }

  test("disallowed fn raises the reference error (test-default-allow-list)") {
    val e = intercept[IllegalArgumentException] {
      run(Some(Nil), inClause.format("[(> age 20)] [(crux.spit/spit age)]"))
    }
    assert(e.getMessage.contains("Query used a function that was not in the allowlist"))
  }

  test("non-listed namespaced fn rejected even when registered (test-default-allow-list)") {
    val e = intercept[IllegalArgumentException] {
      run(Some(Nil),
        inClause.format("[(crux.query-fn-allowlist-test/multiple-of-three? age)]"))
    }
    assert(e.getMessage.contains("not in the allowlist"))
  }

  test("listed full symbol resolves, sibling stays rejected (test-allowed-fns)") {
    val allow = Some(Seq("crux.query-fn-allowlist-test/multiple-of-seven?"))
    assert(run(allow,
      inClause.format("[(crux.query-fn-allowlist-test/multiple-of-seven? age)]")) ==
      Set(Seq(21L)))
    val e = intercept[IllegalArgumentException] {
      run(allow,
        inClause.format("[(crux.query-fn-allowlist-test/multiple-of-three? age)]"))
    }
    assert(e.getMessage.contains("not in the allowlist"))
  }

  test("listed namespace allows all its fns, others rejected (test-allowed-ns)") {
    val allow = Some(Seq("crux.query-fn-allowlist-test"))
    assert(run(allow,
      inClause.format("[(crux.query-fn-allowlist-test/multiple-of-three? age)]")) ==
      Set(Seq(21L)))
    assert(run(allow,
      inClause.format("[(crux.query-fn-allowlist-test/multiple-of-seven? age)]")) ==
      Set(Seq(21L)))
    val e = intercept[IllegalArgumentException] {
      run(allow, inClause.format("[(clojure.magic/capitalize-fn age)]"))
    }
    assert(e.getMessage.contains("not in the allowlist"))
  }

  test("no allowlist configured: registry stays open (default engine)") {
    assert(run(None, inClause.format("[(multiple-of-seven? age)]")) == Set(Seq(21L)))
  }

  test("node option threads the list through query() (GraftNode fnAllowList)") {
    import graft.datalog.TableSource
    val node = new graft.http.GraftNode(spark,
      TableSource.tpch(spark, "/root/testdata/sf0.001"),
      fnAllowList = Some(Seq("graft.test/multiple-of-seven?")))
    assert(node.query(
      """{:find [?k] :where [[?r :r_regionkey ?k]
           [(graft.test/multiple-of-seven? ?k)]]}""", Nil)
      .collect().map(_.getInt(0)).toSet == Set(0))
    val e = intercept[IllegalArgumentException] {
      node.query(
        """{:find [?k] :where [[?r :r_regionkey ?k]
             [(graft.test/multiple-of-three? ?k)]]}""", Nil).collect()
    }
    assert(e.getMessage.contains("not in the allowlist"))
  }
}
