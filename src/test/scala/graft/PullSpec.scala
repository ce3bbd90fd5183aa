package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.pull.Pull

/** Pull/EQL compiler tests mirroring the reference's pull semantics
  * (crux-core/src/crux/pull.clj; ported DataScript suite at
  * crux-core/test/crux/datascript_pull_test.clj): props/aliases/defaults,
  * forward + reverse joins, limits, wildcard, bounded recursion.
  */
class PullSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** people with a self-referencing `boss` fk — exercises recursion. */
  private lazy val catalog: Pull.Catalog = {
    import scala.jdk.CollectionConverters._
    val people = spark.createDataFrame(List(
      Row(1L, "ceo", null),
      Row(2L, "vp", java.lang.Long.valueOf(1L)),
      Row(3L, "mgr", java.lang.Long.valueOf(2L)),
      Row(4L, "eng", java.lang.Long.valueOf(3L)),
      Row(5L, "eng2", java.lang.Long.valueOf(3L))).asJava,
      StructType(Seq(StructField("id", LongType), StructField("pname", StringType),
        StructField("boss", LongType))))
    val pets = spark.createDataFrame(List(
      Row(10L, "rex", 4L), Row(11L, "tom", 4L), Row(12L, "ada", 5L)).asJava,
      StructType(Seq(StructField("pid", LongType), StructField("petname", StringType),
        StructField("owner", LongType))))
    new Pull.Catalog(
      Map("people" -> people, "pets" -> pets),
      Map(
        "people" -> Pull.PullTable(Seq("id"), Seq("id", "pname", "boss"),
          Map("boss" -> "people")),
        "pets" -> Pull.PullTable(Seq("pid"), Seq("pid", "petname", "owner"),
          Map("owner" -> "people"))))
  }

  private def pulled(table: String, pattern: String): Map[Long, String] =
    Pull.pull(catalog, table, pattern)
      .selectExpr("_id", "to_json(pulled) AS j")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("props, alias, default") {
    val m = pulled("people", "[:id [:pname {:as :who}] [:boss {:default -1}]]")
    assert(m(1L) == """{"id":1,"who":"ceo","boss":-1}""")
    assert(m(4L) == """{"id":4,"who":"eng","boss":3}""")
  }

  test("wildcard") {
    val m = pulled("people", "[*]")
    assert(m(2L) == """{"id":2,"pname":"vp","boss":1}""")
  }

  test("forward join") {
    val m = pulled("people", "[:pname {:boss [:pname]}]")
    assert(m(3L) == """{"pname":"mgr","boss":{"pname":"vp"}}""")
    assert(m(1L) == """{"pname":"ceo"}""") // null boss → field dropped by to_json
  }

  test("reverse join with deterministic order and limit") {
    val m = pulled("people", "[:pname {[:_owner {:limit 1}] [:petname]}]")
    assert(m(4L) == """{"pname":"eng","_owner":[{"petname":"rex"}]}""")
    assert(m(5L) == """{"pname":"eng2","_owner":[{"petname":"ada"}]}""")
    assert(m(1L) == """{"pname":"ceo","_owner":[]}""")
  }

  test("bounded recursion up the boss chain") {
    val m = pulled("people", "[:pname {:boss 2}]")
    // depth 2: eng → mgr → vp (vp's boss dropped at depth 0)
    assert(m(4L) == """{"pname":"eng","boss":{"pname":"mgr","boss":{"pname":"vp"}}}""")
  }

  test("reverse recursion: reports chain downward") {
    val m = pulled("people", "[:pname {:_boss 2}]")
    assert(m(1L).contains(""""pname":"vp""""))
    assert(m(1L).contains(""""pname":"mgr""""))
    // depth stops before engs
    assert(!m(1L).contains("eng"))
  }
}
