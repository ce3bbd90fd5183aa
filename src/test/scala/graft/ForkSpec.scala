package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.{GraftNode, Json}

/** Ports of the reference's speculative-transaction suite —
  * crux-core/test/crux/fork_test.clj — over [[GraftNode.withTx]]: forked
  * dbs answer queries/entity/history with the speculative ops applied
  * while the underlying node is untouched; a failed match yields None;
  * forks from past/future bases keep their (vt, tt) cutoffs.
  */
class ForkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newNode() = new GraftNode(spark, TableSource.tpch(spark, "/root/testdata/sf0.001"))

  private def put(doc: JObject, times: String*): JValue =
    JArray(JString("put") :: doc :: times.toList.map(JString(_)))
  private def delete(eid: String): JValue =
    JArray(List(JString("delete"), JString(eid)))

  private def q(node: GraftNode, edn: String): Set[Seq[Any]] =
    node.queryAt(edn).collect().toSet[Row].map(_.toSeq)

  private val allNames = """{:find [?name] :where [[?e :name ?name]]}"""

  private def historyVersions(node: GraftNode, eid: String): Seq[(Long, JValue)] =
    node.entityHistory(eid, sortAsc = true, withCorrections = true,
      withDocs = true, None, None).collect().toSeq.map { r =>
      (r.getAs[Long]("tx_id"), Json.parse(r.getAs[String]("doc")))
    }

  test("empty fork (fork_test.clj:11)") {
    val db = newNode().withTx(List(put(("crux.db/id" -> ":foo") ~ ("name" -> "foo")))).get
    assert(db.entityDoc(":foo", None, None, None).nonEmpty)
  }

  test("simple fork: forked state diverges, original untouched (fork_test.clj:16)") {
    val node = newNode()
    node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivna"))))

    val db2 = node.withTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan")))).get
    assert(q(node, allNames) == Set(Seq("Ivna")))
    assert(q(db2, allNames) == Set(Seq("Ivan")))

    // can delete an entity speculatively
    assert(q(node.withTx(List(delete(":ivan"))).get, allNames).isEmpty)
    assert(q(node.withTx(List(
      put(("crux.db/id" -> ":petr") ~ ("name" -> "Petr")), delete(":ivan"))).get, allNames) ==
      Set(Seq("Petr")))

    // returns None on failed match
    assert(node.withTx(List(JArray(List(JString("match"), JString(":nope"),
      ("crux.db/id" -> ":nope") ~ ("name" -> "x"))))).isEmpty)

    // the original node saw none of it
    assert(q(node, allNames) == Set(Seq("Ivna")))
  }

  test("fork history includes the speculative tx (fork_test.clj:45)") {
    val node = newNode()
    val tx0 = node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivna"))))
    val fork = node.withTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan")))).get
    val hist = historyVersions(fork, ":ivan")
    assert(hist.map(_._1) == Seq(tx0.txId, tx0.txId + 1))
    assert(hist.map(h => h._2 \ "name") == Seq(JString("Ivna"), JString("Ivan")))
  }

  test("speculative from a point in the past (fork_test.clj:65)") {
    val node = newNode()
    val tx0 = node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan0"))))
    node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan1"))))

    // fork from the tx0 basis: Ivan1 must not exist in the fork
    val db1 = node.withTx(List(put(("crux.db/id" -> ":petr") ~ ("name" -> "Petr"))),
      txId = Some(tx0.txId)).get
    assert((Json.parse(db1.entityDoc(":ivan", None, None, None).map(Json.render).get) \ "name") ==
      JString("Ivan0"))

    val db2 = node.withTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan2"))),
      txId = Some(tx0.txId)).get
    val hist = historyVersions(db2, ":ivan")
    assert(hist.map(h => h._2 \ "name") == Seq(JString("Ivan0"), JString("Ivan2")))
  }

  test("speculative from a point in the future (fork_test.clj:91)") {
    val node = newNode()
    node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan0"))))
    val now = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
    val in10m = now.plusMinutes(10)
    val in5m = now.plusMinutes(5)
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME
    node.submitTx(List(put(("crux.db/id" -> ":ivan") ~ ("name" -> "Future Ivan"),
      fmt.format(in10m))))

    // fork from the future-db basis: the vt-less put lands at the db's
    // valid time (now+10m), the explicit one at now+5m
    val db = node.withTx(List(
      put(("crux.db/id" -> ":ivan") ~ ("name" -> "Future Ivan 2")),
      put(("crux.db/id" -> ":ivan") ~ ("name" -> "5m Future Ivan"), fmt.format(in5m))),
      validTime = Some(in10m)).get

    val hist = historyVersions(db, ":ivan").map(h => h._2 \ "name")
    assert(hist == Seq(JString("Ivan0"), JString("5m Future Ivan"),
      JString("Future Ivan"), JString("Future Ivan 2")))
  }

  test("speculative evict (fork_test.clj:127)") {
    val node = newNode()
    node.submitTx(List(
      put(("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan")),
      put(("crux.db/id" -> ":petr") ~ ("name" -> "Petr"))))
    val fork = node.withTx(List(JArray(List(JString("evict"), JString(":petr"))))).get

    assert(historyVersions(node, ":petr").nonEmpty)
    assert(historyVersions(fork, ":ivan").nonEmpty)
    assert(fork.entityDoc(":petr", None, None, None).isEmpty)
    assert(historyVersions(fork, ":petr").isEmpty)
    assert(q(fork, allNames) == Set(Seq("Ivan")))
    // original untouched
    assert(q(node, allNames) == Set(Seq("Ivan"), Seq("Petr")))
  }
}
