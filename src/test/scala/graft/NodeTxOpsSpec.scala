package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.GraftNode

/** Port of the reference's transactions doc-example suite —
  * docs/reference/…/transactions/transactions_test.clj — each tx-op
  * exercised through the NODE surface with `crux/entity` reads at three
  * valid-time bases: ranged put (test-put), ranged delete over existing
  * history (test-delete), match-at-vt gating a piggybacked delete
  * (test-match), evict erasing all of history (test-evict), speculative
  * with-tx isolation (speculative-transactions) and entity visibility
  * after an indexed submit (awaiting — our node indexes synchronously in
  * submitTx, so "await then read" collapses to "read"). The two tx-fn
  * deftests (test-function-anatomy/test-function) are covered at the
  * TxLog layer — `TxLog.applyTxWithFns` + the tx_fn gate — the node's
  * JSON op surface deliberately doesn't ship code as data. */
class NodeTxOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newNode() =
    new GraftNode(spark, TableSource.tpch(spark, "/root/testdata/sf0.001"))

  private val pabloId = ":dbpedia.resource/Pablo-Picasso"
  private val pabloDoc: JObject =
    ("crux.db/id" -> pabloId) ~ ("first-name" -> ":Pablo")

  private def putPablo(node: GraftNode): Unit =
    assert(node.submitTx(List(JArray(List(JString("put"), pabloDoc,
      JString("2017-01-01T00:00:00"))))).committed)

  private def pablo(node: GraftNode, at: Option[String] = None): Option[JValue] =
    node.entityDoc(pabloId,
      at.map(java.time.LocalDateTime.parse), None, None)

  test("ranged put is visible only inside [start, end) (test-put)") {
    val node = newNode()
    assert(node.submitTx(List(JArray(List(JString("put"), pabloDoc,
      JString("2018-05-18T09:20:27.966"),
      JString("2018-05-19T08:31:15.966"))))).committed)
    assert(pablo(node).isEmpty) // now: after the range's end
    assert(pablo(node, Some("2018-05-18T10:20:27.966")).isDefined)
    assert(pablo(node, Some("2018-05-17T10:20:27.966")).isEmpty)
  }

  test("ranged delete blanks a window of existing history (test-delete)") {
    val node = newNode()
    putPablo(node)
    assert(node.submitTx(List(JArray(List(JString("delete"), JString(pabloId),
      JString("2018-05-18T09:20:27.966"),
      JString("2018-05-19T08:31:15.966"))))).committed)
    assert(pablo(node).isDefined) // now: the 2017 doc resumes after the window
    assert(pablo(node, Some("2018-05-18T10:20:27.966")).isEmpty)
    assert(pablo(node, Some("2018-05-17T10:20:27.966")).isDefined)
  }

  test("match at a valid time gates the piggybacked delete (test-match)") {
    val node = newNode()
    putPablo(node)
    // the expected doc DOES hold at the match's valid time → tx commits,
    // the un-timed delete applies from tx-time onward
    assert(node.submitTx(List(
      JArray(List(JString("match"), JString(pabloId), pabloDoc,
        JString("2018-05-18T09:21:31.846"))),
      JArray(List(JString("delete"), JString(pabloId))))).committed)
    assert(pablo(node).isEmpty)
    assert(pablo(node, Some("2018-05-18T10:20:27.966")).isDefined)
    assert(pablo(node, Some("2018-05-17T10:20:27.966")).isDefined)
    // and a match against a WRONG doc aborts the whole tx (the reference
    // asserts this shape in tx_test; here it pins the node surface)
    val node2 = newNode()
    putPablo(node2)
    val wrong: JObject = ("crux.db/id" -> pabloId) ~ ("first-name" -> ":Diego")
    assert(!node2.submitTx(List(
      JArray(List(JString("match"), JString(pabloId), wrong,
        JString("2018-05-18T09:21:31.846"))),
      JArray(List(JString("delete"), JString(pabloId))))).committed)
    assert(pablo(node2).isDefined) // delete discarded with the abort
  }

  test("evict erases the entity at every basis (test-evict)") {
    val node = newNode()
    putPablo(node)
    assert(node.submitTx(List(
      JArray(List(JString("evict"), JString(pabloId))))).committed)
    assert(pablo(node).isEmpty)
    assert(pablo(node, Some("2018-05-18T10:20:27.966")).isEmpty)
    assert(pablo(node, Some("2018-05-17T10:20:27.966")).isEmpty)
  }

  test("speculative with-tx sees its ops; the node never does (speculative-transactions)") {
    val node = newNode()
    val allNames = """{:find [?name] :where [[?e :name ?name]]}"""
    def names(n: GraftNode): Set[Seq[Any]] =
      n.queryAt(allNames).collect().toSet[Row].map(_.toSeq)
    assert(node.submitTx(List(JArray(List(JString("put"),
      ("crux.db/id" -> ":ivan") ~ ("name" -> "Ivan"))))).committed)
    assert(names(node) == Set(Seq("Ivan")))
    val spec = node.withTx(List(JArray(List(JString("put"),
      ("crux.db/id" -> ":petr") ~ ("name" -> "Petr")))))
    assert(spec.isDefined)
    assert(names(spec.get) == Set(Seq("Ivan"), Seq("Petr")))
    // the original node is untouched
    assert(names(node) == Set(Seq("Ivan")))
  }

  test("a submitted tx's entity is visible once indexed (awaiting)") {
    val node = newNode()
    val tx = node.submitTx(List(JArray(List(JString("put"),
      JObject(List("crux.db/id" -> JString(":ivan")))))))
    assert(tx.committed)
    assert(node.latestCompletedTx.exists(_.txId == tx.txId))
    assert(node.entityDoc(":ivan", None, None, None).isDefined)
  }
}
