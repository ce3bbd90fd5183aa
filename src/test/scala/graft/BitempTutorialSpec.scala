package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.GraftNode

/** Port of the reference's bitemporality tutorial test —
  * docs/articles/…/examples/bitemporality_test.clj — the airport
  * entry/departure narrative: 17 single-put transactions interleaving
  * four travellers' valid-time corrections, then the double-basis query
  * `as at` valid time 2019-01-02 AND `as of` the mid-stream transaction
  * (the tag::bitempq tags). Exercises same-(eid, vt) correction
  * supersession across transactions with the tx axis pinned mid-history.
  * Keywords ride as ":SFO"-style strings, insts as ISO strings (opaque
  * values — the query only binds and returns them). */
class BitempTutorialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def put(node: GraftNode, id: String, entryPt: String,
      arrival: String, departure: String, vt: String): node.TxInfo = {
    val doc: JObject = ("crux.db/id" -> id) ~ ("entry-pt" -> entryPt) ~
      ("arrival-time" -> arrival) ~ ("departure-time" -> departure)
    val tx = node.submitTx(List(
      JArray(List(JString("put"), doc, JString(s"${vt}T00:00:00")))))
    assert(tx.committed, s"put of $id at $vt must commit")
    tx
  }

  test("the bitemporality tutorial's double-basis query (bitemporality_test.clj)") {
    val node = new GraftNode(spark, TableSource.tpch(spark, "/root/testdata/sf0.001"))
    val na = ":na"

    put(node, ":p2", ":SFO", "2018-12-31", na, "2018-12-31") // bitemp0
    put(node, ":p3", ":LA", "2018-12-31", na, "2018-12-31") // bitemp1
    put(node, ":p4", ":NY", "2019-01-02", na, "2019-01-02") // bitemp2
    // bitemp3 — the tx the query pins its transaction axis to
    val basis =
      put(node, ":p4", ":NY", "2019-01-02", "2019-01-03", "2019-01-03")
    put(node, ":p1", ":NY", "2018-12-31", na, "2018-12-31") // bitemp4
    put(node, ":p1", ":NY", "2018-12-31", "2019-01-03", "2019-01-03") // 4b
    put(node, ":p1", ":LA", "2019-01-04", na, "2019-01-04") // 4c
    put(node, ":p3", ":LA", "2018-12-31", "2019-01-04", "2019-01-04") // 4d
    put(node, ":p2", ":SFO", "2018-12-31", "2019-01-05", "2019-01-05") // 5
    put(node, ":p3", ":LA", "2018-12-31", na, "2019-01-04") // 7a
    put(node, ":p3", ":LA", "2018-12-31", "2019-01-07", "2019-01-07") // 7b
    put(node, ":p3", ":SFO", "2019-01-08", na, "2019-01-08") // 8a
    put(node, ":p4", ":LA", "2019-01-08", na, "2019-01-08") // 8b
    put(node, ":p3", ":SFO", "2019-01-08", "2019-01-08", "2019-01-09") // 9
    put(node, ":p5", ":LA", "2019-01-10", na, "2019-01-10") // 10
    put(node, ":p7", ":NY", "2019-01-11", na, "2019-01-11") // 11
    put(node, ":p6", ":NY", "2019-01-12", na, "2019-01-12") // 12

    val query = """
      {:find [p entry-pt arrival-time departure-time]
       :where [[p :entry-pt entry-pt]
               [p :arrival-time arrival-time]
               [p :departure-time departure-time]]}"""
    def at(vt: String, txId: Option[Long]): Set[Seq[Any]] =
      node.queryAt(query,
          validTime = Some(java.time.LocalDateTime.parse(s"${vt}T00:00:00")),
          txId = txId)
        .collect().toSet[Row].map(_.toSeq)

    // tag::bitempr — `as at` vt 2019-01-02, `as of` the bitemp3 tx:
    // p1's puts are all later transactions; p4's 01-03 correction is a
    // LATER valid time than the query's, so the 01-02 doc still wins
    assert(at("2019-01-02", Some(basis.txId)) == Set(
      Seq(":p2", ":SFO", "2018-12-31", na),
      Seq(":p3", ":LA", "2018-12-31", na),
      Seq(":p4", ":NY", "2019-01-02", na)))

    // same valid time at the CURRENT tx basis: every correction in the
    // stream carries a LATER valid time than 2019-01-02, so the only
    // change against the pinned-tx view is p1's retroactive 2018-12-31
    // arrival (tx bitemp4 — submitted after the basis tx, placed before
    // the query's valid time); 4b's departure lives at vt 2019-01-03
    assert(at("2019-01-02", None) == Set(
      Seq(":p1", ":NY", "2018-12-31", na),
      Seq(":p2", ":SFO", "2018-12-31", na),
      Seq(":p3", ":LA", "2018-12-31", na),
      Seq(":p4", ":NY", "2019-01-02", na)))

    // end of the narrative (vt 2019-01-12, current txs): each
    // traveller's max-valid-time doc — p3's 8a open stint superseded by
    // tx 9's same-day-departure correction at vt 01-09, p2 still carrying
    // the departed-01-05 doc, p4 in LA since 01-08, p5/p6/p7 arrivals
    assert(at("2019-01-12", None) == Set(
      Seq(":p1", ":LA", "2019-01-04", na),
      Seq(":p2", ":SFO", "2018-12-31", "2019-01-05"),
      Seq(":p3", ":SFO", "2019-01-08", "2019-01-08"),
      Seq(":p4", ":LA", "2019-01-08", na),
      Seq(":p5", ":LA", "2019-01-10", na),
      Seq(":p6", ":NY", "2019-01-12", na),
      Seq(":p7", ":NY", "2019-01-11", na)))
  }
}
