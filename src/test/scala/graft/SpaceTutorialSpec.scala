package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.{GraftNode, Json}

/** Port of the reference's "Crux in Space" tutorial —
  * crux-test/test/crux/space_tutorial_test.clj — the end-user narrative
  * over put (plain / valid-time / valid-range), entity-at-valid-time,
  * history correction, and match-guarded trades, driven through
  * [[GraftNode]]'s JSON tx surface (the same ops the HTTP server takes).
  */
class SpaceTutorialSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def newNode() = new GraftNode(spark, TableSource.tpch(spark, dir))

  private def vt(s: String) = java.time.LocalDateTime.parse(s)

  private def put(doc: JObject, times: String*): JValue =
    JArray(JString("put") :: doc :: times.toList.map(JString(_)))

  private def matchOp(eid: String, doc: JObject): JValue =
    JArray(List(JString("match"), JString(eid), doc))

  private def docAt(node: GraftNode, eid: String, at: Option[String] = None): Option[JValue] =
    node.entityDoc(eid, at.map(vt), None, None)

  private val manifest: JObject =
    ("crux.db/id" -> "manifest") ~ ("pilot-name" -> "Johanna") ~
    ("id/rocket" -> "SB002-sol") ~ ("id/employee" -> "22910x2") ~
    ("badges" -> "SETUP") ~
    ("cargo" -> List("stereo", "gold fish", "slippers", "secret note"))

  test("earth: put a doc, read it back verbatim (space_tutorial:52-68)") {
    val node = newNode()
    assert(node.submitTx(List(put(manifest))).committed)
    val doc = docAt(node, "manifest").get
    assert((doc \ "pilot-name") == JString("Johanna"))
    assert((doc \ "cargo").asInstanceOf[JArray].arr.map(_.values) ==
      List("stereo", "gold fish", "slippers", "secret note"))
  }

  test("pluto: valid-time puts resolve per as-of basis (space_tutorial:71-146)") {
    val node = newNode()
    def stock(w: Double): JObject =
      ("crux.db/id" -> "stock/Pu") ~ ("commod" -> "commodity/Pu") ~ ("weight-ton" -> w)
    assert(node.submitTx(List(
      put(stock(21), "2115-02-13T18:00"),
      put(stock(23), "2115-02-14T18:00"),
      put(stock(22.2), "2115-02-15T18:00"),
      put(stock(24), "2115-02-18T18:00"),
      put(stock(24.9), "2115-02-19T18:00"))).committed)
    // ranged put: N is stocked only inside [13th, 19th)
    val nitro: JObject = ("crux.db/id" -> "stock/N") ~ ("commod" -> "commodity/N") ~ ("weight-ton" -> 3)
    assert(node.submitTx(List(
      put(nitro, "2115-02-13T18:00", "2115-02-19T18:00"))).committed)

    assert((docAt(node, "stock/Pu", Some("2115-02-14T00:00")).get \ "weight-ton") == JDouble(21))
    assert((docAt(node, "stock/Pu", Some("2115-02-18T00:00")).get \ "weight-ton") == JDouble(22.2))
    assert((docAt(node, "stock/N", Some("2115-02-15T00:00")).get \ "weight-ton").values == 3)
    assert(docAt(node, "stock/N", Some("2115-02-20T00:00")).isEmpty) // range ended
    assert(docAt(node, "stock/N", Some("2115-02-13T00:00")).isEmpty) // range not started
  }

  test("neptune: retroactive valid-range corrections (space_tutorial:258-331)") {
    val node = newNode()
    def cover(covered: Boolean, coverType: Option[String]): JObject = {
      val base: JObject = ("crux.db/id" -> "consumer/RJ29sUU") ~
        ("consumer-id" -> "RJ29sUU") ~ ("first-name" -> "Jay") ~
        ("last-name" -> "Rose") ~ ("cover?" -> covered)
      coverType.fold(base)(t => base ~ ("cover-type" -> t))
    }
    assert(node.submitTx(List(put(cover(true, Some("Full")), "2114-12-03T00:00"))).committed)
    assert(node.submitTx(List(
      put(cover(true, Some("Full")), "2113-12-03T00:00", "2114-12-03T00:00"),
      put(cover(true, Some("Full")), "2112-12-03T00:00", "2113-12-03T00:00"),
      put(cover(false, None), "2112-06-03T00:00", "2112-12-02T00:00"),
      put(cover(true, Some("Promotional")), "2111-06-03T00:00", "2112-06-03T00:00"))).committed)

    val at2115 = docAt(node, "consumer/RJ29sUU", Some("2115-07-03T00:00")).get
    assert((at2115 \ "cover?") == JBool(true) && (at2115 \ "cover-type") == JString("Full"))
    // 2112-07-03 falls in the cover?=false stretch: the reference's query
    // binding BOTH cover? and cover-type returns {} — the doc has no type
    val at2112 = docAt(node, "consumer/RJ29sUU", Some("2112-07-03T00:00")).get
    assert((at2112 \ "cover?") == JBool(false) && (at2112 \ "cover-type") == JNothing)
    val at2111 = docAt(node, "consumer/RJ29sUU", Some("2111-07-03T00:00")).get
    assert((at2111 \ "cover-type") == JString("Promotional"))
  }

  test("saturn: match-guarded trade commits, stale match aborts (space_tutorial:339-420)") {
    val node = newNode()
    val blue0: JObject = ("crux.db/id" -> "blue-energy") ~ ("seller?" -> false) ~
      ("buyer?" -> true) ~ ("company-name" -> "Blue Energy") ~ ("credits" -> 1000)
    val blue1: JObject = ("crux.db/id" -> "blue-energy") ~ ("seller?" -> false) ~
      ("buyer?" -> true) ~ ("company-name" -> "Blue Energy") ~ ("credits" -> 900) ~
      ("units/CH4" -> 10)
    assert(node.submitTx(List(put(blue0))).committed)

    // match against the current doc → trade commits
    assert(node.submitTx(List(matchOp("blue-energy", blue0), put(blue1))).committed)
    assert((docAt(node, "blue-energy").get \ "credits").values == 900)

    // match against a STALE doc → whole tx aborts, state unchanged
    val stale = node.submitTx(List(matchOp("blue-energy", blue0),
      put(("crux.db/id" -> "blue-energy") ~ ("credits" -> 0))))
    assert(!stale.committed)
    assert((docAt(node, "blue-energy").get \ "credits").values == 900)
    assert(node.txCommitted(stale.txId).contains(false))
  }

  test("badges accumulate through repeated puts (doc replacement)") {
    val node = newNode()
    assert(node.submitTx(List(put(manifest))).committed)
    val upgraded = manifest.obj.map {
      case ("badges", _) => "badges" -> (JArray(List(JString("SETUP"), JString("PUT"))): JValue)
      case kv => kv
    }
    assert(node.submitTx(List(put(JObject(upgraded)))).committed)
    assert((docAt(node, "manifest").get \ "badges").asInstanceOf[JArray].arr.map(_.values) ==
      List("SETUP", "PUT"))
    // json round-trip stays canonical: resubmitting the same doc is a no-op
    val before = node.currentVersions.count()
    assert(node.submitTx(List(put(JObject(upgraded)))).committed)
    assert(node.entityDoc("manifest", None, None, None).map(d => Json.render(d.asInstanceOf[JObject])) ==
      Some(Json.render(JObject(upgraded.sortBy(_._1)))))
    assert(node.currentVersions.count() == before + 1) // new version row, same content hash
  }

  test("oumuamua: evict removes one person, the rest keep their docs (space_tutorial:501)") {
    val node = newNode()
    def person(id: String, name: String, planet: String, tag: String): JObject =
      ("crux.db/id" -> id) ~ ("full-name" -> name) ~
        ("origin-planet" -> planet) ~ ("identity-tag" -> tag)
    assert(node.submitTx(List(
      put(person(":person/kaarlang", "Kaarlang", "Mars", ":KA01299242093")),
      put(person(":person/ilex", "Ilex Jefferson", "Venus", ":IJ01222212454")),
      put(person(":person/thadd", "Thad Christover", "Titan", ":IJ01222212454")),
      put(person(":person/johanna", "Johanna", "Earth", ":JA012992129120")))).committed)
    def names(): Set[Any] =
      node.queryAt("""{:find [n] :where [[e :full-name n]]}""")
        .collect().map(_.get(0)).toSet
    assert(names() == Set("Kaarlang", "Ilex Jefferson", "Thad Christover", "Johanna"))
    assert(node.submitTx(List(
      JArray(List(JString("evict"), JString(":person/kaarlang"))))).committed)
    assert(names() == Set("Ilex Jefferson", "Thad Christover", "Johanna"))
    // evicted: doc and history gone; the others keep theirs
    assert(docAt(node, ":person/kaarlang").isEmpty)
    assert(node.entityHistory(":person/kaarlang", sortAsc = false,
      withCorrections = false, withDocs = false, None, None).isEmpty)
    assert(!node.entityHistory(":person/ilex", sortAsc = false,
      withCorrections = false, withDocs = false, None, None).isEmpty)
    assert(docAt(node, ":person/thadd").nonEmpty)
  }
}
