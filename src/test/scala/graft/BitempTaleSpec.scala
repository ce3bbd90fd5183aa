package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.GraftNode

/** Port of the reference's "A Bitemporal Tale" tutorial —
  * crux-test/test/crux/bitemporal_tale_test.clj — the full narrative:
  * valid-time puts, queries at many bases, delete/evict, driver-side
  * entity updates, match-guarded retroactive corrections (the cozy-mug
  * provenance), and a (valid-time, tx-time) double-basis query. Dates
  * are carried as ISO strings inside the JSON docs (opaque values; only
  * names/titles/ints are queried). */
class BitempTaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def vt(s: String) = java.time.LocalDateTime.parse(s + "T00:00:00")
  private def put(doc: JObject, validTime: String): JValue =
    JArray(List(JString("put"), doc, JString(s"${validTime}T00:00:00")))
  private def matchOp(eid: String, doc: JValue, atVt: String): JValue =
    JArray(List(JString("match"), JString(eid), doc, JString(s"${atVt}T00:00:00")))

  private def q(node: GraftNode, edn: String, at: Option[String] = None,
      txTime: Option[java.time.LocalDateTime] = None): Set[Seq[Any]] =
    node.queryAt(edn, validTime = at.map(vt), txTime = txTime)
      .collect().toSet[Row].map(_.toSeq)

  private def entityAt(node: GraftNode, eid: String, at: Option[String] = None): Option[JObject] =
    node.entityDoc(eid, at.map(vt), None, None).map(_.asInstanceOf[JObject])

  private def fields(doc: JObject): Map[String, JValue] = doc.obj.toMap

  /** update doc: set key to the given array value (the tale's
    * `(update e :person/has conj/disj …)`). */
  private def withHas(doc: JObject, has: Set[String]): JObject =
    JObject(doc.obj.filterNot(_._1 == "person/has") :+
      ("person/has" -> JArray(has.toList.sorted.map(JString(_)))))
  private def hasOf(doc: JObject): Set[String] =
    fields(doc).get("person/has").collect {
      case JArray(items) => items.collect { case JString(s) => s }.toSet
    }.getOrElse(Set.empty)

  test("a bitemporal tale (bitemporal_tale_test.clj)") {
    val node = new GraftNode(spark, TableSource.tpch(spark, "/root/testdata/sf0.001"))

    val charles: JObject =
      ("crux.db/id" -> ":ids.people/Charles") ~ ("person/name" -> "Charles") ~
      ("person/born" -> "1700-05-18T00:00:00") ~
      ("person/location" -> ":ids.places/rarities-shop") ~
      ("person/str" -> 40) ~ ("person/int" -> 40) ~ ("person/dex" -> 40) ~
      ("person/hp" -> 40) ~ ("person/gold" -> 10000)
    assert(node.submitTx(List(put(charles, "1700-05-18"))).committed)

    node.submitTx(List(
      put(("crux.db/id" -> ":ids.people/Mary") ~ ("person/name" -> "Mary") ~
        ("person/born" -> "1710-05-18T00:00:00") ~
        ("person/location" -> ":ids.places/carribean") ~
        ("person/str" -> 40) ~ ("person/int" -> 50) ~ ("person/dex" -> 50) ~
        ("person/hp" -> 50), "1710-05-18"),
      put(("crux.db/id" -> ":ids.people/Joe") ~ ("person/name" -> "Joe") ~
        ("person/born" -> "1715-05-18T00:00:00") ~
        ("person/location" -> ":ids.places/city") ~
        ("person/str" -> 39) ~ ("person/int" -> 40) ~ ("person/dex" -> 60) ~
        ("person/hp" -> 60) ~ ("person/gold" -> 70), "1715-05-18")))

    node.submitTx(List(
      put(("crux.db/id" -> ":ids.artefacts/cozy-mug") ~
        ("artefact/title" -> "A Rather Cozy Mug") ~ ("artefact.perks/int" -> 3),
        "1625-05-18"),
      put(("crux.db/id" -> ":ids.artefacts/forbidden-beans") ~
        ("artefact/title" -> "Magic beans") ~ ("artefact.perks/int" -> 30) ~
        ("artefact.perks/hp" -> -20), "1500-05-18"),
      put(("crux.db/id" -> ":ids.artefacts/pirate-sword") ~
        ("artefact/title" -> "A used sword"), "1710-05-18"),
      put(("crux.db/id" -> ":ids.artefacts/flintlock-pistol") ~
        ("artefact/title" -> "Flintlock pistol"), "1710-05-18"),
      put(("crux.db/id" -> ":ids.artefacts/unknown-key") ~
        ("artefact/title" -> "Key from an unknown door"), "1700-05-18"),
      put(("crux.db/id" -> ":ids.artefacts/laptop") ~
        ("artefact/title" -> "A Tell DPS Laptop (what?)"), "2016-05-18")))

    node.submitTx(List(
      put(("crux.db/id" -> ":ids.places/continent") ~
        ("place/title" -> "Ah The Continent"), "1000-01-01"),
      put(("crux.db/id" -> ":ids.places/carribean") ~
        ("place/title" -> "Ah The Good Ol Carribean Sea") ~
        ("place/location" -> ":ids.places/carribean"), "1000-01-01"),
      put(("crux.db/id" -> ":ids.places/coconut-island") ~
        ("place/title" -> "Coconut Island") ~
        ("place/location" -> ":ids.places/carribean"), "1000-01-01")))

    // entity read returns the doc verbatim
    assert(entityAt(node, ":ids.people/Charles").map(fields) == Some(fields(charles)))

    assert(q(node, """{:find [?entity-id] :where [[?entity-id :person/name "Charles"]]}""") ==
      Set(Seq(":ids.people/Charles")))
    assert(q(node,
      """{:find [?e ?name ?int]
         :where [[?e :person/name "Charles"] [?e :person/name ?name] [?e :person/int ?int]]}""") ==
      Set(Seq(":ids.people/Charles", "Charles", 40L)))
    assert(q(node, """{:find [?name] :where [[_ :artefact/title ?name]]}""") ==
      Set(Seq("Key from an unknown door"), Seq("Magic beans"), Seq("A used sword"),
        Seq("A Rather Cozy Mug"), Seq("A Tell DPS Laptop (what?)"), Seq("Flintlock pistol")))

    // the beans never happened (retroactive delete), the laptop is evicted
    node.submitTx(List(JArray(List(JString("delete"),
      JString(":ids.artefacts/forbidden-beans"), JString("1690-05-18T00:00:00")))))
    node.submitTx(List(JArray(List(JString("evict"), JString(":ids.artefacts/laptop")))))
    assert(q(node, """{:find [?name] :where [[_ :artefact/title ?name]]}""") ==
      Set(Seq("Key from an unknown door"), Seq("A used sword"),
        Seq("A Rather Cozy Mug"), Seq("Flintlock pistol")))

    // the world in 1599 still has the beans
    assert(q(node, """{:find [?name] :where [[_ :artefact/title ?name]]}""",
      at = Some("1599-01-01")) == Set(Seq("Magic beans")))

    // first ownership tx: read entities at a basis, extend person/has
    def firstOwnershipTx(): List[JValue] = List(
      {
        val c = entityAt(node, ":ids.people/Charles", Some("1725-05-17")).get
        put(withHas(c, hasOf(c) + ":ids.artefacts/cozy-mug" + ":ids.artefacts/unknown-key"),
          "1725-05-18")
      },
      {
        val m = entityAt(node, ":ids.people/Mary", Some("1715-05-17")).get
        put(withHas(m, hasOf(m) + ":ids.artefacts/pirate-sword" + ":ids.artefacts/flintlock-pistol"),
          "1715-05-18")
      })
    val firstOwnership = node.submitTx(firstOwnershipTx())
    assert(firstOwnership.committed)

    val whoHasWhat =
      """{:find [?name ?atitle]
         :where [[?p :person/name ?name] [?p :person/has ?artefact-id]
                 [?artefact-id :artefact/title ?atitle]]}"""
    assert(q(node, whoHasWhat, at = Some("1726-05-01")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol"),
        Seq("Charles", "A Rather Cozy Mug"), Seq("Charles", "Key from an unknown door")))
    assert(q(node, whoHasWhat, at = Some("1716-05-01")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol")))

    // parametrized query: single-map :args with a set value + contains?
    assert(q(node,
      """{:find [?name]
         :args {ids #{:ids.people/Charles :ids.people/Mary}}
         :where [[?e :person/name ?name] [(contains? ids ?e)]]
         :limit 10}""", at = Some("1726-05-01")) == Set(Seq("Mary"), Seq("Charles")))

    // entity-update helper: merge new attrs at a valid time
    {
      val prev = entityAt(node, ":ids.people/Charles").get
      val updated = JObject(prev.obj.filterNot(_._1 == "person/int") :+
        ("person/int" -> JInt(50)))
      node.submitTx(List(put(updated, "1730-05-18")))
      val now = entityAt(node, ":ids.people/Charles").get
      assert(fields(now)("person/int") == JInt(50))
      assert(hasOf(now) == Set(":ids.artefacts/cozy-mug", ":ids.artefacts/unknown-key"))
    }

    // entity-with-adjacent: resolve person/has ids to their docs
    {
      val c = entityAt(node, ":ids.people/Charles").get
      val adjacent = hasOf(c).map(id => fields(entityAt(node, id).get)("artefact/title"))
      assert(adjacent == Set(JString("Key from an unknown door"), JString("A Rather Cozy Mug")))
    }

    // the theft of 1740: mug moves from Charles to Mary
    {
      val theft = "1740-06-18"
      val c = entityAt(node, ":ids.people/Charles", Some(theft)).get
      val m = entityAt(node, ":ids.people/Mary", Some(theft)).get
      node.submitTx(List(
        put(withHas(c, hasOf(c) - ":ids.artefacts/cozy-mug"), theft),
        put(withHas(m, hasOf(m) + ":ids.artefacts/cozy-mug"), theft)))
    }
    assert(q(node, whoHasWhat, at = Some("1740-06-18")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol"),
        Seq("Mary", "A Rather Cozy Mug"), Seq("Charles", "Key from an unknown door")))

    // retroactive correction guarded by match: Mary had the mug from birth…
    {
      val birth = "1710-05-18"
      val babyMary = entityAt(node, ":ids.people/Mary", Some(birth)).get
      val tx = node.submitTx(List(
        matchOp(":ids.people/Mary", babyMary, birth),
        put(withHas(babyMary, hasOf(babyMary) + ":ids.artefacts/cozy-mug"), birth)))
      assert(tx.committed)
    }
    // …but lost it in 1723
    {
      val lost = "1723-01-09"
      val mary = entityAt(node, ":ids.people/Mary", Some(lost)).get
      val tx = node.submitTx(List(
        matchOp(":ids.people/Mary", mary, lost),
        put(withHas(mary, hasOf(mary) - ":ids.artefacts/cozy-mug"), lost)))
      assert(tx.committed)
    }
    // at 1715 the ownership put (derived before the correction) still
    // wins over the corrected birth doc — no mug yet
    assert(q(node, whoHasWhat, at = Some("1715-05-18")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol")))

    // re-assert first ownership over the corrected history: Mary at
    // 1715-05-17 NOW carries the mug, so the re-derived put includes it
    node.submitTx(firstOwnershipTx())
    assert(q(node, whoHasWhat, at = Some("1715-05-18")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol"),
        Seq("Mary", "A Rather Cozy Mug")))
    assert(q(node, whoHasWhat, at = Some("1740-06-19")) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol"),
        Seq("Mary", "A Rather Cozy Mug"), Seq("Charles", "Key from an unknown door")))

    // double basis: valid-time 1715 as-of the FIRST ownership tx-time —
    // the later corrections don't exist yet on that tx axis
    assert(q(node, whoHasWhat, at = Some("1715-06-19"),
      txTime = Some(firstOwnership.txTime)) ==
      Set(Seq("Mary", "A used sword"), Seq("Mary", "Flintlock pistol")))
  }
}
