package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.JsonDSL._
import graft.datalog.TableSource
import graft.http.{GraftHttpClient, GraftNode, HttpServer}

/** The Scala remote-API client ([[GraftHttpClient]] — crux-http-client
  * analogue, remote_api_client.clj) against a live in-process
  * [[HttpServer]]: the full node-level + db-level surface, including the
  * streaming openQuery cursor and bitemporal db bases.
  */
class HttpClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def withClient[A](f: (GraftHttpClient, GraftNode) => A): A = {
    val node = new GraftNode(spark, TableSource.tpch(spark, dir),
      sqlDir = Some(dir))
    val server = new HttpServer(node).start()
    try f(new GraftHttpClient(s"http://127.0.0.1:${server.boundPort}"), node)
    finally server.stop()
  }

  private def put(id: String, fields: (String, JValue)*): JValue =
    JArray(List(JString("put"), JObject(("crux.db/id" -> JString(id)) :: fields.toList)))
  private def putAt(id: String, vt: String, fields: (String, JValue)*): JValue =
    JArray(List(JString("put"), JObject(("crux.db/id" -> JString(id)) :: fields.toList),
      JString(vt)))

  test("status, attribute-stats, metrics") {
    withClient { (c, _) =>
      assert(c.status()("crux.version/version") == "graft-spark")
      val stats = c.attributeStats(Seq("r_name", "n_name"))
      assert(stats("r_name") == 5L && stats("n_name") == 25L)
      assert(c.metrics().contains("crux.metrics.query/completed"))
    }
  }

  test("submitTx → awaitTx → txLog → txCommitted → latest txes") {
    withClient { (c, _) =>
      val tx1 = c.submitTx(Seq(putAt("ivan", "2020-01-01T00:00", "name" -> JString("Ivan"))))
      val tx2 = c.submitTx(Seq(putAt("ivan", "2021-01-01T00:00", "name" -> JString("Ivan 2"))))
      assert(tx2.txId == tx1.txId + 1)
      assert(c.awaitTx(tx2.txId).exists(_.txId == tx2.txId))
      assert(c.sync().exists(_.txId == tx2.txId))
      assert(c.latestCompletedTx.exists(_.txId == tx2.txId))
      assert(c.latestSubmittedTx.exists(_.txId == tx2.txId))
      assert(c.txCommitted(tx1.txId))
      val log = c.txLog(withOps = true)
      assert(log.size == 2 && log.forall(_.contains("crux.api/tx-ops")))
      assert(c.txLog(afterTxId = Some(tx1.txId)).size == 1)
    }
  }

  test("db-level: query (eager + streaming), entity, entityTx, history") {
    withClient { (c, _) =>
      c.submitTx(Seq(putAt("ivan", "2020-01-01T00:00",
        "name" -> JString("Ivan"), "age" -> JInt(30))))
      c.submitTx(Seq(putAt("ivan", "2021-01-01T00:00",
        "name" -> JString("Ivan 2"), "age" -> JInt(31))))

      // catalog-side query (no basis): TPC-H regions
      val r = c.db.query("""[:find ?n :where [[?r :r_name ?n]]]""")
      assert(r.find == Seq("n"))
      assert(r.rows.map(_.head).toSet ==
        Set("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))

      // streaming cursor: rows come off the chunked response one at a time
      val it = c.db.openQuery("""[:find ?n :where [[?r :r_name ?n]]]""")
      try {
        assert(it.find == Seq("n"))
        assert(it.hasNext)
        assert(it.toList.size == 5)
      } finally it.close()

      // doc-store basis: latest vs as-of 2020
      val latest = c.db().query("""[:find ?n :where [[?e :name ?n] [?e :age 31]]]""")
      assert(latest.rows == Seq(Seq("Ivan 2")))
      val asOf = c.db(validTime = Some(java.time.LocalDateTime.parse("2020-06-01T00:00")))
      assert(asOf.query("""[:find ?n :where [[?e :name ?n]]]""").rows == Seq(Seq("Ivan")))

      // in-args through the wire
      val arg = c.db.query("""[:find ?k :in [?name] :where [[?r :r_name ?name] [?r :r_regionkey ?k]]]""",
        Seq("ASIA"))
      assert(arg.rows == Seq(Seq(2L)))
      // a ':'-led STRING that is not a legal keyword must stay quoted on
      // the wire (the old startsWith-":" heuristic emitted invalid EDN)
      val notKw = c.db.query(
        """[:find ?k :in [?name] :where [[?r :r_name ?name] [?r :r_regionkey ?k]]]""",
        Seq(":not a keyword"))
      assert(notKw.rows.isEmpty) // binds the literal string; matches nothing

      // entity / entityTx / history
      assert(c.db().entity("ivan").exists(_("name") == "Ivan 2"))
      assert(asOf.entity("ivan").exists(_("name") == "Ivan"))
      assert(c.db().entity("nobody").isEmpty)
      assert(c.db().entityTx("ivan").exists(_("eid") == "ivan"))
      val hist = c.db().entityHistory("ivan", withDocs = true)
      assert(hist.size == 2)
      assert(hist.head("vt").toString.startsWith("2020-01-01"))
      val histDesc = c.db().entityHistory("ivan", sortAsc = false)
      assert(histDesc.head("vt").toString.startsWith("2021-01-01"))
    }
  }

  test("sql over the wire") {
    withClient { (c, _) =>
      val r = c.sql("SELECT r_name FROM region WHERE r_regionkey < 2 ORDER BY r_name")
      assert(r.find == Seq("r_name"))
      assert(r.rows == Seq(Seq("AFRICA"), Seq("AMERICA")))
    }
  }

  test("query errors surface as exceptions with the server's message") {
    withClient { (c, _) =>
      // unknown attrs are NOT errors (they bind empty, query_test.clj:1083)
      assert(c.db.query("""[:find ?x :where [[?x :no_such_attr ?y]]]""").rows.isEmpty)
      // an unparseable query IS: the 400 body's message surfaces client-side
      val e = intercept[IllegalArgumentException] {
        c.db.query("""[:find ?x :where [[(no-such-fn 1) ?x]]]""")
      }
      assert(e.getMessage.toLowerCase.contains("no-such-fn"))
    }
  }

  test("monitoring routes reflect client queries") {
    withClient { (c, _) =>
      c.db.query("""[:find ?n :where [[?r :r_name ?n]]]""")
      assert(c.recentQueries().nonEmpty)
      // the slowest ring is threshold-gated (100 ms): membership needs a
      // DELIBERATELY slow query — a warm cached query finishes under the
      // threshold and asserting on it flaked with JVM warmth
      graft.datalog.Planner.registerFunction("slow-ident-cli") { args =>
        val f = org.apache.spark.sql.functions.udf { (x: String) =>
          Thread.sleep(150); x
        }
        f(args.head)
      }
      c.db.query("""[:find ?sn :where [[?r :r_name ?n] [(slow-ident-cli ?n) ?sn]]]""")
      assert(c.slowestQueries().nonEmpty)
      val m = c.metrics()
      assert(m("crux.metrics.query/completed").toString.toLong >= 1L)
    }
  }
}
