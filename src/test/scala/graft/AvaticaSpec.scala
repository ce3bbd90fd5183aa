package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import graft.datalog.TableSource
import graft.http.{GraftNode, HttpServer, Json}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** Drives the Avatica JSON RPC wire surface (POST /_crux/avatica) through
  * a full thin-driver conversation — the message sequence the Avatica
  * remote driver sends for `DriverManager.getConnection` +
  * `Statement.executeQuery` + paged `ResultSet.next()` against the
  * reference's Calcite server (crux-sql/src/crux/calcite.clj:495-527):
  * openConnection → createStatement → prepareAndExecute (first frame) →
  * fetch (remaining frames) → closeStatement → closeConnection, plus the
  * PreparedStatement arm (prepare → execute with TypedValue parameters)
  * and the DatabaseMetaData requests (getTables/getColumns).
  */
class AvaticaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val client = HttpClient.newHttpClient()

  private def withServer[A](f: Int => A): A = {
    val node = new GraftNode(spark, TableSource.tpch(spark, dir), sqlDir = Some(dir))
    val server = new HttpServer(node).start()
    try f(server.boundPort) finally server.stop()
  }

  private def rpc(port: Int, body: String): (Int, JValue) = {
    val req = HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port/_crux/avatica"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()
    val r = client.send(req, HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), Json.parse(r.body()))
  }

  private def str(j: JValue): String =
    j match { case JString(s) => s; case other => fail(s"not a string: $other") }
  private def num(j: JValue): Long = j match {
    case JLong(l) => l
    case JInt(i) => i.toLong
    case JDouble(d) => d.toLong
    case other => fail(s"not a number: $other")
  }
  private def arr(j: JValue): List[JValue] =
    j match { case JArray(xs) => xs; case other => fail(s"not an array: $other") }
  private def bool(j: JValue): Boolean =
    j match { case JBool(b) => b; case other => fail(s"not a bool: $other") }

  test("thin-driver conversation: open, execute, paged fetch, close") {
    withServer { port =>
      val cid = "conn-1"
      val (c1, open) = rpc(port, s"""{"request":"openConnection","connectionId":"$cid"}""")
      assert(c1 == 200 && str(open \ "response") == "openConnection")

      val (_, cs) = rpc(port, s"""{"request":"createStatement","connectionId":"$cid"}""")
      val sid = num(cs \ "statementId")

      // 25 nations, first frame capped at 10 → three pages
      val (c2, ex) = rpc(port, Json.render(JObject(
        "request" -> JString("prepareAndExecute"), "connectionId" -> JString(cid),
        "statementId" -> JLong(sid),
        "sql" -> JString("SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"),
        "maxRowCount" -> JLong(-1), "maxRowsInFirstFrame" -> JLong(10))))
      assert(c2 == 200, ex)
      assert(str(ex \ "response") == "executeResults")
      val rs = arr(ex \ "results").head
      assert(str(rs \ "response") == "resultSet")
      val cols = arr(rs \ "signature" \ "columns")
      assert(cols.map(c => str(c \ "columnName")) == List("n_nationkey", "n_name"))
      assert(str(cols.head \ "type" \ "name") == "INTEGER")
      val frame1 = rs \ "firstFrame"
      assert(!bool(frame1 \ "done") && arr(frame1 \ "rows").size == 10)
      assert(num(arr(arr(frame1 \ "rows").head).head) == 0L)

      val (_, f2) = rpc(port, s"""{"request":"fetch","connectionId":"$cid",
        "statementId":$sid,"offset":10,"fetchMaxRowCount":10}""")
      val frame2 = f2 \ "frame"
      assert(num(frame2 \ "offset") == 10 && arr(frame2 \ "rows").size == 10)
      assert(num(arr(arr(frame2 \ "rows").head).head) == 10L)

      val (_, f3) = rpc(port, s"""{"request":"fetch","connectionId":"$cid",
        "statementId":$sid,"offset":20,"fetchMaxRowCount":10}""")
      val frame3 = f3 \ "frame"
      assert(bool(frame3 \ "done") && arr(frame3 \ "rows").size == 5)

      val (_, cl) = rpc(port, s"""{"request":"closeStatement","connectionId":"$cid","statementId":$sid}""")
      assert(str(cl \ "response") == "closeStatement")
      val (_, cc) = rpc(port, s"""{"request":"closeConnection","connectionId":"$cid"}""")
      assert(str(cc \ "response") == "closeConnection")
    }
  }

  test("prepared statement with TypedValue parameters") {
    withServer { port =>
      val cid = "conn-2"
      rpc(port, s"""{"request":"openConnection","connectionId":"$cid"}""")
      val (_, prep) = rpc(port, Json.render(JObject(
        "request" -> JString("prepare"), "connectionId" -> JString(cid),
        "sql" -> JString("SELECT n_name FROM nation WHERE n_regionkey = ? ORDER BY n_name"),
        "maxRowCount" -> JLong(-1))))
      assert(str(prep \ "response") == "prepare")
      val sid = num(prep \ "statement" \ "id")
      assert(arr(prep \ "statement" \ "signature" \ "parameters").size == 1)

      val (c, ex) = rpc(port, s"""{"request":"execute",
        "statementHandle":{"connectionId":"$cid","id":$sid},
        "parameterValues":[{"type":"LONG","value":0}],
        "maxRowsInFirstFrame":-1}""")
      assert(c == 200, ex)
      val frame = arr(ex \ "results").head \ "firstFrame"
      val names = arr(frame \ "rows").map(r => str(arr(r).head))
      assert(names.nonEmpty && names == names.sorted)
      // re-execute with a different binding reuses the prepared handle
      val (_, ex2) = rpc(port, s"""{"request":"execute",
        "statementHandle":{"connectionId":"$cid","id":$sid},
        "parameterValues":[{"type":"LONG","value":1}],
        "maxRowsInFirstFrame":-1}""")
      val names2 = arr(arr(ex2 \ "results").head \ "firstFrame" \ "rows").map(r => str(arr(r).head))
      assert(names2.nonEmpty && names2.toSet.intersect(names.toSet).isEmpty)
    }
  }

  test("metadata: getTables lists the catalog, getColumns typed") {
    withServer { port =>
      val cid = "conn-3"
      rpc(port, s"""{"request":"openConnection","connectionId":"$cid"}""")
      val (_, gt) = rpc(port, s"""{"request":"getTables","connectionId":"$cid"}""")
      val tables = arr(gt \ "firstFrame" \ "rows").map(r => str(arr(r)(2)))
      assert(tables.contains("nation") && tables.contains("lineitem"))

      val (_, gc) = rpc(port, s"""{"request":"getColumns","connectionId":"$cid",
        "tableNamePattern":"region"}""")
      val colRows = arr(gc \ "firstFrame" \ "rows").map(arr)
      assert(colRows.map(r => str(r(3))).contains("r_name"))
      assert(colRows.forall(r => str(r(2)) == "region"))
    }
  }

  test("errors use the Avatica error shape; unknown connection rejected") {
    withServer { port =>
      val cid = "conn-4"
      rpc(port, s"""{"request":"openConnection","connectionId":"$cid"}""")
      rpc(port, s"""{"request":"createStatement","connectionId":"$cid"}""")
      val (code, e) = rpc(port, s"""{"request":"prepareAndExecute","connectionId":"$cid",
        "statementId":0,"sql":"SELECT FROM nowhere","maxRowsInFirstFrame":10}""")
      assert(code == 500 && str(e \ "response") == "error")
      assert(str(e \ "severity") == "ERROR")

      val (code2, e2) = rpc(port, s"""{"request":"createStatement","connectionId":"ghost"}""")
      assert(code2 == 500 && str(e2 \ "response") == "error")
    }
  }
}
