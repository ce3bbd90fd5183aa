package graft.http

import java.net.URI
import java.net.http.{HttpClient => JdkHttpClient, HttpRequest, HttpResponse}
import java.net.URLEncoder
import java.nio.charset.StandardCharsets.UTF_8
import java.time.LocalDateTime

import org.json4s._
import org.json4s.JsonDSL._

/** Remote API client over the [[HttpServer]] wire — the `crux-http-client`
  * module (crux-http-client/src/crux/remote_api_client.clj implements the
  * whole ICruxAPI against `/_crux/...` routes) re-expressed as a Scala
  * library on the JDK's `java.net.http.HttpClient` (no extra deps; the
  * reference uses clj-http + edn readers).
  *
  * Mirrors the reference's API split:
  *   - node-level: status / attributeStats / submitTx / txLog / sync /
  *     awaitTx / latestCompletedTx / latestSubmittedTx / txCommitted
  *     (remote_api_client.clj:238-306) plus this server's metrics and
  *     query-monitor routes
  *   - db-level: [[GraftHttpClient.Db]] captures a bitemporal basis the
  *     way `(db node vt tt)` does (remote_api_client.clj:146-200):
  *     query / entity / entityTx / entityHistory run at that basis
  *
  * Scale: [[Db.openQuery]] streams — the server writes results over a
  * chunked response via `toLocalIterator`, and the client parses the
  * `results` array token-by-token off the socket (jackson streaming, the
  * same parser json4s wraps), so neither side ever holds the whole result
  * set; the reference's open-q cursor contract
  * (remote_api_client.clj:84-118 wraps the response InputStream the same
  * way). `query` is the eager convenience wrapper.
  */
object GraftHttpClient {
  final case class ClientTx(txId: Long, txTime: LocalDateTime)
  /** One query result: column names + rows (cells are JSON-decoded). */
  final case class QueryResult(find: Seq[String], rows: Seq[Seq[Any]])
}

final class GraftHttpClient(baseUrl: String,
    http: JdkHttpClient = JdkHttpClient.newHttpClient()) {
  import GraftHttpClient.{ClientTx, QueryResult}

  // --------------------------------------------------------- node level

  def status(): Map[String, Any] = objMap(getJson("/_crux/status"))

  def attributeStats(attrs: Seq[String] = Nil): Map[String, Long] = {
    val q = if (attrs.isEmpty) "" else "?attrs=" + enc(attrs.mkString(","))
    objMap(getJson("/_crux/attribute-stats" + q)).map {
      case (k, v: Long) => k.stripPrefix(":") -> v
      case (k, v) => k.stripPrefix(":") -> v.toString.toLong
    }
  }

  /** Submit tx ops in the server's JSON op shape (same vectors the
    * reference's JSON wire takes): e.g.
    * `JArray(List(JString("crux.tx/put"), doc))`. */
  def submitTx(ops: Seq[JValue]): ClientTx = {
    val body = Json.render("tx-ops" -> JArray(ops.toList))
    val resp = send(post("/_crux/submit-tx", body))
    if (resp.statusCode() != 202)
      throw new IllegalStateException(s"submit-tx failed: ${resp.body()}")
    txOf(Json.parse(resp.body()))
      .getOrElse(throw new IllegalStateException(s"bad submit-tx response: ${resp.body()}"))
  }

  def txLog(afterTxId: Option[Long] = None, withOps: Boolean = false): Seq[Map[String, Any]] = {
    val qs = Seq(afterTxId.map("after-tx-id=" + _),
      if (withOps) Some("with-ops=true") else None).flatten
    val path = "/_crux/tx-log" + (if (qs.isEmpty) "" else qs.mkString("?", "&", ""))
    getJson(path) \ "results" match {
      case JArray(xs) => xs.map(objMap)
      case _ => Nil
    }
  }

  /** Txs index synchronously on this server; sync/await return the head. */
  def sync(): Option[ClientTx] = txOf(getJson("/_crux/sync"))
  def awaitTx(txId: Long): Option[ClientTx] =
    txOf(getJson("/_crux/await-tx?tx-id=" + txId))
  def latestCompletedTx: Option[ClientTx] = txRoute("/_crux/latest-completed-tx")
  def latestSubmittedTx: Option[ClientTx] = txRoute("/_crux/latest-submitted-tx")

  def txCommitted(txId: Long): Boolean =
    getJson("/_crux/tx-committed?tx-id=" + txId) \ "tx-committed?" match {
      case JBool(b) => b
      case o => throw new IllegalStateException(s"bad tx-committed response: $o")
    }

  def metrics(): Map[String, Any] = objMap(getJson("/_crux/metrics"))
  def activeQueries(): Seq[Map[String, Any]] = arrSeq(getJson("/_crux/active-queries"))
  def recentQueries(): Seq[Map[String, Any]] = arrSeq(getJson("/_crux/recent-queries"))
  def slowestQueries(): Seq[Map[String, Any]] = arrSeq(getJson("/_crux/slowest-queries"))

  // ----------------------------------------------------------- db level

  /** The node's current db (no temporal basis — the table catalog side). */
  def db: Db = new Db(None, None, None, docStore = false)
  /** A bitemporal basis over the node's doc store, like `(db node vt tt)`. */
  def db(validTime: Option[LocalDateTime] = None,
      txTime: Option[LocalDateTime] = None, txId: Option[Long] = None): Db =
    new Db(validTime, txTime, txId, docStore = true)

  /** SQL-over-wire (`/_crux/sql` — the Avatica analogue). */
  def sql(q: String): QueryResult = db.runQuery("/_crux/sql?q=" + enc(q))

  final class Db private[GraftHttpClient] (validTime: Option[LocalDateTime],
      txTime: Option[LocalDateTime], txId: Option[Long], docStore: Boolean) {

    private def basisQs: Seq[String] =
      Seq(validTime.map("valid-time=" + _), txTime.map("tx-time=" + _),
        txId.map("tx-id=" + _),
        if (docStore && validTime.isEmpty && txTime.isEmpty && txId.isEmpty)
          Some("db=docs") else None).flatten

    /** Eager datalog query (GET /_crux/query with this db's basis). */
    def query(edn: String, inArgs: Seq[Any] = Nil): QueryResult = {
      val it = openQuery(edn, inArgs)
      try QueryResult(it.find, it.toSeq) finally it.close()
    }

    /** Streaming datalog query: rows are parsed off the chunked response
      * as the caller consumes them. Close when done (idempotent; fully
      * draining the iterator also closes). */
    def openQuery(edn: String, inArgs: Seq[Any] = Nil): RowIterator = {
      val args = if (inArgs.isEmpty) Nil
        else Seq("in-args-edn=" + enc(inArgs.map(ednArg).mkString("[", " ", "]")))
      val qs = (Seq("query-edn=" + enc(edn)) ++ args ++ basisQs).mkString("&")
      new RowIterator(stream("/_crux/query?" + qs))
    }

    private[GraftHttpClient] def runQuery(path: String): QueryResult = {
      val it = new RowIterator(stream(path))
      try QueryResult(it.find, it.toSeq) finally it.close()
    }

    /** The entity's document at this basis, None when absent. */
    def entity(eid: String): Option[Map[String, Any]] = {
      val resp = send(get("/_crux/entity?" + (Seq("eid=" + enc(eid)) ++ basisQs).mkString("&")))
      if (resp.statusCode() == 404) None
      else Some(objMap(ok(resp)))
    }

    /** The entity's resolved (vt, tt, tx-id, content-hash) row. */
    def entityTx(eid: String): Option[Map[String, Any]] = {
      val resp = send(get("/_crux/entity-tx?" + (Seq("eid=" + enc(eid)) ++ basisQs).mkString("&")))
      if (resp.statusCode() == 404) None
      else Some(objMap(ok(resp)))
    }

    def entityHistory(eid: String, sortAsc: Boolean = true,
        withCorrections: Boolean = false, withDocs: Boolean = false,
        startValidTime: Option[LocalDateTime] = None,
        endValidTime: Option[LocalDateTime] = None): Seq[Map[String, Any]] = {
      // basisQs: the db's tx basis restricts history to versions KNOWN
      // at that point (api_test.clj:292) — it was silently dropped
      val qs = (Seq("eid=" + enc(eid), "history=true",
        "sort-order=" + (if (sortAsc) "asc" else "desc")) ++
        (if (withCorrections) Seq("with-corrections=true") else Nil) ++
        (if (withDocs) Seq("with-docs=true") else Nil) ++
        startValidTime.map("start-valid-time=" + _) ++
        endValidTime.map("end-valid-time=" + _) ++ basisQs).mkString("&")
      getJson("/_crux/entity?" + qs) \ "entity-history" match {
        case JArray(xs) => xs.map(objMap)
        case _ => Nil
      }
    }
  }

  /** Streaming row cursor over a `{"find":[...],"results":[[...]...]}`
    * response — jackson token stream, one row materialized at a time. */
  final class RowIterator private[GraftHttpClient] (in: java.io.InputStream)
      extends Iterator[Seq[Any]] with AutoCloseable {
    import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
    private val parser = new JsonFactory().createParser(in)
    private var closed = false

    /** Column names — the response's `find` array (read eagerly; the
      * server writes it before the first row). */
    val find: Seq[String] = {
      val buf = Seq.newBuilder[String]
      var t = parser.nextToken() // START_OBJECT
      if (t != JsonToken.START_OBJECT) failBody()
      t = parser.nextToken()
      while (t == JsonToken.FIELD_NAME && parser.currentName() != "find") {
        parser.nextToken(); parser.skipChildren(); t = parser.nextToken()
      }
      if (t != JsonToken.FIELD_NAME) failBody()
      if (parser.nextToken() != JsonToken.START_ARRAY) failBody()
      while (parser.nextToken() != JsonToken.END_ARRAY) buf += parser.getText
      // advance to the results array's first row boundary
      var t2 = parser.nextToken()
      while (t2 == JsonToken.FIELD_NAME && parser.currentName() != "results") {
        parser.nextToken(); parser.skipChildren(); t2 = parser.nextToken()
      }
      if (t2 != JsonToken.FIELD_NAME || parser.nextToken() != JsonToken.START_ARRAY)
        failBody()
      buf.result()
    }

    private def failBody(): Nothing = {
      close()
      throw new IllegalStateException("malformed query response (server may have failed mid-stream)")
    }

    private var nextTok = parser.nextToken() // first row's START_ARRAY or END_ARRAY

    override def hasNext: Boolean = {
      val more = !closed && nextTok == JsonToken.START_ARRAY
      if (!more) close()
      more
    }

    override def next(): Seq[Any] = {
      if (!hasNext) throw new NoSuchElementException
      val row = Seq.newBuilder[Any]
      var t = parser.nextToken()
      while (t != JsonToken.END_ARRAY) {
        row += (t match {
          case JsonToken.VALUE_STRING => parser.getText
          case JsonToken.VALUE_NUMBER_INT => parser.getLongValue
          case JsonToken.VALUE_NUMBER_FLOAT => parser.getDoubleValue
          case JsonToken.VALUE_TRUE => true
          case JsonToken.VALUE_FALSE => false
          case JsonToken.VALUE_NULL => null
          case JsonToken.START_ARRAY | JsonToken.START_OBJECT =>
            // nested cell (array/struct column): fall back to a tree read
            Json.fromJValue(org.json4s.jackson.JsonMethods.fromJsonNode(
              parser.readValueAsTree[com.fasterxml.jackson.databind.JsonNode]()))
          case other => failBody()
        })
        t = parser.nextToken()
      }
      nextTok = parser.nextToken()
      row.result()
    }

    override def close(): Unit = if (!closed) {
      closed = true
      parser.close()
      in.close()
    }
  }

  // ------------------------------------------------------------ plumbing

  private def enc(s: String): String = URLEncoder.encode(s, UTF_8)

  /** Strings that round-trip as EDN keywords — the SAME alphabet the
    * server's keywordRe accepts; any other ':'-led string is a genuine
    * string value and must stay quoted (':not a keyword' would otherwise
    * serialize as invalid EDN and bind garbage). */
  private val keywordRe =
    "^:[A-Za-z0-9*+!_?<>=.-]+(/[A-Za-z0-9*+!_?<>=.-]+)?$".r

  /** EDN text for an `in-args-edn` value (the literal subset the server's
    * parseInArgs reads back). */
  private def ednArg(v: Any): String = v match {
    case s: String if keywordRe.matches(s) => s
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case t: LocalDateTime => "#inst \"" + t + "\""
    case seq: Seq[_] => seq.map(ednArg).mkString("[", " ", "]")
    case other => String.valueOf(other)
  }

  private def get(path: String): HttpRequest =
    HttpRequest.newBuilder(URI.create(baseUrl + path)).GET().build()
  private def post(path: String, body: String): HttpRequest =
    HttpRequest.newBuilder(URI.create(baseUrl + path))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build()

  private def send(req: HttpRequest): HttpResponse[String] =
    http.send(req, HttpResponse.BodyHandlers.ofString())

  private def stream(path: String): java.io.InputStream = {
    val resp = http.send(get(path), HttpResponse.BodyHandlers.ofInputStream())
    if (resp.statusCode() != 200) {
      val body = new String(resp.body().readAllBytes(), UTF_8)
      resp.body().close()
      throw new IllegalArgumentException(errOf(body))
    }
    resp.body()
  }

  private def ok(resp: HttpResponse[String]): JValue = {
    if (resp.statusCode() >= 400)
      throw new IllegalArgumentException(errOf(resp.body()))
    Json.parse(resp.body())
  }

  private def errOf(body: String): String =
    Json.parse(body) \ "error" match {
      case JString(m) => m
      case _ => body
    }

  private def getJson(path: String): JValue = ok(send(get(path)))

  private def txOf(j: JValue): Option[ClientTx] =
    (j \ "crux.tx/tx-id", j \ "crux.tx/tx-time") match {
      case (JLong(id), JString(t)) => Some(ClientTx(id, LocalDateTime.parse(t)))
      case (JInt(id), JString(t)) => Some(ClientTx(id.toLong, LocalDateTime.parse(t)))
      case _ => None
    }

  private def txRoute(path: String): Option[ClientTx] = {
    val resp = send(get(path))
    if (resp.statusCode() == 404) None else txOf(ok(resp))
  }

  private def objMap(j: JValue): Map[String, Any] = j match {
    case JObject(fields) => fields.map { case (k, v) => k -> Json.fromJValue(v) }.toMap
    case other => throw new IllegalStateException(s"expected JSON object, got $other")
  }
  private def arrSeq(j: JValue): Seq[Map[String, Any]] = j match {
    case JArray(xs) => xs.map(objMap)
    case _ => Nil
  }
}
