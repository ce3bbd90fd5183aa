package graft.http

import com.sun.net.httpserver.{HttpExchange, HttpServer => JdkHttpServer}
import org.json4s._
import org.json4s.JsonDSL._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** HTTP query/ingest surface — the `crux-http-server` routes
  * (crux-http-server/src/crux/http_server.clj:328-424) re-expressed over
  * [[GraftNode]], on the JDK's built-in `HttpServer` (no extra deps; the
  * reference runs Jetty). JSON only (the reference also speaks EDN and
  * transit via muuntaja; CSV/TSV are kept for `/query.csv|.tsv`).
  *
  * Routes (all under /_crux, as in the reference):
  *   GET  /status, /db, /entity, /entity-tx, /attribute-stats,
  *        /sync, /await-tx, /await-tx-time, /tx-log, /tx-committed,
  *        /latest-completed-tx, /latest-submitted-tx,
  *        /active-queries, /recent-queries, /slowest-queries, /metrics
  *        (crux-metrics analogue: query gauges + indexer meters as JSON),
  *        /query (+ .csv/.tsv), /sql (+ .csv/.tsv — the SQL-over-wire
  *        surface; the reference serves SQL via Calcite/Avatica JDBC,
  *        crux-sql/src/crux/calcite.clj:495-527)
  *   POST /query, /sql, /submit-tx, /avatica (Avatica JSON RPC — the
  *        SQL wire protocol, see [[Avatica]])
  *
  * Scale: query results are streamed to the socket via `toLocalIterator`
  * over a chunked response — the open-q cursor (query.clj:1816-1835)
  * re-expressed; the driver never holds the whole result set.
  */
final class HttpServer(node: GraftNode, port: Int = 0,
    /** reject writes — the reference's read-only node
      * (http_server_test.clj:11 `test-read-only-node`: submit-tx throws
      * "read-only"); queries and every GET surface stay served */
    readOnly: Boolean = false) {

  private val server = JdkHttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** Query monitoring rides the NODE's [[QueryTracker]] (active/recent/
    * slowest with the reference's cleaning policies — max-age expiry,
    * slow-query threshold, ring caps, node.clj:190-197); the server adds
    * only counters. One registry: queries over the wire and via
    * node.q() land in the same rings. */
  private def trackerJson(q: QueryTracker.QueryState): JValue =
    ("query-id" -> q.queryId) ~ ("query" -> q.query) ~
      ("started-at" -> q.startedAt.toString) ~
      ("finished-at" -> q.finishedAt.map(_.toString)) ~
      ("took-ms" -> q.finishedAt.map(f =>
        JDouble((f.toEpochMilli - q.startedAt.toEpochMilli).toDouble)).getOrElse(JNull: JValue)) ~
      ("status" -> q.status) ~ ("error" -> q.error)
  /** Node-level counters — the crux-metrics analogue (crux-metrics/src/
    * crux/metrics/query.clj gauges + indexer meters), exported on
    * /_crux/metrics instead of dropwizard registries. */
  private val queriesCompleted = new java.util.concurrent.atomic.AtomicLong()
  private val queriesFailed = new java.util.concurrent.atomic.AtomicLong()
  private val queryMsTotal = new java.util.concurrent.atomic.DoubleAdder()
  private val queryMsMax = new java.util.concurrent.atomic.AtomicLong() // ms, rounded up

  /** Avatica JSON RPC state machine behind POST /_crux/avatica — the
    * SQL wire protocol (the reference's calcite.clj:495-527 server). */
  private val avatica = new Avatica(this.node)

  /** /status "size": a full count job per health poll would compete with
    * real queries — cache the count keyed by the latest tx id (the only
    * thing that changes it) and recount only after a new tx lands. */
  private val sizeCache = new java.util.concurrent.atomic.AtomicReference[(Long, Long)](null)
  private def cachedSize(): Long = {
    val txId = node.latestCompletedTx.map(_.txId).getOrElse(-1L)
    val cur = sizeCache.get()
    if (cur != null && cur._1 == txId) cur._2
    else {
      val n = node.currentVersions.count()
      sizeCache.set((txId, n)); n
    }
  }

  def boundPort: Int = server.getAddress.getPort
  def start(): HttpServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdown() } // non-daemon workers must die or the JVM can't exit

  // ------------------------------------------------------------- routing

  private def route(path: String, ex: HttpExchange, qp: Map[String, String]): (Int, String, String) = {
    val json = "application/json"
    path match {
      case "/_crux/status" =>
        (200, json, Json.render(
          ("crux.version/version" -> "graft-spark") ~
          ("crux.index/index-version" -> 1) ~
          ("crux.tx-log/consumer-state" -> JNull) ~
          ("size" -> cachedSize())))

      case "/_crux/db" =>
        val vt = qp.get("valid-time").getOrElse(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC).toString)
        (200, json, Json.render(
          ("crux.db/valid-time" -> vt) ~
          ("crux.tx/tx-time" -> node.latestCompletedTx.map(_.txTime.toString)) ~
          ("crux.tx/tx-id" -> node.latestCompletedTx.map(_.txId))))

      case "/_crux/entity" =>
        val eid = qp.getOrElse("eid", return (400, json, err("eid required")))
        node.entityDoc(eid, qp.get("valid-time").map(java.time.LocalDateTime.parse),
            qp.get("tx-time").map(java.time.LocalDateTime.parse), qp.get("tx-id").map(_.toLong)) match {
          case Some(doc) => (200, json, Json.render(doc))
          case None => (404, json, err(s"$eid entity not found"))
        }

      case "/_crux/entity-tx" =>
        val eid = qp.getOrElse("eid", return (400, json, err("eid required")))
        node.entityTx(eid, qp.get("valid-time").map(java.time.LocalDateTime.parse),
            qp.get("tx-time").map(java.time.LocalDateTime.parse), qp.get("tx-id").map(_.toLong)) match {
          case Some(row) => (200, json, Json.render(Json.toJValue(row)))
          case None => (404, json, err(s"$eid entity-tx not found"))
        }

      case "/_crux/attribute-stats" =>
        val attrs = qp.get("attrs").map(_.split(",").toSeq)
          .getOrElse(node.source.attrs.toSeq.sorted)
        val stats = node.attributeStats(attrs)
        (200, json, Json.render(JObject(stats.toList.sortBy(_._1).map {
          case (a, n) => (":" + a) -> JLong(n) })))

      case "/_crux/sync" | "/_crux/await-tx" | "/_crux/await-tx-time" =>
        // txs apply synchronously in this node (GraftNode.submitTx), so
        // sync/await are immediately satisfied — same contract, trivial wait
        node.latestCompletedTx match {
          case Some(t) => (200, json, Json.render(
            ("crux.tx/tx-id" -> t.txId) ~ ("crux.tx/tx-time" -> t.txTime.toString)))
          case None => (200, json, Json.render(("crux.tx/tx-time" -> JNull): JObject))
        }

      case "/_crux/tx-log" =>
        val after = qp.get("after-tx-id").map(_.toLong).getOrElse(-1L)
        val withOps = qp.get("with-ops").contains("true")
        val entries = node.txLogEntries.filter(_._1.txId > after).map { case (t, ops) =>
          val base: JObject = ("crux.tx/tx-id" -> t.txId) ~
            ("crux.tx/tx-time" -> t.txTime.toString) ~ ("committed" -> t.committed)
          if (withOps) base ~ ("crux.api/tx-ops" -> ops.getOrElse(JNull)) else base
        }
        (200, json, Json.render("results" -> JArray(entries.toList)))

      case "/_crux/submit-tx" =>
        if (ex.getRequestMethod != "POST") return (405, json, err("POST required"))
        if (readOnly) return (403, json, err("read-only node: submit-tx rejected"))
        val body = Json.parse(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        val ops = body \ "tx-ops" match {
          case JArray(xs) => xs
          case o => return (400, json, err(s"body needs tx-ops array, got $o"))
        }
        val info = node.submitTx(ops)
        (202, json, Json.render(
          ("crux.tx/tx-id" -> info.txId) ~ ("crux.tx/tx-time" -> info.txTime.toString)))

      case "/_crux/tx-committed" =>
        val txId = qp.getOrElse("tx-id", return (400, json, err("tx-id required"))).toLong
        node.txCommitted(txId) match {
          case Some(c) => (200, json, Json.render("tx-committed?" -> c))
          case None => (400, json, err(s"tx-id $txId not found"))
        }

      case "/_crux/latest-completed-tx" => txInfo(node.latestCompletedTx, "No latest-completed-tx found.")
      case "/_crux/latest-submitted-tx" => txInfo(node.latestSubmittedTx, "No latest-submitted-tx found.")

      case "/_crux/active-queries" =>
        (200, json, Json.render(JArray(node.queryTracker.active().map(trackerJson).toList)))
      case "/_crux/recent-queries" =>
        (200, json, Json.render(JArray(node.queryTracker.recent().map(trackerJson).toList)))
      case "/_crux/slowest-queries" =>
        (200, json, Json.render(JArray(node.queryTracker.slowestQueries().map(trackerJson).toList)))

      case "/_crux/metrics" =>
        // crux-metrics analogue: query gauges/timers + indexer meters
        // (crux-metrics/src/crux/metrics/query.clj, indexer.clj) as one
        // JSON document instead of a dropwizard registry
        val completed = queriesCompleted.get()
        val totalMs = queryMsTotal.sum()
        val txs = node.txLogEntries
        (200, json, Json.render(
          ("crux.metrics.query/active" -> JLong(node.queryTracker.active().size.toLong)) ~
          ("crux.metrics.query/completed" -> JLong(completed)) ~
          ("crux.metrics.query/failed" -> JLong(queriesFailed.get())) ~
          ("crux.metrics.query/total-ms" -> JDouble(totalMs)) ~
          ("crux.metrics.query/avg-ms" ->
            JDouble(if (completed == 0) 0.0 else totalMs / completed)) ~
          ("crux.metrics.query/max-ms" -> JLong(queryMsMax.get())) ~
          ("crux.metrics.indexer/submitted-tx-count" -> JLong(txs.size.toLong)) ~
          ("crux.metrics.indexer/latest-completed-tx-id" ->
            node.latestCompletedTx.map(t => JLong(t.txId)).getOrElse(JNull: JValue)) ~
          ("crux.metrics.indexer/latest-completed-tx-time" ->
            node.latestCompletedTx.map(t => JString(t.txTime.toString))
              .getOrElse(JNull: JValue))))

      case _ => (404, json, err(s"unknown route $path"))
    }
  }

  private def txInfo(t: Option[GraftNode#TxInfo], notFound: String): (Int, String, String) =
    t match {
      case Some(tx) => (200, "application/json", Json.render(
        ("crux.tx/tx-id" -> tx.txId) ~ ("crux.tx/tx-time" -> tx.txTime.toString)))
      case None => (404, "application/json", err(notFound))
    }

  /** `in-args-edn` — only the literal subset the Planner's `:in` coercion
    * takes (scalars + collections), parsed with the repo's EDN reader. */
  private def parseInArgs(edn: String): Seq[Any] =
    graft.datalog.Edn.parse(edn) match {
      case graft.datalog.Edn.Vec(items) => items.map(ednToArg)
      case other => Seq(ednToArg(other))
    }
  private def ednToArg(v: graft.datalog.Edn.Val): Any = v match {
    case graft.datalog.Edn.Str(s) => s
    case graft.datalog.Edn.Lng(n) => n
    case graft.datalog.Edn.Dbl(d) => d
    case graft.datalog.Edn.Bool(b) => b
    case graft.datalog.Edn.Kw(k) => ":" + k
    case graft.datalog.Edn.Inst(t) => t
    case graft.datalog.Edn.Vec(items) => items.map(ednToArg)
    case other => throw new IllegalArgumentException(s"unsupported in-arg $other")
  }

  /** Entity history streams row-by-row the same way the query endpoints
    * do — a pathological million-version entity never buffers on the
    * driver (the reference's open-entity-history cursor). */
  private def handleEntityHistory(ex: HttpExchange, qp: Map[String, String]): Unit = {
    val eid = qp.getOrElse("eid",
      return respond(ex, 400, "application/json", err("eid required")))
    val df = node.entityHistory(eid,
      sortAsc = !qp.get("sort-order").contains("desc"),
      withCorrections = qp.get("with-corrections").contains("true"),
      withDocs = qp.get("with-docs").contains("true"),
      startVt = qp.get("start-valid-time").map(java.time.LocalDateTime.parse),
      endVt = qp.get("end-valid-time").map(java.time.LocalDateTime.parse),
      // the tx basis restricts history to versions KNOWN at that point
      // (api_test.clj:292) — it was silently dropped on the wire path
      txTime = qp.get("tx-time").map(java.time.LocalDateTime.parse),
      txId = qp.get("tx-id").map(_.toLong))
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(200, 0L) // chunked
    val out = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(ex.getResponseBody, UTF_8))
    try {
      out.write("{\"entity-history\":[")
      val it = df.toLocalIterator()
      var first = true
      while (it.hasNext) {
        if (!first) out.write(",")
        out.write(Json.render(Json.toJValue(it.next())))
        first = false
      }
      out.write("]}")
    } finally { out.close(); ex.close() }
  }

  /** `/query` paths stream the result set row-by-row over a chunked
    * response via `toLocalIterator` — the reference's open-q cursor
    * (query.clj:1816-1835) re-expressed: the driver holds one partition
    * at a time, never the whole result. */
  private def handleQuery(path: String, ex: HttpExchange, qp: Map[String, String]): Unit = {
    val isSql = path.startsWith("/_crux/sql")
    val (edn, inArgs) =
      if (ex.getRequestMethod == "POST") {
        val body = Json.parse(new String(ex.getRequestBody.readAllBytes(), UTF_8))
        val q = body \ "query" match {
          case JString(s) => s
          case o => return respond(ex, 400, "application/json", err(s"POST body needs string 'query', got $o"))
        }
        val args = body \ "in-args" match {
          case JArray(xs) => xs.map(Json.fromJValue)
          case _ => Nil
        }
        (q, args)
      } else if (isSql)
        (qp.getOrElse("q",
          return respond(ex, 400, "application/json", err("q parameter required"))), Nil)
      else (qp.getOrElse("query-edn",
          return respond(ex, 400, "application/json", err("query-edn parameter required"))),
        qp.get("in-args-edn").map(parseInArgs).getOrElse(Nil))

    val started = System.nanoTime()
    val qid = node.queryTracker.started(edn)
    var finished = false
    // once 200 + chunked headers are on the wire we can no longer send an
    // error status; a mid-stream failure then only gets a truncated body
    var headersSent = false
    try {
      // the reference's /query runs against the node's document db at an
      // optional bitemporal basis; this node ALSO serves its table
      // catalog (the crux-sql-style schema surface), so: temporal params
      // or db=docs → doc store (queryAt), otherwise the catalog
      val useDocs = qp.contains("valid-time") || qp.contains("tx-time") ||
        qp.contains("tx-id") || qp.get("db").contains("docs")
      def t(p: String) = qp.get(p).map(java.time.LocalDateTime.parse)
      val df =
        if (isSql) node.sql(edn)
        else if (useDocs) node.queryAt(edn, inArgs,
          validTime = t("valid-time"), txTime = t("tx-time"),
          txId = qp.get("tx-id").map(_.toLong))
        else node.query(edn, inArgs)
      val cols = df.columns.toList
      // :timeout over the wire: a query declaring one collects EAGERLY
      // under the node's cancellable job group (GraftNode.collectWithGroup
      // — lazy streaming would never consult the timeout; a bounded query
      // is small by declaration), then streams from the array
      val timeoutMs = if (isSql) None else graft.datalog.Ast.parse(edn).timeoutMs
      val preCollected: Option[Array[org.apache.spark.sql.Row]] =
        timeoutMs.map(_ => node.collectWithGroup(df, timeoutMs))
      // EDN wire format (the reference's native content type, muuntaja-
      // negotiated in crux-http-server): ?as=edn or Accept: application/edn
      val wantsEdn = qp.get("as").contains("edn") ||
        Option(ex.getRequestHeaders.getFirst("Accept"))
          .exists(_.contains("application/edn"))
      val ctype = path match {
        case "/_crux/query.csv" | "/_crux/sql.csv" => "text/csv"
        case "/_crux/query.tsv" | "/_crux/sql.tsv" => "text/tsv"
        case _ if wantsEdn => "application/edn"
        case _ => "application/json"
      }
      ex.getResponseHeaders.set("Content-Type", ctype)
      ex.sendResponseHeaders(200, 0L) // 0 ⇒ chunked transfer encoding
      headersSent = true
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(ex.getResponseBody, UTF_8))
      val it = preCollected match {
        case Some(rows) => java.util.Arrays.asList(rows: _*).iterator()
        case None => df.toLocalIterator()
      }
      path match {
        case "/_crux/query.csv" | "/_crux/query.tsv" | "/_crux/sql.csv" | "/_crux/sql.tsv" =>
          val d = if (path.endsWith(".csv")) "," else "\t"
          // RFC 4180: quote any field containing the delimiter, a quote,
          // or a newline; double embedded quotes (the reference emits
          // proper CSV via clojure.data.csv)
          def field(s: String): String =
            if (s.contains(d) || s.contains("\"") || s.contains("\n") || s.contains("\r"))
              "\"" + s.replace("\"", "\"\"") + "\""
            else s
          out.write(cols.map(field).mkString(d)); out.write("\n")
          while (it.hasNext) {
            val r = it.next()
            out.write(cols.indices.map(i =>
              field(Option(r.get(i)).map(_.toString).getOrElse(""))).mkString(d))
            out.write("\n")
          }
        case _ if wantsEdn =>
          out.write("{:find [" + cols.map(":" + _).mkString(" ") + "] :results [")
          var first = true
          while (it.hasNext) {
            val r = it.next()
            if (!first) out.write(" ")
            first = false
            out.write(cols.indices.map(i => ednStr(r.get(i))).mkString("[", " ", "]"))
          }
          out.write("]}")
        case _ =>
          out.write("""{"find":""" + Json.render(JArray(cols.map(JString(_)))) + ""","results":[""")
          var first = true
          while (it.hasNext) {
            val r = it.next()
            if (!first) out.write(",")
            first = false
            out.write(Json.render(JArray(cols.indices.map(i => Json.toJValue(r.get(i))).toList)))
          }
          out.write("]}")
      }
      out.flush()
      ex.close()
      val tookMs = (System.nanoTime() - started) / 1e6
      node.queryTracker.finished(qid, None); finished = true
      queriesCompleted.incrementAndGet()
      queryMsTotal.add(tookMs)
      queryMsMax.updateAndGet(m => math.max(m, math.ceil(tookMs).toLong))
    } catch {
      case scala.util.control.NonFatal(e) =>
        val status = e match {
          case _: IllegalArgumentException => 400
          case _: java.util.concurrent.TimeoutException => 408
          case _ => 500
        }
        val msg = Option(e.getMessage).getOrElse(e.toString)
        if (!headersSent) respond(ex, status, "application/json", err(msg))
        else ex.close() // truncated chunked body signals the failure to the client
        node.queryTracker.finished(qid, Some(msg)); finished = true
        queriesFailed.incrementAndGet()
    } finally if (!finished) node.queryTracker.finished(qid,
      Some("aborted")) // fatal error path — never leave an in-progress ghost
  }

  /** Strings that round-trip as EDN keywords: `:name` or `:ns/name` over
    * the symbol alphabet only. Anything else — e.g. a genuine string value
    * ":not(a)keyword" — must stay quoted or the wire emits invalid EDN. */
  private val keywordRe =
    "^:[A-Za-z0-9*+!_?<>=.-]+(/[A-Za-z0-9*+!_?<>=.-]+)?$".r

  /** EDN rendering of a result cell. Canonical ":kw" strings render back
    * as keywords (the inverse of this engine's keyword encoding,
    * SURVEY §1.2); timestamps as #inst; arrays/structs as vectors. */
  private def ednStr(v: Any): String = v match {
    case null => "nil"
    case s: String if keywordRe.matches(s) => s
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c => c.toString
      } + "\""
    case b: Boolean => b.toString
    case n: java.lang.Number => n.toString
    case t: java.time.LocalDateTime => "#inst \"" + t.toString + "\""
    case t: java.sql.Timestamp => "#inst \"" + t.toLocalDateTime.toString + "\""
    case seq: scala.collection.Seq[_] => seq.map(ednStr).mkString("[", " ", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(ednStr).mkString("[", " ", "]")
    case other => ednStr(other.toString)
  }

  private def respond(ex: HttpExchange, status: Int, ctype: String, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", ctype)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(msg: String): String = Json.render("error" -> msg)

  server.createContext("/", (ex: HttpExchange) => {
    val qp = Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq).getOrElse(Nil)
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), UTF_8) ->
          java.net.URLDecoder.decode(kv.drop(i + 1), UTF_8)
      }.toMap
    val path = ex.getRequestURI.getPath
    try {
      if (path == "/_crux/query" || path == "/_crux/query.csv" || path == "/_crux/query.tsv" ||
          path == "/_crux/sql" || path == "/_crux/sql.csv" || path == "/_crux/sql.tsv")
        handleQuery(path, ex, qp)
      else if (path == "/_crux/avatica") {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, "application/json", err("POST required"))
        else {
          val (status, body) =
            avatica.handle(new String(ex.getRequestBody.readAllBytes(), UTF_8))
          respond(ex, status, "application/json", body)
        }
      }
      else if (path == "/_crux/entity" && qp.get("history").contains("true"))
        handleEntityHistory(ex, qp)
      else {
        val (status, ctype, body) = route(path, ex, qp)
        respond(ex, status, ctype, body)
      }
    } catch {
      case e: IllegalArgumentException => respond(ex, 400, "application/json", err(e.getMessage))
      // malformed temporal params are CLIENT errors like bad tx-ids
      // (NumberFormatException IS an IAE; DateTimeParseException is not)
      case e: java.time.format.DateTimeParseException =>
        respond(ex, 400, "application/json", err(e.getMessage))
      case scala.util.control.NonFatal(e) => respond(ex, 500, "application/json", err(e.toString))
    }
  })
}
