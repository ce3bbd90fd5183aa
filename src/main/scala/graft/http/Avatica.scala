package graft.http

import org.json4s._
import org.json4s.JsonDSL._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** Avatica-compatible JSON RPC handler — the SQL wire protocol the
  * reference serves through Calcite's Avatica HTTP server
  * (crux-sql/src/crux/calcite.clj:495-527 `->server`), re-expressed over
  * [[GraftNode]]'s SQL surface. Speaks the public Avatica JSON message
  * set (request discriminator + camelCase fields) so an Avatica thin
  * driver / `sqlline` pointed at `/_crux/avatica` can run the same
  * prepare/execute/fetch conversation it would run against the reference:
  *
  *   openConnection, connectionSync, createStatement, prepare,
  *   prepareAndExecute, execute (with TypedValue `?` parameters), fetch,
  *   syncResults, closeStatement, closeConnection, commit, rollback,
  *   getCatalogs, getSchemas, getTables, getTableTypes, getColumns.
  *
  * Scale: result sets are cursors over `DataFrame.toLocalIterator` —
  * each `fetch` streams the next frame from the running Spark job, so a
  * billion-row result pages through the driver one frame at a time,
  * exactly like the `/query` chunked responses. Statement state is one
  * iterator + offset per open statement, nothing else is buffered.
  */
final class Avatica(node: GraftNode, serverAddress: String = "127.0.0.1") {

  private final class Stmt(val id: Int) {
    var preparedSql: Option[String] = None
    var rows: Iterator[Row] = Iterator.empty
    var schema: StructType = new StructType()
    var offset: Long = 0L
    var open = false
  }
  private final class Conn(val id: String) {
    val stmts = new ConcurrentHashMap[Int, Stmt]()
    val nextStmt = new AtomicInteger(0)
  }
  private val conns = new ConcurrentHashMap[String, Conn]()

  private val rpcMeta: JObject =
    ("response" -> "rpcMetadata") ~ ("serverAddress" -> serverAddress)

  /** Dispatch one Avatica JSON request → (status, body). Protocol errors
    * use Avatica's ErrorResponse shape over HTTP 500, like the server. */
  def handle(body: String): (Int, String) =
    try {
      val req = Json.parse(body)
      val kind = str(req \ "request").getOrElse(
        throw new IllegalArgumentException("missing 'request' discriminator"))
      val resp = kind match {
        case "openConnection" =>
          conns.putIfAbsent(connId(req), new Conn(connId(req)))
          ("response" -> "openConnection") ~ ("rpcMetadata" -> rpcMeta)
        case "closeConnection" =>
          conns.remove(connId(req))
          ("response" -> "closeConnection") ~ ("rpcMetadata" -> rpcMeta)
        case "connectionSync" =>
          ("response" -> "connectionSync") ~
            ("connProps" -> (("connProps" -> "connPropsImpl") ~
              ("autoCommit" -> true) ~ ("readOnly" -> true) ~ ("dirty" -> false))) ~
            ("rpcMetadata" -> rpcMeta)
        case "createStatement" =>
          val c = conn(req)
          val s = new Stmt(c.nextStmt.getAndIncrement())
          c.stmts.put(s.id, s)
          ("response" -> "createStatement") ~ ("connectionId" -> c.id) ~
            ("statementId" -> s.id) ~ ("rpcMetadata" -> rpcMeta)
        case "closeStatement" =>
          conn(req).stmts.remove(int(req \ "statementId"))
          ("response" -> "closeStatement") ~ ("rpcMetadata" -> rpcMeta)
        case "prepare" =>
          val c = conn(req)
          val sql = str(req \ "sql").getOrElse("")
          val s = new Stmt(c.nextStmt.getAndIncrement())
          s.preparedSql = Some(sql)
          c.stmts.put(s.id, s)
          ("response" -> "prepare") ~ ("statement" ->
            (("connectionId" -> c.id) ~ ("id" -> s.id) ~
              ("signature" -> signature(new StructType(), sql)))) ~
            ("rpcMetadata" -> rpcMeta)
        case "prepareAndExecute" =>
          val c = conn(req)
          val s = c.stmts.computeIfAbsent(int(req \ "statementId"), new Stmt(_))
          executeSql(c, s, str(req \ "sql").getOrElse(""), Array.empty, frameMax(req))
        case "execute" =>
          val h = req \ "statementHandle"
          val c = conn(str(h \ "connectionId").getOrElse(""))
          val s = Option(c.stmts.get(int(h \ "id"))).getOrElse(
            throw new IllegalArgumentException(s"no statement ${int(h \ "id")}"))
          val sql = s.preparedSql.getOrElse(
            throw new IllegalArgumentException("statement was not prepared"))
          val args = (req \ "parameterValues") match {
            case JArray(vs) => vs.map(typedValue).toArray
            case _ => Array.empty[Any]
          }
          executeSql(c, s, sql, args, frameMax(req))
        case "fetch" =>
          val c = conn(req)
          val s = Option(c.stmts.get(int(req \ "statementId"))).getOrElse(
            throw new IllegalArgumentException("unknown statement"))
          val max = intOpt(req \ "fetchMaxRowCount")
            .orElse(intOpt(req \ "frameMaxSize")).getOrElse(100)
          ("response" -> "fetch") ~ ("connectionId" -> c.id) ~
            ("statementId" -> s.id) ~ ("frame" -> nextFrame(s, max)) ~
            ("rpcMetadata" -> rpcMeta)
        case "syncResults" =>
          val c = conn(req)
          val more = Option(c.stmts.get(int(req \ "statementId"))).exists(_.open)
          ("response" -> "syncResults") ~ ("moreResults" -> more) ~
            ("missingStatement" -> false) ~ ("rpcMetadata" -> rpcMeta)
        case "commit" => ("response" -> "commit") ~ ("rpcMetadata" -> rpcMeta)
        case "rollback" => ("response" -> "rollback") ~ ("rpcMetadata" -> rpcMeta)
        case "getCatalogs" => metaResult(req, Seq("TABLE_CAT"), Seq(Seq("graft")))
        case "getTableTypes" =>
          metaResult(req, Seq("TABLE_TYPE"), Seq(Seq("TABLE")))
        case "getSchemas" =>
          metaResult(req, Seq("TABLE_SCHEM", "TABLE_CATALOG"), Seq(Seq("crux", "graft")))
        case "getTables" =>
          metaResult(req, Seq("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "TABLE_TYPE"),
            node.sqlTableNames.map(t => Seq("graft", "crux", t, "TABLE")))
        case "getColumns" =>
          // tableNamePattern is a JDBC SQL LIKE pattern (% = any run,
          // _ = any char) — introspection tools send partial wildcards
          // like "tx%"; exact-or-"%" matching returned empty column sets
          val wantTable = str(req \ "tableNamePattern")
          def likeMatches(pattern: String, t: String): Boolean = {
            val rx = pattern.flatMap {
              case '%' => ".*"
              case '_' => "."
              case c => java.util.regex.Pattern.quote(c.toString)
            }
            t.matches(rx)
          }
          val rows = for {
            t <- node.sqlTableNames if wantTable.forall(likeMatches(_, t))
            (f, i) <- node.sqlTableSchema(t).fields.zipWithIndex
          } yield Seq("graft", "crux", t, f.name,
            typeId(f.dataType).toString, typeName(f.dataType), (i + 1).toString)
          metaResult(req, Seq("TABLE_CAT", "TABLE_SCHEM", "TABLE_NAME", "COLUMN_NAME",
            "DATA_TYPE", "TYPE_NAME", "ORDINAL_POSITION"), rows)
        case other =>
          throw new IllegalArgumentException(s"unsupported avatica request '$other'")
      }
      (200, Json.render(resp))
    } catch {
      case e: Exception =>
        (500, Json.render(("response" -> "error") ~
          ("exceptions" -> List(e.toString)) ~
          ("errorMessage" -> Option(e.getMessage).getOrElse(e.toString)) ~
          ("errorCode" -> -1) ~ ("sqlState" -> "00000") ~
          ("severity" -> "ERROR") ~ ("rpcMetadata" -> rpcMeta)))
    }

  // ------------------------------------------------------------ execution

  private def executeSql(c: Conn, s: Stmt, sql: String, args: Array[Any],
      max: Int): JObject = {
    val df = node.sqlPrepared(sql, args)
    s.schema = df.schema
    s.rows = scala.jdk.CollectionConverters.IteratorHasAsScala(df.toLocalIterator()).asScala
    s.offset = 0
    s.open = true
    ("response" -> "executeResults") ~ ("missingStatement" -> false) ~
      ("rpcMetadata" -> rpcMeta) ~ ("results" -> List(
        ("response" -> "resultSet") ~ ("connectionId" -> c.id) ~
          ("statementId" -> s.id) ~ ("ownStatement" -> true) ~
          ("signature" -> signature(s.schema, sql)) ~
          ("firstFrame" -> nextFrame(s, max)) ~ ("updateCount" -> -1L)))
  }

  /** Pull the next ≤max rows off the statement's cursor. */
  private def nextFrame(s: Stmt, max: Int): JObject = {
    val limit = if (max < 0) Int.MaxValue else max
    val buf = List.newBuilder[JValue]
    var n = 0
    while (n < limit && s.rows.hasNext) { buf += rowJson(s.rows.next(), s.schema); n += 1 }
    val done = !s.rows.hasNext
    val frame = ("offset" -> s.offset) ~ ("done" -> done) ~ ("rows" -> buf.result())
    s.offset += n
    if (done) s.open = false
    frame
  }

  private def rowJson(r: Row, schema: StructType): JValue =
    JArray(schema.fields.toList.zipWithIndex.map { case (f, i) =>
      if (r.isNullAt(i)) JNull else (f.dataType match {
        case StringType => JString(r.getString(i))
        case LongType => JLong(r.getLong(i))
        case IntegerType => JLong(r.getInt(i).toLong)
        case ShortType => JLong(r.getShort(i).toLong)
        case ByteType => JLong(r.getByte(i).toLong)
        case DoubleType => JDouble(r.getDouble(i))
        case FloatType => JDouble(r.getFloat(i).toDouble)
        case BooleanType => JBool(r.getBoolean(i))
        case _: DecimalType => JDecimal(r.getDecimal(i))
        // Avatica wire reps: TIMESTAMP = epoch millis, DATE = epoch days
        case TimestampType => JLong(r.getTimestamp(i).getTime)
        case TimestampNTZType =>
          JLong(r.getAs[java.time.LocalDateTime](i)
            .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
        case DateType => JLong(r.getDate(i).toLocalDate.toEpochDay)
        case _ => JString(String.valueOf(r.get(i)))
      })
    })

  // ------------------------------------------------------------ signatures

  private def typeId(dt: DataType): Int = dt match {
    case StringType => java.sql.Types.VARCHAR
    case LongType => java.sql.Types.BIGINT
    case IntegerType | ShortType | ByteType => java.sql.Types.INTEGER
    case DoubleType => java.sql.Types.DOUBLE
    case FloatType => java.sql.Types.FLOAT
    case BooleanType => java.sql.Types.BOOLEAN
    case _: DecimalType => java.sql.Types.DECIMAL
    case TimestampType | TimestampNTZType => java.sql.Types.TIMESTAMP
    case DateType => java.sql.Types.DATE
    case _ => java.sql.Types.OTHER
  }

  private def typeName(dt: DataType): String = dt match {
    case StringType => "VARCHAR"
    case LongType => "BIGINT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case _: DecimalType => "DECIMAL"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case _ => "OTHER"
  }

  private def rep(dt: DataType): String = dt match {
    case StringType => "STRING"
    case LongType => "PRIMITIVE_LONG"
    case IntegerType | ShortType | ByteType => "PRIMITIVE_INT"
    case DoubleType => "PRIMITIVE_DOUBLE"
    case FloatType => "PRIMITIVE_FLOAT"
    case BooleanType => "PRIMITIVE_BOOLEAN"
    case _: DecimalType => "BIG_DECIMAL"
    case TimestampType | TimestampNTZType => "JAVA_SQL_TIMESTAMP"
    case DateType => "JAVA_SQL_DATE"
    case _ => "STRING"
  }

  private def columnMeta(f: StructField, i: Int): JObject =
    ("ordinal" -> i) ~ ("autoIncrement" -> false) ~ ("caseSensitive" -> false) ~
      ("searchable" -> true) ~ ("currency" -> false) ~
      ("nullable" -> (if (f.nullable) 1 else 0)) ~ ("signed" -> true) ~
      ("displaySize" -> 40) ~ ("label" -> f.name) ~ ("columnName" -> f.name) ~
      ("schemaName" -> "crux") ~ ("precision" -> 0) ~ ("scale" -> 0) ~
      ("tableName" -> "") ~ ("catalogName" -> "graft") ~
      ("type" -> (("type" -> "scalar") ~ ("id" -> typeId(f.dataType)) ~
        ("name" -> typeName(f.dataType)) ~ ("rep" -> rep(f.dataType)))) ~
      ("readOnly" -> true) ~ ("writable" -> false) ~
      ("definitelyWritable" -> false) ~ ("columnClassName" -> "java.lang.Object")

  private def signature(schema: StructType, sql: String): JObject = {
    val params = (0 until countParams(sql)).map { i =>
      ("signed" -> false) ~ ("precision" -> 0) ~ ("scale" -> 0) ~
        ("parameterType" -> java.sql.Types.OTHER) ~ ("typeName" -> "ANY") ~
        ("className" -> "java.lang.Object") ~ ("name" -> s"?${i + 1}")
    }.toList
    ("columns" -> schema.fields.toList.zipWithIndex.map { case (f, i) => columnMeta(f, i) }) ~
      ("sql" -> sql) ~ ("parameters" -> params) ~
      ("cursorFactory" -> (("style" -> "LIST") ~
        ("clazz" -> JNull) ~ ("fieldNames" -> JNull))) ~
      ("statementType" -> "SELECT")
  }

  /** `?` placeholders outside single-quoted literals. */
  private def countParams(sql: String): Int = {
    var n = 0; var inStr = false
    for (ch <- sql) ch match {
      case '\'' => inStr = !inStr
      case '?' if !inStr => n += 1
      case _ =>
    }
    n
  }

  // ------------------------------------------------------------ metadata

  /** Synthetic all-VARCHAR result set for the DatabaseMetaData requests. */
  private def metaResult(req: JValue, cols: Seq[String], rows: Seq[Seq[String]]): JObject = {
    val schema = StructType(cols.map(StructField(_, StringType)))
    ("response" -> "resultSet") ~ ("connectionId" -> connId(req)) ~
      ("statementId" -> -1) ~ ("ownStatement" -> true) ~
      ("signature" -> signature(schema, "")) ~
      ("firstFrame" -> (("offset" -> 0L) ~ ("done" -> true) ~
        ("rows" -> rows.toList.map(r => JArray(r.toList.map(JString(_))))))) ~
      ("updateCount" -> -1L)
  }

  // ------------------------------------------------------------ decoding

  private def conn(req: JValue): Conn = conn(connId(req))
  private def conn(id: String): Conn =
    Option(conns.get(id)).getOrElse(
      throw new IllegalArgumentException(s"unknown connection '$id'"))
  private def connId(req: JValue): String = str(req \ "connectionId").getOrElse("")

  private def frameMax(req: JValue): Int =
    intOpt(req \ "maxRowsInFirstFrame").orElse(intOpt(req \ "firstFrameMaxSize"))
      .getOrElse(100)

  private def str(j: JValue): Option[String] =
    j match { case JString(s) => Some(s); case _ => None }
  private def intOpt(j: JValue): Option[Int] = j match {
    case JInt(n) => Some(n.toInt)
    case JLong(n) => Some(n.toInt)
    case JDouble(d) => Some(d.toInt)
    case _ => None
  }
  private def int(j: JValue): Int = intOpt(j).getOrElse(
    throw new IllegalArgumentException(s"expected integer, got $j"))

  /** Avatica TypedValue → Spark positional parameter. */
  private def typedValue(tv: JValue): Any = {
    val rep = str(tv \ "type").getOrElse("STRING").toUpperCase
    val v = tv \ "value"
    rep match {
      case "NULL" => null
      case "STRING" | "CHARACTER" => str(v).orNull
      case "BOOLEAN" | "PRIMITIVE_BOOLEAN" =>
        v match { case JBool(b) => b; case _ => false }
      case "BYTE" | "SHORT" | "INTEGER" | "LONG" | "PRIMITIVE_BYTE" |
          "PRIMITIVE_SHORT" | "PRIMITIVE_INT" | "PRIMITIVE_LONG" | "NUMBER" =>
        v match {
          case JInt(n) => n.toLong
          case JLong(n) => n
          case JDouble(d) => d.toLong
          case JDecimal(d) => d.toLong
          case other => throw new IllegalArgumentException(s"bad numeric $other")
        }
      case "FLOAT" | "DOUBLE" | "PRIMITIVE_FLOAT" | "PRIMITIVE_DOUBLE" |
          "BIG_DECIMAL" =>
        v match {
          case JDouble(d) => d
          case JDecimal(d) => d.toDouble
          case JInt(n) => n.toDouble
          case JLong(n) => n.toDouble
          case other => throw new IllegalArgumentException(s"bad numeric $other")
        }
      case "JAVA_SQL_TIMESTAMP" | "JAVA_UTIL_DATE" =>
        v match {
          case JInt(n) => new java.sql.Timestamp(n.toLong)
          case JLong(n) => new java.sql.Timestamp(n)
          case other => throw new IllegalArgumentException(s"bad timestamp $other")
        }
      case "JAVA_SQL_DATE" =>
        v match {
          case JInt(n) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n.toLong))
          case JLong(n) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(n))
          case other => throw new IllegalArgumentException(s"bad date $other")
        }
      case other => throw new IllegalArgumentException(s"unsupported TypedValue rep '$other'")
    }
  }
}
