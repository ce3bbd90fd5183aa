package graft.datalog

/** Minimal EDN reader — enough for the reference's Datalog query surface
  * (maps/vectors/lists/sets, keywords, symbols, strings, numbers, booleans,
  * nil, #inst). Mirrors the grammar accepted by the reference's query spec
  * (crux-core/src/crux/query.clj:53-157); not a general EDN implementation.
  */
object Edn {
  sealed trait Val
  final case class Kw(name: String) extends Val { override def toString = s":$name" }
  final case class Sym(name: String) extends Val { override def toString = name }
  final case class Str(s: String) extends Val
  final case class Lng(l: Long) extends Val
  final case class Dbl(d: Double) extends Val
  final case class Bool(b: Boolean) extends Val
  case object NilV extends Val
  final case class Vec(items: List[Val]) extends Val
  final case class Lst(items: List[Val]) extends Val
  final case class SetV(items: List[Val]) extends Val
  final case class MapV(entries: List[(Val, Val)]) extends Val
  final case class Inst(t: java.time.LocalDateTime) extends Val

  def parse(s: String): Val = {
    val p = new Parser(s)
    val v = p.readVal()
    p.skipWs()
    require(p.eof, s"trailing input at ${p.pos}: ${s.drop(p.pos).take(30)}")
    v
  }

  /** Parse a whole string that may contain several top-level forms. */
  def parseAll(s: String): List[Val] = {
    val p = new Parser(s)
    val buf = scala.collection.mutable.ListBuffer[Val]()
    p.skipWs()
    while (!p.eof) { buf += p.readVal(); p.skipWs() }
    buf.toList
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    private def cur: Char = s.charAt(pos)

    def skipWs(): Unit = {
      var go = true
      while (go && !eof) {
        val c = cur
        if (c == ';') { while (!eof && cur != '\n') pos += 1 }
        else if (c.isWhitespace || c == ',') pos += 1
        else go = false
      }
    }

    def readVal(): Val = {
      skipWs()
      require(!eof, "unexpected end of input")
      cur match {
        case '(' => pos += 1; Lst(readSeq(')'))
        case '[' => pos += 1; Vec(readSeq(']'))
        case '{' => pos += 1; readMap()
        case '"' => Str(readString())
        case ':' => pos += 1; Kw(readToken())
        case '#' => readDispatch()
        case '\\' => // character literal -> 1-char string
          pos += 1
          val t = readToken()
          Str(t match {
            case "newline" => "\n"; case "space" => " "; case "tab" => "\t"
            case other => other.take(1)
          })
        case c if c.isDigit || ((c == '-' || c == '+') && pos + 1 < s.length && s.charAt(pos + 1).isDigit) =>
          readNumber()
        case _ =>
          val t = readToken()
          t match {
            case "true" => Bool(true)
            case "false" => Bool(false)
            case "nil" => NilV
            case sym => Sym(sym)
          }
      }
    }

    private def readSeq(close: Char): List[Val] = {
      val buf = scala.collection.mutable.ListBuffer[Val]()
      skipWs()
      while ({ require(!eof, s"unclosed '$close'"); cur != close }) {
        buf += readVal(); skipWs()
      }
      pos += 1
      buf.toList
    }

    private def readMap(): MapV = {
      val items = readSeq('}')
      require(items.size % 2 == 0, "map with odd number of forms")
      MapV(items.grouped(2).map { case List(k, v) => (k, v) }.toList)
    }

    private def readDispatch(): Val = {
      pos += 1
      require(!eof, "dangling #")
      if (cur == '{') { pos += 1; SetV(readSeq('}')) }
      // regex literal #"..." — carried as its pattern string (re-find &
      // co take the pattern positionally, query_test.clj:766)
      else if (cur == '"') Str(readString())
      else {
        val tag = readToken()
        tag match {
          case "inst" =>
            skipWs()
            val str = readString()
            // RFC3339; normalize to LocalDateTime in UTC. Offset forms
            // ("…-05:00", "…Z") convert to the UTC instant's wall clock.
            val t =
              if (!str.contains("T"))
                // date-only, incl. abbreviated "#inst \"2019\"" /
                // "#inst \"2019-02\"" (RFC3339 lets crux abbreviate)
                java.time.LocalDate.parse(str.length match {
                  case 4 => str + "-01-01"
                  case 7 => str + "-01"
                  case _ => str
                }).atStartOfDay()
              else if (str.endsWith("Z") || str.lastIndexOf('+') > str.indexOf('T') ||
                  str.lastIndexOf('-') > str.indexOf('T'))
                java.time.OffsetDateTime.parse(str)
                  .withOffsetSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
              else java.time.LocalDateTime.parse(
                if (str.length == 10 + 6) str + ":00" else str)
            Inst(t)
          case other => throw new IllegalArgumentException(s"unsupported tag #$other")
        }
      }
    }

    private def readString(): String = {
      require(cur == '"', "expected string")
      pos += 1
      val sb = new StringBuilder
      while ({ require(!eof, "unclosed string"); cur != '"' }) {
        if (cur == '\\') {
          pos += 1
          sb.append(cur match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '"' => '"'; case '\\' => '\\'
            case 'u' =>
              val hex = s.substring(pos + 1, pos + 5); pos += 4
              Integer.parseInt(hex, 16).toChar
            case other => other
          })
          pos += 1
        } else { sb.append(cur); pos += 1 }
      }
      pos += 1
      sb.toString
    }

    private def readToken(): String = {
      val start = pos
      while (!eof && !cur.isWhitespace && !",()[]{}\";".contains(cur)) pos += 1
      require(pos > start, s"empty token at $start")
      s.substring(start, pos)
    }

    private def readNumber(): Val = {
      val t = readToken()
      if (t.exists(c => c == '.' || c == 'e' || c == 'E') && !t.endsWith("N") && !t.endsWith("M"))
        Dbl(t.toDouble)
      else {
        val core = t.stripSuffix("N").stripSuffix("M")
        if (core.contains('.')) Dbl(core.toDouble) else Lng(core.toLong)
      }
    }
  }
}
