package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF N-Triples source (SURVEY §2.1; reference:
  * labs/crux-rdf/src/crux/rdf.clj — bulk triple load for the LUBM/WatDiv
  * suites, maps `<subject>` IRIs to entity ids and predicate IRIs to
  * keyword attributes).
  *
  * Spark-first: `spark.read.text` + codegen'd `regexp_extract` line
  * parsing — no per-line driver work, scales linearly with input splits.
  * Typed literals are split into per-type value columns compatible with
  * [[graft.datalog.QuadSource]] (the §1.2 "one typed column per type-tag
  * family" decision).
  */
object Rdf {

  /** N-Triples string-literal escaping (\\ \" \n \r \t). */
  private def escapeLit(c: org.apache.spark.sql.Column) = {
    val e1 = regexp_replace(c, "\\\\", "\\\\\\\\")
    val e2 = regexp_replace(e1, "\"", "\\\\\"")
    val e3 = regexp_replace(e2, "\n", "\\\\n")
    val e4 = regexp_replace(e3, "\r", "\\\\r")
    regexp_replace(e4, "\t", "\\\\t")
  }

  private def unescapeLit(c: org.apache.spark.sql.Column) = {
    // ONE left-to-right pass: sequential per-escape replaces corrupt a
    // round-trip like "C:\\nodes" (escaped backslash + literal 'n'),
    // because a later pass re-reads the surviving backslash as the start
    // of an escape. No regexp_replace chain can consume pairs once
    // (\\n must yield a newline but \\\\n a backslash+n), so this is a
    // UDF — acceptable HERE because it runs once per corpus inside the
    // persisted parse, never in a query hot path.
    import org.apache.spark.sql.functions.udf
    val un = udf { (s: String) =>
      if (s == null || !s.contains("\\")) s
      else {
        val sb = new java.lang.StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case '"' => sb.append('"'); i += 2
              case '\\' => sb.append('\\'); i += 2
              case o => sb.append(ch); sb.append(o); i += 2
            }
          } else { sb.append(ch); i += 1 }
        }
        sb.toString
      }
    }
    un(c)
  }

  /** literal or IRI object term, with optional ^^datatype / @lang. */
  private val ObjLit = """^"(.*)"(?:\^\^<([^>]*)>|@[A-Za-z0-9-]+)?\s*$"""
  private val ObjIri = """^<([^>]*)>\s*$"""

  /** Per-(session, path) cache of PERSISTED parsed quads. The regex parse
    * is the expensive part of an NT load, and a datalog query re-executes
    * its source once per triple pattern — a 6-clause WatDiv snowflake
    * re-parsed the corpus six times before this (r5, VERDICT r4 watdiv_f1
    * profile). Persisting the parse output means one parse, N columnar
    * cache scans. At real scale the same economics say parse-once →
    * write parquet → read back; MEMORY_AND_DISK spills rather than OOMs
    * until then. Dropped on application end, like [[Tables]]. */
  private val ntCache = new SessionCache[(SparkSession, String), DataFrame]

  /** Parse an N-Triples text file/dir into quads
    * (e, a, v_str, v_num, v_dbl): IRIs shortened to their local name
    * (fragment or last path segment, rdf.clj's keyword mapping).
    * Parsed+persisted once per (session, path) — see [[ntCache]]; a
    * rewritten file needs [[invalidate]]. */
  def loadNTriples(spark: SparkSession, path: String): DataFrame =
    ntCache.getOrBuild((spark, path))(
      parseNTriples(spark, path).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Unpersist + drop the cached parse for a rewritten file. */
  def invalidate(spark: SparkSession, path: String): Unit =
    ntCache.remove((spark, path)).foreach(_.unpersist())

  private def parseNTriples(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0 && !col("value").startsWith("#"))
    // subject: IRI or blank node (`_:b0` — vc-db-1.nt style); blank-node
    // labels pass through as entity ids (rdf.clj keeps them distinct too)
    val TripleLine = """^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$"""
    val parts = lines.select(
      regexp_extract(col("value"), TripleLine, 1).as("s_tok"),
      regexp_extract(col("value"), TripleLine, 2).as("p_iri"),
      regexp_extract(col("value"), TripleLine, 3).as("obj"))
    def localName(c: org.apache.spark.sql.Column) =
      regexp_extract(regexp_replace(c, "/+$", ""), """([^/#]+)$""", 1)
    parts
      .filter(col("s_tok") =!= "" && col("p_iri") =!= "")
      .select(
        when(col("s_tok").startsWith("_:"), col("s_tok"))
          .otherwise(localName(regexp_replace(col("s_tok"), "^<|>$", ""))).as("e"),
        localName(col("p_iri")).as("a"),
        regexp_extract(col("obj"), ObjLit, 1).as("lex"),
        regexp_extract(col("obj"), ObjLit, 2).as("dtype"),
        regexp_extract(col("obj"), ObjIri, 1).as("o_iri"),
        col("obj"))
      .select(col("e"), col("a"),
        when(col("o_iri") =!= "", localName(col("o_iri")))
          .when(col("obj").rlike("^_:\\S+$"), col("obj")) // blank-node object
          .when(col("dtype") === "" || col("dtype").endsWith("string"),
            nullif(unescapeLit(col("lex")), lit("")))
          .otherwise(lit(null)).as("v_str"),
        when(col("dtype").endsWith("integer") || col("dtype").endsWith("long") ||
             col("dtype").endsWith("int"), col("lex").cast("long")).as("v_num"),
        when(col("dtype").endsWith("double") || col("dtype").endsWith("decimal") ||
             col("dtype").endsWith("float"), col("lex").cast("double")).as("v_dbl"))
  }

  /** Serialize (entity-id, attr → value) rows to N-Triples lines under
    * `ns`. Longs/doubles become typed literals, strings plain literals. */
  def toNTriples(df: DataFrame, ns: String, idCol: String): DataFrame = {
    val valueCols = df.columns.filterNot(_ == idCol)
    val lines = valueCols.map { c =>
      val obj = df.schema(c).dataType match {
        case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType =>
          concat(lit("\""), col(c).cast("string"),
            lit("\"^^<http://www.w3.org/2001/XMLSchema#long>"))
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
          concat(lit("\""), col(c).cast("string"),
            lit("\"^^<http://www.w3.org/2001/XMLSchema#double>"))
        case _ => concat(lit("\""), escapeLit(col(c).cast("string")), lit("\""))
      }
      df.filter(col(c).isNotNull).select(concat(
        lit(s"<$ns/e/"), col(idCol).cast("string"), lit(s"> <$ns/$c> "), obj, lit(" .")).as("value"))
    }
    if (lines.isEmpty)
      df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType))))
    else lines.reduce(_ unionByName _)
  }
}
