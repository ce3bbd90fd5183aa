package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.datalog.QuadSource
import graft.sparql.Sparql
import graft.sources.Rdf

/** Correctness gates for the SPARQL front-end (labs/crux-rdf sparql.clj;
  * ported suite in SparqlSpec): the ARQ-tutorial vcard corpus
  * (crux-test/test/crux/vc-db-1.nt — read as DATA, like the LUBM gates
  * read University0_0.ntriples) queried via [[Sparql.query]], checked
  * against a DuckDB parse of the same file. */
object SparqlQueries {

  val path = "/root/reference/crux-test/test/crux/vc-db-1.nt"

  private def source(s: SparkSession): QuadSource = {
    val quads = Rdf.loadNTriples(s, path)
    val attrs = quads.select("a").distinct().collect().map(_.getString(0))
    new QuadSource(quads,
      attrs.map(a => a -> (if (a == "age") "v_num" else "v_str")).toMap)
  }

  /** Render an optional (tagged mixed-family) column for the oracle:
    * whole numerics print bare, the unmatched marker keyword as-is. */
  private def renderTagged(c: org.apache.spark.sql.Column) =
    coalesce(c.getField("n").cast("long").cast("string"), c.getField("s"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // OPTIONAL with the :crux.sparql/optional marker (sparql_test.clj:69-84)
    "sparql_vcard" -> ((s: SparkSession, _: String) =>
      Sparql.query(s, source(s), """
        PREFIX info:  <http://somewhere/peopleInfo#>
        PREFIX vcard: <http://www.w3.org/2001/vcard-rdf/3.0#>
        SELECT ?name ?age
        WHERE { ?person vcard:FN ?name . OPTIONAL { ?person info:age ?age } }""")
        .withColumn("age", renderTagged(col("age")))),

    // FILTER regex with flags (sparql_test.clj:45-55)
    "sparql_regex" -> ((s: SparkSession, _: String) =>
      Sparql.query(s, source(s), """
        PREFIX vcard: <http://www.w3.org/2001/vcard-rdf/3.0#>
        SELECT ?g
        WHERE { ?y vcard:Given ?g . FILTER regex(?g, "r", "i") }""")))
}

object SparqlSql {
  /** DuckDB quad extraction for vc-db-1.nt: IRI local names (trailing
    * `/` stripped), blank-node subjects/objects kept verbatim —
    * mirroring [[graft.sources.Rdf.loadNTriples]]. */
  private val nt = raw"""
    WITH nt AS (
      SELECT
        CASE WHEN line LIKE '_:%' THEN regexp_extract(line, '^(_:[^ \t]+)', 1)
             ELSE regexp_extract(line, '^<[^>]*?([^/#>]+)[/]*>', 1) END AS e,
        regexp_extract(line, '^(?:<[^>]*>|_:[^ \t]+)\s*<[^>]*?([^/#>]+)>', 1) AS a,
        COALESCE(
          NULLIF(regexp_extract(line, '(_:[^ \t]+)\s*\.\s*$$', 1), ''),
          regexp_extract(line, '"([^"]*)"', 1)) AS v
      FROM read_csv('${SparqlQueries.path}',
                    columns={'line': 'VARCHAR'}, delim='\t',
                    header=false, quote='')
      WHERE length(trim(line)) > 0
    )"""

  val all: Map[String, String] = Map(
    "sparql_vcard" -> raw"""$nt
      SELECT DISTINCT f.v AS name,
             CASE WHEN a.v IS NULL THEN ':crux.sparql/optional' ELSE a.v END AS age
      FROM (SELECT e, v FROM nt WHERE a='FN') f
      LEFT JOIN (SELECT e, v FROM nt WHERE a='age') a ON f.e = a.e""",

    "sparql_regex" -> raw"""$nt
      SELECT DISTINCT v AS g FROM nt
      WHERE a='Given' AND regexp_matches(v, '(?i)r')""")
}
