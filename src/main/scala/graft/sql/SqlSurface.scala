package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.Bitemp
import graft.sources.Tables

/** The SQL query surface (SURVEY §2.8, §3.2). The reference routes SQL
  * through Calcite converter rules into Datalog
  * (crux-sql/src/crux/CruxRules.java:25-38); here `spark.sql` IS the
  * engine — the only reference-specific behavior to re-express is:
  *
  *  - catalog registration of the typed tables (the schema-doc concept,
  *    crux-sql/src/crux/calcite.clj:456-465);
  *  - the temporal prefix `VALIDTIME ('…') [TRANSACTIONTIME ('…')]`
  *    stripped from the SQL text and applied as the snapshot basis
  *    (calcite.clj:51-72 `prepare-sql`): the bitemporal `events_current`
  *    view is resolved as-of that basis before the query runs.
  */
object SqlSurface {

  // one temporal-prefix token: keyword + ('literal') or (number), rest
  private val PrefixToken =
    """(?is)^\s*(VALIDTIME|TRANSACTIONTIME|TRANSACTIONID)\s*\(\s*(?:'([^']*)'|(\d+))\s*\)\s*(.*)$""".r

  /** Register all parquet tables plus the bitemporal `events_current` view
    * resolved at (vt, tt | tx-id), then run the SQL. Like the reference's
    * prepare-sql (calcite.clj:51-72), the prefix keywords `VALIDTIME ('…')`
    * / `TRANSACTIONTIME ('…')` / `TRANSACTIONID (n)` are parsed in a loop:
    * any order, any subset. The no-prefix default basis is the CURRENT
    * time on both axes (future-valid-dated facts are not visible by
    * default, matching the reference). */
  /** @param args positional `?` parameters — the JDBC prepared-statement
    *   surface (crux-sql/test/crux/calcite_test.clj:422-427); Spark's
    *   parameterized-SQL binding does the substitution. */
  def query(spark: SparkSession, dir: String, sql: String,
      args: Array[Any] = Array.empty): DataFrame = {
    Tables.registerAll(spark, dir)
    var rest = sql
    var vt: Option[java.time.LocalDateTime] = None
    var tt: Option[java.time.LocalDateTime] = None
    var txId: Option[Long] = None
    var more = true
    while (more) rest match {
      case PrefixToken(kw, str, num, tail) =>
        kw.toUpperCase(java.util.Locale.ROOT) match {
          case "VALIDTIME" => vt = Some(java.time.LocalDateTime.parse(str))
          case "TRANSACTIONTIME" => tt = Some(java.time.LocalDateTime.parse(str))
          case "TRANSACTIONID" => txId = Some(Option(num).getOrElse(str).toLong)
        }
        rest = tail
      case _ => more = false
    }
    registerCurrent(spark, dir, vt.getOrElse(java.time.LocalDateTime.now()), tt, txId)
    if (args.isEmpty) spark.sql(rest) else spark.sql(rest, args)
  }

  private def registerCurrent(spark: SparkSession, dir: String,
      vt: java.time.LocalDateTime, tt: Option[java.time.LocalDateTime],
      txId: Option[Long]): Unit = {
    val versions = graft.queries.BitempQueries.versionsFromEvents(spark, dir)
    val snap = txId match {
      case Some(id) => Bitemp.asOf(versions, lit(vt), lit(id))
      case None => Bitemp.asOfTime(versions, lit(vt),
        lit(tt.getOrElse(java.time.LocalDateTime.now())))
    }
    snap.createOrReplaceTempView("events_current")
  }
}
