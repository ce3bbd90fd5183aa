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

  private val TemporalPrefix =
    """(?is)\s*VALIDTIME\s*\('([^']+)'\)(?:\s*TRANSACTIONTIME\s*\('([^']+)'\))?(?:\s*TRANSACTIONID\s*\((\d+)\))?\s*(.*)""".r

  /** Register all parquet tables plus the bitemporal `events_current` view
    * resolved at (vt, tt | tx-id), then run the SQL. All three prefix
    * forms of calcite.clj:51-72 are accepted:
    * `VALIDTIME ('…') [TRANSACTIONTIME ('…')] [TRANSACTIONID (n)]`. */
  def query(spark: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerAll(spark, dir)
    sql match {
      case TemporalPrefix(vt, tt, txId, rest) =>
        registerCurrent(spark, dir,
          java.time.LocalDateTime.parse(vt),
          Option(tt).map(java.time.LocalDateTime.parse),
          Option(txId).map(_.toLong))
        spark.sql(rest)
      case _ =>
        registerCurrent(spark, dir, java.time.LocalDateTime.parse("9999-01-01T00:00"), None, None)
        spark.sql(sql)
    }
  }

  private def registerCurrent(spark: SparkSession, dir: String,
      vt: java.time.LocalDateTime, tt: Option[java.time.LocalDateTime],
      txId: Option[Long]): Unit = {
    val versions = graft.queries.BitempQueries.versionsFromEvents(spark, dir)
    val snap = txId match {
      case Some(id) => Bitemp.asOf(versions, lit(vt), lit(id))
      case None => Bitemp.asOfTime(versions, lit(vt),
        lit(tt.getOrElse(java.time.LocalDateTime.parse("9999-01-01T00:00"))))
    }
    snap.createOrReplaceTempView("events_current")
  }
}
