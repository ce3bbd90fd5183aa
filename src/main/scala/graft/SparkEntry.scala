package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{BitempQueries, BitempSql, Datalog2Queries, Datalog2Sql, DatalogQueries, DatalogSql, HttpQueries, HttpSql, LubmQueries, LubmSql, SparqlQueries, SparqlSql, TemporalJoinQueries, TemporalJoinSql, TsQueries, TsSql, WatDivQueries, WatDivSql, PullQueries, PullSql, RdfSetQueries, RdfSetSql, SqlStreamQueries, SqlStreamSql, Tpch, TpchSql, TxFnStatsQueries, TxFnStatsSql, TrainQueries, TrainSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tpch.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Tpch.all ++ BitempQueries.all ++ DatalogQueries.all ++ TrainQueries.all ++ SqlStreamQueries.all ++ PullQueries.all ++ Datalog2Queries.all ++ RdfSetQueries.all ++ TxFnStatsQueries.all ++ LubmQueries.all ++ WatDivQueries.all ++ HttpQueries.all ++ SparqlQueries.all ++ TemporalJoinQueries.all ++ TsQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TpchSql.all ++ BitempSql.all ++ DatalogSql.all ++ TrainSql.all ++ SqlStreamSql.all ++ PullSql.all ++ Datalog2Sql.all ++ RdfSetSql.all ++ TxFnStatsSql.all ++ LubmSql.all ++ WatDivSql.all ++ HttpSql.all ++ SparqlSql.all ++ TemporalJoinSql.all ++ TsSql.all
}
