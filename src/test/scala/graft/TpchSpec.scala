package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Tpch, TpchSql}

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Smoke + shape tests for the TPC-H-style suite at sf0.001. Exact value
  * parity with DuckDB is checked by the driver's oracle gate (Verify +
  * oracle_sql.json); these tests pin plan health and result shape.
  */
class TpchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("every query has an oracle") {
    assert(Tpch.all.keySet == TpchSql.all.keySet)
  }

  test("q1 groups and aggregates") {
    val rows = Tpch.q1(spark, dir).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus
    val cols = Tpch.q1(spark, dir).columns.toSet
    assert(cols == Set("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order"))
    assert(rows.forall(_.getDouble(2) > 0)) // sum_qty positive
  }

  test("q6 single-row aggregate") {
    val rows = Tpch.q6(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getDouble(0) > 0)
  }

  test("all queries execute without error") {
    Tpch.all.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      withClue(s"$name: ") { assert(df.count() >= 0) }
    }
  }

  test("q1 plan pushes filter into parquet scan") {
    val plan = Tpch.q1(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("pushedFilters"))
  }
}
