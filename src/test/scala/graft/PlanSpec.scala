package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tpch
import graft.datalog.{Planner, TableSource}

/** Physical-plan shape assertions — the properties that decide whether
  * these operators survive a 100 TB cluster, pinned so a regression in
  * plan quality fails CI even while results stay correct:
  *
  *   - filters reach the parquet scan (PushedFilters)
  *   - projections prune the scan schema (ReadSchema)
  *   - dimension joins broadcast instead of shuffling both sides
  *   - no accidental cartesian products in the join cascades
  *   - the hot aggregation paths stay inside WholeStageCodegen
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q5 nation/region/supplier joins broadcast") {
    val p = plan(Tpch.q5(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // six tables, and none of the joins degrades to a cartesian
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("TPC-H cascades never produce a cartesian product") {
    for ((name, fn) <- Tpch.all) {
      val p = plan(fn(spark, dir))
      withClue(s"$name: ") { assert(!p.contains("CartesianProduct")) }
    }
  }

  test("q6 pushes range filters into the scan and prunes columns") {
    val p = plan(Tpch.q6(spark, dir))
    assert(p.contains("PushedFilters"))
    // the scan must not read the full 10-column lineitem schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_shipdate"))
    assert(!readSchema.contains("l_returnflag"), readSchema)
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("q1 aggregation runs inside whole-stage codegen") {
    val df = Tpch.q1(spark, dir)
    df.collect() // AQE only materializes codegen stages in the final plan
    // "*(n)" prefixes are the WholeStageCodegen span markers in the tree string
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")), p.take(2000))
    assert(!p.linesIterator.exists(l => l.contains("HashAggregate") && !l.contains("*(")), p.take(2000))
  }

  test("datalog triple-pattern join prunes columns and pushes the constant") {
    val src = TableSource.tpch(spark, dir)
    val df = Planner.q(spark, src,
      """[:find ?n :where [[?r :r_name ?n] [?r :r_regionkey 2]]]""")
    val p = plan(df)
    // the r_regionkey = 2 literal must reach the region scan
    assert(p.contains("PushedFilters") && p.contains("r_regionkey"), p.take(2000))
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(!reads.contains("r_comment"), reads) // never read, never scanned
  }

  test("datalog equi-join on shared vars broadcasts the dimension side") {
    val src = TableSource.tpch(spark, dir)
    val df = Planner.q(spark, src, """
      [:find ?c ?n :where [[?cu :c_custkey ?c] [?cu :c_nationkey ?nk]
                           [?na :n_nationkey ?nk] [?na :n_name ?n]]]""")
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") || p.contains("AdaptiveSparkPlan"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("text-search plan carries the contains prefilter before tokenizing") {
    val src = TableSource.tpch(spark, dir)
    val df = Planner.q(spark, src,
      """[:find ?e :where [[(text-search :p_name "blue") [[?e]]]]]""")
    val p = df.queryExecution.optimizedPlan.toString
    // cheap Contains guard present (prefilter), not just the token compare
    assert(p.toLowerCase.contains("contains"), p.take(2000))
  }
}
