package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** Native Catalyst expression surface (functions/CosineSimilarity.scala). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cosine_sim: parallel=1, orthogonal=0, zero-norm=null, float casts") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS par,
             cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth,
             cosine_sim(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS zero,
             cosine_sim(array(CAST(3.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS flt
      """).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
  }

  test("two cosine_sim calls share one codegen scope without local collisions") {
    GraftFunctions.register(spark)
    val df = spark.range(2)
      .selectExpr("array(CAST(id + 1 AS DOUBLE), 2.0D) AS a",
        "array(2.0D, 1.0D) AS b", "array(1.0D, 1.0D) AS c")
      .selectExpr("cosine_sim(a, b) AS x", "cosine_sim(a, c) AS y")
    assert(df.collect().length == 2) // would throw on Janino redeclaration
  }

  test("cosine_sim stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    // non-local source so the expression isn't constant-folded away
    val df = spark.range(2)
      .selectExpr("array(CAST(id + 1 AS DOUBLE), 2.0D) AS a", "array(2.0D, CAST(id + 1 AS DOUBLE)) AS b")
      .selectExpr("cosine_sim(a, b) AS c", "a")
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    val vals = df.orderBy("a").collect().map(_.getDouble(0))
    assert(math.abs(vals(0) - 0.8) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
  }
}
