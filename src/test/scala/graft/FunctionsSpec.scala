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

  test("morton_z matches Morton.interleave on ntz timestamps and stays in codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(64)
      .selectExpr(
        "CAST(timestamp_micros(id * 1000003 + 17) AS TIMESTAMP_NTZ) AS vt",
        "CAST(timestamp_micros(id * 999983 + 3) AS TIMESTAMP_NTZ) AS tt")
      .selectExpr("vt", "tt", "morton_z(vt, tt) AS z")
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    df.collect().foreach { r =>
      def us(t: java.time.LocalDateTime): Long =
        t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
      // morton_z rides the epoch-BIASED time kernel (zDecimal); the raw
      // interleave of the biased micros is the expected curve position
      val bias = graft.bitemp.Morton.EpochBiasMicros
      val expect = graft.bitemp.Morton.interleave(
        us(r.getAs[java.time.LocalDateTime]("vt")) + bias,
        us(r.getAs[java.time.LocalDateTime]("tt")) + bias)
      assert(BigInt(r.getDecimal(2).toBigInteger) == expect, r.toString)
    }
    // raw micros longs are accepted too (the other physical encoding)
    val bias = graft.bitemp.Morton.EpochBiasMicros
    val viaLong = spark.sql("SELECT morton_z(5L, 9L) AS z").collect().head
    assert(BigInt(viaLong.getDecimal(0).toBigInteger) ==
      graft.bitemp.Morton.interleave(5L + bias, 9L + bias))
    // pre-1970 timestamps are IN the supported domain: the biased curve
    // keeps them ordered below the epoch instead of wrapping to the top
    val pre = spark.sql(
      "SELECT morton_z(CAST('1969-12-31 00:00:00' AS TIMESTAMP_NTZ), 5L) AS z," +
      "       morton_z(CAST('1970-01-02 00:00:00' AS TIMESTAMP_NTZ), 5L) AS z2").collect().head
    assert(BigInt(pre.getDecimal(0).toBigInteger) < BigInt(pre.getDecimal(1).toBigInteger))
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
