package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stats

/** HLL-approx stats sketch sanity (index_store.clj:453-472 analogue). */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("approx_count_distinct within rsd tolerance of exact") {
    val df = spark.range(0, 50000)
      .selectExpr("id % 9973 AS k", "CAST(id % 37 AS STRING) AS s")
    val stats = Stats.attrStats(df, Seq("k", "s"), rsd = 0.05)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val (exactK, approxK) = stats("k")
    assert(exactK == 9973L)
    assert(math.abs(approxK - exactK).toDouble / exactK < 0.15)
    val (exactS, approxS) = stats("s")
    assert(exactS == 37L)
    assert(math.abs(approxS - exactS).toDouble / exactS < 0.15)
  }
}
