package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SessionConf

/** The scoped-override contract every batch-sizing path leans on:
  * restore on normal exit AND on throw, and nested scopes restore to
  * what the outer scope set (not to the session default). */
class SessionConfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val key = "spark.sql.shuffle.partitions"

  test("restores on exit, on throw, and through nesting") {
    val outer = spark.conf.get(key)
    SessionConf.withConf(spark, key -> "7") {
      assert(spark.conf.get(key) == "7")
      SessionConf.withConf(spark, key -> "3") {
        assert(spark.conf.get(key) == "3")
      }
      assert(spark.conf.get(key) == "7") // nested restores to outer's value
      intercept[RuntimeException] {
        SessionConf.withConf(spark, key -> "5") {
          assert(spark.conf.get(key) == "5")
          throw new RuntimeException("boom")
        }
      }
      assert(spark.conf.get(key) == "7") // restored on the throw path
    }
    assert(spark.conf.get(key) == outer)
  }
}
