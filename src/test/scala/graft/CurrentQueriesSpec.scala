package graft

import java.time.{Duration, Instant}
import org.scalatest.funsuite.AnyFunSuite
import graft.http.QueryTracker
import graft.http.QueryTracker.{Options, QueryState}

/** Ports of current_queries_test.clj — the node's recent/slowest query
  * registries and their cleaning policies (crux-core/src/crux/node.clj:
  * 65-86, crux-test/test/crux/current_queries_test.clj). */
class CurrentQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private val now = Instant.parse("2026-01-01T00:00:00Z")
  private def qs(id: Long, startedSecAgo: Long, finishedSecAgo: Long) =
    QueryState(id, s"q$id", now.minusSeconds(startedSecAgo),
      Some(now.minusSeconds(finishedSecAgo)), "completed", None)

  test("cleaning recent queries: max count + age expiration (:20-48 port)") {
    // finished now / -5s / -10s, exactly the fixture rows
    val queries = Seq(qs(1, 1, 0), qs(2, 6, 5), qs(3, 11, 10))
    def ids(maxAge: Long, maxCount: Int) =
      QueryTracker.cleanCompleted(queries,
        Options(recentQueriesMaxAge = Duration.ofSeconds(maxAge),
          recentQueriesMaxCount = maxCount), now).map(_.queryId)
    assert(ids(8, 1) == Seq(1L))
    assert(ids(8, 2) == Seq(1L, 2L))
    assert(ids(4, 5) == Seq(1L))
    assert(ids(8, 5) == Seq(1L, 2L))
  }

  test("cleaning slowest queries: ordering by duration + age (:52-92 port)") {
    // all started -10s; finished -9s/-5s/-1s → durations 1s/5s/9s for ids 3/2/1
    val queries = Seq(qs(3, 10, 9), qs(2, 10, 5), qs(1, 10, 1))
    def ids(maxAge: Long, maxCount: Int) =
      QueryTracker.cleanSlowest(queries,
        Options(slowQueriesMaxAge = Duration.ofSeconds(maxAge),
          slowQueriesMaxCount = maxCount), now).map(_.queryId)
    assert(ids(8, 1) == Seq(1L))
    assert(ids(8, 2) == Seq(1L, 2L))
    assert(ids(4, 5) == Seq(1L))
    assert(ids(8, 5) == Seq(1L, 2L))
  }

  test("recent queries: successful then failed query both recorded (:94-115 port)") {
    import graft.datalog.TableSource
    val node = new graft.http.GraftNode(spark, TableSource.tpch(spark, dir))
    node.q("""[:find ?n :where [[?r :r_name ?n]]]""")
    val afterOk = node.queryTracker.recent()
    assert(afterOk.head.status == "completed")
    assert(afterOk.head.query.contains("r_name"))
    // a malformed query (unknown find var) is recorded as failed, with
    // its original text (current_queries_test.clj:108-114)
    intercept[Exception] {
      node.q("""[:find ?f :where [[?e :r_name ?n]]]""")
    }
    val afterFail = node.queryTracker.recent()
    assert(afterFail.head.status == "failed")
    assert(afterFail.head.query.contains("?f"))
    assert(afterFail.head.error.nonEmpty)
    node.close()
  }

  test("slowest queries honor the min threshold") {
    val t = new graft.http.QueryTracker(Options(
      slowQueriesMinThreshold = Duration.ofNanos(1)))
    val id = t.started("q")
    t.finished(id, None)
    assert(t.slowestQueries().nonEmpty) // every real query exceeds 1 ns
    val t2 = new graft.http.QueryTracker(Options(
      slowQueriesMinThreshold = Duration.ofHours(1)))
    val id2 = t2.started("q")
    t2.finished(id2, None)
    assert(t2.slowestQueries().isEmpty)
    assert(t2.recent().nonEmpty)
  }
}
