package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TemporalJoin
import graft.sources.Tables

/** Semantics of the generic temporal joins: the window-based as-of join
  * must agree with a naive per-row "latest at or before" computation, and
  * the binned range join must agree with the plain range-predicate join —
  * on the real events fixture and on synthetic edges (exact-boundary
  * timestamps, empty right side, tolerance cutoffs, numeric ts). */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def events = Tables.load(spark, dir, "events")

  test("asofJoin equals the naive latest-at-or-before computation") {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val got = TemporalJoin.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_click_id"))
    // naive: range join then per-purchase argmax over click ts
    val naive = purchases.as("p")
      .join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max_by(col("c.click_id"), col("c.ts")).as("asof_click_id"))
    assert(got.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet ==
      naive.collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet)
    assert(got.count() == purchases.count()) // left-outer: every purchase kept
  }

  test("asofJoin: same-instant right row matches; tolerance nulls stale rows") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "t")
    val right = Seq((1L, 100L, "a"), (1L, 150L, "b"), (2L, 10L, "c"))
      .toDF("k", "t", "v")
    val noTol = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t")
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])].collect().toSet
    assert(noTol == Set((1L, 100L, Some("a")), (1L, 200L, Some("b")),
      (2L, 50L, Some("c"))))
    // numeric ts are treated as seconds; tolerance 30 s drops the 40-s-old
    // match for (2, 50) but keeps the exact-boundary (1, 100)→(1, 100)
    val tol = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        toleranceSeconds = Some(30L))
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])].collect().toSet
    assert(tol == Set((1L, 100L, Some("a")), (1L, 200L, None),
      (2L, 50L, None)))
  }

  test("forward asofJoin picks the earliest at-or-after row; tolerance caps it") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("k", "t")
    val right = Seq((1L, 100L, "a"), (1L, 150L, "b"), (2L, 90L, "c"))
      .toDF("k", "t", "v")
    val fwd = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        direction = "forward")
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])].collect().toSet
    // (1,100)→a (same instant), (1,200)→none (no future row), (2,50)→c
    assert(fwd == Set((1L, 100L, Some("a")), (1L, 200L, None),
      (2L, 50L, Some("c"))))
    val tol = TemporalJoin.asofJoin(left, right, Seq("k"), "t", "t",
        toleranceSeconds = Some(30L), direction = "forward")
      .select("k", "t", "asof_v").as[(Long, Long, Option[String])].collect().toSet
    // (2,50)→c is 40 s ahead — beyond the 30 s tolerance
    assert(tol == Set((1L, 100L, Some("a")), (1L, 200L, None),
      (2L, 50L, None)))
  }

  test("rangeJoinBinned equals the naive range-predicate join") {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    val got = TemporalJoin.rangeJoinBinned(clicks, purchases, Seq("user_id"),
        "click_ts", "purchase_ts", windowSeconds = 1800, rightPrefix = "")
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = clicks.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select("click_id", "purchase_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.nonEmpty)
  }

  test("rangeJoinBinned: exact window boundary is inclusive, across buckets") {
    import spark.implicits._
    // right rows at +0s, +60s (exact boundary, next bucket), +61s (out)
    val left = Seq((1L, 1000L)).toDF("k", "t")
    val right = Seq((1L, 1000L, "x"), (1L, 1060L, "y"), (1L, 1061L, "z"))
      .toDF("k", "t", "v")
    val got = TemporalJoin.rangeJoinBinned(left, right, Seq("k"), "t", "t",
        windowSeconds = 60).select("r_v").as[String].collect().toSet
    assert(got == Set("x", "y"))
  }
}
