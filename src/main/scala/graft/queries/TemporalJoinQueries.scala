package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin
import graft.sources.Tables

/** Gates for the generic temporal-join operators ([[TemporalJoin]]):
  * the as-of join checked against DuckDB's native `ASOF JOIN`, and the
  * binned bounded range join checked against a plain range-predicate
  * join. Both run over the events table (150 users × 10k events at
  * sf0.01) — enough key collision to exercise the per-key merge logic.
  */
object TemporalJoinQueries {

  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  /** Every purchase picks the user's latest click at or before it. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    TemporalJoin.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_event_id"), col("asof_ts"))
  }

  /** All click→purchase pairs within 30 minutes, via the binned
    * equi-join plan (explode ×2 on the epoch bucket — no per-key
    * nested loop). */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    TemporalJoin.rangeJoinBinned(clicks, purchases, Seq("user_id"),
        "click_ts", "purchase_ts", windowSeconds = 1800, rightPrefix = "")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Forward direction: every click picks the user's EARLIEST purchase
    * at or after it (time-to-conversion analysis shape). */
  def asofJoinFwd(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    TemporalJoin.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
        direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof_event_id"), col("asof_ts"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "asof_join" -> asofJoin _,
    "asof_join_fwd" -> asofJoinFwd _,
    "range_join" -> rangeJoin _)
}

object TemporalJoinSql {
  val all: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN is the oracle — semantics must agree
    // exactly (latest right ts <= left ts per key, unmatched → NULL)
    "asof_join" -> """
      SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts, p.value,
             c.event_id AS asof_event_id, CAST(c.ts AS TIMESTAMP) AS asof_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts""",

    // DuckDB ASOF accepts <= for the forward direction
    "asof_join_fwd" -> """
      SELECT c.event_id, c.user_id, CAST(c.ts AS TIMESTAMP) AS ts,
             p.event_id AS asof_event_id, CAST(p.ts AS TIMESTAMP) AS asof_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND c.ts <= p.ts""",

    "range_join" -> """
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             CAST(c.ts AS TIMESTAMP) AS click_ts,
             CAST(p.ts AS TIMESTAMP) AS purchase_ts
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE""")
}
