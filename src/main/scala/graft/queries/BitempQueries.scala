package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.Bitemp
import graft.sources.Tables

/** Correctness-gate queries for the bitemporal core (SURVEY §2.3/§2.5/§2.9),
  * driven by the `events` table re-cast as a version log: each event is a
  * put of entity user_id at valid-time ts, tx-id event_id; `error` events
  * are tombstones (deletes). Oracles in [[BitempSql]] express the same
  * semantics with window SQL.
  */
object BitempQueries {

  /** events → versions(eid, vt, tt, tx_id, content_hash, tombstone, value) */
  def versionsFromEvents(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("user_id").cast("string").as("eid"),
      col("ts").as("vt"),
      col("ts").as("tt"),
      col("event_id").as("tx_id"),
      col("event_type").as("content_hash"),
      (col("event_type") === "error").as("tombstone"),
      col("value"))

  private def out(df: DataFrame): DataFrame =
    df.select(col("eid"), col("vt"), col("tx_id"),
      col("content_hash").as("event_type"), col("value"))

  private val VT = java.time.LocalDateTime.parse("2024-01-15T00:00:00")

  /** Point-in-time snapshot: latest non-tombstone version per entity. */
  def asof(s: SparkSession, dir: String): DataFrame =
    out(Bitemp.asOf(versionsFromEvents(s, dir), lit(VT), lit(Long.MaxValue)))

  /** Snapshot with a transaction-id basis too (time-travel both axes). */
  def asofTx(s: SparkSession, dir: String): DataFrame =
    out(Bitemp.asOf(versionsFromEvents(s, dir), lit(VT), lit(5000L)))

  /** Resolved entity history with valid-time range bounds. */
  def history(s: SparkSession, dir: String): DataFrame = {
    val v = versionsFromEvents(s, dir).filter(col("eid").cast("long") % 25 === 0)
    out(Bitemp.history(v, sortAsc = true, withCorrections = false,
      vtStart = Some(lit(java.time.LocalDateTime.parse("2024-01-10T00:00:00"))),
      vtEnd = Some(lit(java.time.LocalDateTime.parse("2024-01-20T00:00:00")))))
  }

  /** Speculative basis (`with-tx`): fork the DB with in-memory puts. */
  def speculative(s: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    val specVt = java.time.LocalDateTime.parse("2024-02-01T00:00:00")
    val rows = Seq("1", "2", "3").zipWithIndex.map { case (eid, i) =>
      Row(eid, specVt, specVt, 1000000000L + i, "spec", false, 0.0)
    }
    val spec = s.createDataFrame(rows.asJava, versionsFromEvents(s, dir).schema)
    val forked = Bitemp.withSpeculative(versionsFromEvents(s, dir), spec)
    out(Bitemp.asOf(forked,
      lit(java.time.LocalDateTime.parse("2024-02-15T00:00:00")), lit(Long.MaxValue)))
      .filter(col("eid").isin("1", "2", "3"))
  }

  /** Valid-time intervals view ([vt, vt_end) per version). */
  def intervals(s: SparkSession, dir: String): DataFrame = {
    val v = versionsFromEvents(s, dir).filter(col("eid").cast("long") % 50 === 0)
    Bitemp.intervals(v)
      .select(col("eid"), col("vt"), col("vt_end"), col("content_hash").as("event_type"))
  }

  /** Content-addressed document fetch (SURVEY §2.1 entity/doc fetch): the
    * docs table is keyed by content hash; the "entity index" maps doc_id →
    * hash; fetching = a join on the hash. */
  /** Bitemporal box query over the Z-ordered layout: the (vt × tt) box
    * becomes ≤8 contiguous z-ranges ([[graft.bitemp.Morton.zRanges]]) —
    * a pruning predicate over the z-sorted parquet — plus the exact
    * per-row bounds. The oracle recomputes the box from the raw events,
    * so a hash match proves the range decomposition COVERS the box (a
    * dropped z-range would lose rows). */
  def zRangeBox(s: SparkSession, dir: String): DataFrame = {
    import graft.bitemp.Morton
    val path = graft.sources.Layout.zOrderedVersions(s, dir)
    def us(t: String): Long =
      java.time.LocalDateTime.parse(t).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val (vt1, vt2) = ("2024-01-10T00:00:00", "2024-01-20T00:00:00")
    val (tt1, tt2) = ("2024-01-12T00:00:00", "2024-01-18T00:00:00")
    val ranges = Morton.zRanges(us(vt1), us(vt2), us(tt1), us(tt2), maxRanges = 8)
    val zPred = ranges.map { case (a, b) =>
      col("z") >= lit(new java.math.BigDecimal(a.bigInteger)) &&
        col("z") <= lit(new java.math.BigDecimal(b.bigInteger))
    }.reduce(_ || _)
    s.read.parquet(path)
      .filter(zPred)
      .filter(col("vt") >= lit(java.time.LocalDateTime.parse(vt1)) &&
        col("vt") <= lit(java.time.LocalDateTime.parse(vt2)) &&
        col("tt") >= lit(java.time.LocalDateTime.parse(tt1)) &&
        col("tt") <= lit(java.time.LocalDateTime.parse(tt2)))
      .select(col("eid"), col("vt"), col("tt"), col("tx_id"),
        col("content_hash").as("event_type"), col("value"))
  }

  def docFetch(s: SparkSession, dir: String): DataFrame = {
    val documents = Tables.load(s, dir, "documents")
    val docStore = documents.select(sha2(col("text"), 256).as("content_hash"),
      col("text"), col("n_chars")).distinct()
    val entityIndex = documents.select(col("doc_id").as("eid"),
      sha2(col("text"), 256).as("content_hash"))
    entityIndex.join(docStore, Seq("content_hash"))
      .filter(col("eid") < 100)
      .select(col("eid"), col("content_hash"), col("n_chars"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bitemp_asof" -> asof _,
    "bitemp_asof_tx" -> asofTx _,
    "bitemp_history" -> history _,
    "bitemp_speculative" -> speculative _,
    "bitemp_intervals" -> intervals _,
    "bitemp_zrange" -> zRangeBox _,
    "doc_fetch" -> docFetch _)
}

object BitempSql {
  private val versions = """
    SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
           CAST(ts AS TIMESTAMP) AS tt, event_id AS tx_id,
           event_type, value, (event_type = 'error') AS tombstone
    FROM events"""

  val all: Map[String, String] = Map(
    "bitemp_asof" -> s"""
      WITH versions AS ($versions),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid ORDER BY vt DESC, tx_id DESC) AS rn
        FROM versions WHERE vt <= TIMESTAMP '2024-01-15 00:00:00')
      SELECT eid, vt, tx_id, event_type, value
      FROM ranked WHERE rn = 1 AND NOT tombstone""",

    "bitemp_asof_tx" -> s"""
      WITH versions AS ($versions),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid ORDER BY vt DESC, tx_id DESC) AS rn
        FROM versions
        WHERE vt <= TIMESTAMP '2024-01-15 00:00:00' AND tx_id <= 5000)
      SELECT eid, vt, tx_id, event_type, value
      FROM ranked WHERE rn = 1 AND NOT tombstone""",

    "bitemp_history" -> s"""
      WITH versions AS ($versions),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid, vt ORDER BY tx_id DESC) AS rn
        FROM versions
        WHERE CAST(eid AS BIGINT) % 25 = 0
          AND vt >= TIMESTAMP '2024-01-10 00:00:00' AND vt < TIMESTAMP '2024-01-20 00:00:00')
      SELECT eid, vt, tx_id, event_type, value FROM ranked WHERE rn = 1""",

    "bitemp_speculative" -> s"""
      WITH versions AS ($versions
        UNION ALL
        SELECT * FROM (VALUES
          ('1', TIMESTAMP '2024-02-01', TIMESTAMP '2024-02-01', 1000000000, 'spec', 0.0, false),
          ('2', TIMESTAMP '2024-02-01', TIMESTAMP '2024-02-01', 1000000001, 'spec', 0.0, false),
          ('3', TIMESTAMP '2024-02-01', TIMESTAMP '2024-02-01', 1000000002, 'spec', 0.0, false))
          AS s(eid, vt, tt, tx_id, event_type, value, tombstone)),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid ORDER BY vt DESC, tx_id DESC) AS rn
        FROM versions WHERE vt <= TIMESTAMP '2024-02-15 00:00:00')
      SELECT eid, vt, tx_id, event_type, value
      FROM ranked WHERE rn = 1 AND NOT tombstone AND eid IN ('1', '2', '3')""",

    "bitemp_intervals" -> s"""
      WITH versions AS ($versions)
      SELECT eid, vt, lead(vt) OVER (PARTITION BY eid ORDER BY vt, tx_id) AS vt_end,
             event_type
      FROM versions WHERE CAST(eid AS BIGINT) % 50 = 0""",

    "bitemp_zrange" -> """
      SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
             CAST(ts + (user_id % 5) * INTERVAL 1 DAY AS TIMESTAMP) AS tt,
             event_id AS tx_id, event_type, value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10' AND ts <= TIMESTAMP '2024-01-20'
        AND ts + (user_id % 5) * INTERVAL 1 DAY >= TIMESTAMP '2024-01-12'
        AND ts + (user_id % 5) * INTERVAL 1 DAY <= TIMESTAMP '2024-01-18'""",

    "doc_fetch" -> """
      SELECT sha256(text) AS content_hash, doc_id AS eid, n_chars
      FROM documents WHERE doc_id < 100""")
}
