package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.Bitemp
import graft.functions.Exact
import graft.sources.Tables

/** ts-devices / ts-weather time-series workloads — the reference's only
  * non-TPC-H/RDF bench families (crux-bench/src/crux/bench/ts_devices.clj:
  * 84-230, ts_weather.clj:75-310), and the ones that exercise the
  * entity-history path at volume: the reference keys EVERY reading of a
  * device to one entity id with valid-time = reading time
  * (ts_devices.clj:44-47, :72-74), so "current state" is the latest
  * reading per device (an as-of resolve over the whole log) and windowed
  * rollups are entity-history scans.
  *
  * Fixture mapping (the TimescaleDB devices/weather CSVs aren't in this
  * sandbox): `events` = the readings log (device = user_id, reading time =
  * ts, level = value, status = event_type, tx order = event_id) and
  * `customer` = the device-info / location dim (c_custkey = device id,
  * c_mktsegment = model / environment). Readings never delete, so the
  * version log has no tombstones.
  *
  * Scale notes: the as-of resolve is [[Bitemp.asOf]]'s one partial-agg
  * shuffle (no window sort); dim lookups broadcast (1500 rows); the hourly
  * rollups push their valid-time bounds into the scan via
  * [[Bitemp.history]]'s vt range pruning before any shuffle.
  */
object TsQueries {

  /** The readings log as a version table ([[Bitemp]] schema). */
  private def readings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("user_id").cast("string").as("eid"),
      col("ts").as("vt"),
      col("ts").as("tt"),
      col("event_id").as("tx_id"),
      col("event_type").as("content_hash"),
      lit(false).as("tombstone"),
      col("value"))

  private val Basis = lit(java.time.LocalDateTime.parse("2099-01-01T00:00"))

  /** Current snapshot = latest reading per device (as-of resolve). */
  private def currentReadings(s: SparkSession, dir: String): DataFrame =
    Bitemp.asOf(readings(s, dir), Basis, lit(Long.MaxValue))
      .select(col("vt").as("time"),
        col("eid").cast("long").as("device_id"),
        col("content_hash").as("status"),
        col("value").as("level"))

  /** The device-info dim, broadcast-sized (ts_devices.clj:22-31). */
  private def deviceInfo(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("device_id"), col("c_mktsegment").as("model"))

  /** recent-battery-readings (ts_devices.clj:84-122): the 10 most recent
    * current readings across devices. */
  def devicesRecent(s: SparkSession, dir: String): DataFrame =
    currentReadings(s, dir)
      .orderBy(col("time").desc, col("device_id").desc)
      .limit(10)
      .select(col("time"), col("device_id"), col("level"))

  /** busiest-devices (ts_devices.clj:124-186): current readings in a
    * status with level below a threshold, joined to the device dim,
    * top 5 by level. The dim join broadcasts. */
  def devicesBusiest(s: SparkSession, dir: String): DataFrame =
    currentReadings(s, dir)
      .filter(col("status") === "click" && col("level") < 150.0)
      .join(broadcast(deviceInfo(s, dir)), Seq("device_id"))
      .orderBy(col("level").desc, col("time").desc, col("device_id").desc)
      .limit(5)
      .select(col("time"), col("device_id"), col("level"), col("status"), col("model"))

  /** min-max-battery-level-per-hour (ts_devices.clj:189-230): hourly
    * min/max level over the reading HISTORY of devices whose model is in
    * a set — an entity-history scan with vt-range pruning, dim-filtered
    * by a broadcast semi-join, 12 hours. */
  def devicesHourly(s: SparkSession, dir: String): DataFrame = {
    val wanted = deviceInfo(s, dir)
      .filter(col("model").isin("AUTOMOBILE", "MACHINERY"))
      .select(col("device_id").cast("string").as("eid"))
    val hist = Bitemp.history(readings(s, dir),
      sortAsc = true, withCorrections = true,
      vtStart = Some(lit(java.time.LocalDateTime.parse("2024-01-01T00:00"))),
      vtEnd = Some(lit(java.time.LocalDateTime.parse("2024-01-02T00:00"))))
      .join(broadcast(wanted), Seq("eid"), "left_semi")
    hist.groupBy(date_trunc("hour", col("vt")).as("hour"))
      .agg(min(col("value")).as("min_level"), max(col("value")).as("max_level"))
      .orderBy(col("hour").asc)
      .limit(12)
  }

  /** last-10-readings (ts_weather.clj:67): the plain 10 most recent
    * current conditions across ALL locations — no dim filter, the
    * family's simplest query; completes the 1:1 map of the reference's
    * six ts-bench queries. (Shape-identical to [[devicesRecent]] modulo
    * the tiebreak order the weather bench uses: location ascending.) */
  def weatherRecent(s: SparkSession, dir: String): DataFrame =
    currentReadings(s, dir)
      .orderBy(col("time").desc, col("device_id").asc)
      .limit(10)
      .select(col("time"), col("device_id"), col("status"), col("level"))

  /** last-10-readings-from-outside-locations (ts_weather.clj:150-190):
    * current conditions restricted BY THE DIM (environment), not by the
    * reading — the complementary filter route to [[devicesBusiest]]. */
  def weatherOutside(s: SparkSession, dir: String): DataFrame =
    currentReadings(s, dir)
      .join(broadcast(deviceInfo(s, dir).filter(col("model") === "HOUSEHOLD")
        .select(col("device_id"))), Seq("device_id"))
      .orderBy(col("time").desc, col("device_id").asc)
      .limit(10)
      .select(col("time"), col("device_id"), col("level"))

  /** hourly-average-min-max-temperatures-for-field-locations
    * (ts_weather.clj:248-310): hourly avg+min+max over the condition
    * history of one environment's locations; the average rides
    * [[Exact.davg]] decimal sums so the fold is order-free. */
  def weatherHourly(s: SparkSession, dir: String): DataFrame = {
    val field = deviceInfo(s, dir).filter(col("model") === "FURNITURE")
      .select(col("device_id").cast("string").as("eid"))
    val hist = Bitemp.history(readings(s, dir),
      sortAsc = true, withCorrections = true,
      vtStart = Some(lit(java.time.LocalDateTime.parse("2024-01-01T00:00"))),
      vtEnd = Some(lit(java.time.LocalDateTime.parse("2024-01-02T00:00"))))
      .join(broadcast(field), Seq("eid"), "left_semi")
    hist.groupBy(date_trunc("hour", col("vt")).as("hour"))
      .agg(Exact.davg(col("value")).as("avg_level"),
        min(col("value")).as("min_level"), max(col("value")).as("max_level"))
      .orderBy(col("hour").asc)
      .limit(12)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_devices_recent" -> devicesRecent _,
    "ts_devices_busiest" -> devicesBusiest _,
    "ts_devices_hourly" -> devicesHourly _,
    "ts_weather_recent" -> weatherRecent _,
    "ts_weather_outside" -> weatherOutside _,
    "ts_weather_hourly" -> weatherHourly _)
}

object TsSql {
  /** The as-of resolve in window SQL: latest (ts, event_id) row per device. */
  private val Current = """
    SELECT ts AS time, user_id AS device_id, event_type AS status, value AS level,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events"""

  val all: Map[String, String] = Map(
    "ts_devices_recent" -> s"""
      WITH cur AS ($Current)
      SELECT time, device_id, level FROM cur WHERE rn = 1
      ORDER BY time DESC, device_id DESC LIMIT 10""",

    "ts_devices_busiest" -> s"""
      WITH cur AS ($Current)
      SELECT time, cur.device_id AS device_id, level, status, c_mktsegment AS model
      FROM cur JOIN customer ON cur.device_id = c_custkey
      WHERE rn = 1 AND status = 'click' AND level < 150.0
      ORDER BY level DESC, time DESC, device_id DESC LIMIT 5""",

    "ts_devices_hourly" -> """
      SELECT date_trunc('hour', ts) AS hour,
             min(value) AS min_level, max(value) AS max_level
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts < TIMESTAMP '2024-01-02 00:00:00'
        AND user_id IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY'))
      GROUP BY 1 ORDER BY 1 ASC LIMIT 12""",

    "ts_weather_recent" -> s"""
      WITH cur AS ($Current)
      SELECT time, device_id, status, level FROM cur WHERE rn = 1
      ORDER BY time DESC, device_id ASC LIMIT 10""",

    "ts_weather_outside" -> s"""
      WITH cur AS ($Current)
      SELECT time, device_id, level FROM cur
      WHERE rn = 1 AND device_id IN (SELECT c_custkey FROM customer
                                     WHERE c_mktsegment = 'HOUSEHOLD')
      ORDER BY time DESC, device_id ASC LIMIT 10""",

    "ts_weather_hourly" -> s"""
      SELECT date_trunc('hour', ts) AS hour,
             ${graft.functions.Exact.sqlDavg("value")} AS avg_level,
             min(value) AS min_level, max(value) AS max_level
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        AND ts < TIMESTAMP '2024-01-02 00:00:00'
        AND user_id IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'FURNITURE')
      GROUP BY 1 ORDER BY 1 ASC LIMIT 12"""
  )
}
