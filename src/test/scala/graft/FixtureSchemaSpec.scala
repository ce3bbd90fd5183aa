package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Fixture-schema sanity gate: fails LOUDLY if the driver's testdata changes
  * physical encoding under us again (round 5 lost 20 oracle gates to a
  * silent TIMESTAMP(NANOS) → timestamp[us] change in `events.ts`; the old
  * loader asserted one encoding, and the streaming paths silently computed
  * 1000×-shrunk timestamps). Two invariants per sf dir:
  *
  *  1. every `Tables.all` table loads and analyzes (a `count` forces the
  *     full scan path through the vectorized reader), and
  *  2. `events.ts` arrives as TIMESTAMP_NTZ with min/max inside the
  *     fixture's documented data year (2024) — a unit error (ns read as µs
  *     or vice versa) lands millennia away and trips this instantly.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("fixture-schema-spec").getOrCreate()

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(d => s"/root/testdata/$d")
    .filter(d => new java.io.File(d).isDirectory)

  test("a testdata dir exists") { assert(sfDirs.nonEmpty) }

  for (dir <- sfDirs) {
    test(s"every table in $dir loads and analyzes") {
      for (name <- Tables.all) {
        val df = Tables.load(spark, dir, name)
        assert(df.schema.nonEmpty, s"$name: empty schema")
        assert(df.count() > 0, s"$name: no rows")
      }
    }

    test(s"events.ts in $dir is TIMESTAMP_NTZ within the fixture year") {
      val events = Tables.load(spark, dir, "events")
      assert(events.schema("ts").dataType == TimestampNTZType,
        s"events.ts loaded as ${events.schema("ts").dataType}, want TIMESTAMP_NTZ")
      val Array(row) = events
        .selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").collect()
      val (lo, hi) = (row.getInt(0), row.getInt(1))
      assert(lo >= 2020 && hi <= 2030,
        s"events.ts year range [$lo,$hi] outside sane fixture window " +
          "(unit error: ns↔µs confusion lands millennia away)")
    }
  }
}
