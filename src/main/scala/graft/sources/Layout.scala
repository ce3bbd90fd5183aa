package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout management: rewrite a table into a partitioned
  * directory layout so temporal/categorical predicates prune whole
  * partitions at the SCAN — the single highest-leverage knob for a
  * 100 TB event store (a day-filtered query over a year of day-partitioned
  * events reads ~0.3% of the files; unpartitioned it reads all of them).
  *
  * The reference has no layout story (its KV indexes are sorted by codec
  * key, crux-core/src/crux/kv/index_store.clj); this is the Spark-native
  * analogue of that sort order: Hive-style `ds=YYYY-MM-DD` directories
  * that Catalyst turns into `PartitionFilters` — pruning happens at file
  * listing, before any IO. PlanSpec pins the pruned plan shape.
  */
object Layout {

  /** Rewrite `df` day-partitioned by `tsCol` under `out`. One shuffle on
    * the partition key (repartition by ds) so each day lands as one file
    * per day rather than one file per (input-partition × day) — the
    * small-files discipline a real compactor enforces. */
  def writeDayPartitioned(df: DataFrame, tsCol: String, out: String): Unit =
    df.withColumn("ds", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("ds"))
      .write.partitionBy("ds").mode("overwrite").parquet(out)

  /** Per-(session, source-dir) memo of the day-partitioned events layout:
    * the rewrite is an offline compaction artifact — built once, probed by
    * every subsequent pruned read (same build-once policy as the IVF/PQ
    * index caches). */
  private val layoutCache = new SessionCache[(SparkSession, String), String]

  def dayPartitionedEvents(spark: SparkSession, sfDir: String): String =
    layoutCache.getOrBuild((spark, sfDir)) {
      val out = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/events_by_day"
      writeDayPartitioned(Tables.load(spark, sfDir, "events"), "ts", out)
      out
    }

  // --------------------------- Z-ordered bitemporal layout (r6, Morton)

  /** Add a 128-bit Morton `z` column interleaving (vt, tt) micros —
    * decimal(38,0) holds any interleave of two sub-2^63 micro timestamps
    * (z < 2^126 < 10^38). The interleave is the codegen'd
    * [[graft.functions.MortonZ]] Catalyst expression (TIMESTAMP_NTZ's
    * internal long IS the micros value), so a 100 TB z-layout rewrite
    * stays UDF-free inside whole-stage codegen. */
  def withZ(df: DataFrame, vtCol: String = "vt", ttCol: String = "tt"): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("z", call_function("morton_z", col(vtCol), col(ttCol)))
  }

  /** The bitemporal version log laid out along the Z-order curve
    * (range-partitioned + sorted on `z`): each parquet file covers a
    * contiguous curve segment, so the OR-of-BETWEEN predicate from
    * [[graft.bitemp.Morton.zRanges]] prunes files/row-groups by min-max
    * stats — the columnar re-expression of the reference's
    * space-filling-curve index seeks (crux-core/src/crux/morton.clj +
    * kv/index_store.clj entity-history seeks). tt is derived
    * deterministically from the events fixture (ts + user_id%5 days) so
    * the two temporal axes genuinely differ. */
  def zOrderedVersions(spark: SparkSession, sfDir: String): String =
    layoutCache.getOrBuild((spark, sfDir + "#z")) {
      val out = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/versions_z"
      val versions = Tables.load(spark, sfDir, "events").select(
        col("user_id").cast("string").as("eid"),
        col("ts").as("vt"),
        (col("ts") + expr("make_dt_interval(user_id % 5, 0, 0, 0)")).as("tt"),
        col("event_id").as("tx_id"),
        col("event_type").as("content_hash"),
        col("value"))
      withZ(versions)
        .repartitionByRange(8, col("z"))
        .sortWithinPartitions(col("z"))
        .write.mode("overwrite").parquet(out)
      out
    }

  // --------------------------- bucketed co-located join layout (r6b)

  /** Write orders and lineitem BUCKETED on the join key (8 buckets,
    * sorted within bucket, repartitioned so each bucket is ONE file and
    * therefore reports its sort order) into the session catalog as
    * `orders_bucketed`/`lineitem_bucketed`.
    *
    * This is the co-located-join knob for the fact⋈fact joins that
    * dominate a 100 TB TPC-H-shaped store: both sides hash-land in
    * matching buckets at WRITE time, so a sort-merge join needs NO
    * exchange and NO sort on either side — the shuffle is paid once at
    * compaction, not per query (PlanSpec pins the exchange-free plan).
    * Build-once artifact, memoized per (session, dir) like the other
    * layout rewrites; the catalog table names are stable, so a rebuild
    * for a different dir overwrites them.
    */
  /** The bucketed CATALOG TABLE NAMES are shared per session, so the
    * memo must track which dir currently backs them — returning to a
    * previously-built dir after building for another would otherwise
    * skip the rebuild and silently serve the other dir's rows. */
  private val bucketedDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def bucketedOrdersLineitem(spark: SparkSession, sfDir: String): Unit = {
    bucketedDir.keySet.removeIf(_.sparkContext.isStopped)
    if (bucketedDir.get(spark) == sfDir) return
    locally {
      val base = java.nio.file.Files.createTempDirectory("graft_buckets").toString
      Tables.load(spark, sfDir, "orders")
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").option("path", s"$base/orders_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
      Tables.load(spark, sfDir, "lineitem")
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").option("path", s"$base/lineitem_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
      base
    }
    bucketedDir.put(spark, sfDir)
    ()
  }
}
