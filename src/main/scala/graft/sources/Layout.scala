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
  private val layoutCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), String]()

  def dayPartitionedEvents(spark: SparkSession, sfDir: String): String =
    layoutCache.computeIfAbsent((spark, sfDir), _ => {
      val out = java.nio.file.Files.createTempDirectory("graft_layout").toString + "/events_by_day"
      writeDayPartitioned(Tables.load(spark, sfDir, "events"), "ts", out)
      out
    })
}
