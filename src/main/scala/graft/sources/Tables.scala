package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The reference is schemaless (documents decomposed to EAV rows,
  * crux-core/src/crux/kv/index_store.clj:936-963); our SQL/DataFrame surface
  * is schema-per-table, exactly like crux-sql's schema documents
  * (crux-sql/src/crux/calcite.clj:456-465). Each parquet file is one table.
  *
  * Scale notes: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan, so downstream operators should NOT cache or
  * materialize these eagerly. On a real cluster the same code reads
  * partitioned object-store layouts unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memo of analyzed frames per (session, dir, table): a DataFrame is an
    * immutable logical plan, and re-reading costs a parquet footer/schema
    * round trip per call — which every gate pays several times over.
    * Entries are dropped when their session's SparkContext ends (listener
    * below), so stopped sessions' plans are never pinned; data rewritten
    * under a live session's sfDir needs [[invalidate]]. */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.keySet.removeIf(_._1 eq spark)
          hooked.remove(spark)
        }
      })
    cache.computeIfAbsent((spark, sfDir, name), _ => doLoad(spark, sfDir, name))
  }

  /** Drop cached plans for a dir whose parquet files were rewritten. */
  def invalidate(spark: SparkSession, sfDir: String): Unit =
    cache.keySet.removeIf(k => (k._1 eq spark) && k._2 == sfDir)

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read it as a long and downcast to micro-precision NTZ
      // (truncation — same as DuckDB's ns→µs cast, keeping oracle parity).
      // The conf is session-global BY DESIGN: reads are lazy, so a
      // set/restore scope would race plan execution, and the conf only
      // changes behavior for TIMESTAMP(NANOS) columns — which Spark
      // otherwise refuses to read at all.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions._
      raw.withColumn("ts",
        expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (idempotent) and return the dir. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
