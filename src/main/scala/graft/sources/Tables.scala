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
    * Stopped sessions' entries are swept on access ([[SessionCache]]);
    * data rewritten under a live session's sfDir needs [[invalidate]]. */
  private val cache = new SessionCache[(SparkSession, String, String), DataFrame]

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrBuild((spark, sfDir, name))(doLoad(spark, sfDir, name))

  /** Drop cached plans for a dir whose parquet files were rewritten
    * (and the registration memo — the temp views hold the old plans). */
  def invalidate(spark: SparkSession, sfDir: String): Unit = {
    cache.invalidateIf(k => (k._1 eq spark) && k._2 == sfDir)
    registeredDir.remove(spark, sfDir)
    // compiled Datalog plans over this dir hold the OLD table plans (r16
    // query cache) — same rewrite hazard, same hook
    graft.datalog.Planner.invalidateCompiled(spark, Some(sfDir)); ()
  }

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      // events.ts has been written both as parquet TIMESTAMP(NANOS) and as
      // plain timestamp[us] across fixture generations. Dispatch on what the
      // file actually says — the Spark analogue of the reference codec's
      // value-type-tag dispatch (crux-core/src/crux/codec.clj:478-503) —
      // rather than asserting one physical encoding.
      val raw = readEventsRaw(spark, s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case LongType =>
          // nanos-as-long: truncate to micro-precision NTZ (same as
          // DuckDB's ns→µs cast, keeping oracle parity).
          raw.withColumn("ts",
            expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
        case _ =>
          // already a timestamp (µs): normalize to NTZ (no-op if NTZ;
          // UTC-instant-preserving under the session's UTC timezone).
          raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Read the events parquet, falling back to nanos-as-long when the file
    * carries TIMESTAMP(NANOS) — which Spark refuses to read without the
    * legacy conf. The conf is session-global BY DESIGN: reads are lazy, so
    * a set/restore scope would race plan execution, and the conf only
    * changes behavior for TIMESTAMP(NANOS) columns. */
  private[graft] def readEventsRaw(spark: SparkSession, path: String): DataFrame =
    try spark.read.parquet(path)
    catch {
      case e: Exception if causeChain(e)
          .exists(m => Option(m.getMessage).exists(_.contains("NANOS"))) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }

  private def causeChain(e: Throwable): List[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toList

  /** Register every table as a temp view (idempotent) and return the dir. */
  /** Last dir registered per session: registration is idempotent for a
    * given dir (the views are name-stable), so repeated SQL calls skip
    * the 10 catalog round-trips; a DIFFERENT dir re-registers (the view
    * names are shared). */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    registeredDir.keySet.removeIf(_.sparkContext.isStopped)
    if (registeredDir.get(spark) != sfDir) {
      all.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
      registeredDir.put(spark, sfDir); ()
    }
  }
}
