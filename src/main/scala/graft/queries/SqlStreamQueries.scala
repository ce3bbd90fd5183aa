package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.TxLog
import graft.sources.Tables
import graft.sql.SqlSurface
import graft.streaming.IngestStream

/** Gate queries for the SQL surface (§2.8: spark.sql over the registered
  * catalog, temporal-prefix basis, scalar-function parity §2.7) and the
  * ingestion side (§2.9: ordered tx batches, single-writer streaming
  * ingest, windowed stream aggregation).
  */
object SqlStreamQueries {

  /** events → tx ops in three valid-time buckets (each tx strictly later
    * than the previous — keeps crux put semantics union-shaped). */
  private def opsByBucket(s: SparkSession, dir: String): Seq[DataFrame] = {
    val ev = Tables.load(s, dir, "events")
    def bucket(lo: String, hi: String): DataFrame =
      ev.filter(col("ts") >= lit(java.time.LocalDateTime.parse(lo)) &&
          col("ts") < lit(java.time.LocalDateTime.parse(hi)))
        .select(
          when(col("event_type") === "error", "delete").otherwise("put").as("op"),
          col("user_id").cast("string").as("eid"),
          when(col("event_type") === "error", lit(null).cast("string"))
            .otherwise(col("event_type")).as("content_hash"),
          col("ts").as("start_vt"),
          lit(null).cast("timestamp_ntz").as("end_vt"),
          lit(null).cast("timestamp_ntz").as("at_vt"),
          lit(null).cast("string").as("expected_hash"),
          col("event_id").as("seq"))
    Seq(
      bucket("2024-01-01T00:00", "2024-01-11T00:00"),
      bucket("2024-01-11T00:00", "2024-01-21T00:00"),
      bucket("2024-01-21T00:00", "2099-01-01T00:00"))
  }

  /** One-pass arrival staging for the streaming gates: the same three op
    * buckets as [[opsByBucket]], written as one job via partitionBy (a
    * single coalesced task lands one file per bucket) instead of three
    * filter+write jobs, then laid out as `b0..b2.parquet` so the file
    * stream picks them up in tx order. Returns the ops dir.
    *
    * Memoized per (session, dir): the staged arrival layout is the gates'
    * INPUT artifact (a production feed arrives already laid out — the
    * operator under test is the ingest fold, not the fixture-to-arrival
    * conversion), so repeated runs share one staging — the same
    * build-once policy as the graph gates' edge artifact. Each run keeps
    * its own state/checkpoint dirs; only the read-only ops dir is shared. */
  private val stageCache =
    new graft.sources.SessionCache[(SparkSession, String), String]
  private def stageOpsByBucket(s: SparkSession, dir: String): String =
    stageCache.getOrBuild((s, dir)) {
      val base = java.nio.file.Files.createTempDirectory("graft_ops_stage").toString
      stageOpsUncached(s, dir, base)
    }
  private def stageOpsUncached(s: SparkSession, dir: String, base: String): String = {
    val opsDir = s"$base/ops"
    new java.io.File(opsDir).mkdirs()
    // same [2024-01-01, 2099-01-01) bounds as opsByBucket — without them
    // bucket 0 would silently absorb any pre-2024 event and the streaming
    // op set would diverge from the batch path's
    val ev = Tables.load(s, dir, "events")
      .filter(col("ts") >= lit(java.time.LocalDateTime.parse("2024-01-01T00:00")) &&
        col("ts") < lit(java.time.LocalDateTime.parse("2099-01-01T00:00")))
    val bucket = when(col("ts") < lit(java.time.LocalDateTime.parse("2024-01-11T00:00")), 0)
      .when(col("ts") < lit(java.time.LocalDateTime.parse("2024-01-21T00:00")), 1)
      .otherwise(2)
    ev.select(
        when(col("event_type") === "error", "delete").otherwise("put").as("op"),
        col("user_id").cast("string").as("eid"),
        when(col("event_type") === "error", lit(null).cast("string"))
          .otherwise(col("event_type")).as("content_hash"),
        col("ts").as("start_vt"),
        lit(null).cast("timestamp_ntz").as("end_vt"),
        lit(null).cast("timestamp_ntz").as("at_vt"),
        lit(null).cast("string").as("expected_hash"),
        col("event_id").as("seq"),
        bucket.as("b"))
      .coalesce(1)
      .write.partitionBy("b").mode("overwrite").parquet(s"$base/stage")
    // FileStreamSource orders by mtime: the single coalesced write can
    // stamp all three buckets identically, so set strictly increasing
    // mtimes to make "picked up in tx order" hold by timestamp, not by
    // listing-order tie-break
    val now = System.currentTimeMillis()
    (0 until 3).foreach { i =>
      val part = Option(new java.io.File(s"$base/stage/b=$i").listFiles())
        .getOrElse(Array.empty[java.io.File])
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(
          s"stageOpsByBucket: bucket $i is empty — events fixture ts span drifted"))
      val dst = new java.io.File(s"$opsDir/b$i.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(now + i * 1000L); ()
    }
    opsDir
  }

  /** Ordered tx-batch ingest (put/delete/evict) then snapshot. */
  def ingestBatch(s: SparkSession, dir: String): DataFrame = Interactive.txScale(s) {
    val txs = opsByBucket(s, dir).zipWithIndex.map { case (ops, i) =>
      (i.toLong, java.time.LocalDateTime.parse("2024-02-01T00:00").plusHours(i.toLong), ops)
    }
    // final tx: evict two entities (GDPR hard delete, tx.clj:135-147)
    import scala.jdk.CollectionConverters._
    val evict = s.createDataFrame(List(
      Row("evict", "11", null, null, null, null, null, 1L),
      Row("evict", "12", null, null, null, null, null, 2L)).asJava, TxLog.opSchema)
    val all = txs :+ ((3L, java.time.LocalDateTime.parse("2024-02-02T00:00"), evict))
    val state = TxLog.applyBatch(TxLog.emptyState(s), all)
    state.select(col("eid"), col("vt"), col("tx_id"),
      col("content_hash").as("event_type"), col("tombstone"))
  }

  /** Single-writer streaming ingest via foreachBatch; same ops, delivered
    * as parquet files picked up by a file stream. Output excludes tx_id/tt
    * (batch-order dependent); the surviving (eid, vt, hash) set is
    * batch-order INVARIANT because buckets carry distinct tx times. */
  def ingestStream(s: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val stateDir = s"$base/state"; val ckDir = s"$base/ck"
    val opsDir = stageOpsByBucket(s, dir)
    val stream = s.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(opsDir)
    val q = IngestStream.start(s, stream, stateDir, ckDir,
      txTime = id => java.time.LocalDateTime.parse("2024-02-01T00:00").plusHours(id),
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false)),
      txPartitions = Some(8))
    q.awaitTermination()
    IngestStream.loadState(s, stateDir)
      .select(col("eid"), col("vt"), col("content_hash").as("event_type"), col("tombstone"))
  }

  /** JDBC-backed tx log ([[graft.sources.JdbcLog]], the crux-jdbc
    * analogue over Derby embedded): the same three op buckets + the evict
    * tx submitted as rows of the `tx_events` table (tx id = the RDBMS
    * auto-increment offset), the log read back as a PARTITIONED Spark
    * JDBC scan, decoded, and folded through the same [[TxLog.applyBatch]]
    * every other transport uses. The resolved state must match the
    * `ingest_batch` oracle (tx ids shifted to the DB's 1-based offsets) —
    * proving an RDBMS is a drop-in tx-log backend. */
  def ingestJdbc(s: SparkSession, dir: String): DataFrame = Interactive.txScale(s) {
    import graft.sources.JdbcLog
    val db = java.nio.file.Files.createTempDirectory("graft_jdbc").toString + "/txdb"
    val url = JdbcLog.derbyUrl(db)
    JdbcLog.setupSchema(url)
    opsByBucket(s, dir).foreach(ops => JdbcLog.submitTx(url, JdbcLog.opsToJson(ops)))
    JdbcLog.submitTx(url,
      """[{"op":"evict","eid":"11","seq":1},{"op":"evict","eid":"12","seq":2}]""")
    val state = JdbcLog.replay(s, url, TxLog.emptyState(s))
    state.select(col("eid"), col("vt"), col("tx_id"),
      col("content_hash").as("event_type"), col("tombstone"))
  }

  /** Checkpoint sink round-trip (SURVEY §2.1, checkpoint.clj semantics):
    * ingest, save two snapshots with keep=1 (older pruned), restore the
    * latest and emit the same projection as `ingest_batch` — proving a
    * node could start from the snapshot instead of replaying the log. */
  def checkpointRestore(s: SparkSession, dir: String): DataFrame = Interactive.txScale(s) {
    import graft.bitemp.Checkpoint
    val txs = opsByBucket(s, dir).zipWithIndex.map { case (ops, i) =>
      (i.toLong, java.time.LocalDateTime.parse("2024-02-01T00:00").plusHours(i.toLong), ops)
    }
    import scala.jdk.CollectionConverters._
    val evict = s.createDataFrame(List(
      Row("evict", "11", null, null, null, null, null, 1L),
      Row("evict", "12", null, null, null, null, null, 2L)).asJava, TxLog.opSchema)
    val store = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val mid = TxLog.applyBatch(TxLog.emptyState(s), txs)
    Checkpoint.save(mid, store, txId = 2L, keep = 1)
    val fin = TxLog.applyBatch(mid, Seq((3L, java.time.LocalDateTime.parse("2024-02-02T00:00"), evict)))
    Checkpoint.save(fin, store, txId = 3L, keep = 1)
    assert(Checkpoint.completed(s, store).size == 1, "retention must prune the older checkpoint")
    Checkpoint.restore(s, store).get
      .select(col("eid"), col("vt"), col("tx_id"),
        col("content_hash").as("event_type"), col("tombstone"))
  }

  /** Incrementally-maintained materialized view over the ingest stream
    * ([[IngestStream.maintainTypeCounts]]): per-batch delta maintenance
    * (resolve touched entities before/after, fold the difference), never
    * a full recompute. The oracle recomputes the final current-snapshot
    * counts from raw events — a hash match proves every batch's delta
    * was exact. */
  /** Stage the matview gates' op buckets as one-file-per-tx arrival dirs
    * and run the maintained-view ingest; returns the view root. */
  private def runMatviewStream(s: SparkSession, dir: String,
      views: Seq[IngestStream.ViewDef]): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_matview").toString
    val stateDir = s"$base/state"
    val ckDir = s"$base/ck"; val viewDir = s"$base/view"
    val opsDir = stageOpsByBucket(s, dir)
    val stream = s.readStream.schema(TxLog.opSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(opsDir)
    val q = IngestStream.start(s, stream, stateDir, ckDir,
      txTime = id => java.time.LocalDateTime.parse("2024-02-01T00:00").plusHours(id),
      matViewDir = Some(viewDir),
      txShape = Some(TxLog.TxShape(hasChecks = false, hasEvict = false,
        hasRanged = false)),
      views = views,
      // 4 partitions suit the fixture's ~1.5k touched eids/tx: the fold
      // is one shuffle, so partition count is pure task/committer fanout
      // (4 delta files/tx, read back by every later tx's state scan)
      txPartitions = Some(4),
      // group-committed maintenance: flush only when a view's unflushed
      // span reaches 4 txs; readers stay exact through loadView's journal
      // catch-up (the scale knob — per-tx view writes are the IVM
      // family's dominant constant, twice the r7/r8 target miss)
      viewFlushEvery = 4)
    q.awaitTermination()
    (viewDir, stateDir)
  }

  def streamMatview(s: SparkSession, dir: String): DataFrame = {
    val (viewDir, stateDir) = runMatviewStream(s, dir, Seq(IngestStream.typeCountsView))
    IngestStream.loadView(s, viewDir, "type_counts",
        catchUp = Some((stateDir, IngestStream.typeCountsView))).get
      .select(col("content_hash").as("event_type"), col("n"))
  }

  /** IVM view WITH a join (the shape that separates a real IVM design
    * from a count-by-key special case): live entity count per
    * (content_hash, customer market segment), the snapshot joined to the
    * STATIC customer dimension inside the view's aggregation. The same
    * touched-eid delta discipline maintains it — only touched eids' rows
    * change per tx, so the join delta is the row delta joined — while the
    * default type-count view rides along in the same maintenance pass
    * (multi-view, one delta resolve). Oracle recomputes the joined counts
    * from raw events; a hash match proves every batch's joined delta was
    * exact. */
  def streamMatviewJoin(s: SparkSession, dir: String): DataFrame = {
    // static dimension: materialize once, not re-read per micro-batch
    val dim = Tables.load(s, dir, "customer")
      .select(col("c_custkey").cast("string").as("eid"), col("c_mktsegment"))
      .localCheckpoint(true)
    val segView = IngestStream.ViewDef("seg_counts",
      keys = Seq("content_hash", "c_mktsegment"),
      rows = snap => snap.join(broadcast(dim), Seq("eid")))
    val (viewDir, stateDir) = runMatviewStream(s, dir,
      Seq(IngestStream.typeCountsView, segView))
    IngestStream.loadView(s, viewDir, "seg_counts",
        catchUp = Some((stateDir, segView))).get
      .select(col("content_hash").as("event_type"), col("c_mktsegment"), col("n"))
  }

  /** Sum-shaped IVM view (r8): beyond `count`, any SUM-decomposable
    * aggregate folds by the identical delta-with-negation discipline —
    * here live-entity count AND sum-of-entity-id per type, with `avg` as
    * sum÷count at read time. The oracle recomputes count/sum/avg from raw
    * events; a hash match proves every batch's signed measure deltas were
    * exact through put/delete alike. */
  def streamMatviewSum(s: SparkSession, dir: String): DataFrame = {
    val sumView = IngestStream.ViewDef("type_sums",
      keys = Seq("content_hash"),
      measures = Seq("n" -> lit(1L), "total" -> col("eid").cast("long")))
    val (viewDir, stateDir) = runMatviewStream(s, dir, Seq(sumView))
    IngestStream.loadView(s, viewDir, "type_sums",
        catchUp = Some((stateDir, sumView))).get
      .select(col("content_hash").as("event_type"), col("n"), col("total"),
        (col("total").cast("double") / col("n")).as("avg_uid"))
  }

  /** PIVOT through the SQL surface (§2.8): per-nation customer counts
    * spread across market segments. Spark and DuckDB differ in PIVOT
    * syntax, so the oracle expresses the same pivot with conditional
    * aggregation — the relational content is identical. */
  def sqlPivot(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT c_nationkey,
        coalesce(automobile, 0) AS automobile, coalesce(building, 0) AS building,
        coalesce(furniture, 0) AS furniture, coalesce(household, 0) AS household,
        coalesce(machinery, 0) AS machinery
      FROM (
        SELECT * FROM (SELECT c_nationkey, c_mktsegment FROM customer)
        PIVOT (COUNT(*) FOR c_mktsegment IN
          ('AUTOMOBILE' AS automobile, 'BUILDING' AS building,
           'FURNITURE' AS furniture, 'HOUSEHOLD' AS household,
           'MACHINERY' AS machinery)))""")

  /** CSV source round-trip (§2.1 source formats): documents staged as a
    * quoted CSV, read back with an explicit schema, aggregated. The
    * oracle computes the same aggregate from the parquet table — a hash
    * match proves the CSV write/read preserved every row and value. */
  def srcCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/docs"
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").option("escape", "\"").csv(out)
    // multiLine: quoted fields may legally contain newlines — without it
    // any embedded-newline document would split into corrupt rows
    s.read.option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .csv(out)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(length(col("text"))).as("text_len"))
  }

  /** JSON-lines source round-trip (§2.1): same contract over
    * `spark.read.json` with schema inference disabled in favor of an
    * explicit schema (the production posture — inference is a full extra
    * pass at 100 TB). */
  def srcJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .coalesce(1).write.mode("overwrite").json(out)
    s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(out)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"),
        sum(length(col("text"))).as("text_len"))
  }

  /** Windowed streaming aggregation (tumbling day windows, complete mode). */
  def streamWindow(s: SparkSession, dir: String): DataFrame =
    IngestStream.windowedCounts(s, s"$dir/events.parquet")

  /** Partition-pruned scan over the day-partitioned events layout
    * ([[graft.sources.Layout]]): the `ds` filter prunes to ONE of ~30 day
    * directories at file listing (PlanSpec pins `PartitionFilters` in the
    * scan). Oracle recomputes the same day's aggregate from the
    * unpartitioned source table — a hash match proves the rewrite
    * relocated every row to its correct partition. */
  def layoutPrune(s: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.Layout.dayPartitionedEvents(s, dir)
    s.read.parquet(path)
      .filter(col("ds") === "2024-01-15")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
  }

  /** Co-located fact⋈fact join over the bucketed layout
    * ([[graft.sources.Layout.bucketedOrdersLineitem]]): both sides were
    * bucketed on the join key at write time, so the sort-merge join runs
    * with NO exchange and NO sort (PlanSpec pins this). The merge hint
    * keeps the demonstration deterministic — for large-large joins the
    * exchange-free SMJ is the plan you want; broadcast would re-decide
    * per size. Oracle recomputes from the unbucketed tables, proving the
    * layout rewrite relocated every row to its hash bucket. */
  def bucketJoin(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.Layout
    Layout.bucketedOrdersLineitem(s, dir)
    s.table("orders_bucketed").hint("merge")
      .join(s.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
  }

  /** Salted skew join ([[graft.operators.SkewJoin]]): events (the
    * skewed fact — every row of a hot user lands on one reducer in a
    * plain equi-join) against the per-user dimension, salt 8. The result
    * is EXACTLY the plain join's (oracle computes it unsalted). */
  def skewJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= 150)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.operators.SkewJoin.saltedJoin(ev, dim, Seq("user_id"), 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Plain SQL through the registered catalog. */
  def sqlBasic(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT n_name,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name""")

  /** Temporal-prefix SQL: snapshot basis applied to events_current. */
  def sqlTemporal(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir,
      "VALIDTIME ('2024-01-15T00:00:00') TRANSACTIONTIME ('2024-01-15T00:00:00') " +
        "SELECT eid, content_hash AS event_type, value FROM events_current")

  /** TRANSACTIONID basis form (calcite.clj:51-72): snapshot at a tx id. */
  def sqlTxId(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir,
      "VALIDTIME ('2024-01-15T00:00:00') TRANSACTIONID (5000) " +
        "SELECT eid, content_hash AS event_type, value FROM events_current")

  /** SQL window functions over the registered catalog (§2.8 breadth the
    * Spark engine adds over the reference's Calcite subset): ranking,
    * offset, and partition aggregates in one pass. Money sums ride
    * decimals so partition-aggregation order can't perturb doubles. */
  def sqlWindow(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      WITH w AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey) AS rn,
          CAST(rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_mktsegment) AS BIGINT) AS seg_rank,
          lag(c_custkey) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS prev_cust,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) OVER (
            PARTITION BY c_nationkey) AS DECIMAL(24,4)) AS DOUBLE) AS nation_total,
          CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nation_n
        FROM customer)
      SELECT c_custkey, c_nationkey, c_acctbal, rn, seg_rank, prev_cust,
             nation_total, nation_n
      FROM w WHERE rn <= 5""")

  /** Scalar-function parity (§2.7 string/number set). */
  def sqlScalarFns(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT c_custkey,
        lower(c_name) AS lo, upper(c_mktsegment) AS up,
        initcap(lower(c_mktsegment)) AS ini,
        concat(c_name, '-', c_mktsegment) AS cat,
        char_length(c_name) AS len,
        substring(c_name, 3, 5) AS sub,
        replace(c_mktsegment, 'BUILD', 'B') AS rep,
        trim(c_name) AS tr,
        CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        CAST(floor(c_acctbal) AS BIGINT) AS fl,
        floor(c_acctbal * 100) / 100 AS trunc2
      FROM customer WHERE c_custkey <= 100""")

  /** Outer-join breadth through the SQL surface (§2.8): LEFT JOIN
    * preserving order-less customers and FULL OUTER aligning two
    * aggregates — the join shapes Calcite's converter rules cover that
    * the other gates don't exercise. */
  def sqlJoinTypes(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      WITH lo AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 200 GROUP BY c.c_custkey),
      cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
      sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY s_nationkey),
      fo AS (SELECT coalesce(cn.k, sn.k) AS k, coalesce(n_cust, 0) AS n_cust,
                    coalesce(n_supp, 0) AS n_supp
             FROM cn FULL OUTER JOIN sn ON cn.k = sn.k)
      SELECT 'left' AS kind, CAST(c_custkey AS BIGINT) AS id,
             n_orders AS a, CAST(NULL AS BIGINT) AS b FROM lo
      UNION ALL
      SELECT 'full', CAST(k AS BIGINT), n_cust, n_supp FROM fo""")

  /** Subquery breadth (§2.8): scalar subquery (above-average balance,
    * kept exact via sum×count decimal cross-multiplication — AVG of
    * doubles is partition-order-dependent), uncorrelated IN, correlated
    * EXISTS and NOT EXISTS. */
  def sqlSubquery(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT count(*) FROM customer)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)""")

  /** LATERAL correlated subquery (§2.8): per-customer top-2 orders —
    * the "top-N per group via join" shape; both engines plan it as a
    * correlated lateral. */
  def sqlLateral(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey <= 100""")

  /** Semi-structured JSON breadth (§2.7): extract a typed value from the
    * events `props` JSON column and aggregate — the
    * schema-on-read path every event pipeline needs. Extraction is
    * codegen'd (`get_json_object`), no UDF. */
  def sqlJson(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT event_type, COUNT(*) AS n,
        SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
        COUNT(DISTINCT CAST(get_json_object(props, '$.k') AS BIGINT)) AS nk,
        MIN(CAST(get_json_object(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(get_json_object(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type""")

  /** Grouping-set breadth (§2.8): ROLLUP with GROUPING() flags — the
    * subtotal/grand-total shape reporting queries need. */
  def sqlRollup(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT n_regionkey, c_mktsegment, count(*) AS n,
        CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS total,
        CAST(GROUPING(n_regionkey) AS BIGINT) AS g_region,
        CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_regionkey, c_mktsegment)""")

  /** Date/time scalar functions (§2.7 temporal set). Date-typed results
    * are cast back to TIMESTAMP_NTZ: parquet DATE → pandas object vs
    * DuckDB datetime64 dtype-mismatches in the gate's frame compare. */
  def sqlDateFns(s: SparkSession, dir: String): DataFrame =
    SqlSurface.query(s, dir, """
      SELECT o_orderkey,
        CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP_NTZ) AS d,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP_NTZ) AS ld,
        CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m,
        CAST(day(o_orderdate) AS BIGINT) AS dd,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP_NTZ) AS mstart
      FROM orders WHERE o_orderkey <= 100""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_batch" -> ingestBatch _,
    "ingest_jdbc" -> ingestJdbc _,
    "checkpoint_restore" -> checkpointRestore _,
    "ingest_stream" -> ingestStream _,
    "stream_window" -> streamWindow _,
    "layout_prune" -> layoutPrune _,
    "stream_sessions" -> ((s: SparkSession, dir: String) =>
      IngestStream.sessions(s, s"$dir/events.parquet", gapMinutes = 30)),
    "stream_join" -> ((s: SparkSession, dir: String) =>
      IngestStream.streamJoin(s, s"$dir/events.parquet", windowMinutes = 30)),
    "sql_basic" -> sqlBasic _,
    "sql_temporal" -> sqlTemporal _,
    "sql_txid" -> sqlTxId _,
    "sql_scalar_fns" -> sqlScalarFns _,
    "sql_window" -> sqlWindow _,
    "sql_date_fns" -> sqlDateFns _,
    "sql_join_types" -> sqlJoinTypes _,
    "sql_subquery" -> sqlSubquery _,
    "sql_rollup" -> sqlRollup _,
    "bucket_join" -> bucketJoin _,
    "skew_join" -> skewJoin _,
    "sql_lateral" -> sqlLateral _,
    "sql_json" -> sqlJson _,
    "sql_pivot" -> sqlPivot _,
    "src_csv_roundtrip" -> srcCsvRoundtrip _,
    "src_jsonl_roundtrip" -> srcJsonlRoundtrip _,
    "stream_matview" -> streamMatview _,
    "stream_matview_join" -> streamMatviewJoin _,
    "stream_matview_sum" -> streamMatviewSum _)
}

object SqlStreamSql {
  val all: Map[String, String] = Map(
    "ingest_batch" -> """
      SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
        CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 0
             WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 2 END AS tx_id,
        CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type,
        (event_type = 'error') AS tombstone
      FROM events
      WHERE user_id NOT IN (11, 12)""",

    "ingest_jdbc" -> """
      SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
        CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 1
             WHEN ts < TIMESTAMP '2024-01-21' THEN 2 ELSE 3 END AS tx_id,
        CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type,
        (event_type = 'error') AS tombstone
      FROM events
      WHERE user_id NOT IN (11, 12)""",

    "checkpoint_restore" -> """
      SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
        CASE WHEN ts < TIMESTAMP '2024-01-11' THEN 0
             WHEN ts < TIMESTAMP '2024-01-21' THEN 1 ELSE 2 END AS tx_id,
        CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type,
        (event_type = 'error') AS tombstone
      FROM events
      WHERE user_id NOT IN (11, 12)""",

    "ingest_stream" -> """
      SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
        CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS event_type,
        (event_type = 'error') AS tombstone
      FROM events""",

    "stream_window" -> """
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS w_start, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2""",

    "stream_sessions" -> """
      WITH e AS (
        SELECT user_id, ts, CAST(value AS DECIMAL(18,4)) AS v,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        FROM events),
      m AS (SELECT *, CASE WHEN prev IS NULL OR ts > prev + INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS brk FROM e),
      s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM m)
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events, CAST(SUM(v) AS DOUBLE) AS total
      FROM s GROUP BY user_id, sid""",

    "layout_prune" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM events
      WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      GROUP BY event_type""",

    "stream_join" -> """
      SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
             CAST(a.ts AS TIMESTAMP) AS click_ts,
             CAST(b.ts AS TIMESTAMP) AS purchase_ts
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_type = 'click' AND b.event_type = 'purchase'
       AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE""",

    "sql_basic" -> """
      SELECT n_name,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(24,6)) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name""",

    "sql_temporal" -> """
      WITH versions AS (
        SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
               event_id AS tx_id, event_type, value,
               (event_type = 'error') AS tombstone
        FROM events),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid ORDER BY vt DESC, tx_id DESC) AS rn
        FROM versions WHERE vt <= TIMESTAMP '2024-01-15 00:00:00')
      SELECT eid, event_type, value FROM ranked WHERE rn = 1 AND NOT tombstone""",

    "sql_txid" -> """
      WITH versions AS (
        SELECT CAST(user_id AS VARCHAR) AS eid, CAST(ts AS TIMESTAMP) AS vt,
               event_id AS tx_id, event_type, value,
               (event_type = 'error') AS tombstone
        FROM events),
      ranked AS (
        SELECT *, row_number() OVER (PARTITION BY eid ORDER BY vt DESC, tx_id DESC) AS rn
        FROM versions
        WHERE vt <= TIMESTAMP '2024-01-15 00:00:00' AND tx_id <= 5000)
      SELECT eid, event_type, value FROM ranked WHERE rn = 1 AND NOT tombstone""",

    "sql_scalar_fns" -> """
      SELECT c_custkey,
        lower(c_name) AS lo, upper(c_mktsegment) AS up,
        upper(substr(lower(c_mktsegment), 1, 1)) || lower(substr(lower(c_mktsegment), 2)) AS ini,
        concat(c_name, '-', c_mktsegment) AS cat,
        CAST(length(c_name) AS INT) AS len,
        substring(c_name, 3, 5) AS sub,
        replace(c_mktsegment, 'BUILD', 'B') AS rep,
        trim(c_name) AS tr,
        CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        CAST(floor(c_acctbal) AS BIGINT) AS fl,
        floor(c_acctbal * 100) / 100 AS trunc2
      FROM customer WHERE c_custkey <= 100""",

    "sql_window" -> """
      WITH w AS (
        SELECT c_custkey, c_nationkey, c_acctbal,
          row_number() OVER (PARTITION BY c_nationkey
                             ORDER BY c_acctbal DESC, c_custkey) AS rn,
          CAST(rank() OVER (PARTITION BY c_nationkey
                            ORDER BY c_mktsegment) AS BIGINT) AS seg_rank,
          lag(c_custkey) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS prev_cust,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) OVER (
            PARTITION BY c_nationkey) AS DECIMAL(24,4)) AS DOUBLE) AS nation_total,
          CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS nation_n
        FROM customer)
      SELECT c_custkey, c_nationkey, c_acctbal, CAST(rn AS INT) AS rn,
             seg_rank, prev_cust, nation_total, nation_n
      FROM w WHERE rn <= 5""",

    "sql_date_fns" -> """
      SELECT o_orderkey,
        CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS d,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS ld,
        CAST(year(o_orderdate) AS BIGINT) AS y,
        CAST(month(o_orderdate) AS BIGINT) AS m,
        CAST(day(o_orderdate) AS BIGINT) AS dd,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart
      FROM orders WHERE o_orderkey <= 100""",

    "sql_join_types" -> """
      WITH lo AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey <= 200 GROUP BY c.c_custkey),
      cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY c_nationkey),
      sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY s_nationkey),
      fo AS (SELECT coalesce(cn.k, sn.k) AS k, coalesce(n_cust, 0) AS n_cust,
                    coalesce(n_supp, 0) AS n_supp
             FROM cn FULL OUTER JOIN sn ON cn.k = sn.k)
      SELECT 'left' AS kind, CAST(c_custkey AS BIGINT) AS id,
             n_orders AS a, CAST(NULL AS BIGINT) AS b FROM lo
      UNION ALL
      SELECT 'full', CAST(k AS BIGINT), n_cust, n_supp FROM fo""",

    "sql_subquery" -> """
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE CAST(c_acctbal AS DECIMAL(18,4)) * (SELECT count(*) FROM customer)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) FROM customer)
        AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)""",

    "sql_rollup" -> """
      SELECT n_regionkey, c_mktsegment, count(*) AS n,
        CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(24,4)) AS DOUBLE) AS total,
        CAST(GROUPING(n_regionkey) AS BIGINT) AS g_region,
        CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_regionkey, c_mktsegment)""",

    "bucket_join" -> """
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority""",

    "skew_join" -> """
      SELECT c_mktsegment, event_type, COUNT(*) AS n
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      WHERE c.c_custkey <= 150
      GROUP BY c_mktsegment, event_type""",

    "sql_lateral" -> """
      SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey <= 100""",

    "sql_json" -> """
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS nk,
        MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      FROM events GROUP BY event_type""",

    "stream_matview" -> """
      WITH ranked AS (
        SELECT user_id, event_type, (event_type = 'error') AS tomb,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked WHERE rn = 1 AND NOT tomb
      GROUP BY event_type""",

    "stream_matview_join" -> """
      WITH ranked AS (
        SELECT user_id, event_type, (event_type = 'error') AS tomb,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT event_type, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
      FROM ranked JOIN customer ON user_id = c_custkey
      WHERE rn = 1 AND NOT tomb
      GROUP BY event_type, c_mktsegment""",

    "stream_matview_sum" -> """
      WITH ranked AS (
        SELECT user_id, event_type, (event_type = 'error') AS tomb,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(user_id) AS BIGINT) AS total,
             CAST(SUM(user_id) AS DOUBLE) / COUNT(*) AS avg_uid
      FROM ranked WHERE rn = 1 AND NOT tomb
      GROUP BY event_type""",

    "sql_pivot" -> """
      SELECT c_nationkey,
        COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS automobile,
        COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS building,
        COUNT(*) FILTER (c_mktsegment = 'FURNITURE') AS furniture,
        COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD') AS household,
        COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS machinery
      FROM customer GROUP BY c_nationkey""",

    "src_csv_roundtrip" -> """
      SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        CAST(SUM(length(text)) AS BIGINT) AS text_len
      FROM documents GROUP BY lang""",

    "src_jsonl_roundtrip" -> """
      SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS chars,
        CAST(SUM(length(text)) AS BIGINT) AS text_len
      FROM documents GROUP BY source""")
}
