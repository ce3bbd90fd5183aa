package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.{Bitemp, TxLog}
import graft.operators.Stats
import graft.sources.Tables

/** Gate queries for transaction functions (§2.9/§2.10 tx fn) and the
  * attribute-stats job (§2.9 stats maintenance). */
object TxFnStatsQueries {

  /** tx function: seed events as puts, then one fn op whose closure reads
    * the in-flight snapshot and emits suffix-bump puts for users 1-8 —
    * all committed atomically with the enclosing tx (tx.clj:149-227). */
  def txFn(s: SparkSession, dir: String): DataFrame = Interactive.txScale(s) {
    val t0 = java.time.LocalDateTime.parse("2024-02-01T00:00")
    val ev = Tables.load(s, dir, "events")
      .filter(col("ts") < lit(java.time.LocalDateTime.parse("2024-01-11T00:00")))
    val puts = ev.select(
      lit("put").as("op"), col("user_id").cast("string").as("eid"),
      col("event_type").as("content_hash"), col("ts").as("start_vt"),
      lit(null).cast("timestamp_ntz").as("end_vt"),
      lit(null).cast("timestamp_ntz").as("at_vt"),
      lit(null).cast("string").as("expected_hash"),
      col("event_id").as("seq"))
    val (state1, _) = TxLog.applyTx(TxLog.emptyState(s), puts, 0L, t0,
      Some(TxLog.TxShape(hasChecks = false, hasEvict = false, hasRanged = false)))
    // applyTx checkpoints eagerly — no second checkpoint

    val fns: Map[String, TxLog.TxFn] = Map(
      "bump" -> ((snapshot: DataFrame, arg: String) =>
        snapshot.filter(col("eid").cast("long") <= 8)
          .select(lit("put").as("op"), col("eid"),
            concat(col("content_hash"), lit("_"), lit(arg)).as("content_hash"),
            lit(null).cast("timestamp_ntz").as("start_vt"), // defaults to txTime
            lit(null).cast("timestamp_ntz").as("end_vt"),
            lit(null).cast("timestamp_ntz").as("at_vt"),
            lit(null).cast("string").as("expected_hash"),
            col("eid").cast("long").as("seq"))))

    import scala.jdk.CollectionConverters._
    val fnOp = s.createDataFrame(List(
      org.apache.spark.sql.Row("fn", "bump", "V9", null, null, null, null, 1L)).asJava,
      TxLog.opSchema)
    val (st2, ab) = TxLog.applyTxWithFns(state1, fnOp, 1L, t0.plusHours(1), fns)
    require(!ab, "fn tx must commit")

    Bitemp.asOfTime(st2,
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")),
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")))
      .select(col("eid"), col("content_hash"))
  }

  /** single-pass per-attribute stats over customer (exact side gated;
    * the approx_count_distinct sketch is exercised in StatsSpec). */
  def statsAttrs(s: SparkSession, dir: String): DataFrame =
    Stats.attrStats(Tables.load(s, dir, "customer"),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
      .select(col("attr"), col("n_docs"), col("n_distinct"))

  /** Exact interpolated quantiles per group (the distribution-stats pass
    * a corpus audit runs before choosing filters): Spark `percentile`
    * and DuckDB `quantile_cont` share the (n-1)·p linear-interpolation
    * definition, so with a 6-dp round the gate is exact. One shuffle,
    * partial aggregation map-side. */
  def statsQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("q25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("q50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("q75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 6).as("q95"),
        round(min(col("l_extendedprice")), 6).as("lo"),
        round(max(col("l_extendedprice")), 6).as("hi"))

  /** Pearson correlation + population covariance per group, computed
    * from EXACT decimal power sums (Σx, Σy, Σxy, Σx², Σy²) with one
    * final double expression — unlike the built-in `corr` (a running
    * merge over doubles whose result depends on partition order), the
    * decimal sums are associative, so the statistic is bit-identical at
    * any parallelism and in the DuckDB oracle, which evaluates the same
    * closed form over the same exact sums. */
  def statsCorr(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity").cast("decimal(18,4)")
    val y = col("l_extendedprice").cast("decimal(18,4)")
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("_sx"), sum(y).as("_sy"),
        sum((x * y).cast("decimal(38,8)")).as("_sxy"),
        sum((x * x).cast("decimal(38,8)")).as("_sxx"),
        sum((y * y).cast("decimal(38,8)")).as("_syy"))
      .select(col("l_returnflag"), col("n"),
        // exact decimal sums → ONE double expression (identical shape in
        // the oracle); the 9/6-dp round absorbs the decimal→double cast's
        // last-ulp freedom
        {
          val (nd, sx, sy, sxy, sxx, syy) = (col("n").cast("double"),
            col("_sx").cast("double"), col("_sy").cast("double"),
            col("_sxy").cast("double"), col("_sxx").cast("double"),
            col("_syy").cast("double"))
          round((nd * sxy - sx * sy) /
            sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 9).as("corr")
        },
        round((col("n").cast("double") * col("_sxy").cast("double") -
          col("_sx").cast("double") * col("_sy").cast("double")) /
          (col("n").cast("double") * col("n").cast("double")), 6).as("covar_pop"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx_fn" -> txFn _,
    "stats_attrs" -> statsAttrs _,
    "stats_quantiles" -> statsQuantiles _,
    "stats_corr" -> statsCorr _)
}

object TxFnStatsSql {
  val all: Map[String, String] = Map(
    "tx_fn" -> """
      WITH ranked AS (
        SELECT CAST(user_id AS VARCHAR) AS eid, user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-11')
      SELECT eid,
        CASE WHEN user_id <= 8 THEN event_type || '_V9' ELSE event_type END
          AS content_hash
      FROM ranked WHERE rn = 1""",

    "stats_attrs" -> """
      SELECT 'c_custkey' AS attr, COUNT(c_custkey) AS n_docs,
             COUNT(DISTINCT c_custkey) AS n_distinct FROM customer
      UNION ALL
      SELECT 'c_name', COUNT(c_name), COUNT(DISTINCT c_name) FROM customer
      UNION ALL
      SELECT 'c_nationkey', COUNT(c_nationkey), COUNT(DISTINCT c_nationkey) FROM customer
      UNION ALL
      SELECT 'c_mktsegment', COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment) FROM customer""",

    "stats_corr" -> """
      WITH sums AS (
        SELECT l_returnflag, COUNT(*) AS n,
          SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sx,
          SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS sy,
          SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
                   CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxy,
          SUM(CAST(CAST(l_quantity AS DECIMAL(19,4)) *
                   CAST(l_quantity AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS sxx,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(19,4)) *
                   CAST(l_extendedprice AS DECIMAL(19,4)) AS DECIMAL(38,8))) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
               (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 9) AS corr,
        round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
              (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS covar_pop
      FROM sums""",

    "stats_quantiles" -> """
      SELECT l_returnflag, COUNT(*) AS n,
        round(quantile_cont(l_extendedprice, 0.25), 6) AS q25,
        round(quantile_cont(l_extendedprice, 0.5), 6) AS q50,
        round(quantile_cont(l_extendedprice, 0.75), 6) AS q75,
        round(quantile_cont(l_extendedprice, 0.95), 6) AS q95,
        round(MIN(l_extendedprice), 6) AS lo,
        round(MAX(l_extendedprice), 6) AS hi
      FROM lineitem GROUP BY l_returnflag""")
}
