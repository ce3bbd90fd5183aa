package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bitemp.{Bitemp, TxLog}
import graft.datalog.{Planner, QuadSource}
import graft.sources.{Rdf, Tables}

/** Gate queries for the RDF loader (§2.1), match/cas tx semantics (§2.9),
  * and set operations (§2.6). */
object RdfSetQueries {

  /** nation → N-Triples text → distributed parse → quads → Datalog. */
  def rdfLoad(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.load(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val out = java.nio.file.Files.createTempDirectory("graft_rdf").toString + "/nt"
    Rdf.toNTriples(nation, "http://graft.test", "n_nationkey")
      .write.mode("overwrite").text(out)
    val quads = Rdf.loadNTriples(s, out)
    val source = new QuadSource(quads,
      Map("n_name" -> "v_str", "n_regionkey" -> "v_num"))
    Planner.q(s, source, """
      {:find [?name ?rk]
       :keys [n_name n_regionkey]
       :where [[?n :n_name ?name] [?n :n_regionkey ?rk]]}""")
  }

  /** cas success + match-failure abort (tx.clj:100-130). Initial state =
    * first-bucket events; tx 1 cas-bumps users 1-10 (expected hash taken
    * from the resolved snapshot, so it matches); tx 2 carries a wrong
    * match and must abort atomically, discarding its piggybacked put. */
  def ingestCas(s: SparkSession, dir: String): DataFrame = Interactive.txScale(s) {
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
    // gate-built op lists have driver-known kind mixes — pass shape hints
    // so no tx pays the one-row probe job (TxLog.TxShape)
    val (state1, ab1) = TxLog.applyTx(TxLog.emptyState(s), puts, 0L, t0,
      Some(TxLog.TxShape(hasChecks = false, hasEvict = false, hasRanged = false)))
    require(!ab1, "seed tx must commit") // applyTx checkpoints eagerly

    // eid is asOfTime's grouping key, so filtering BEFORE the resolve is
    // result-identical and keeps the 140 untouched users' history out of
    // the snapshot shuffle (the cast blocks Catalyst from pushing the
    // predicate through the aggregate itself)
    val snap = Bitemp.asOfTime(
      state1.filter(col("eid").cast("long") <= 10),
      lit(java.time.LocalDateTime.parse("2024-03-01T00:00")),
      lit(java.time.LocalDateTime.parse("2024-03-01T00:00")))
    // tx 1: self-consistent cas for users 1-10 → commits
    val casOps = snap
      .select(lit("cas").as("op"), col("eid"),
        concat(col("content_hash"), lit("_v2")).as("content_hash"),
        lit(null).cast("timestamp_ntz").as("start_vt"),
        lit(null).cast("timestamp_ntz").as("end_vt"),
        lit(null).cast("timestamp_ntz").as("at_vt"),
        col("content_hash").as("expected_hash"),
        col("eid").cast("long").as("seq"))
    val (state2, ab2) = TxLog.applyTx(state1, casOps, 1L, t0.plusHours(1),
      Some(TxLog.TxShape(hasChecks = true, hasEvict = false, hasRanged = false)))
    require(!ab2, "cas tx must commit")

    // tx 2: wrong match + a put that must be discarded with the abort
    import scala.jdk.CollectionConverters._
    val badTx = s.createDataFrame(List(
      org.apache.spark.sql.Row("match", "11", null, null, null, null, "WRONG_HASH", 1L),
      org.apache.spark.sql.Row("put", "999", "SHOULD_NOT_APPEAR",
        java.sql.Timestamp.valueOf("2024-02-01 00:00:00").toLocalDateTime, null, null, null, 2L)).asJava,
      TxLog.opSchema)
    val (st3, ab3) = TxLog.applyTx(state2, badTx, 2L, t0.plusHours(2),
      Some(TxLog.TxShape(hasChecks = true, hasEvict = false, hasRanged = false)))
    require(ab3, "match with wrong hash must abort")

    Bitemp.asOfTime(st3,
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")),
        lit(java.time.LocalDateTime.parse("2024-03-01T00:00")))
      .select(col("eid"), col("content_hash"))
  }

  /** All-integer PageRank over the supplier↔part bipartite graph
    * ([[graft.operators.Graph.pageRank]]): picorank arithmetic makes the
    * result bit-identical at any parallelism, and the oracle replays the
    * SAME integer recurrence as unrolled CTEs — a hash match proves
    * every iteration's join+sum was exact. */
  /** Memoized symmetric supplier↔part edge artifact per (session, dir):
    * both graph gates iterate over it, and a graph deployment builds its
    * edge table once — same build-once policy as the RDF parse cache and
    * the ANN index memos. */
  private val edgeCache =
    new graft.sources.SessionCache[(SparkSession, String), DataFrame]
  private def bipartiteEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrBuild((s, dir)) {
      val li = Tables.load(s, dir, "lineitem")
      val fwd = li.select(concat(lit("s"), col("l_suppkey")).as("src"),
        concat(lit("p"), col("l_partkey")).as("dst"))
      fwd.unionByName(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().localCheckpoint(true)
    }

  def graphPagerank(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.pageRank(bipartiteEdges(s, dir), iters = 5,
        assumeDistinct = true)
      .orderBy(col("rank_pico").desc, col("id"))
      .limit(20)

  private[queries] def pagerankOracle(iters: Int): String = {
    val head = """
      WITH eraw AS (SELECT DISTINCT 's' || l_suppkey AS src,
                           'p' || l_partkey AS dst FROM lineitem),
      edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
      nn AS (SELECT COUNT(*) AS n FROM nodes),
      r0 AS (SELECT id, CAST(1000000000000 // n AS BIGINT) AS r FROM nodes, nn)"""
    val steps = (1 to iters).map { k =>
      s""",
      c$k AS (SELECT e.dst AS id, CAST(SUM(r.r // deg.d) AS BIGINT) AS c
             FROM edges e JOIN r${k - 1} r ON e.src = r.id
             JOIN deg ON e.src = deg.src
             GROUP BY e.dst),
      r$k AS (SELECT nd.id,
               CAST(15000000000000 // (100 * nn.n)
                 + (85 * COALESCE(c.c, 0)) // 100 AS BIGINT) AS r
             FROM nodes nd CROSS JOIN nn LEFT JOIN c$k c ON nd.id = c.id)"""
    }.mkString
    head + steps +
      s"\n      SELECT id, r AS rank_pico FROM r$iters ORDER BY r DESC, id LIMIT 20"
  }

  /** Bounded-hop single-source shortest paths from supplier 1 over the
    * same bipartite graph — integer distances, unrolled-recurrence
    * oracle like [[graphPagerank]]. */
  def graphSssp(s: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.shortestPaths(bipartiteEdges(s, dir), "s1",
        iters = 4, assumeDistinct = true)
      .orderBy(col("d"), col("id")).limit(500)

  private[queries] def ssspOracle(iters: Int): String = {
    val head = """
      WITH eraw AS (SELECT DISTINCT 's' || l_suppkey AS src,
                           'p' || l_partkey AS dst FROM lineitem),
      edges AS (SELECT src, dst FROM eraw UNION SELECT dst, src FROM eraw),
      d0 AS (SELECT 's1' AS id, CAST(0 AS BIGINT) AS d)"""
    val steps = (1 to iters).map { k =>
      s""",
      d$k AS (SELECT id, CAST(MIN(d) AS BIGINT) AS d FROM (
               SELECT id, d FROM d${k - 1}
               UNION ALL
               SELECT e.dst AS id, p.d + 1 AS d
               FROM edges e JOIN d${k - 1} p ON e.src = p.id)
             GROUP BY id)"""
    }.mkString
    head + steps +
      s"\n      SELECT id, d FROM d$iters ORDER BY d, id LIMIT 500"
  }

  /** Triangle count over the part co-purchase graph (parts appearing in
    * the same high-value order — ~240k edges over ~20k parts at sf0.1, a
    * realistically SPARSE graph; a co-supply supplier graph is
    * near-complete and degenerate for triangle counting): the Spark side
    * runs the degree-ordered forward algorithm; the oracle counts
    * naively with an id-ordered 3-join — exact integers, any correct
    * implementation produces the same number. */
  /** Memoized part co-purchase edge artifact per (session, dir): both
    * the triangle and the components gate iterate over it — the same
    * build-once policy as [[bipartiteEdges]]. Kept distinct (one
    * canonical direction); components symmetrizes on top. */
  private val coPurchaseCache =
    new graft.sources.SessionCache[(SparkSession, String), DataFrame]
  private def coPurchaseEdges(s: SparkSession, dir: String): DataFrame =
    coPurchaseCache.getOrBuild((s, dir)) {
      val ho = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000).select(col("o_orderkey"))
      val lp = Tables.load(s, dir, "lineitem")
        .join(ho, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      lp.as("x").join(lp.as("y"),
          col("x.l_orderkey") === col("y.l_orderkey") &&
            col("x.l_partkey") < col("y.l_partkey"))
        .select(col("x.l_partkey").as("src"), col("y.l_partkey").as("dst"))
        .distinct().localCheckpoint(true)
    }

  def graphTriangles(s: SparkSession, dir: String): DataFrame =
    // the memoized artifact is distinct with src < dst and no self-loops
    // (see coPurchaseEdges) — triangleCount can skip its canonicalize pass
    graft.operators.Graph.triangleCount(coPurchaseEdges(s, dir),
      assumeCanonical = true)

  /** Component size distribution of the sparse part co-purchase graph
    * (the [[graphTriangles]] fixture — the full supplier↔part graph is
    * one dense component and 6 rounds over its 1.2M edges cost 14 s)
    * via bounded min-label propagation; unrolled-recurrence oracle. */
  def graphComponents(s: SparkSession, dir: String): DataFrame = {
    val co = coPurchaseEdges(s, dir)
    // co is distinct with src < dst, so the two union arms are disjoint
    // directions — the symmetrized set is distinct by construction
    val sym = co.unionByName(co.select(col("dst").as("src"), col("src").as("dst")))
    graft.operators.Graph.minLabelComponents(sym, iters = 6,
        assumeDistinct = true)
      .groupBy(col("lab").as("component"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("component")).limit(50)
  }

  private[queries] def componentsOracle(iters: Int): String = {
    val head = """
      WITH ho AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000),
      lp AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem JOIN ho ON l_orderkey = o_orderkey),
      und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey),
      edges AS (SELECT a AS src, b AS dst FROM und
                UNION SELECT b, a FROM und),
      nodes AS (SELECT DISTINCT src AS id FROM edges),
      l0 AS (SELECT id, id AS lab FROM nodes)"""
    val steps = (1 to iters).map { k =>
      s""",
      l$k AS (SELECT id, MIN(lab) AS lab FROM (
               SELECT id, lab FROM l${k - 1}
               UNION ALL
               SELECT e.dst AS id, p.lab
               FROM edges e JOIN l${k - 1} p ON e.src = p.id)
             GROUP BY id)"""
    }.mkString
    head + steps + s"""
      SELECT lab AS component, CAST(COUNT(*) AS BIGINT) AS n
      FROM l$iters GROUP BY lab ORDER BY n DESC, component LIMIT 50"""
  }

  def setIntersect(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.load(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    c.intersect(o)
  }

  def setExcept(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(col("c_custkey"))
    val o = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))
    c.except(o)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rdf_load" -> rdfLoad _,
    "ingest_cas" -> ingestCas _,
    "set_intersect" -> setIntersect _,
    "set_except" -> setExcept _,
    "graph_pagerank" -> graphPagerank _,
    "graph_sssp" -> graphSssp _,
    "graph_triangles" -> graphTriangles _,
    "graph_components" -> graphComponents _)
}

object RdfSetSql {
  val all: Map[String, String] = Map(
    "rdf_load" -> """
      SELECT DISTINCT n_name, CAST(n_regionkey AS BIGINT) AS n_regionkey
      FROM nation""",

    "ingest_cas" -> """
      WITH ranked AS (
        SELECT CAST(user_id AS VARCHAR) AS eid, user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '2024-01-11')
      SELECT eid,
        CASE WHEN user_id <= 10 THEN event_type || '_v2' ELSE event_type END
          AS content_hash
      FROM ranked WHERE rn = 1""",

    "set_intersect" -> """
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders""",

    "set_except" -> """
      SELECT c_custkey FROM customer
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_totalprice > 300000""",

    "graph_pagerank" -> RdfSetQueries.pagerankOracle(5),
    "graph_sssp" -> RdfSetQueries.ssspOracle(4),
    "graph_components" -> RdfSetQueries.componentsOracle(6),

    "graph_triangles" -> """
      WITH ho AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000),
      lp AS (SELECT DISTINCT l_orderkey, l_partkey
             FROM lineitem JOIN ho ON l_orderkey = o_orderkey),
      und AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
              FROM lp x JOIN lp y ON x.l_orderkey = y.l_orderkey
                                 AND x.l_partkey < y.l_partkey)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM und e1
      JOIN und e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b""")
}
