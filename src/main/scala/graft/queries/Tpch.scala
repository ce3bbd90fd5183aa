package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Exact._
import graft.sources.Tables

/** TPC-H-style analytical suite over the driver's parquet tables, adapted to
  * the available columns (FIXTURES.md §1 — no partsupp; lineitem/orders carry
  * a column subset). Mirrors the reference's TPC-H Datalog corpus
  * (crux-test/src/crux/fixtures/tpch.clj:118-640) re-expressed Spark-first:
  * declarative DataFrame plans, Catalyst does pushdown/join-selection, small
  * dimensions broadcast.
  *
  * Every query has a DuckDB oracle in [[TpchSql]]; aggregates use
  * [[graft.functions.Exact]] so both engines produce bit-identical doubles.
  */
object Tpch {

  // Parquet timestamps here are NTZ (no UTC adjustment); NTZ literals keep
  // comparisons and outputs in naive-wall-clock space, matching DuckDB.
  private def ts(s: String): Column = lit(java.time.LocalDateTime.parse(s + "T00:00:00"))

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Q1: pricing summary report — scan + filter + 8-way agg + sort. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" <= ts("2000-09-02"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum(money($"l_quantity")).as("sum_qty"),
        dsum(money($"l_extendedprice")).as("sum_base_price"),
        dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("sum_disc_price"),
        dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount") * rate(lit(1) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** Q2: top-balance supplier per nation in EUROPE — agg + self-join-back
    * (the reference's correlated-min-subquery pattern, tpch.clj:155-168,
    * decorrelated into join+groupBy per SURVEY §4). */
  def q2(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val supplier = t(s, dir, "supplier")
    val maxBal = supplier.groupBy($"s_nationkey".as("mb_nationkey"))
      .agg(max($"s_acctbal").as("max_bal"))
    supplier
      .join(broadcast(maxBal),
        $"s_nationkey" === $"mb_nationkey" && $"s_acctbal" === $"max_bal")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "EUROPE")
      .select($"n_name", $"s_name", $"s_acctbal")
      .orderBy($"n_name", $"s_name")
  }

  /** Q3: unshipped-order revenue — 3-way join + agg + top-k. */
  def q3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < ts("1998-01-01"))
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" > ts("1998-01-01"))
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate")
      .limit(10)
  }

  /** Q4: order-priority checking — EXISTS as left-semi join with a
    * non-equi conjunct. */
  def q4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    t(s, dir, "orders")
      .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1997-10-01"))
      .join(li, $"o_orderkey" === $"l_orderkey" && $"l_shipdate" > $"o_orderdate", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  /** Q5: local-supplier volume — 6-way join, broadcast dims, agg. */
  def q5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" >= ts("1997-01-01") && $"o_orderdate" < ts("1998-01-01"))
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .join(broadcast(t(s, dir, "supplier")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc)
  }

  /** Q6: forecast revenue — pure scan + range predicates + single agg
    * (the reference's minimum end-to-end slice, tpch.clj:243-254). */
  def q6(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(dsum(money($"l_extendedprice") * rate($"l_discount")).as("revenue"))
  }

  /** Q7: volume shipping between two nations — dual nation join with
    * disjunctive pair filter, group by (nation, nation, year). */
  def q7(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = t(s, dir, "nation").select($"n_nationkey".as("n1_key"), $"n_name".as("supp_nation"))
    val n2 = t(s, dir, "nation").select($"n_nationkey".as("n2_key"), $"n_name".as("cust_nation"))
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1996-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"n1_key")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n2), $"c_nationkey" === $"n2_key")
      .filter(($"supp_nation" === "NATION_1" && $"cust_nation" === "NATION_2") ||
              ($"supp_nation" === "NATION_2" && $"cust_nation" === "NATION_1"))
      .groupBy($"supp_nation", $"cust_nation", year($"l_shipdate").cast("long").as("l_year"))
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"supp_nation", $"cust_nation", $"l_year")
  }

  /** Q8: market share of NATION_3 within AMERICA for ECONOMY parts —
    * conditional aggregation ratio. */
  def q8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = t(s, dir, "nation").select($"n_nationkey".as("cn_key"), $"n_regionkey".as("cn_region"))
    val n2 = t(s, dir, "nation").select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
    val vol = money($"l_extendedprice") * rate(lit(1) - $"l_discount")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter($"p_type" === "ECONOMY")), $"l_partkey" === $"p_partkey")
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n2), $"s_nationkey" === $"sn_key")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= ts("1996-01-01") && $"o_orderdate" < ts("1998-01-01"))
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(n1), $"c_nationkey" === $"cn_key")
      .join(broadcast(t(s, dir, "region")), $"cn_region" === $"r_regionkey")
      .filter($"r_name" === "AMERICA")
      .groupBy(year($"o_orderdate").cast("long").as("o_year"))
      .agg((dsum(when($"supp_nation" === "NATION_3", vol)) / dsum(vol)).as("mkt_share"))
      .orderBy($"o_year")
  }

  /** Q9: profit by supplier-nation and year (cost = retailprice × qty since
    * there is no partsupp). */
  def q9(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val amount = money($"l_extendedprice") * rate(lit(1) - $"l_discount") -
      money($"p_retailprice") * money($"l_quantity")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part").filter($"p_type" === "STANDARD")), $"l_partkey" === $"p_partkey")
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      .agg(dsum(amount).as("sum_profit"))
      .orderBy($"nation", $"o_year".desc)
  }

  /** Q10: returned-item reporting — 4-way join + agg + top 20. */
  def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" >= ts("1997-07-01") && $"o_orderdate" < ts("1997-10-01"))
      .join(t(s, dir, "lineitem").filter($"l_returnflag" === "R"), $"o_orderkey" === $"l_orderkey")
      .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"c_custkey")
      .limit(20)
  }

  /** Q11: important part values — agg + global-total scalar subquery
    * (broadcast cross join of a 1-row aggregate). */
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perPart = t(s, dir, "lineitem").groupBy($"l_partkey")
      .agg(dsum(money($"l_extendedprice")).as("part_value"))
    // re-sum through decimal: part_value is an exact multiple of 1e-6, so
    // this stays exact and order-independent (a raw double sum would not)
    val total = perPart.agg(
      sum($"part_value".cast(org.apache.spark.sql.types.DecimalType(18, 6)))
        .cast("double").as("total_value"))
    // fraction 0.0005 is tuned to the fixture (ref uses 0.0001/partsupp,
    // fixtures/tpch.clj:377-399): 0.001 excluded every part at sf≥0.01,
    // making the gate vacuous (r3 verdict)
    perPart.crossJoin(broadcast(total))
      .filter($"part_value" > $"total_value" * 0.0005)
      .select($"l_partkey", $"part_value")
      .orderBy($"part_value".desc, $"l_partkey")
  }

  /** Q12: priority mix by return flag — conditional counts. */
  def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val high = $"o_orderpriority" === "1-URGENT" || $"o_orderpriority" === "2-HIGH"
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy($"l_returnflag")
  }

  /** Q13: customer order-count distribution — conditional left outer join +
    * two-level aggregation. */
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        $"c_custkey" === $"o_custkey" && $"o_orderpriority" =!= "1-URGENT", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  /** Q14: promo revenue share — conditional-agg ratio over a join. */
  def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vol = money($"l_extendedprice") * rate(lit(1) - $"l_discount")
    t(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-09-01") && $"l_shipdate" < ts("1997-10-01"))
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .agg((lit(100.0) * dsum(when($"p_type" === "PROMO", vol).otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(23, 8)))) /
        dsum(vol)).as("promo_revenue"))
  }

  /** Q15: top supplier by quarter revenue — agg + max-scalar + join back. */
  def q15(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = t(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1997-04-01"))
      .groupBy($"l_suppkey")
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("total_revenue"))
    val top = rev.agg(max($"total_revenue").as("max_revenue"))
    rev.crossJoin(broadcast(top))
      .filter($"total_revenue" === $"max_revenue")
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_revenue")
      .orderBy($"s_suppkey")
  }

  /** Q16: supplier diversity per part group — anti join + distinct count. */
  def q16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val badSupp = t(s, dir, "supplier").filter($"s_acctbal" < 0).select($"s_suppkey")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .filter($"p_brand" =!= "Brand#5" && $"p_type" =!= "PROMO" &&
            $"p_size".isin(1, 4, 9, 14, 19, 24, 29, 34)),
        ), $"l_partkey" === $"p_partkey")
      .join(broadcast(badSupp), $"l_suppkey" === $"s_suppkey", "left_anti")
      .groupBy($"p_brand", $"p_type", $"p_size")
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
  }

  /** Q17: small-quantity revenue — per-part average threshold join. */
  def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val avgQty = li.groupBy($"l_partkey".as("aq_partkey"))
      .agg((davg($"l_quantity") * 0.5).as("qty_threshold"))
    li.join(broadcast(t(s, dir, "part").filter($"p_brand" === "Brand#3")), $"l_partkey" === $"p_partkey")
      .join(avgQty, $"l_partkey" === $"aq_partkey")
      .filter($"l_quantity" < $"qty_threshold")
      .agg((dsum(money($"l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  /** Q18: large-volume customers — having-filtered agg join + top-k. */
  def q18(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "lineitem").groupBy($"l_orderkey")
      .agg(dsum(money($"l_quantity")).as("sum_qty"))
      .filter($"sum_qty" > 300)
    t(s, dir, "orders")
      .join(big, $"o_orderkey" === $"l_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_orderdate", $"o_orderkey")
      .limit(100)
  }

  /** Q19: discounted revenue — disjunctive multi-range predicates. */
  def q19(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"l_quantity".between(1, 11) && $"p_size".between(1, 5)) ||
        ($"p_brand" === "Brand#23" && $"l_quantity".between(10, 20) && $"p_size".between(1, 10)) ||
        ($"p_brand" === "Brand#34" && $"l_quantity".between(20, 30) && $"p_size".between(1, 15)))
      .agg(dsum(money($"l_extendedprice") * rate(lit(1) - $"l_discount")).as("revenue"))
  }

  /** Q20: suppliers with heavy PROMO shipments — nested semi joins. */
  def q20(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val promoParts = t(s, dir, "part").filter($"p_type" === "PROMO").select($"p_partkey")
    val heavy = t(s, dir, "lineitem")
      .filter($"l_shipdate" >= ts("1997-01-01") && $"l_shipdate" < ts("1998-01-01"))
      .join(broadcast(promoParts), $"l_partkey" === $"p_partkey", "left_semi")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(dsum(money($"l_quantity")).as("qty"))
      .filter($"qty" > 50)
      .select($"l_suppkey").distinct()
    t(s, dir, "supplier")
      .join(broadcast(heavy), $"s_suppkey" === $"l_suppkey", "left_semi")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      // nations chosen to intersect the heavy-supplier set in the seed-42
      // fixture — NATION_1..3 hosted none, leaving the gate at 0 rows
      .filter($"n_name".isin("NATION_6", "NATION_7", "NATION_11"))
      .select($"s_name", $"s_acctbal")
      .orderBy($"s_name")
  }

  /** Q21: suppliers in multi-supplier failed orders with no returned line.
    *
    * Single-scan shape (r1 VERDICT plan audit): instead of re-scanning
    * lineitem for the semi (other supplier exists) and anti (other
    * supplier returned) sides, fold both EXISTS tests into one per-order
    * supplier profile — `exists l2 (supp≠self)` ⟺ the order has ≥2
    * distinct suppliers; `not exists l3 (R, supp≠self)` ⟺ no supplier
    * returned, or the only returning supplier is self. Two cascaded
    * aggregations (per (order, supp), then per order) keep partial
    * aggregation and avoid an Expand from multi-distinct; at 100× this
    * halves lineitem scan + shuffle volume vs the three-scan plan. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
    val perSupp = li.groupBy($"l_orderkey".as("po_orderkey"), $"l_suppkey".as("po_suppkey"))
      .agg(max(when($"l_returnflag" === "R", 1).otherwise(0)).as("has_r"))
    val perOrder = perSupp.groupBy($"po_orderkey")
      .agg(count(lit(1)).as("nsupp"), sum($"has_r").as("nrsupp"),
        max(when($"has_r" === 1, $"po_suppkey")).as("rsupp"))
    li.join(t(s, dir, "orders").filter($"o_orderstatus" === "F"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(t(s, dir, "supplier")), $"l_suppkey" === $"s_suppkey")
      .join(perOrder, $"l_orderkey" === $"po_orderkey")
      .filter($"nsupp" >= 2 &&
        ($"nrsupp" === 0 || ($"nrsupp" === 1 && $"rsupp" === $"l_suppkey")))
      .groupBy($"s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy($"numwait".desc, $"s_name")
      .limit(100)
  }

  /** Q22: well-funded customers without orders — scalar-avg filter +
    * anti join + agg. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = t(s, dir, "customer")
    val avgBal = cust.filter($"c_acctbal" > 0.0)
      .agg(davg($"c_acctbal").as("avg_bal"))
    // anti join against RECENT orders only: every fixture customer has at
    // least one order over the full 1995-2001 span, so the unwindowed
    // anti join was vacuously empty (r3 verdict)
    cust.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"avg_bal")
      .join(t(s, dir, "orders").filter($"o_orderdate" >= ts("1998-01-01"))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("numcust"), dsum(money($"c_acctbal")).as("totacctbal"))
      .orderBy($"c_mktsegment")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1" -> q1 _, "q2" -> q2 _, "q3" -> q3 _, "q4" -> q4 _, "q5" -> q5 _,
    "q6" -> q6 _, "q7" -> q7 _, "q8" -> q8 _, "q9" -> q9 _, "q10" -> q10 _,
    "q11" -> q11 _, "q12" -> q12 _, "q13" -> q13 _, "q14" -> q14 _,
    "q15" -> q15 _, "q16" -> q16 _, "q17" -> q17 _, "q18" -> q18 _,
    "q19" -> q19 _, "q20" -> q20 _, "q21" -> q21 _, "q22" -> q22 _)
}
