package graft.queries

/** DuckDB oracle SQL for [[Tpch]] — each statement mirrors the DataFrame
  * plan's arithmetic exactly (decimal-cast sums → double, see
  * [[graft.functions.Exact]]) so hashes match bit-for-bit.
  */
object TpchSql {
  import graft.functions.Exact.{sqlDsum => dsum, sqlMoney => m, sqlRate}
  private val vol = s"${m("l_extendedprice")} * ${sqlRate("1 - l_discount")}"

  val all: Map[String, String] = Map(
    "q1" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${dsum(m("l_quantity"))} AS sum_qty,
        ${dsum(m("l_extendedprice"))} AS sum_base_price,
        ${dsum(vol)} AS sum_disc_price,
        ${dsum(s"$vol * CAST(1 + l_tax AS DECIMAL(8,4))")} AS sum_charge,
        ${dsum(m("l_quantity"))} / COUNT(*) AS avg_qty,
        ${dsum(m("l_extendedprice"))} / COUNT(*) AS avg_price,
        ${dsum(m("l_discount"))} / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "q2" -> """
      SELECT n_name, s_name, s_acctbal
      FROM supplier
      JOIN (SELECT s_nationkey AS mb_nationkey, MAX(s_acctbal) AS max_bal
            FROM supplier GROUP BY s_nationkey) mb
        ON s_nationkey = mb_nationkey AND s_acctbal = max_bal
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      ORDER BY n_name, s_name""",

    "q3" -> s"""
      SELECT l_orderkey, o_orderdate, ${dsum(vol)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate
      LIMIT 10""",

    "q4" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-10-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""",

    "q5" -> s"""
      SELECT n_name, ${dsum(vol)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC""",

    "q6" -> s"""
      SELECT ${dsum(s"CAST(l_extendedprice AS DECIMAL(14,4)) * CAST(l_discount AS DECIMAL(8,4))")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q7" -> s"""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year, ${dsum(vol)} AS revenue
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""",

    "q8" -> s"""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             ${dsum(s"CASE WHEN n2.n_name = 'NATION_3' THEN $vol END")} / ${dsum(vol)} AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY o_year
      ORDER BY o_year""",

    "q9" -> s"""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             ${dsum(s"$vol - CAST(p_retailprice AS DECIMAL(14,4)) * CAST(l_quantity AS DECIMAL(14,4))")} AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_type = 'STANDARD'
      GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
      ORDER BY nation, o_year DESC""",

    "q10" -> s"""
      SELECT c_custkey, c_name, c_acctbal, n_name, ${dsum(vol)} AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""",

    "q11" -> s"""
      WITH per_part AS (
        SELECT l_partkey, ${dsum(m("l_extendedprice"))} AS part_value
        FROM lineitem GROUP BY l_partkey),
      total AS (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM per_part)
      SELECT l_partkey, part_value
      FROM per_part, total
      WHERE part_value > total_value * 0.0005
      ORDER BY part_value DESC, l_partkey""",

    "q12" -> """
      SELECT l_returnflag,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",

    "q13" -> """
      SELECT c_count, COUNT(*) AS custdist
      FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT OUTER JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC""",

    "q14" -> s"""
      SELECT 100.0 * ${dsum(s"CASE WHEN p_type = 'PROMO' THEN $vol ELSE CAST(0 AS DECIMAL(23,8)) END")}
               / ${dsum(vol)} AS promo_revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""",

    "q15" -> s"""
      WITH rev AS (
        SELECT l_suppkey, ${dsum(vol)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
      ORDER BY s_suppkey""",

    "q16" -> """
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q17" -> s"""
      WITH aq AS (
        SELECT l_partkey AS aq_partkey,
               ${dsum(m("l_quantity"))} / COUNT(*) * 0.5 AS qty_threshold
        FROM lineitem GROUP BY l_partkey)
      SELECT ${dsum(m("l_extendedprice"))} / 7.0 AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN aq ON l_partkey = aq_partkey
      WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold""",

    "q18" -> s"""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM orders
      JOIN (SELECT l_orderkey, ${dsum(m("l_quantity"))} AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ${dsum(m("l_quantity"))} > 300) big
        ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100""",

    "q19" -> s"""
      SELECT ${dsum(vol)} AS revenue
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
         OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
         OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)""",

    "q20" -> s"""
      SELECT s_name, s_acctbal
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name IN ('NATION_6', 'NATION_7', 'NATION_11')
        AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
            AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          GROUP BY l_suppkey, l_partkey
          HAVING ${dsum(m("l_quantity"))} > 50)
      ORDER BY s_name""",

    "q21" -> """
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100""",

    "q22" -> s"""
      WITH avg_bal AS (
        SELECT ${dsum(m("c_acctbal"))} / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0)
      SELECT c_mktsegment, COUNT(*) AS numcust, ${dsum(m("c_acctbal"))} AS totacctbal
      FROM customer, avg_bal
      WHERE c_acctbal > avg_bal
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")
}
