package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pull.Pull

/** Gate queries for the EQL pull surface (SURVEY §7.1 module 6;
  * crux-core/src/crux/pull.clj). Pulled structs are compared with the
  * DuckDB oracle as compact JSON strings — both engines serialize
  * `{"k":v}` with no whitespace, nulls written explicitly
  * (ignoreNullFields=false to match DuckDB's to_json).
  */
object PullQueries {

  private val JsonOpts = Map("ignoreNullFields" -> "false")

  /** props + alias + default over customers. */
  def pullProps(s: SparkSession, dir: String): DataFrame =
    Pull.pull(Pull.tpch(s, dir), "customer",
        "[:c_custkey :c_name [:c_acctbal {:as :bal}] [:c_mktsegment {:default \"NONE\"}]]")
      .filter(col("_id") <= 100)
      .select(col("_id").as("c_custkey"),
        to_json(col("pulled"), JsonOpts).as("pulled"))

  /** forward join chain orders → customer → nation. */
  def pullFwd(s: SparkSession, dir: String): DataFrame =
    Pull.pull(Pull.tpch(s, dir), "orders",
        "[:o_orderkey :o_totalprice {:o_custkey [:c_custkey :c_name {:c_nationkey [:n_name]}]}]")
      .filter(col("_id") <= 200)
      .select(col("_id").as("o_orderkey"),
        to_json(col("pulled"), JsonOpts).as("pulled"))

  /** reverse join with limit: each customer's first 3 orders by orderkey. */
  def pullReverse(s: SparkSession, dir: String): DataFrame =
    Pull.pull(Pull.tpch(s, dir), "customer",
        "[:c_custkey {[:_o_custkey {:limit 3}] [:o_orderkey :o_totalprice]}]")
      .filter(col("_id") <= 50)
      .select(col("_id").as("c_custkey"),
        to_json(col("pulled"), JsonOpts).as("pulled"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pull_props" -> pullProps _,
    "pull_fwd" -> pullFwd _,
    "pull_reverse" -> pullReverse _)
}

object PullSql {
  val all: Map[String, String] = Map(
    "pull_props" -> """
      SELECT c_custkey,
        to_json(struct_pack(c_custkey := c_custkey, c_name := c_name,
          bal := c_acctbal,
          c_mktsegment := COALESCE(c_mktsegment, 'NONE'))) AS pulled
      FROM customer WHERE c_custkey <= 100""",

    "pull_fwd" -> """
      SELECT o_orderkey,
        to_json(struct_pack(o_orderkey := o_orderkey,
          o_totalprice := o_totalprice,
          o_custkey := struct_pack(c_custkey := c_custkey, c_name := c_name,
            c_nationkey := struct_pack(n_name := n_name)))) AS pulled
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderkey <= 200""",

    "pull_reverse" -> """
      WITH lst AS (
        SELECT o_custkey,
          list(struct_pack(o_orderkey := o_orderkey, o_totalprice := o_totalprice)
               ORDER BY o_orderkey) AS l
        FROM orders GROUP BY o_custkey)
      SELECT c_custkey,
        to_json(struct_pack(c_custkey := c_custkey,
          _o_custkey := COALESCE(l[1:3], []))) AS pulled
      FROM customer LEFT JOIN lst ON o_custkey = c_custkey
      WHERE c_custkey <= 50""")
}
