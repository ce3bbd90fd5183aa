package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attribute statistics maintenance (SURVEY §2.9 last row; reference:
  * per-attr doc-count + eid/value HyperLogLogs updated at index time,
  * crux-core/src/crux/kv/index_store.clj:417-472, HLL impl
  * crux-core/src/crux/hyper_log_log.clj — used by the join planner at
  * query.clj:586-703).
  *
  * Spark-first: stats are a batch job, ONE pass over the table computing
  * every attribute's doc count, exact distinct, and HLL-approx distinct
  * (`approx_count_distinct` — the direct analogue of the reference's HLL
  * with configurable rsd), then unpivoted to one row per attribute. At
  * cluster scale the approx column is the one you keep (mergeable
  * sketches, constant memory); exact distinct is here because the
  * correctness gate hash-compares against DuckDB.
  */
object Stats {

  /** One row per attribute: (attr, n_docs, n_distinct, approx_distinct). */
  def attrStats(df: DataFrame, attrs: Seq[String], rsd: Double = 0.05): DataFrame = {
    val aggs: Seq[Column] = attrs.flatMap { a =>
      Seq(count(col(a)).as(s"__c_$a"),
        countDistinct(col(a)).as(s"__d_$a"),
        approx_count_distinct(col(a), rsd).as(s"__a_$a"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = attrs.map(a =>
      struct(lit(a).as("attr"), col(s"__c_$a").as("n_docs"),
        col(s"__d_$a").as("n_distinct"), col(s"__a_$a").as("approx_distinct")))
    one.select(explode(array(stacked: _*)).as("_s")).select("_s.*")
  }
}
