package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.datalog.{Planner, TableSource}

/** A schemaless whole-corpus scan (`wildcard-text-search`) over a
  * partially-broken catalog must DEGRADE — skip the unloadable table with a
  * warning and search the rest — not die. In round 5 the events fixture's
  * encoding change killed `dl_wildcard_search` collaterally: the scan
  * touches every string attribute of every table, including tables the
  * query never mentions. Directly-named attributes still throw: there the
  * query asked for that table and skipping would change semantics. */
class BrokenCatalogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** sf0.001 catalog with one table's parquet missing entirely. */
  private def dirWithout(table: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_broken_cat")
    graft.sources.Tables.all.filterNot(_ == table).foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        d.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$sfDir/$t.parquet"))
    }
    d.toString
  }

  test("wildcard-text-search survives a missing table dir") {
    val dir = dirWithout("events")
    val out = Planner.q(spark, TableSource.tpch(spark, dir), """
      {:find [?e ?v ?a]
       :keys [e v a]
       :where [[(wildcard-text-search "MEDIUM") [[?e ?v ?a]]]]}""")
    // 'medium' occurs in part.p_type and orders.o_orderpriority — both
    // still present, so the scan must return rows from the healthy tables
    assert(out.count() > 0)
    val attrs = out.select("a").distinct().collect().map(_.getString(0)).toSet
    assert(attrs.contains(":p_type") && attrs.contains(":o_orderpriority"))
  }

  test("directly-named attribute on the broken table still throws") {
    val dir = dirWithout("events")
    val ex = intercept[Exception] {
      Planner.q(spark, TableSource.tpch(spark, dir), """
        {:find [?e ?t] :where [[?e :event_type ?t]]}""").count()
    }
    assert(ex != null)
  }
}
