package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Rdf

/** N-Triples round-trip incl. string-literal escaping (labs/crux-rdf). */
class RdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("serialize/load round-trips quotes, backslashes and control chars") {
    import spark.implicits._
    val df = Seq(
      (1L, "say \"hi\" twice", 10L),
      (2L, "back\\slash and\ttab", 20L),
      (3L, "line one\nline two", 30L)).toDF("id", "note", "n")
    val lines = Rdf.toNTriples(df, "http://g", "id")
    // every triple is exactly one physical line
    assert(lines.count() == 6)
    val dir = java.nio.file.Files.createTempDirectory("graft_rdf_spec").toString + "/nt"
    lines.coalesce(1).write.text(dir)
    val back = Rdf.loadNTriples(spark, dir)
    val notes = back.filter($"a" === "note").select($"e", $"v_str").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(notes("1") == "say \"hi\" twice")
    assert(notes("2") == "back\\slash and\ttab")
    assert(notes("3") == "line one\nline two")
    val nums = back.filter($"a" === "n").select($"e", $"v_num").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(nums == Map("1" -> 10L, "2" -> 20L, "3" -> 30L))
  }

  test("dbpedia entities load and query (dbpedia_test.clj:13-30)") {
    import org.apache.spark.sql.functions.col
    val quads = Rdf.loadNTriples(spark,
        "/root/reference/crux-test/test/crux/Pablo_Picasso.ntriples")
      .unionByName(Rdf.loadNTriples(spark,
        "/root/reference/crux-test/test/crux/Guernica_(Picasso).ntriples"))
    val strAttrs = quads.filter(col("v_str").isNotNull)
      .select("a").distinct().collect().map(_.getString(0))
    val src = new graft.datalog.QuadSource(quads, strAttrs.map(_ -> "v_str").toMap)
    def q(query: String): Set[Seq[Any]] =
      graft.datalog.Planner.q(spark, src, query).collect()
        .toSet[org.apache.spark.sql.Row].map(_.toSeq)
    // the reference keywordizes full IRIs; the loader's local names carry
    // the same identity (dbpedia resource names are unique local names)
    assert(q("""[:find ?e :where [[?e :givenName "Pablo"]]]""") ==
      Set(Seq("Pablo_Picasso")))
    assert(q("""[:find ?g :where [[?p :givenName "Pablo"] [?g :author ?p]]]""") ==
      Set(Seq("Guernica_(Picasso)")))
  }
}
