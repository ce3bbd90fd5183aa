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
}
