package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench self-defense decisions (r14 judge ask #3) — pure helpers,
  * spec'd so the re-run trigger is pinned behavior, not a smoke test:
  * two rounds of committed boards were poisoned by co-tenant bursts the
  * judge had to re-measure by hand, so what counts as "spiked" and how
  * a reference board parses must not drift silently. */
class BenchDefenseSpec extends AnyFunSuite {

  test("parseRef: flat gate map, _comment prose ignored, garbage tolerated") {
    val txt = """{
      "_comment": "quiet board, cpu_control_min 0.54; re-runs at 3x",
      "q1": 0.204, "ingest_cas": 2.32, "text_exact_substr": 0.828,
      "weird": 1e-2
    }"""
    val ref = Bench.parseRef(txt)
    assert(ref("q1") == 0.204)
    assert(ref("ingest_cas") == 2.32)
    assert(ref("weird") == 1e-2)
    // prose numbers inside the comment string never form a "key": number
    // pair, so the comment contributes nothing
    assert(!ref.contains("_comment"))
    assert(ref.size == 4)
    // defense degrades to OFF, never to a crash
    assert(Bench.parseRef("").isEmpty)
    assert(Bench.parseRef("not json at all").isEmpty)
    // a hand-edit typo that MATCHES the token regex but not toDouble
    // drops that entry only — the rest of the board stays live
    val typo = Bench.parseRef("""{"q1": 1.2.3, "q2": 0.5}""")
    assert(!typo.contains("q1") && typo("q2") == 0.5)
    // the committed reference board itself parses and is all-positive
    val committed = Bench.parseRef(
      scala.io.Source.fromFile("tools/bench_ref.json").mkString)
    assert(committed.nonEmpty && committed.values.forall(_ > 0))
    assert(committed.contains("q1") && committed.contains("ingest_cas"))
  }

  test("spiked: strictly-over-3x trigger, zero/missing references never fire") {
    assert(!Bench.spiked(1.0, None)) // no board → defense off
    assert(!Bench.spiked(100.0, Some(0.0))) // zero ref can't divide the world
    assert(!Bench.spiked(100.0, Some(-1.0)))
    assert(!Bench.spiked(0.6, Some(0.2))) // exactly 3× is drift, not a spike
    assert(Bench.spiked(0.6000001, Some(0.2)))
    assert(Bench.spiked(9.29, Some(0.26))) // the r13 ts_devices_recent ghost
    assert(!Bench.spiked(0.26, Some(0.26)))
  }
}
