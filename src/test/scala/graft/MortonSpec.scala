package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.bitemp.Morton

/** Port of morton_test.clj — encode/decode, mask range check, and the
  * LITMAX/BIGMIN values from the Tropf/Herzog paper (p.74) and the
  * Wikipedia Z-order example. */
class MortonSpec extends AnyFunSuite {

  test("can encode and decode morton numbers (:12-23 port)") {
    assert(Morton.interleave(3, 5) == BigInt(27))
    assert(Morton.deinterleave(BigInt(27)) == ((3L, 5L)))
    // handles unsigned longs: (-1, -1) is the all-ones 128-bit max
    assert(Morton.interleave(-1L, -1L) == Morton.ZMax)
    assert(Morton.deinterleave(Morton.ZMax) == ((-1L, -1L)))
  }

  test("can check range without decoding (:25-43 port)") {
    def z(a: Long, b: Long) = Morton.interleave(a, b)
    assert(Morton.withinRange(z(1, 1), z(1, 1), z(1, 1)))
    assert(Morton.withinRange(z(2, 2), z(3, 6), z(3, 4)))
    assert(!Morton.withinRange(z(2, 2), z(3, 6), z(0, 0)))
    assert(!Morton.withinRange(z(2, 2), z(3, 6), z(5, 4)))
  }

  test("can calculate litmax and bigmin (:45-76 port)") {
    def z(a: Long, b: Long) = Morton.interleave(a, b)
    def rs(s: BigInt, e: BigInt, v: BigInt) = {
      val (l, b) = Morton.rangeSearch(s, e, v); (l.toInt, b.toInt)
    }
    // paper p.74
    assert(rs(27, 102, 58) == ((55, 74)))
    assert(rs(z(3, 5), z(5, 10), z(7, 4)) == ((55, 74)))
    // Wikipedia example
    assert(rs(12, 45, 19) == ((15, 36)))
    assert(rs(z(2, 2), z(6, 3), z(1, 5)) == ((15, 36)))
    // search below / above the segment
    assert(rs(12, 45, 11) == ((0, 12)))
    assert(rs(12, 45, 0) == ((0, 12)))
    assert(rs(51, 193, 50) == ((0, 51)))
    assert(rs(12, 45, 46) == ((45, 0)))
    assert(rs(51, 193, 196) == ((193, 0)))
    def na(s: Int, e: Int) = {
      val (l, b) = Morton.nextAddress(BigInt(s), BigInt(e)); (l.toInt, b.toInt)
    }
    assert(na(51, 193) == ((107, 145)))
    assert(na(51, 107) == ((63, 98)))
    assert(na(98, 107) == ((99, 104)))
    assert(na(145, 193) == ((149, 192)))
  }

  test("zRanges cover the box and exclude big gaps") {
    // box d1 in [3,5], d2 in [5,10] (the paper's example box). zRanges
    // (like the z column it prunes) lives on the epoch-BIASED curve, so
    // the oracle biases its points the same way.
    val b = Morton.EpochBiasMicros
    val ranges = Morton.zRanges(3, 5, 5, 10, maxRanges = 4)
    assert(ranges.nonEmpty && ranges.size <= 4)
    val zmin = Morton.interleave(3 + b, 5 + b)
    val zmax = Morton.interleave(5 + b, 10 + b)
    // every in-box point's z is covered by some range
    for (d1 <- 3L to 5L; d2 <- 5L to 10L) {
      val zv = Morton.interleave(d1 + b, d2 + b)
      assert(ranges.exists { case (s, e) => s <= zv && zv <= e },
        s"($d1,$d2) z=$zv uncovered by $ranges")
    }
    // ranges stay inside the curve segment and shrink the covered length
    assert(ranges.forall { case (s, e) => s >= zmin && e <= zmax && s <= e })
    val covered = ranges.map { case (s, e) => e - s + 1 }.sum
    assert(covered < zmax - zmin + 1, s"no gap removed: $ranges")
  }
}
