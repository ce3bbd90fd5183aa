package graft.bitemp

/** Z-order (Morton) interleaving of two unsigned 64-bit dimensions into a
  * 128-bit curve position, with the Tropf/Herzog LITMAX/BIGMIN range
  * decomposition — the space-filling-curve index the reference uses for
  * bitemporal (valid-time × transaction-time) range scans
  * (crux-core/src/crux/morton.clj, after
  * vision-tools.com/h-tropf/multidimensionalrangequery.pdf p.76).
  *
  * Spark mapping: the KV store seeks along the curve with BIGMIN jumps;
  * a columnar store gets the same effect by SORTING/partitioning on the
  * z-value and turning a (vt, tt) box into a small OR-of-BETWEEN z-range
  * predicate ([[zRanges]]) — parquet row-group min/max stats then skip
  * everything outside the ranges, and [[withinRange]] mask-checks
  * exactness per row (no false positives survive).
  *
  * 128-bit values ride as BigInt (masked): range decomposition runs
  * driver-side per query, so clarity beats bit-twiddling; the per-row
  * z-value hot path uses the long-only spread ([[interleave]]).
  */
object Morton {

  private val Mask128 = (BigInt(1) << 128) - 1
  /** odd (d1) / even (d2) bit masks, morton.clj:79-80. */
  val D1Mask: BigInt = BigInt("aa" * 16, 16)
  val D2Mask: BigInt = BigInt("55" * 16, 16)
  /** morton.clj z-max-mask: both dimensions all-ones. */
  val ZMax: BigInt = Mask128

  /** Spread the low 32 bits of x to the even bit positions
    * (graphics.stanford.edu bithacks InterleaveBMN; morton.clj:34-41). */
  private def spread(x0: Long): Long = {
    var x = x0
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def unspread(x0: Long): Long = {
    var x = x0 & 0x5555555555555555L
    x = (x | (x >>> 1)) & 0x3333333333333333L
    x = (x | (x >>> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >>> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >>> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >>> 16)) & 0x00000000ffffffffL
    x
  }

  /** Interleave the low 32 bits of d1 (odd positions) and d2 (even). */
  private def interleaveInts(d1: Long, d2: Long): Long =
    (spread(d1 & 0xffffffffL) << 1) | spread(d2 & 0xffffffffL)

  /** 128-bit z-number for two unsigned 64-bit dimensions
    * (morton.clj:60-64 longs->morton-number). */
  def interleave(d1: Long, d2: Long): BigInt = {
    val lower = interleaveInts(d1, d2)
    val upper = interleaveInts(d1 >>> 32, d2 >>> 32)
    (unsignedBig(upper) << 64) | unsignedBig(lower)
  }

  /** Inverse of [[interleave]]: (d1, d2) as (possibly negative) longs. */
  def deinterleave(z: BigInt): (Long, Long) = {
    val lower = (z & BigInt("ffffffffffffffff", 16)).longValue
    val upper = ((z >> 64) & BigInt("ffffffffffffffff", 16)).longValue
    val d1 = (unspread(upper >>> 1) << 32) | unspread(lower >>> 1)
    val d2 = (unspread(upper) << 32) | unspread(lower)
    (d1, d2)
  }

  private def unsignedBig(x: Long): BigInt =
    BigInt(java.lang.Long.toUnsignedString(x))

  /** Epoch bias for the TIME-facing entries ([[zDecimal]], [[zRanges]]):
    * the curve machinery is UNSIGNED, so a raw negative micros value
    * (any pre-1970 timestamp) would wrap to the top of the curve —
    * producing a z the range side can never match (rows silently vanish
    * from pruned scans) or, with bit 63 set in only one half, a signed/
    * unsigned mismatch that overflows Decimal(38,0) inside codegen.
    * Shifting both dimensions by 2^62 keeps the whole supported domain
    * (±2^62 µs ≈ ±146,000 years) in [0, 2^63) — order-preserving, and
    * any interleave stays < 2^126 < 10^38. Out-of-domain inputs fail
    * LOUDLY. Raw [[interleave]]/[[deinterleave]] stay bias-free
    * (morton.clj parity — MortonSpec pins the unsigned edge values). */
  val EpochBiasMicros: Long = 1L << 62
  private def biased(micros: Long, what: String): Long = {
    require(micros > -EpochBiasMicros && micros < EpochBiasMicros,
      s"morton $what out of the supported +-2^62-microsecond domain: $micros")
    micros + EpochBiasMicros
  }

  /** [[interleave]] of two micros-since-epoch longs (epoch-BIASED, see
    * [[EpochBiasMicros]]) as a Spark `Decimal(38,0)` — the per-row
    * hot-path entry the codegen'd [[graft.functions.MortonZ]] expression
    * calls. Built from the two interleaved halves directly, no BigInt
    * string hop. */
  def zDecimal(d1u: Long, d2u: Long): org.apache.spark.sql.types.Decimal = {
    val d1 = biased(d1u, "dimension 1")
    val d2 = biased(d2u, "dimension 2")
    val lower = interleaveInts(d1, d2)
    val upper = interleaveInts(d1 >>> 32, d2 >>> 32)
    val bi = java.math.BigInteger.valueOf(upper).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lower)))
    org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(bi), 38, 0)
  }

  /** morton.clj:81-91 morton-number-within-range?: per-dimension mask
    * compare — no decode needed, no false positives. */
  def withinRange(min: BigInt, max: BigInt, z: BigInt): Boolean =
    (min & D1Mask) <= (z & D1Mask) && (min & D2Mask) <= (z & D2Mask) &&
      (z & D1Mask) <= (max & D1Mask) && (z & D2Mask) <= (max & D2Mask)

  /** LITMAX/BIGMIN for a curve segment [start, end] (morton.clj:98-124,
    * decision tables p.76 of the paper): z values in (litmax, bigmin) are
    * OUTSIDE the query box spanned by (start, end). */
  def nextAddress(start: BigInt, end: BigInt): (BigInt, BigInt) = {
    // a degenerate single-point segment has no differing bit: the shift
    // arithmetic below would return a garbage (litmax, bigmin) pair far
    // outside the segment with no error (r9 review) — callers guard
    // (zRanges's s >= e check) and so must external consumers
    require(start != end, s"nextAddress needs start != end (got $start)")
    val firstDifferingBit = 128 - (start ^ end).bitLength
    val splitDimension = firstDifferingBit & 1
    val dimensionInheritMask = if (splitDimension == 0) D2Mask else D1Mask
    val commonMsbMask = (Mask128 << (128 - firstDifferingBit)) & Mask128
    val allCommonBitsMask = dimensionInheritMask | commonMsbMask
    // 1000 -> 1000000
    val otherDimensionAbove = BigInt(1) << (127 - firstDifferingBit)
    val bigmin = (allCommonBitsMask & start) | otherDimensionAbove
    // 0111 -> 0010101
    val otherDimensionBelow =
      (otherDimensionAbove - 1) & (if (splitDimension == 0) D1Mask else D2Mask)
    val litmax = (allCommonBitsMask & end) | otherDimensionBelow
    (litmax, bigmin)
  }

  /** morton.clj:126-148 morton-range-search: for an out-of-box curve
    * position z, the (litmax, bigmin) pair bracketing it — bigmin is
    * where a curve seek should jump forward to. */
  def rangeSearch(start0: BigInt, end0: BigInt, z: BigInt): (BigInt, BigInt) = {
    var start = start0
    var end = end0
    while (true) {
      if (end < z) return (end, BigInt(0))
      if (z < start) return (BigInt(0), start)
      val (litmax, bigmin) = nextAddress(start, end)
      if (bigmin < z) start = bigmin
      else if (z < litmax) end = litmax
      else return (litmax, bigmin)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Decompose the curve segment of a (d1, d2) box into ≤ maxRanges
    * contiguous z-ranges that COVER the box (greedy largest-gap-first
    * splitting via [[nextAddress]]): every in-box z stays covered, and
    * each split removes the biggest out-of-box gap, so the ranges tighten
    * fast. These become an OR-of-BETWEEN pruning predicate over a
    * z-sorted layout. */
  def zRanges(minD1: Long, maxD1: Long, minD2: Long, maxD2: Long,
      maxRanges: Int = 8): Seq[(BigInt, BigInt)] = {
    // same epoch bias as the z column's [[zDecimal]] kernel — box bounds
    // and stored z values must live on the SAME unsigned curve
    val zmin = interleave(biased(minD1, "min d1"), biased(minD2, "min d2"))
    val zmax = interleave(biased(maxD1, "max d1"), biased(maxD2, "max d2"))
    // worklist of ranges; split the one with the largest removable gap
    var ranges = List((zmin, zmax))
    var n = 1
    while (n < maxRanges) {
      val splits = ranges.map { case (s, e) =>
        if (s >= e) ((s, e), None)
        else {
          val (litmax, bigmin) = nextAddress(s, e)
          // only an interior gap both sides of which stay ordered is a
          // valid split of [s, e]
          if (litmax >= s && bigmin <= e && litmax < bigmin)
            ((s, e), Some((litmax, bigmin, bigmin - litmax)))
          else ((s, e), None)
        }
      }
      val best = splits.collect { case (r, Some((lm, bm, gap))) => (r, lm, bm, gap) }
        .sortBy(-_._4).headOption
      best match {
        case Some(((s, e), lm, bm, _)) =>
          ranges = ranges.flatMap { case (rs, re) =>
            if ((rs, re) == ((s, e))) List((rs, lm), (bm, re)) else List((rs, re))
          }
          n += 1
        case None => return ranges
      }
    }
    ranges
  }
}
