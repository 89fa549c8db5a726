package graft.functions

/** Exact fixed-point binary logarithm — the engine-portable cost scale
  * for likelihood maximization ([[UnigramLm]]): transcendental log is
  * not correctly-rounded cross-engine (the PMI/perplexity caveat
  * throughout the repo), but THIS bit-specified shift-and-square
  * algorithm is pure integer arithmetic any engine replays exactly —
  * the q172 "portable arithmetic over portable floats" convention
  * applied to log2 itself.
  *
  * `ilog2e16(x)` ≈ 2^16 · log2(x), x ≥ 1, by the classic mantissa
  * -squaring method (Majithia & Levan 1973): normalize x to a 32-bit
  * mantissa m ∈ [2^31, 2^32) (truncating low bits when x ≥ 2^32 — the
  * documented truncation BOTH replicas perform), then 16 rounds of
  * m ← m² with a defined truncating renormalization; each round's
  * overflow bit is the next fraction bit. Max absolute error vs the
  * real 2^16·log2 is a few ULP — irrelevant: the value is DEFINED by
  * this algorithm, not by its distance to the transcendental, and both
  * engines compute the same longs.
  */
object IntLog2 {

  private val Pow63 = BigInt(1) << 63

  def ilog2e16(x: Long): Long = {
    require(x >= 1, s"ilog2e16 needs x >= 1, got $x")
    val msb = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m: BigInt =
      if (msb <= 31) BigInt(x) << (31 - msb) else BigInt(x) >> (msb - 31)
    var frac = 0L
    var i = 0
    while (i < 16) {
      val sq = m * m
      if (sq >= Pow63) { frac |= 1L << (15 - i); m = sq >> 32 }
      else m = sq >> 31
      i += 1
    }
    (msb.toLong << 16) + frac
  }
}
