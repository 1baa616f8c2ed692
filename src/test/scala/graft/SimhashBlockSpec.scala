package graft

import org.scalatest.funsuite.AnyFunSuite

/** The C3 candidate filter's completeness contract: the Manku
  * 5-piece/10-pair index must admit EVERY signature pair at hamming
  * distance ≤ 3 (so the query's output equals the oracle's block
  * formulation exactly), and the d = 3 bound is tight for the piece
  * count — 4 flips across 4 distinct pieces leave no clean pair.
  *
  * (r10 layout change: 6 pieces/15 tables of 21-22-bit keys → 5
  * pieces/10 tables of ≤ 26-bit keys. Same pigeonhole argument — ≤ 3
  * flipped pieces out of 5 leave ≥ 2 intact, and any 2 intact pieces
  * form an indexed pair — with 2/3 the explode volume and ~16-32×
  * sparser keys, pushing the cap-transition regime a decade out.)
  */
class SimhashBlockSpec extends AnyFunSuite {

  /** The exact piece layout dedup_simhash keys on: 4×13 + 1×12 bits. */
  private def pieces(sig: Long): Array[Long] = Array(
    (sig >> 0) & 8191, (sig >> 13) & 8191, (sig >> 26) & 8191,
    (sig >> 39) & 8191, (sig >> 52) & 4095)

  private def sharesPair(a: Long, b: Long): Boolean = {
    val (pa, pb) = (pieces(a), pieces(b))
    (for { p <- 0 until 5; q <- (p + 1) until 5 }
      yield pa(p) == pb(p) && pa(q) == pb(q)).exists(identity)
  }

  test("every hamming <= 3 pair shares a clean piece pair (completeness)") {
    val rnd = new scala.util.Random(12345)
    (0 until 50000).foreach { _ =>
      val a = rnd.nextLong()
      val d = rnd.nextInt(4) // 0..3 flips — inside the contract
      val b = (0 until d).foldLeft(a)((x, _) => x ^ (1L << rnd.nextInt(64)))
      assert(sharesPair(a, b),
        f"missed pair at hamming ${java.lang.Long.bitCount(a ^ b)}: $a%x vs $b%x")
    }
  }

  test("the pieces reconstruct the signature (no bit is unindexed)") {
    val rnd = new scala.util.Random(99)
    (0 until 1000).foreach { _ =>
      val a = rnd.nextLong()
      val p = pieces(a)
      val back = (p(0) & 8191) | ((p(1) & 8191) << 13) | ((p(2) & 8191) << 26) |
        ((p(3) & 8191) << 39) | ((p(4) & 4095) << 52)
      assert(back == a, f"piece layout must cover all 64 bits: $a%x -> $back%x")
    }
  }

  test("d = 3 is the tight bound: 4 flips in 4 distinct pieces miss") {
    // flip the low bit of pieces 0..3 — only piece 4 stays clean, so
    // no clean PAIR exists and the candidate filter (correctly, by
    // contract) does not admit the pair
    val a = 0L
    val b = (1L << 0) ^ (1L << 13) ^ (1L << 26) ^ (1L << 39)
    assert(java.lang.Long.bitCount(a ^ b) == 4)
    assert(!sharesPair(a, b))
  }

  test("3 flips concentrated in 3 distinct pieces still collide") {
    // the worst d = 3 spread for a 5-piece layout: exactly 2 intact
    // pieces remain and exactly ONE table (their pair) catches it
    val a = 0L
    val b = (1L << 0) ^ (1L << 13) ^ (1L << 26)
    assert(java.lang.Long.bitCount(a ^ b) == 3)
    assert(sharesPair(a, b))
  }
}
