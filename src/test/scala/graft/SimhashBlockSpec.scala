package graft

import org.scalatest.funsuite.AnyFunSuite

/** The C3 candidate filter's completeness contract: the Manku
  * 6-piece/15-pair index must admit EVERY signature pair at hamming
  * distance ≤ 3 (so the query's output equals the oracle's 4-block
  * formulation exactly), and the d = 3 bound is tight for the piece
  * count — 5 flips across 5 distinct pieces leave no clean pair.
  */
class SimhashBlockSpec extends AnyFunSuite {

  /** The exact piece layout dedup_simhash keys on: 4×11 + 2×10 bits. */
  private def pieces(sig: Long): Array[Long] = Array(
    (sig >> 0) & 2047, (sig >> 11) & 2047, (sig >> 22) & 2047,
    (sig >> 33) & 2047, (sig >> 44) & 1023, (sig >> 54) & 1023)

  private def sharesPair(a: Long, b: Long): Boolean = {
    val (pa, pb) = (pieces(a), pieces(b))
    (for { p <- 0 until 6; q <- (p + 1) until 6 }
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
      val back = (p(0) & 2047) | ((p(1) & 2047) << 11) | ((p(2) & 2047) << 22) |
        ((p(3) & 2047) << 33) | ((p(4) & 1023) << 44) | ((p(5) & 1023) << 54)
      assert(back == a, f"piece layout must cover all 64 bits: $a%x -> $back%x")
    }
  }

  test("d = 3 is the tight bound: 5 flips in 5 distinct pieces miss") {
    // flip the low bit of pieces 0..4 — only piece 5 stays clean, so
    // no clean PAIR exists and the candidate filter (correctly, by
    // contract) does not admit the pair
    val a = 0L
    val b = (1L << 0) ^ (1L << 11) ^ (1L << 22) ^ (1L << 33) ^ (1L << 44)
    assert(java.lang.Long.bitCount(a ^ b) == 5)
    assert(!sharesPair(a, b))
  }
}
