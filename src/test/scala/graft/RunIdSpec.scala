package graft

import graft.ecs.RunId
import org.scalatest.funsuite.AnyFunSuite

/** RunId codec laws: round-trip, fixed width, and the ULID property
  * (lexicographic order == numeric order == time order).
  */
class RunIdSpec extends AnyFunSuite {

  test("mint/decode round-trips time and entropy") {
    for (ms <- Seq(0L, 1L, 1700000000000L, (1L << RunId.TimeBits) - 1);
         e <- Seq(0L, 1L, 0xFFFFFL)) {
      val id = RunId.mint(ms, e)
      assert(id.length == RunId.Chars)
      assert(RunId.decodeMillis(id) == ms)
      assert((RunId.decode(id) & ((1L << RunId.EntropyBits) - 1)) == e)
    }
  }

  test("entropy folds to the field width and never crosses time bits") {
    for (seq <- 0 until 50) {
      val e = RunId.entropyFor("sim_x", seq)
      assert(e >= 0 && e < (1L << RunId.EntropyBits))
    }
  }

  test("lexicographic order equals mint-time order across entropy") {
    // later millis must sort later REGARDLESS of entropy values
    val ids = for (k <- 0 until 100) yield
      RunId.mint(1700000000000L + k * 7L, RunId.entropyFor("s", 99 - k))
    assert(ids == ids.sorted)
    assert(ids.distinct.size == ids.size)
  }

  test("millis out of the 44-bit range is rejected") {
    intercept[IllegalArgumentException](RunId.mint(1L << RunId.TimeBits, 0L))
    intercept[IllegalArgumentException](RunId.mint(-1L, 0L))
  }
}
