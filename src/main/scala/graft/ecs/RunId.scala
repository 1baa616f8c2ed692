package graft.ecs

/** Time-sortable run-id minting — the run/simulation management sugar
  * the reference gets from ULIDs (store.py:32-44 mints a ULID and a
  * created-at timestamp at store init; run registries and object-store
  * listings then sort by id = by creation time).
  *
  * 64-bit layout: 44 high bits of unix millis, 20 low bits of entropy,
  * encoded as 13 Crockford-base32 chars. Fixed width + an ascending
  * alphabet make LEXICOGRAPHIC order equal NUMERIC order, and the time
  * field in the high bits makes numeric order equal CREATION order —
  * the two ULID properties that matter. Unlike a ULID, the clock and
  * entropy are caller-supplied (a logical clock and a deterministic
  * seed), so every minted id is exactly replayable by an oracle — the
  * engine never reads a wall clock inside a query.
  */
object RunId {
  val Alphabet = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
  val TimeBits = 44
  val EntropyBits = 20
  val Chars = 13 // 13 × 5 = 65 bits; the top character carries 4 bits

  def pack(millis: Long, entropy: Long): Long = {
    require(millis >= 0 && millis < (1L << TimeBits), s"millis out of range: $millis")
    (millis << EntropyBits) | (entropy & ((1L << EntropyBits) - 1))
  }

  def encode(id: Long): String = {
    val sb = new StringBuilder(Chars)
    var i = Chars - 1
    while (i >= 0) { sb.append(Alphabet.charAt(((id >>> (i * 5)) & 31L).toInt)); i -= 1 }
    sb.toString
  }

  def mint(millis: Long, entropy: Long): String = encode(pack(millis, entropy))

  def decode(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc << 5) | Alphabet.indexOf(c).toLong)

  def decodeMillis(s: String): Long = decode(s) >>> EntropyBits

  /** Deterministic entropy from the simulation name and a sequence
    * number: FNV-1a folded to [[EntropyBits]].
    */
  def entropyFor(simulation: String, seq: Int): Long = {
    val bytes = s"$simulation#$seq".getBytes("UTF-8")
    var h = 0xcbf29ce484222325L
    bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    (h ^ (h >>> 32)) & ((1L << EntropyBits) - 1)
  }
}
