package graft.dedup

/** 64-bit SimHash (Charikar, "Similarity Estimation Techniques from
  * Rounding Algorithms", STOC 2002 — public algorithm) over a token
  * multiset: each token's 64-bit hash votes ±1 per bit position; the sign
  * of each accumulated vote becomes the fingerprint bit. Near-duplicate
  * documents land within small Hamming distance.
  */
object SimHash {
  /** FNV-1a 64-bit string hash — stable, dependency-free. */
  def fnv1a64(s: CharSequence): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(tokens: Iterator[String]): Long = {
    val votes = new Array[Int](64)
    while (tokens.hasNext) {
      val h = fnv1a64(tokens.next())
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
