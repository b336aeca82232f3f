package graft.text

import scala.collection.mutable.ArrayBuffer

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003 —
  * public algorithm). Rolling Rabin-Karp hashes over character k-grams;
  * one minimum per sliding window of w hashes, deduplicated by position
  * rule, yields a compact fingerprint set robust to local edits.
  */
object Winnow {
  final val Base = 1000003L
  final val KDefault = 5
  final val WDefault = 4

  /** Rolling k-gram hashes of s (length n-k+1), 64-bit wrapping arithmetic. */
  def kgramHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array.empty
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= Base; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    out(0) = h
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * pow) * Base + s.charAt(i)
      out(i - k + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed fingerprint: the rightmost-minimum of each w-window of the
    * k-gram hash sequence, recorded once per distinct selection position.
    */
  def fingerprint(s: String, k: Int = KDefault, w: Int = WDefault): Array[Long] = {
    val hs = kgramHashes(s, k)
    if (hs.isEmpty) return Array.empty
    if (hs.length <= w) return Array(hs.min)
    val out = new ArrayBuffer[Long]
    var lastPos = -1
    var start = 0
    while (start + w <= hs.length) {
      var minIdx = start
      var j = start + 1
      while (j < start + w) {
        if (hs(j) <= hs(minIdx)) minIdx = j // rightmost minimum
        j += 1
      }
      if (minIdx != lastPos) {
        out += hs(minIdx)
        lastPos = minIdx
      }
      start += 1
    }
    out.toArray
  }
}
