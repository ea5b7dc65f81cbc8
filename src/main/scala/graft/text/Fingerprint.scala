package graft.text

import graft.dedup.Shingles
import graft.gen.TranscriptGen.mix64

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): rolling k-gram hashes over the canonical text, keep the
  * minimum hash in every sliding window of w — a position-robust fingerprint
  * set whose overlap estimates local similarity (unlike MinHash's global
  * Jaccard). */
object Fingerprint {

  /** Rolling 64-bit hashes of all k-grams (Rabin-Karp style with a fixed
    * base over code units, then splitmix-finalized for dispersion). */
  def rollingHashes(text: String, k: Int): Array[Long] = {
    val t = Shingles.canonical(text)
    if (t.length < k) return if (t.isEmpty) Array.empty else Array(mix64(t.hashCode.toLong))
    val B = 1000003L
    var pow = 1L
    var i = 0
    while (i < k - 1) { pow *= B; i += 1 }
    val out = new Array[Long](t.length - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + t.charAt(i); i += 1 }
    out(0) = mix64(h)
    i = k
    while (i < t.length) {
      h = (h - t.charAt(i - k) * pow) * B + t.charAt(i)
      out(i - k + 1) = mix64(h)
      i += 1
    }
    out
  }

  /** Winnowing: minimum hash per window of w consecutive k-gram hashes,
    * deduplicated, sorted (deterministic). */
  def winnow(text: String, k: Int = 5, w: Int = 4): Array[Long] = {
    val hs = rollingHashes(text, k)
    if (hs.isEmpty) return Array.empty
    if (hs.length <= w) return Array(hs.min)
    val picked = new java.util.TreeSet[java.lang.Long]()
    // monotonic deque for sliding-window minimum, O(n)
    val deque = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < hs.length) {
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) picked.add(hs(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Long](picked.size)
    val it = picked.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  /** Containment of a's fingerprints in b's (plagiarism-style score). */
  def containment(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / a.length
  }
}
