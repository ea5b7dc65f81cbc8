package graft.dedup

import java.util.Locale

import graft.gen.TranscriptGen.mix64

/** Shingling + hashing primitives shared by the dedup family. All hashing is
  * seeded splitmix64 over the shingle's chars — deterministic across JVMs and
  * partitionings. */
object Shingles {

  /** Lowercase, collapse non-alphanumerics to single spaces — the canonical
    * form near-dup comparisons are done in. */
  def canonical(text: String): String = {
    val lower = text.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var prevSpace = true
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (Character.isLetterOrDigit(c)) { sb.append(c); prevSpace = false }
      else if (!prevSpace) { sb.append(' '); prevSpace = true }
      i += 1
    }
    sb.toString.trim
  }

  /** 64-bit hash of s[from, until). */
  def hashRange(s: String, from: Int, until: Int, seed: Long): Long = {
    var h = seed ^ 0x9e3779b97f4a7c15L
    var i = from
    while (i < until) {
      h = mix64(h ^ s.charAt(i))
      i += 1
    }
    h
  }

  /** Character k-shingle hash set of the canonical text (distinct). */
  def charShingles(text: String, k: Int = 5): Array[Long] = {
    val t = canonical(text)
    if (t.length < k) {
      if (t.isEmpty) Array.empty else Array(hashRange(t, 0, t.length, 1L))
    } else {
      val set = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i + k <= t.length) {
        set.add(hashRange(t, i, i + k, 1L))
        i += 1
      }
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      java.util.Arrays.sort(out)
      out
    }
  }

  /** Word n-gram shingle hash set of the canonical text (distinct). */
  def wordShingles(text: String, n: Int = 3): Array[Long] = {
    val words = canonical(text).split(' ')
    if (words.length == 0 || words(0).isEmpty) return Array.empty
    val set = new java.util.HashSet[java.lang.Long]()
    if (words.length < n) {
      var h = 2L
      words.foreach(w => h = mix64(h ^ hashRange(w, 0, w.length, 2L)))
      set.add(h)
    } else {
      var i = 0
      while (i + n <= words.length) {
        var h = 2L
        var j = i
        while (j < i + n) { h = mix64(h ^ hashRange(words(j), 0, words(j).length, 2L)); j += 1 }
        set.add(h)
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    java.util.Arrays.sort(out)
    out
  }

  /** Exact Jaccard over two SORTED hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }
}
