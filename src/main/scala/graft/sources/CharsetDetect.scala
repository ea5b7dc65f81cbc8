package graft.sources

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** Charset detection for raw-text ingest — reference parity for CorpusAid's
  * never-fail decode path (charset-normalizer in the Python report path,
  * reference src/CorpusAid.py:1786-1793; chardetng in the Rust preview twin,
  * rust_preview/src/lib.rs:43-57). Built from scratch on the standard
  * detection ladder those libraries implement:
  *
  *   1. BOM sniffing (UTF-8 / UTF-16LE / UTF-16BE / UTF-32)
  *   2. zero-byte parity heuristic for BOM-less UTF-16 (ASCII-heavy UTF-16
  *      has ~50% NUL bytes concentrated on one parity; NULs almost never
  *      appear in legitimate single-byte text)
  *   3. strict UTF-8 validation (a stream that validates IS UTF-8 — the
  *      probability of non-trivial windows-1252 text validating is
  *      negligible, the same argument charset-normalizer makes)
  *   4. windows-1252 fallback (superset of latin-1 on the printable range —
  *      every byte decodes, matching the reference's errors-tolerant mode)
  *
  * Decoding always REPLACEs malformed sequences, so the contract is total:
  * any byte stream decodes to a string, like the reference's
  * `errors="replace"` (src/CorpusAid.py:141).
  */
object CharsetDetect {

  final case class Detected(charset: String, bomBytes: Int)

  /** windows-1252 defines 0x80-0x9F as printable (unlike latin-1 control
    * chars); the JVM ships the charset. */
  val Fallback = "windows-1252"

  def detect(bytes: Array[Byte]): Detected = {
    if (bytes == null || bytes.isEmpty) return Detected("UTF-8", 0)
    // 1. BOMs (longest first: UTF-32 BOMs contain the UTF-16 ones)
    if (bytes.length >= 4 && bytes(0) == -1 && bytes(1) == -2 &&
      bytes(2) == 0 && bytes(3) == 0) return Detected("UTF-32LE", 4)
    if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      bytes(2) == -2 && bytes(3) == -1) return Detected("UTF-32BE", 4)
    if (bytes.length >= 3 && bytes(0) == -17 && bytes(1) == -69 &&
      bytes(2) == -65) return Detected("UTF-8", 3)
    if (bytes.length >= 2 && bytes(0) == -1 && bytes(1) == -2)
      return Detected("UTF-16LE", 2)
    if (bytes.length >= 2 && bytes(0) == -2 && bytes(1) == -1)
      return Detected("UTF-16BE", 2)

    // 2. BOM-less UTF-16: NUL parity over a bounded prefix
    val n = math.min(bytes.length, 8192)
    var zerosEven = 0
    var zerosOdd = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0) { if (i % 2 == 0) zerosEven += 1 else zerosOdd += 1 }
      i += 1
    }
    val half = math.max(1, n / 2)
    // multiply, don't integer-divide: `zerosEven < zerosOdd / 4` rounds
    // the bound to 0 for short files (a 3-char BOM-less UTF-16 doc has
    // zerosOdd = 3, 3/4 == 0 → undetectable, and the NUL-riddled bytes
    // would then pass strict UTF-8 validation as mojibake)
    if (zerosOdd.toDouble / half > 0.3 && zerosEven * 4 < zerosOdd)
      return Detected("UTF-16LE", 0) // text bytes on even positions
    if (zerosEven.toDouble / half > 0.3 && zerosOdd * 4 < zerosEven)
      return Detected("UTF-16BE", 0)

    // 3. strict UTF-8 validation over the whole stream
    if (validUtf8(bytes)) Detected("UTF-8", 0)
    // 4. single-byte fallback
    else Detected(Fallback, 0)
  }

  /** Strict UTF-8 well-formedness per RFC 3629 (incl. overlong/surrogate
    * rejection via the continuation-range table). */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= n || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf // <= U+10FFFF
        if (c1 < lo || c1 > hi ||
          (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80) return false
        i += 4
      } else return false
    }
    true
  }

  /** Total decode: detect, strip the BOM, decode with REPLACE on malformed
    * input. Never throws. */
  def decode(bytes: Array[Byte]): (String, String) = {
    if (bytes == null) return ("", "UTF-8")
    val d = detect(bytes)
    val cs =
      try Charset.forName(d.charset)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    val buf = java.nio.ByteBuffer.wrap(bytes, d.bomBytes, bytes.length - d.bomBytes)
    (dec.decode(buf).toString, d.charset)
  }
}
