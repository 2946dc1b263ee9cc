package graft.text

/**
 * 60-bit SimHash kernel (near-dup fingerprinting for web corpora).
 *
 * Width rationale: a 16-bit simhash at Hamming <= 3 is so unselective
 * that the *output* of the pair-join is quadratic in corpus size (at
 * 6k docs it already emits 2.3M "near-dup" pairs); 60 bits keeps the
 * per-band blocking buckets tiny and the match set meaningful at any
 * scale. 60 (not 64) so the signature and every per-token hash stay
 * positive in a signed 64-bit long — reproducible in DuckDB BIGINT SQL
 * (the oracle re-derives the identical signature from md5 hex chars).
 *
 * Token hash h60 = first 15 hex nibbles of md5(token), big-endian.
 * Signature bit b = 1 iff sum over token OCCURRENCES of
 * (+1 if bit b of h60(token) else -1) is strictly positive.
 * Tokenization = split on single space, trailing/empty tokens kept —
 * exactly Spark's `split(text, " ")` / DuckDB's `string_split`.
 *
 * Pure Scala: called from generated code (one kernel call per row
 * replaces 60 interpreted higher-order-function passes over the token
 * array).
 */
object SimHash {
  val Bits = 60
  val BandBits = 15 // 4 bands x 15 bits; Hamming <= 3 => >= 1 equal band
  val NumBands = 4

  /** First 15 hex nibbles of md5(token) as a non-negative long. */
  def h60(token: String): Long = {
    val d = graft.geo.GeoTag.md5Bytes(token)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 60-bit simhash of a space-tokenized text. Round-6: tokens are
    * COUNTED first so md5 runs once per DISTINCT token and the 60-bit
    * vote loop adds the count (votes are integer sums — identical at
    * any iteration order, bit-identical to the one-occurrence-at-a-time
    * formulation; real corpora repeat tokens heavily, so this trades a
    * small hash map for most of the digest work). */
  def sig60(text: String): Long = {
    val toks = text.split(" ", -1) // keep empties: split(text," ") parity
    val counts = new java.util.HashMap[String, Integer](toks.length * 2)
    var t = 0
    while (t < toks.length) {
      counts.merge(toks(t), 1, (a, b) => a + b)
      t += 1
    }
    val votes = new Array[Int](Bits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val en = it.next()
      val h = h60(en.getKey)
      val c: Int = en.getValue
      var b = 0
      while (b < Bits) {
        if (((h >>> b) & 1L) == 1L) votes(b) += c else votes(b) -= c
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
