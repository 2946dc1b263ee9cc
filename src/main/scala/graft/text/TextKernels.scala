package graft.text

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.geo.GeoTag

/**
 * Static kernels behind the text expressions (called from generated
 * code). Each replaces an interpreted higher-order-function pipeline
 * (transform/aggregate/element_at per element, boxing per step) with
 * one tight loop per row — the "custom codegen Expression beats
 * composed HOFs" tier for the per-token hot paths.
 *
 * Hash definitions are md5-hex-prefix based and EXACTLY mirror the
 * DuckDB oracle SQL (Oracle.h4/h32FromMd/h60FromMd): correctness gate
 * checks them bit-for-bit.
 */
object TextKernels {

  /** Split on single space, KEEPING empty tokens — the exact semantics
    * of Spark's split(text, " ") / DuckDB's string_split. */
  def splitTokens(text: String): Array[String] = text.split(" ", -1)

  /** Word-k-gram shingles joined by ' '; fewer than k tokens -> empty. */
  def shingles(text: UTF8String, k: Int): GenericArrayData = {
    val toks = splitTokens(text.toString)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Full per-document MinHash signature in ONE kernel pass (round-6):
    * tokenize, build the k-shingles, and take the numHashes 32-bit
    * minima directly — md5 runs once per DISTINCT in-document shingle
    * and salt (min is idempotent over duplicates, so skipping repeats
    * is exact), and the whole explode -> md5-projection -> groupBy-min
    * SHUFFLE of the (id, shingle) occurrence relation disappears from
    * the minhash pipeline. Hash family and index order are EXACTLY
    * [[md5Words]] over `shingle` / `shingle#salt`: sig[s*4+w] = word w
    * of md5(salted shingle) — bit-identical to the aggregated path
    * (DedupAnnSpec pins the parity). Fewer than k tokens -> EMPTY array
    * (the aggregated path emits no row; callers filter size > 0). */
  def minhashSigs(text: UTF8String, k: Int, numHashes: Int): GenericArrayData = {
    val toks = splitTokens(text.toString)
    val n = toks.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val nSalts = numHashes / 4
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[String](n * 2)
    val sb = new java.lang.StringBuilder(48)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        var s = 0
        while (s < nSalts) {
          val d = GeoTag.md5Bytes(if (s == 0) sh else sh + "#" + s)
          var w = 0
          while (w < 4) {
            val o = w * 4
            val h = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
              ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
            val idx = s * 4 + w
            if (h < mins(idx)) mins(idx) = h
            w += 1
          }
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.map(x => x: Any))
  }

  /** The 4 big-endian unsigned 32-bit words of md5(s) — ONE digest for
    * four independent 32-bit hashes (minhash's hash family; word 0 ==
    * the oracle's h32FromMd(md5_hex, 0), word i == offset 8i). */
  def md5Words(s: UTF8String): GenericArrayData = {
    val d = GeoTag.md5Bytes(s.toString)
    val out = new Array[Any](4)
    var w = 0
    while (w < 4) {
      val o = w * 4
      out(w) = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Per-language marker-vote counts in TextOps.langMarkers order —
    * one tokenize pass instead of one interpreted filter() HOF per
    * marker (12 passes). Counts token OCCURRENCES equal to a marker. */
  def langScores(text: UTF8String): GenericArrayData = {
    val markers = TextOps.langMarkers
    val out = new Array[Long](markers.length)
    val toks = splitTokens(text.toString)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      var l = 0
      while (l < markers.length) {
        val ms = markers(l)._2
        var m = 0
        while (m < ms.length) {
          if (ms(m) == tok) out(l) += 1
          m += 1
        }
        l += 1
      }
      t += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }

  /** Position-weighted rolling fingerprint (TextOps.fingerprint
    * parity): sum over tokens of h16(token) * (1-based index), mod
    * 2147483647. h16 = first 4 hex nibbles of md5 = first 2 bytes. */
  def fingerprint(text: UTF8String): Long = {
    val toks = splitTokens(text.toString)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      val d = GeoTag.md5Bytes(toks(i))
      val h16 = ((d(0) & 0xffL) << 8) | (d(1) & 0xffL)
      // reduce mod p every step: the raw sum grows ~ 2^15 * n^2 / 2 and
      // would wrap Long (negative fingerprint) past ~2e7 tokens; each
      // term is < 2^16 * 2^31 so the running value never overflows, and
      // modular arithmetic makes the result identical to mod-at-end
      acc = (acc + h16 * ((i + 1L) % 2147483647L)) % 2147483647L
      i += 1
    }
    acc
  }
}
