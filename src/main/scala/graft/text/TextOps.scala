package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines
 * (builder mandate, beyond the reference's surface): tokenization,
 * portable hashing, language-ID scoring, quality features, document
 * fingerprints. Everything is a codegen'd Column expression; every hash
 * is md5-hex + ascii arithmetic so the DuckDB oracle replicates results
 * bit-for-bit (same trick as graft.geo.GeoTag).
 */
object TextOps {

  /** Whitespace tokens (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  private def hexv(c: Column): Column =
    when(c.between("0", "9"), ascii(c) - 48).otherwise(ascii(c) - 87)

  /** 16-bit hash of a string: first 4 hex chars of md5 (GeoTag.h4(md,0)
    * parity — the SQL oracle uses the identical CASE/ascii form). */
  def h16(s: Column): Column = {
    val md = md5(s.cast("binary"))
    hexv(substring(md, 1, 1)) * 4096 + hexv(substring(md, 2, 1)) * 256 +
      hexv(substring(md, 3, 1)) * 16 + hexv(substring(md, 4, 1))
  }

  /** 32-bit hash: first 8 hex chars of md5. */
  def h32(s: Column): Column =
    h16(s).cast("long") * 65536L +
      (hexv(substring(md5(s.cast("binary")), 5, 1)) * 4096 +
        hexv(substring(md5(s.cast("binary")), 6, 1)) * 256 +
        hexv(substring(md5(s.cast("binary")), 7, 1)) * 16 +
        hexv(substring(md5(s.cast("binary")), 8, 1))).cast("long")

  /** Word-k-gram shingles (k consecutive tokens joined by ' ');
    * fewer than k tokens -> empty array. One codegen'd kernel call
    * (TextKernels.shingles) per row. */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.shingles_k(text, k)

  /** Language-ID by marker-token votes: argmax of per-language marker
    * hits, ties broken by list order (deterministic). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "tablish" -> Seq("table", "row", "scan", "column"),
    "sparkish" -> Seq("spark", "agg", "join", "batch"),
    "speedish" -> Seq("fast", "slow", "small", "value"))

  def langScores(text: Column): Seq[(String, Column)] = {
    // single kernel pass over the tokens (CSE collapses the repeated
    // lang_scores subtree within one projection)
    val arr = graft.functions.lang_scores(text)
    langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      lang -> element_at(arr, i + 1)
    }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    // strict argmax in list order: pick first language whose score
    // beats all later ones and is >= all earlier ones
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown"): Column) { case ((lang, s), elseCol) =>
      when(s === best && best > 0, lit(lang)).otherwise(elseCol)
    }
  }

  /** Quality features (exact integer arithmetic; ratios derived by one
    * final division so they're reproducible everywhere). */
  def nTokens(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  def nDigits(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("long")

  /** Mean token length = (len - (n-1)) / n from exact ints. */
  def meanTokenLen(text: Column): Column =
    (length(text).cast("double") - (nTokens(text) - 1).cast("double")) /
      nTokens(text).cast("double")

  /** BPE-ish token count: letter runs, digit runs, other non-space. */
  def nBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
      .cast("long")

  /** Position-weighted rolling fingerprint:
    * sum(h16(token_i) * i) mod 2147483647 (1-based i; exact in Long).
    * One codegen'd kernel call (TextKernels.fingerprint) per row. */
  def fingerprint(text: Column): Column =
    graft.functions.doc_fingerprint(text)
}
