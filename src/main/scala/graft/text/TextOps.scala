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

  // Hash definitions (h16 = first 4 md5 hex nibbles, 32-bit words = md5
  // byte words) live in TextKernels / SimHash as codegen kernels; the
  // DuckDB oracle re-derives them in SQL (Oracle.h4/h32FromMd/h60FromMd).

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
