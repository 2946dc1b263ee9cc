package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/**
 * Deduplication family for web-scale corpora (builder mandate):
 * exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band ->
 * bucket-join -> exact-Jaccard verify), SimHash (band-join on signature
 * nibbles, exact Hamming verify), and exact n-gram-Jaccard via an
 * inverted shingle index.
 *
 * Scale notes: every pipeline is candidate-generation-by-equi-join (no
 * all-pairs product anywhere); the verify step touches only candidate
 * pairs. All hashes are md5-derived (TextOps.h16/h32) so the DuckDB
 * oracle reproduces every signature exactly. Tiebreaks are explicit
 * (min doc_id keeper, a<b pair order) — deterministic at any
 * parallelism.
 */
object Dedup {

  /** Exact dedup: group by content hash, keep min id.
    * Returns (fp, n_dups, keeper). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper"))

  /** Distinct (id, shingle) pairs. */
  def docShingles(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
        explode(shingles(col(textCol), k)).as("shingle"))
      .distinct()

  /** MinHash signatures: numHashes 32-bit minima of md5(shingle#i). */
  def minhash(sh: DataFrame, numHashes: Int = 8): DataFrame = {
    val hashCols = (0 until numHashes).map(i =>
      min(h32(concat(col("shingle"), lit("#"), lit(i)))).as(s"m$i"))
    sh.groupBy("id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** LSH band keys: rowsPerBand signature values concatenated. Emits
    * (id, band, key). */
  def bands(sig: DataFrame, numHashes: Int = 8,
            rowsPerBand: Int = 2): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until rowsPerBand)
          .map(r => col(s"m${b * rowsPerBand + r}")): _*).as("key"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Candidate pairs: ids sharing any band bucket, a < b, distinct. */
  def candidates(bandDf: DataFrame): DataFrame = {
    val a = bandDf.alias("a"); val b = bandDf.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over distinct shingle sets for given pairs. */
  def jaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val common = pairs
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.select(col("id").as("id_a"), col("n").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")).cast("double"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by exact
    * Jaccard >= threshold. Returns (id_a, id_b, common, n_a, n_b,
    * jaccard). */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 threshold: Double = 0.4, numHashes: Int = 8,
                 rowsPerBand: Int = 2, k: Int = 3): DataFrame = {
    val sh = docShingles(df, idCol, textCol, k)
    val cand = candidates(bands(minhash(sh, numHashes), numHashes, rowsPerBand))
    jaccard(cand, sh).filter(col("jaccard") >= threshold)
  }

  /** 16-bit SimHash: bit b set iff sum over token OCCURRENCES of
    * (+1 if bit b of h16(token) else -1) is positive. */
  def simhash16(text: Column): Column = {
    val toks = tokens(text)
    val bitCols = (0 until 16).map { b =>
      val contrib = transform(toks, x =>
        when(shiftright(h16(x).cast("long"), b).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L))
      val w = aggregate(contrib, lit(0L), (acc, v) => acc + v)
      when(w > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** SimHash near-dup: band-join on the 4 signature nibbles (Hamming
    * <= 3 over 16 bits guarantees >= 1 identical nibble — standard
    * pigeonhole blocking), verify exact Hamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash16(col(textCol)).as("sig"))
    val nib = sig.select(col("id"), col("sig"),
        explode(array((0 until 4).map(n => struct(lit(n).as("band"),
          shiftright(col("sig"), n * 4).bitwiseAND(15L).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = nib.alias("a"); val b = nib.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram-Jaccard near-dup via the inverted shingle index
    * (no LSH): every pair sharing >= 1 shingle is scored exactly. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 3): DataFrame = {
    val sh = docShingles(df, idCol, textCol, k)
    val a = sh.alias("a"); val b = sh.alias("b")
    val pairs = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    jaccard(pairs, sh).filter(col("jaccard") >= threshold)
  }
}
