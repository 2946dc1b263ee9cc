package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (builder mandate):
 * brute-force cosine top-k as the exactness baseline, and a
 * random-hyperplane LSH-bucketed variant as the scale path.
 *
 * Exactness/determinism trick: embeddings are QUANTIZED to integers
 * (trunc(x * 10000)) so dot products and norms are exact Long sums —
 * cosine is then one closed-form double division, identical at any
 * parallelism and reproducible by the DuckDB oracle. The LSH
 * hyperplanes are integer-valued from a fixed LCG formula — signatures
 * are exact too.
 *
 * Scale shape: brute-force = broadcast(queries) x corpus with partial
 * top-k per partition (Window row_number after a cheap codegen'd dot);
 * LSH = equi-join on the signature (no cross product).
 */
object Ann {

  /** Quantize a float array column to Long (trunc toward zero). */
  def quantize(v: Column): Column =
    transform(v, x => (x.cast("double") * 10000.0).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine from quantized vectors (one double division at the end).
    * try_divide: a zero vector yields NULL, not an ANSI error. */
  def cosineQ(a: Column, b: Column): Column =
    try_divide(dotQ(a, b).cast("double"),
      sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Brute-force cosine top-k: queries (qid, qv) x corpus (id, v).
    * Returns (qid, rank, id, cos) with rank 1..k; ties -> lower id. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("cos", cosineQ(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }

  /** Integer hyperplane weights: LCG of (plane, dim) — single source of
    * truth for both the Spark plan and the generated oracle SQL. */
  val NumPlanes = 8
  def planeWeight(p: Int, i: Int): Long =
    ((1103515245L * (p * 64 + i) + 12345L) % 65536L) - 32768L

  def planeArray(p: Int, dim: Int): Seq[Long] =
    (0 until dim).map(i => planeWeight(p, i))

  /** 8-bit signature: bit p set iff dot(plane_p, qv) > 0 (exact ints). */
  def lshSignature(qv: Column, dim: Int): Column =
    (0 until NumPlanes).map { p =>
      val w = array(planeArray(p, dim).map(lit): _*)
      when(dotQ(w, qv) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-dup pairs (the dedup-family member over
    * vectors): block by full LSH signature (same-bucket self-join — no
    * cross product), verify exact cosine >= threshold. Deterministic
    * contract: all same-signature pairs with cosine >= t, a < b. */
  def cosineNearDup(corpus: DataFrame, dim: Int,
                    threshold: Double): DataFrame = {
    val c = corpus.withColumn("sig", lshSignature(col("v"), dim))
    val a = c.alias("a"); val b = c.alias("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosineQ(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** LSH-bucketed ANN: candidates share the full signature bucket; each
    * query returns its exact top-k within the bucket (a recall-bounded
    * approximation of cosineTopK — the deterministic contract is
    * "top-k among same-signature corpus vectors"). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int,
              k: Int): DataFrame = {
    val q = queries.withColumn("sig", lshSignature(col("qv"), dim))
    val c = corpus.withColumn("sig", lshSignature(col("v"), dim))
    val scored = c.join(broadcast(q), Seq("sig"))
      .withColumn("cos", cosineQ(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "id", "cos")
  }
}
