package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family scaling probe (iteration tool, like graft.Scaling for
  * the tile job): runs exact/simhash/minhash dedup over a deterministic
  * synthetic near-dup corpus at nDocs and 4*nDocs and reports the
  * wall-time ratio. The 100-TB claim for the dedup family is that every
  * stage is linear in corpus size (candidate generation by equi-join,
  * capped buckets) — the measured ratio at two sizes on one box is the
  * sandbox-scale evidence (ratio ~4 with fixed scheduling overhead
  * amortizing as n grows; a quadratic stage would read ~16).
  *
  * The corpus is seeded by row id (no external data): 40-token texts
  * over a 4096-word vocabulary via an LCG; every 10th doc is an exact
  * duplicate of the doc 10 ids earlier, every 10th+1 doc a near-dup of
  * it (same prefix, 2-token tail appended — shares most shingles and
  * band buckets), the rest unique. ~20% of docs are therefore involved
  * in dup pairs at every scale, so candidate volumes grow linearly by
  * construction, like a fixed-dup-rate web crawl.
  */
object ScalingDedup {

  private val Vocab: Array[String] = (0 until 4096).map(i => f"w$i%04x").toArray

  def text(id: Long): String = {
    val sb = new StringBuilder(5 * 40)
    var x = id
    var i = 0
    while (i < 40) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(Vocab(((x >>> 33) % 4096).toInt))
      if (i < 39) sb.append(' ')
      i += 1
    }
    sb.result()
  }

  def docText(id: Long): String =
    if (id >= 10 && id % 10 == 0) text(id - 1) // exact dup of a UNIQUE doc
    else if (id >= 10 && id % 10 == 1) // near dup of another unique doc
      text(id - 3) + " zz" + (id % 97)
    else text(id)

  def corpus(s: SparkSession, nDocs: Long, parts: Int): DataFrame = {
    import s.implicits._
    s.range(0, nDocs, 1, parts)
      .map(id => (id, docText(id)))
      .toDF("doc_id", "text")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val n0 = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "50000").toLong
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    def run(name: String, n: Long, job: DataFrame => DataFrame): Double = {
      val c = corpus(spark, n, cpus * 4)
      val t0 = System.nanoTime()
      val rows = job(c).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"DEDUPSCALE $name%-10s n=$n%-8d wall=$wall%7.2fs rows=$rows")
      wall
    }
    val jobs: Seq[(String, DataFrame => DataFrame)] = Seq(
      "exact" -> (c => Dedup.exact(c, "doc_id", "text")
        .filter(col("n_dups") > 1)),
      "simhash" -> (c => Dedup.simhashPairs(c, "doc_id", "text",
        maxBucket = Some(64))),
      "minhash" -> (c => Dedup.minhashLsh(c, "doc_id", "text", 0.4,
        maxBucket = Some(64))))
    // warm (JIT + codegen) on the small size, then measure both sizes
    jobs.foreach { case (name, j) => run(s"warm-$name", n0 / 5, j) }
    val ratios = jobs.map { case (name, j) =>
      val t1 = run(name, n0, j)
      val t4 = run(name, n0 * 4, j)
      println(f"DEDUPSCALE $name%-10s 4x-ratio=${t4 / t1}%.2f (linear ~4, quadratic ~16)")
      name -> t4 / t1
    }
    println("DEDUPSCALE " + ratios.map { case (n, r) => f"$n=$r%.2f" }
      .mkString("summary: ", " ", ""))
    spark.stop()
  }
}
