package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the heavy pipelines (not driver-run). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    import graft.text.Dedup._
    val corpus = graft.sources.Corpus.withDups(spark, sfDir)
    t("corpus")(corpus)
    val sh = docShingles(corpus, "doc_id", "text")
    t("docShingles")(sh)
    t("docShingles(2nd)")(sh)
    t("minhash")(minhash(sh))
    t("bands")(bands(minhash(sh)))
    t("candidates")(candidates(bands(minhash(sh))))
    t("jaccard-full")(minhashLsh(corpus, "doc_id", "text", 0.4))
    val sig = corpus.select(col("doc_id").as("id"),
      graft.functions.simhash60(col("text")).as("sig"))
    t("simhash-sig")(sig)
    t("simhash-pairs")(simhashPairs(corpus, "doc_id", "text"))
    t("ngram-pairs-only") {
      val a = sh.alias("a"); val b = sh.alias("b")
      a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    }
    t("ngram-full")(ngramJaccard(corpus, "doc_id", "text", 0.3))
    t("ngram-capped")(ngramJaccard(corpus, "doc_id", "text", 0.3,
      maxDf = Some(NgramMaxDf)))
    spark.catalog.clearCache()
    t("clip_poly")(SparkEntry.qClipPoly(spark, sfDir))
    t("clip_poly(2nd)")(SparkEntry.qClipPoly(spark, sfDir))
    t("knn")(SparkEntry.qKnn(spark, sfDir))
    t("calibrate")(SparkEntry.qCalibrate(spark, sfDir))
    t("ann_lsh")(SparkEntry.qAnnLsh(spark, sfDir))
    spark.stop()
  }
}
