package graft

import org.apache.spark.sql.functions._

/** Deterministic 10x upscale of the driver's documents/embeddings
  * tables (VERDICT r4 next #5: re-run the heaviest dedup/ANN gates at
  * sf1.0 — scale-dependent premises like the round-3 cap no-op hide at
  * the next decade). No external data: copy k of each row gets id
  * shifted by k*step with the text/vector perturbed per a fixed id%3
  * rule, so the scaled corpus carries exact cross-copy duplicates,
  * near-duplicates (one appended token / a uniformly scaled vector —
  * cosine 1 after normalization), and unique rows at every scale, like
  * a re-crawled web corpus. Usage:
  *   runMain graft.ScaleUp <srcSfDir> <dstDir> <factor>
  * then point Verify + scripts/check_correctness.py at <dstDir>.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val docStep = docs.agg(max("doc_id")).first().getLong(0) + 1
    val scaledDocs = (0 until factor).map { k =>
      if (k == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(k.toLong * docStep))
        .withColumn("text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(s" xk$k")))
            .when(col("doc_id") % 3 === 1, col("text")) // exact cross-copy dup
            .otherwise(concat(lit(s"v$k "), col("text"))))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)
    // single part file so the DuckDB side of the gate can read the same
    // path as a plain parquet file (flattened by the caller)
    scaledDocs.coalesce(1).write.mode("overwrite")
      .parquet(s"$dstDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val embStep = emb.agg(max("vec_id")).first().getLong(0) + 1
    val scaledEmb = (0 until factor).map { k =>
      if (k == 0) emb
      else emb
        .withColumn("vec_id", col("vec_id") + lit(k.toLong * embStep))
        .withColumn("embedding",
          when(col("vec_id") % 3 === 1, col("embedding")) // exact dup
            .otherwise(transform(col("embedding"),
              x => x * lit(1.0f + k * 1e-4f)))) // cosine-1 near-dup
    }.reduce(_ unionByName _)
    scaledEmb.coalesce(1).write.mode("overwrite")
      .parquet(s"$dstDir/embeddings.parquet")

    println(s"SCALEUP docs=${spark.read.parquet(s"$dstDir/documents.parquet").count()} " +
      s"emb=${spark.read.parquet(s"$dstDir/embeddings.parquet").count()} -> $dstDir")
    spark.stop()
  }
}
