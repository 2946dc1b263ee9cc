package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Dedup test corpus: documents plus deterministic duplicates —
 * doc_id%10==0 re-appears verbatim (exact dup, +1000000), doc_id%10==1
 * re-appears with an appended tail (near dup, +2000000). Mirror of
 * Oracle.corpusCte — keep in sync.
 */
object Corpus {
  val NearDupTail = " graft dup tail"

  def withDups(spark: SparkSession, dir: String): DataFrame = {
    val d = Pages.documents(spark, dir).select("doc_id", "text")
    val exactCopies = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val nearCopies = d.filter(col("doc_id") % 10 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(NearDupTail)).as("text"))
    d.unionByName(exactCopies).unionByName(nearCopies)
  }
}
