package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Composed corpus-cleaning pipeline (builder mandate — the C4-style
 * flagship of the text family, composing T11 quality + lang-ID, T1
 * exact dedup and T3+T6 near-dup cluster removal in the order a
 * production cleaning job runs them):
 *
 *   1. quality gate — token count and mean token length thresholds
 *      (cheap row-local filters run FIRST so every later stage sees a
 *      smaller corpus);
 *   2. language gate — marker-vote language id must resolve (drop
 *      'unknown');
 *   3. exact dedup — keep the min-id doc per identical text (one
 *      hash-groupBy + semi-join);
 *   4. near-dup removal — simhash pairs over the survivors, connected
 *      components, keep one doc per cluster (Dedup.keepClusterKeepers).
 *
 * Every stage is an existing oracle-gated operator; the composition is
 * gated end-to-end as q_clean_corpus. All predicates are engine-exact
 * (integer counts; the mean-token-length closed form is one double
 * division of exact integers, reproduced bit-for-bit by the oracle).
 */
object Clean {

  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 15L,
                  maxMeanTokLen: Double = 4.9): DataFrame = {
    // cached (round-6): the gated corpus feeds FOUR consumers — the
    // exact-dedup aggregate, the semi-join left side, the simhash
    // signature scan and the final anti-join — so without the caches
    // the quality/lang kernels re-ran over the full corpus 3-4x per
    // action (measured: q_clean_corpus task time 26 s -> 8 s at sf0.1).
    // Cache lifetime is the CALLER's session, the minhashLsh
    // convention (Verify/Bench clearCache between queries).
    val q = df
      .withColumn("n_tok", TextOps.nTokens(col(textCol)))
      .withColumn("mean_tok_len", TextOps.meanTokenLen(col(textCol)))
      .withColumn("pred_lang", TextOps.langId(col(textCol)))
      .filter(col("n_tok") >= minTokens &&
        col("mean_tok_len") <= maxMeanTokLen &&
        col("pred_lang") =!= "unknown")
      .cache()
    val exactKept = q.join(
      Dedup.exact(q, idCol, textCol).select(col("keeper").as(idCol)),
      Seq(idCol), "left_semi")
      .cache()
    Dedup.keepClusterKeepers(exactKept, idCol,
      Dedup.simhashPairs(exactKept, idCol, textCol))
  }
}
