package graft.ops

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Classification operators (SURVEY.md §2.9 M1-M4, §2.4 A7-A8; geoRpro
 * model.py).
 *
 * - confusion matrix = `groupBy(y, yhat).count` (model.py:64,81 via
 *   sklearn confusion_matrix) — a hash aggregate, not a driver matrix.
 * - cohen's kappa from marginals (model.py:34-47: pe from
 *   np.outer(sum0, sum1)/total²) and per-class commission/omission/
 *   user/producer accuracies (model.py:94-127) — all closed forms over
 *   exact integer counts, so results are identical at any parallelism
 *   and reproducible by the SQL oracle.
 * - RF train/predict (model.py:50-130, 162-253) = spark.ml
 *   RandomForestClassifier; the reference's only parallel operator —
 *   joblib-threaded blockwise predict, model.py:195-205 — is inherent
 *   here: `model.transform` scores partitions in parallel, no batching
 *   code needed. The reference's hard-coded dummy-class trim
 *   (`cm[:-2,:-2]`, model.py:68,84, flagged "to be removed") is NOT
 *   reproduced — it is a data-specific workaround, not semantics.
 */
object Model {

  /** A7: confusion counts (y, yhat, n). */
  def confusion(df: DataFrame, y: String, yhat: String): DataFrame =
    df.groupBy(col(y).as("y"), col(yhat).as("yhat"))
      .agg(count(lit(1)).as("n"))

  /**
   * A7/A8/M4 over a confusion relation: one row per class with
   * marginals, correct count, user/producer accuracy (their
   * complements are commission/omission), plus overall accuracy and
   * cohen's kappa (same scalars on every row — relational form of the
   * reference's report dict). All ratios are single double divisions
   * of exact Long sums.
   */
  def classMetrics(conf: DataFrame): DataFrame = {
    val t = conf.groupBy(col("y").as("cls")).agg(sum("n").as("n_true"))
    val p = conf.groupBy(col("yhat").as("cls")).agg(sum("n").as("n_pred"))
    val d = conf.filter(col("y") === col("yhat"))
      .select(col("y").as("cls"), col("n").as("n_correct"))
    val perClass = t.join(p, Seq("cls"), "full_outer")
      .join(d, Seq("cls"), "left_outer")
      .na.fill(0L, Seq("n_true", "n_pred", "n_correct"))
    // scalars from the marginals: po = sum diag / N,
    // pe = sum_c n_true(c)*n_pred(c) / N^2, kappa = (po-pe)/(1-pe)
    val scalars = perClass.agg(
        sum("n_true").as("total"),
        sum("n_correct").as("correct"),
        sum(col("n_true") * col("n_pred")).as("cross"))
      .select(
        (col("correct").cast("double") / col("total").cast("double")).as("oa"),
        (col("correct").cast("double") / col("total").cast("double") -
          col("cross").cast("double") / (col("total") * col("total")).cast("double"))
          ./(lit(1.0) -
            col("cross").cast("double") / (col("total") * col("total")).cast("double"))
          .as("kappa"))
    perClass
      .withColumn("user_acc", when(col("n_pred") === 0, lit(null))
        .otherwise(col("n_correct").cast("double") / col("n_pred").cast("double")))
      .withColumn("producer_acc", when(col("n_true") === 0, lit(null))
        .otherwise(col("n_correct").cast("double") / col("n_true").cast("double")))
      .crossJoin(broadcast(scalars))
  }

  /** M1: RF training over a feature relation (bands..., label). The
    * 70/30 stratified split of model.py:57-60 is sampleBy label with
    * a fixed seed; returns (model, heldout test rows). */
  def trainRf(xy: DataFrame, bands: Seq[String], labelCol: String,
              numTrees: Int = 20, seed: Long = 42L)
      : (RandomForestClassificationModel, DataFrame) = {
    val assembled = new VectorAssembler()
      .setInputCols(bands.toArray).setOutputCol("features")
      .transform(xy)
    val labels = assembled.select(labelCol).distinct()
      .collect().map(_.getDouble(0))
    val fractions = labels.map(_ -> 0.7).toMap
    val train = assembled.stat.sampleBy(labelCol, fractions, seed)
    val test = assembled.exceptAll(train)
    val model = new RandomForestClassifier()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(numTrees).setSeed(seed)
      .fit(train)
    (model, test)
  }

  /** M2/M3: score a feature relation — partition-parallel by
    * construction (the blockwise/threaded predict of model.py:162-253
    * is just `transform` here). */
  def predict(model: RandomForestClassificationModel, df: DataFrame,
              bands: Seq[String]): DataFrame = {
    val assembled =
      if (df.columns.contains("features")) df
      else new VectorAssembler().setInputCols(bands.toArray)
        .setOutputCol("features").transform(df)
    model.transform(assembled)
  }
}
