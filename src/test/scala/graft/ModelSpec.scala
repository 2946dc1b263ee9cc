package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Model

class ModelSpec extends AnyFunSuite {
  lazy val spark = SparkSessionHelper.spark
  import spark.implicits._

  test("classMetrics: kappa/OA/per-class accuracies match hand math") {
    // confusion: y=a (10 rows: 8 as a, 2 as b), y=b (10 rows: 4 as a, 6 as b)
    val conf = Seq(("a", "a", 8L), ("a", "b", 2L), ("b", "a", 4L), ("b", "b", 6L))
      .toDF("y", "yhat", "n")
    val m = Model.classMetrics(conf).orderBy("cls").collect()
    val total = 20.0
    val po = 14.0 / total
    val pe = (10.0 * 12 + 10 * 8) / (total * total)
    assert(m.length == 2)
    val a = m(0)
    assert(a.getAs[Long]("n_true") == 10L && a.getAs[Long]("n_pred") == 12L)
    assert(a.getAs[Double]("user_acc") == 8.0 / 12.0)
    assert(a.getAs[Double]("producer_acc") == 8.0 / 10.0)
    assert(a.getAs[Double]("oa") == po)
    assert(math.abs(a.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-15)
  }

  test("classMetrics handles one-sided classes (null accuracy, not NaN)") {
    val conf = Seq(("a", "a", 5L), ("a", "c", 5L)).toDF("y", "yhat", "n")
    val rows = Model.classMetrics(conf).orderBy("cls").collect()
    val c = rows.find(_.getString(0) == "c").get
    assert(c.getAs[Long]("n_true") == 0L)
    assert(c.isNullAt(c.fieldIndex("producer_acc")))
  }

  test("RF train/predict: separable bands classify >= 90% correctly") {
    val xy = (0 until 400).map { i =>
      val label = (i % 2).toDouble
      val rnd = new scala.util.Random(i)
      val base = if (label == 0.0) 10.0 else 50.0
      (base + rnd.nextGaussian(), base * 2 + rnd.nextGaussian(), label)
    }.toDF("b1", "b2", "label")
    val (model, test) = Model.trainRf(xy, Seq("b1", "b2"), "label")
    val scored = Model.predict(model, test, Seq("b1", "b2"))
    val conf = Model.confusion(
      scored.select(col("label").cast("string").as("y"),
        col("prediction").cast("string").as("yhat")), "y", "yhat")
    val m = Model.classMetrics(conf).limit(1).collect()(0)
    assert(m.getAs[Double]("oa") >= 0.9, s"overall accuracy ${m.getAs[Double]("oa")}")
  }
}
