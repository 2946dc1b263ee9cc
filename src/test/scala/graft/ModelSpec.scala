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

  test("sent2_charcoal e2e: stack -> mask -> extract -> class edits -> RF") {
    // The reference's flagship classification workflow
    // (workflow/sent2_charcoal.py:111-153) composed end-to-end: cloud
    // mask (SCL analog) -> masked band stack + index -> point extract
    // with the 9999 sentinel drop -> add_class("masked", 9999) ->
    // remove_class -> seeded RF train/predict -> confusion. RF isn't
    // DuckDB-reproducible, so the oracle is in-suite: the whole
    // pipeline must be bit-deterministic across re-execution, the
    // synthetic masked class must be (near-)perfectly separable, and
    // the removed class must vanish from train and predictions.
    import graft.ops.{Extract, Indexes, Mask}
    import graft.sources.{Pages, Points}
    val dir = "/root/testdata/sf0.001"
    val res = 8
    val feats = Seq("b1", "b2", "b3", "ndvi")
    def pipeline(seed: Long): (Seq[(Long, Long, Long)], Double) = {
      val geo = Pages.geoCells(spark, dir, res)
      val bands = geo.groupBy("cell").agg(
        count(lit(1)).as("b1"), sum("n_chars").as("b2"),
        max("n_chars").as("b3"))
      val cloud = col("b1") % 7 === 0 // the SCL cloud-class stand-in
      val stack = bands
        .select(col("cell") +: Seq("b1", "b2", "b3").map(b =>
          Mask.applyMask(Mask.maskCond(col(b), cloud), 9999).as(b)): _*)
        .withColumn("ndvi", when(col("b2") === 9999, 9999L)
          .otherwise(Indexes.ndvi(col("b2"), col("b3"))))
      val points = Points.fromTable(spark, dir, "customer", "c_custkey",
        Seq("c_mktsegment"), "c")
      val seg2id = when(col("c_mktsegment") === "AUTOMOBILE", 0L)
        .when(col("c_mktsegment") === "BUILDING", 1L)
        .when(col("c_mktsegment") === "FURNITURE", 2L)
        .when(col("c_mktsegment") === "HOUSEHOLD", 3L)
        .otherwise(4L)
      val xy = Extract.extract(points, stack, res, feats, Some(9999L))
        .select(feats.map(col) :+ col("c_mktsegment").as("classname") :+
          seg2id.as("label_id"): _*)
      val edited = Extract.removeClass(
        Extract.addClass(xy, feats, lit(9999L), "masked"), 2L)
      assert(edited.filter(col("label_id") === 2L).count() == 0)
      val withLabel = edited.withColumn("label", col("label_id").cast("double"))
      val (model, heldout) = Model.trainRf(withLabel, feats, "label",
        numTrees = 20, seed = seed)
      val scored = Model.predict(model, heldout, feats)
      val conf = Model.confusion(scored.select(
        col("label").cast("long").as("y"),
        col("prediction").cast("long").as("yhat")), "y", "yhat")
      val rows = conf.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val maskedAcc = Model.classMetrics(conf)
        .filter(col("cls") === 5L).collect()(0).getAs[Double]("producer_acc")
      (rows, maskedAcc)
    }
    // the reference loops 30 identical runs; two seeds represent it
    val (c1, acc1) = pipeline(42L)
    val (c1again, acc1again) = pipeline(42L)
    assert(c1 == c1again && acc1 == acc1again, "pipeline not deterministic")
    val (c2, acc2) = pipeline(7L)
    // add_class: the synthetic masked class (id = max+1 = 5) exists and
    // its all-9999 feature vector is separable
    assert(c1.exists(_._1 == 5L) && c2.exists(_._1 == 5L))
    assert(acc1 >= 0.95 && acc2 >= 0.95, s"masked class acc $acc1 / $acc2")
    // remove_class: label 2 appears neither as truth nor as prediction
    assert(!c1.exists(t => t._1 == 2L || t._2 == 2L))
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
