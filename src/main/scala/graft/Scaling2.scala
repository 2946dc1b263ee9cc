package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Overhead dissection at local[32] (iteration tool). */
object Scaling2 {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "1000000").toLong
    val spark = Scaling.session(32)
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime(); body
      val t1 = System.nanoTime(); body
      println(f"SCAN2 $name%-36s ${(t1 - t0) / 1e9}%.3f / ${(System.nanoTime() - t1) / 1e9}%.3f s")
    }

    def job(parts: Int): DataFrame = Scaling.tileJob(spark, n, parts)

    t("noop parts=128")(job(128).write.format("noop").mode("overwrite").save())
    t("noop parts=32")(job(32).write.format("noop").mode("overwrite").save())
    t("count parts=32")(job(32).count())
    t("count parts=128")(job(128).count())
    t("range-only count parts=128")(
      spark.range(0, n, 1, 128).select((col("id") * 2).as("x"))
        .groupBy(col("x") % 100).count().count())
    t("synthetic-only noop parts=128")(
      graft.sources.Pages.synthetic(spark, n, 128)
        .write.format("noop").mode("overwrite").save())
    t("geocell-only noop parts=128")(
      graft.sources.Pages.synthetic(spark, n, 128)
        .select(graft.functions.geotag_cell(col("url"), 12).as("cell"))
        .write.format("noop").mode("overwrite").save())
    println("adaptive=" + spark.conf.get("spark.sql.adaptive.enabled"))
    spark.conf.set("spark.sql.shuffle.partitions", 4)
    t("count parts=128 shufpart=4")(job(128).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", 32)
    t("count parts=128 no-AQE")(job(128).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    t("count parts=128 AQE coalesce-first")(job(128).count())
    t("noop parts=128 AQE coalesce-first")(
      job(128).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
