package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standalone scaling probe (iteration tool; Bench embeds the same job). */
object Scaling {
  def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def tileJob(s: SparkSession, nPages: Long, parts: Int): DataFrame = {
    import graft.functions.{geotag_cell, cell_parent}
    graft.sources.Pages.synthetic(s, nPages, parts)
      .select(geotag_cell(col("url"), SparkEntry.Res).as("cell"))
      .groupBy(cell_parent(col("cell"), SparkEntry.Res - SparkEntry.TileRes).as("tile"))
      .agg(count(lit(1)).as("n_pages"))
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "128000000").toLong
    def run(p: Int): Double = {
      val spark = session(p)
      spark.sparkContext.setLogLevel("WARN")
      def once(): Double = {
        val t0 = System.nanoTime()
        tileJob(spark, nPages, p).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val best = Seq.fill(2)(once()).min
      spark.stop()
      best
    }
    val t8 = run(8)
    val t32 = run(32)
    println(f"SCALING n=$nPages t8=$t8%.3f t32=$t32%.3f eff=${t8 / t32 / 4.0}%.3f")
  }
}
