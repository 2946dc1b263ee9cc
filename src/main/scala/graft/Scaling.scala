package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standalone scaling probe (iteration tool; Bench embeds the same job). */
object Scaling {
  def session(cpus: Int): SparkSession = Sessions.local(cpus)

  def tileJob(s: SparkSession, nPages: Long, parts: Int): DataFrame = {
    import graft.functions.{geotag_cell, cell_parent}
    graft.sources.Pages.synthetic(s, nPages, parts)
      .select(geotag_cell(col("url"), SparkEntry.Res).as("cell"))
      .groupBy(cell_parent(col("cell"), SparkEntry.Res - SparkEntry.TileRes).as("tile"))
      .agg(count(lit(1)).as("n_pages"))
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "384000000").toLong
    def run(p: Int): Double = {
      val spark = session(p)
      spark.sparkContext.setLogLevel("WARN")
      val osb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      def once(): Double = {
        val t0 = System.nanoTime()
        val c0 = osb.getProcessCpuTime
        tileJob(spark, nPages, p * 4).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = (osb.getProcessCpuTime - c0) / 1e9
        println(f"LEG p=$p wall=$wall%.2f cpuSec=$cpu%.1f util=${cpu / wall / p}%.2f")
        wall
      }
      once() // warm
      val best = Seq.fill(2)(once()).min
      spark.stop()
      best
    }
    val p1 = sys.env.getOrElse("SPARK_GRAFT_P1", "8").toInt
    val p2 = sys.env.getOrElse("SPARK_GRAFT_P2", "32").toInt
    val t1 = run(p1)
    val t2 = run(p2)
    println(f"SCALING n=$nPages t$p1=$t1%.3f t$p2=$t2%.3f " +
      f"eff=${t1 / t2 / (p2.toDouble / p1)}%.3f")
  }
}
