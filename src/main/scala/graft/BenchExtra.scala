package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Round-6 optimization profiler (guide §1: measure first) — SEPARATE
  * from the frozen graft.Bench harness. Per named query: repeated
  * noop-sink walls plus Spark JOB / STAGE / TASK counts and summed task
  * time from a listener. The job count is the lever this round: on the
  * shared box the per-job driver overhead dominates multi-job queries
  * (cache fills, gate counts, iterative rounds), so "fewer jobs per
  * query" is measurable evidence, not vibes.
  *
  * Usage: SPARK_GRAFT_BENCH_ONLY=q_a,q_b runMain graft.BenchExtra
  *        (unset = all queries; SPARK_GRAFT_REPEATS, default 3)
  */
object BenchExtra {

  final class Counter extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
    }
    def reset(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val spark = Sessions.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val counter = new Counter
    spark.sparkContext.addSparkListener(counter)
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warmup

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    println("query,run,wall_s,jobs,stages,tasks,task_time_s")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => only.forall(_.contains(q._1))).foreach { case (name, fn) =>
        (0 until repeats).foreach { i =>
          counter.reset()
          spark.sparkContext.setJobDescription(s"$name run$i")
          val dt = try time(fn(spark, sfDir)) catch { case _: Throwable => -1.0 }
          spark.catalog.clearCache()
          // let listener events drain so counts attribute to this run
          Thread.sleep(150)
          println(f"$name,$i,$dt%.3f,${counter.jobs.get},${counter.stages.get}," +
            f"${counter.tasks.get},${counter.taskMs.get / 1000.0}%.1f")
        }
      }
    spark.stop()
  }
}
