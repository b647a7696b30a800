package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only per-query job/task-time profiler (opt round 1): runs each
  * named catalog query twice (pass 2 = warm) with Bench's session
  * config and reports wall, Spark job count, and summed executor task
  * time — separating driver-latency-bound queries (many jobs, tiny
  * taskSec) from compute-bound ones.
  *
  * Usage: runMain graft.DevQDiag <sfDir> <q1,q2,...>
  */
object DevQDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq.filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "256k")
      // let AQE size CACHED plans' partitions by bytes too (r13 opt
      // round 1): iterative fits persist small model/feature frames
      // and then run many rounds over them — without this the cache
      // pins the pre-AQE partition count and every round pays
      // per-task overhead x partitions for KB-sized data; with it the
      // cached layout follows the same advisory byte sizing as every
      // other exchange (size-adaptive at any SF, not a core-count
      // tune)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        taskTime.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
    })
    (1 to 2).foreach { pass =>
      println(s"[qdiag] ===== pass $pass =====")
      names.foreach { name =>
        Thread.sleep(200)
        val j0 = jobs.get(); val t0t = taskTime.get()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"[qdiag] $name%-32s ${dt}%7.3f s  jobs=${jobs.get - j0}%3d taskSec=${(taskTime.get - t0t) / 1e3}%8.2f")
      }
    }
    spark.stop()
  }
}
