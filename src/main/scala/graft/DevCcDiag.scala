package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Dev-only decomposition of the CC-family query cost (opt round 1):
  * times each stage of the q50/q180 pipeline separately — signature
  * hashing, rep-pair banding, the CC fixpoint, the member attach —
  * and reports the fixpoint's round count plus Spark job/stage
  * counts per leg, so the optimization targets the measured hot leg
  * instead of the assumed one.
  *
  * Usage: runMain graft.DevCcDiag [sfDir]
  */
object DevCcDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskTime.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = ()
    })

    def leg(name: String)(body: => Unit): Unit = {
      // settle listener counters
      Thread.sleep(200)
      val j0 = jobs.get(); val s0 = stages.get(); val t0t = taskTime.get()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[ccdiag] $name%-34s ${dt}%8.3f s  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%4d taskSec=${(taskTime.get - t0t) / 1e3}%8.2f rounds=${Dedup.lastCcRounds.get}%2d")
    }

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(col("doc_id"))

    (1 to 2).foreach { pass =>
      println(s"[ccdiag] ===== pass $pass =====")
      leg("sigs (hash only)") {
        noop(docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh")))
      }
      leg("simhashPairs") {
        noop(Dedup.simhashPairs(docs, maxHamming = 12))
      }
      leg("simhashEdges") {
        noop(Dedup.simhashEdges(docs, maxHamming = 12))
      }
      leg("simhashClusters (pairs+CC)") {
        noop(Dedup.simhashClusters(docs, maxHamming = 12))
      }
      leg("duplicateClusters(edges) alone") {
        noop(Dedup.duplicateClusters(
          Dedup.simhashEdges(docs, maxHamming = 12)))
      }
      val hist = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      leg("q180 leg: simhashClusters(hist)") {
        noop(Dedup.simhashClusters(hist, maxHamming = 12))
      }
      leg("q180 leg: simhashTable(hist)") {
        noop(Dedup.simhashTable(hist))
      }
      leg("q180 leg: batchEdges(batch,served)") {
        noop(Dedup.simhashBatchEdges(batch,
          Dedup.simhashTable(hist), maxHamming = 12))
      }
      leg("q180 full: mergeClusters") {
        noop(Dedup.mergeClusters(
          Dedup.simhashClusters(hist, maxHamming = 12),
          Dedup.simhashBatchEdges(batch,
            Dedup.simhashTable(hist), maxHamming = 12)))
      }
    }
    spark.stop()
  }
}
