package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.SuffixRepeats
import graft.text.TextAnalysis

/** Dev-only decomposition of the suffix-maintenance query cost (opt
  * round 1): times each leg of the q182/q186 pipeline separately —
  * history span build (fit-once), gram index, probes, the sub-corpus
  * rank, the merge — with job/stage/task-time counters, so the
  * optimization targets the measured hot leg.
  *
  * Usage: runMain graft.DevSpanDiag [sfDir]
  */
object DevSpanDiag {
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
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        taskTime.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
    })
    def leg(name: String)(body: => Unit): Unit = {
      Thread.sleep(200)
      val j0 = jobs.get(); val t0t = taskTime.get()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[spandiag] $name%-34s ${dt}%8.3f s  jobs=${jobs.get - j0}%3d taskSec=${(taskTime.get - t0t) / 1e3}%8.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // replicate QueriesScale.saCorpus
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(col("doc_id"))
    val toks = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("tk"))
    val sample = toks.filter(col("doc_id") % 20 === 0)
    val boiler = sample.filter(col("doc_id").isin(0L, 20L, 40L, 60L))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("doc_id"), col("tk")))),
        x => x.getField("tk"))).as("bl"))
    val aug = sample.crossJoin(broadcast(boiler))
      .select(col("doc_id"),
        when(col("doc_id") % 100 === 0, concat(col("tk"), col("bl")))
          .otherwise(col("tk")).as("tokens"))

    (1 to 2).foreach { pass =>
      println(s"[spandiag] ===== pass $pass =====")
      val hist = aug.filter(col("doc_id") % 200 =!= 100)
      val batch = aug.filter(col("doc_id") % 200 === 100)
      leg("hist spanList (fit-once)") {
        noop(SuffixRepeats.repeatedSpanList(hist, minLen = 25))
      }
      leg("hist gramIndex") {
        noop(SuffixRepeats.gramIndex(hist, minLen = 25))
      }
      leg("q182 mergeSpanList") {
        val (spans, _) = SuffixRepeats.mergeSpanList(
          SuffixRepeats.repeatedSpanList(hist, minLen = 25),
          SuffixRepeats.gramIndex(hist, minLen = 25),
          hist, batch, minLen = 25)
        noop(spans)
      }
      val removed = aug.filter(col("doc_id") % 60 === 40)
        .select(col("doc_id"))
      leg("q186 full spanList(aug)") {
        noop(SuffixRepeats.repeatedSpanList(aug, minLen = 25))
      }
      leg("q186 retractSpanList") {
        val (spans, _) = SuffixRepeats.retractSpanList(
          SuffixRepeats.repeatedSpanList(aug, minLen = 25),
          SuffixRepeats.gramIndex(aug, minLen = 25),
          aug, removed, minLen = 25)
        noop(spans)
      }
    }
    spark.stop()
  }
}
