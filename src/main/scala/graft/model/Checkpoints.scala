package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation for fixpoint/index operators (the CC loop in
  * q50/q88, the suffix-array rounds, the fit-once caches), with a
  * RELIABLE mode for real clusters (r7 verdict item 3).
  *
  * Default mode is `localCheckpoint(eager)`: partitions pin in
  * executor block storage — the right call at local[32] and the
  * cheapest truncation on any cluster, but NOT executor-loss-safe
  * (a lost executor loses those partitions unrecoverably, because
  * the lineage behind them was discarded).
  *
  * Set `graft.checkpoint.dir` (a SparkSession conf; any
  * Hadoop-visible path — HDFS/S3A/local) and every truncation in the
  * engine switches to a reliable `df.checkpoint(eager)` against that
  * directory instead. Results are bit-identical between modes
  * (CheckpointModeSpec asserts it): checkpointing only changes WHERE
  * the materialized partitions live, never their content or order.
  *
  * [[release]] frees the storage behind a superseded materialization
  * (r7 ADVICE item 2): per-round checkpoints in an iterative build
  * are garbage the moment the next round materializes, and waiting
  * for ContextCleaner GC pins executor storage for the JVM lifetime.
  */
object Checkpoints {

  val DirConf = "graft.checkpoint.dir"

  /** Eagerly materialize `df` and truncate its lineage — local block
    * storage by default, reliable checkpoint when [[DirConf]] is set.
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(dir)))
          sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** Unpersist the block storage behind a frame previously returned
    * by [[materialize]] (no-op for reliable-checkpoint files, which
    * ContextCleaner removes when `spark.cleaner.referenceTracking
    * .cleanCheckpoints` is on). Non-blocking; safe to call on any
    * frame — only checkpoint-backed leaves are touched.
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
