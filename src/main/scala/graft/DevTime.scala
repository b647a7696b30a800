package graft

import org.apache.spark.sql.SparkSession

/** Dev-only filtered timing main (not part of the driver contract):
  * times a comma-separated subset of SparkEntry.queries against a
  * given SF dir with graft.Bench's exact session config, warmup, and
  * median-of-rounds protocol — for same-session Spark-vs-DuckDB pair
  * measurements of individual queries without a full catalog run.
  *
  * Usage: runMain graft.DevTime <sfDir> <q1,q2,...> [rounds]
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq.filter(_.nonEmpty)
    val rounds = if (args.length > 2) args(2).toInt else 3
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
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val warmDir = {
      val p = java.nio.file.Paths.get(sfDir)
      val sibling = Option(p.getParent)
        .map(_.resolve("sf0.001").toString).getOrElse(sfDir)
      if (new java.io.File(sibling).isDirectory) sibling else sfDir
    }
    names.foreach { n =>
      try run(n, warmDir) catch { case _: Throwable => () }
    }
    val samples = scala.collection.mutable
      .Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to rounds).foreach { r =>
      names.foreach { n =>
        val dt = run(n, sfDir)
        println(f"[devtime] round$r $n $dt%.3f s")
        samples(n) = dt :: samples(n)
      }
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    names.foreach { n =>
      println(f"[devtime] MEDIAN $n ${median(samples(n))}%.4f s")
    }
    spark.stop()
  }
}
