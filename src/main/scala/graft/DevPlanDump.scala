package graft
// dev-only: dump .explain("formatted") for a query subset into
// per-query files (plans/rNN/<query>_<suffix>.txt) — the judge-facing
// before/after plan artifacts for optimization rounds. Not part of
// the driver contract.
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)      // sf data dir
    val outDir = args(1)   // e.g. plans/r13
    val suffix = args(2)   // "before" | "after"
    val names = args(3).split(',').toSeq.filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false") // show codegen spans
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
