package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.OddsFunctions._
import graft.operators.{Arb, Devig, Flatten}
import graft.streaming.StreamingIngest

/** The reference's poll-and-append loop as a streaming-native
  * pipeline: landing JSON → flatten → devig → canonical append via
  * foreachBatch, then the batch arb summary over the accumulated
  * history — the full §3.2 lifecycle incrementally.
  */
class EndToEndStreamSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_e2e").toString

  test("streamed odds batches land devigged in the canonical table") {
    val base = tmp()
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    val src = getClass.getResource("/sample_odds.json").getPath
    Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$landing/batch1.json"))

    val stream = StreamingIngest.readOddsStream(spark, landing)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cleaned = Devig.proportional(
          Flatten.flattenOdds(batch, "h2h")
            .withColumn("price", decimalize(col("price")))
            .withColumn("implied_prob", impliedProb(col("price"))))
          .withColumn("batch_id", lit(batchId))
        cleaned.write.mode("append").parquet(s"$base/canonical")
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val canonical = spark.read.parquet(s"$base/canonical")
    assert(canonical.count() == 6)
    // devig invariant survived the streaming path
    canonical.groupBy("game_id").agg(sum("devig_prob").as("s"))
      .collect().foreach(r => assert(approx(r.getAs[Double]("s"), 1.0)))
    // and the batch arb summary over the landed history still finds
    // the constructed arbitrage
    val m = Arb.margins(Arb.bestPrices(canonical)).collect()
      .map(r => r.getAs[String]("game_id") -> r).toMap
    val lakers = m.keys.find(_.contains("Lakers")).get
    assert(m(lakers).getAs[Double]("arbitrage_margin") == 3.26)
  }

  test("date-partitioned canonical prunes partitions on read") {
    import spark.implicits._
    val base = tmp()
    val hist = Seq(
      ("2025-01-01", "g1", 1.95), ("2025-01-01", "g2", 2.10),
      ("2025-01-02", "g1", 1.90), ("2025-01-03", "g1", 1.85)
    ).toDF("snap_date", "game_id", "price")
    hist.write.partitionBy("snap_date").mode("overwrite")
      .parquet(s"$base/hist")

    val read = spark.read.parquet(s"$base/hist")
      .filter($"snap_date" === "2025-01-02")
    assert(read.count() == 1)
    val plan = read.queryExecution.executedPlan.toString
    // the filter must reach the scan as a partition filter, not a
    // post-scan predicate over all files
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("snap_date"),
      s"expected partition pruning in:\n$plan")
  }
}
