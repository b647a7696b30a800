package graft

import org.apache.spark.sql.functions._

import graft.sources.Recrawl
import graft.streaming.StreamingIngest

/** Streaming ≡ batch for the crawl-loop history fold: outcomes
  * arriving across micro-batches must leave each URL's estimator
  * state (n_crawls, n_changes, last_crawl_day) exactly where the
  * batch `ingestOutcomes` chain puts it — 304s counted as unchanged,
  * errors observing nothing.
  */
class CrawlHistoryStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched history fold == batch ingestOutcomes aggregate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    // cycle 1 (day 10) and cycle 2 (day 11) outcome sets; urlD only
    // ever errors, so it must have NO state at all
    val c1 = Seq(("urlA", "changed", 10L), ("urlB", "unchanged", 10L),
      ("urlC", "not_modified", 10L), ("urlD", "error", 10L))
    val c2 = Seq(("urlA", "unchanged", 11L), ("urlB", "changed", 11L),
      ("urlD", "error", 11L))

    // ---- batch side: two ingestOutcomes appends + the estimator agg
    val hist2 = Recrawl.ingestOutcomes(
      Recrawl.ingestOutcomes(
        Seq.empty[(String, Long, Boolean)]
          .toDF("loc", "crawl_day", "changed"),
        c1.toDF("loc", "status", "day")
          .select(col("loc"), col("status")),
        fetchDay = 10L),
      c2.toDF("loc", "status", "day")
        .select(col("loc"), col("status")),
      fetchDay = 11L)
    val batch = hist2.groupBy(col("loc"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("changed"), 1L).otherwise(0L)).as("g"),
        max(col("crawl_day")).as("d"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap

    // ---- streaming side: one trigger per cycle ----
    val input = MemoryStream[(String, String, Long)]
    val q = StreamingIngest.crawlHistoryStream(input.toDS())
      .toDF("loc", "n_crawls", "n_changes", "last_crawl_day")
      .writeStream.format("memory").queryName("chs_out")
      .outputMode("append").start()
    input.addData(c1: _*)
    q.processAllAvailable()
    input.addData(c2: _*)
    q.processAllAvailable()
    q.stop()
    // last emission per loc is the final state
    val streamed = spark.table("chs_out")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3))))
      .groupBy(_._1)
      .map { case (loc, rows) =>
        // n_crawls grows monotonically per URL, so the max row IS the
        // final state (last_crawl_day can tie across triggers)
        loc -> rows.map(_._2).maxBy(_._1)
      }

    assert(streamed == batch,
      s"streamed state must equal the batch aggregate:\n" +
        s"stream=$streamed\nbatch=$batch")
    assert(!streamed.contains("urlD"),
      "error-only URLs must carry no estimator state")
    assert(streamed("urlA") == ((2L, 1L, 11L)))
    assert(streamed("urlC") == ((1L, 0L, 10L)),
      "a 304 must count as an unchanged observation")
  }
}
