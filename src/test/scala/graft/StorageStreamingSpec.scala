package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.Snapshots
import graft.streaming.StreamingIngest

/** Storage (S4-S6/S9), Structured Streaming ingestion + event-time
  * windows, and multimodal plumbing.
  */
class StorageStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_test").toString

  test("snapshot write + canonical append + latest view") {
    val base = tmp()
    val batch1 = Seq((1L, "a", 10.0, "t1"), (2L, "b", 20.0, "t1"))
      .toDF("id", "k", "v", "batch_ts")
    val batch2 = Seq((1L, "a", 11.0, "t2"))
      .toDF("id", "k", "v", "batch_ts")
    Snapshots.writeSnapshot(batch1, base, "h2h", "20250101_000000")
    Snapshots.appendCanonical(batch1, s"$base/canonical")
    Snapshots.appendCanonical(batch2, s"$base/canonical")
    val hist = Snapshots.readCanonical(spark, s"$base/canonical")
    assert(hist.count() == 3) // append-only event log
    val latest = Snapshots.latest(hist, Seq("id"), "batch_ts")
    assert(latest.count() == 2)
    assert(latest.filter($"id" === 1L).collect().head
      .getAs[Double]("v") == 11.0)
  }

  test("compaction rewrites the canonical log to latest-per-key") {
    val base = tmp()
    val b1 = Seq((1L, 10.0, "t1"), (2L, 20.0, "t1"))
      .toDF("id", "v", "batch_ts")
    val b2 = Seq((1L, 11.0, "t2"), (3L, 30.0, "t2"))
      .toDF("id", "v", "batch_ts")
    Snapshots.appendCanonical(b1, s"$base/canonical")
    Snapshots.appendCanonical(b2, s"$base/canonical")
    assert(Snapshots.readCanonical(spark, s"$base/canonical").count() == 4)
    Snapshots.compact(spark, s"$base/canonical", Seq("id"), "batch_ts")
    val after = Snapshots.readCanonical(spark, s"$base/canonical")
    assert(after.count() == 3)
    assert(after.filter($"id" === 1L).collect().head
      .getAs[Double]("v") == 11.0)
    // latest over the compacted log is unchanged
    assert(Snapshots.latest(after, Seq("id"), "batch_ts").count() == 3)
  }

  test("watermarked streaming dedup drops in-horizon duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "fingerprint", "value")
    val deduped = graft.streaming.StreamingIngest
      .dedupWithinWatermark(df, Seq("fingerprint"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("wm_dedup_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (t("2025-01-01 00:00:00"), "a", 1.0),
      (t("2025-01-01 00:05:00"), "a", 2.0),  // dup within horizon
      (t("2025-01-01 00:10:00"), "b", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_dedup_out")
      .select("fingerprint").collect().map(_.getString(0)).toSeq.sorted
    assert(out == Seq("a", "b"))
  }

  test("stream-stream interval join matches in-window rows, bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val anchors = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val hits = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val l = anchors.toDF().toDF("ts", "user_id", "anchor_id")
    val r = hits.toDF().toDF("ts", "user_id", "hit_id")
    val joined = graft.streaming.StreamingIngest
      .intervalJoin(l, r, "user_id", windowSpec = "1 hour",
        watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivj_out").start()
    anchors.addData((t("2025-01-01 00:00:00"), 7L, 1L))
    hits.addData(
      (t("2025-01-01 00:00:00"), 7L, 10L),  // at anchor time: in
      (t("2025-01-01 00:59:59"), 7L, 11L),  // just inside window
      (t("2025-01-01 01:00:00"), 7L, 12L),  // at window end: out
      (t("2025-01-01 00:30:00"), 8L, 13L))  // other user: out
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ivj_out")
      .select("r_hit_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L))
  }

  test("bucketed tables join without an exchange") {
    val a = (1L to 500L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 500L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Snapshots.writeBucketedTable(a, "graft_bucket_a", "k", 8)
    Snapshots.writeBucketedTable(b, "graft_bucket_b", "k", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("streaming file source appends to the canonical table") {
    val base = tmp()
    val landing = s"$base/landing"
    new java.io.File(landing).mkdirs()
    // land the fixture as one JSON file
    val src = getClass.getResource("/sample_odds.json").getPath
    Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(s"$landing/batch1.json"))
    val stream = StreamingIngest.readOddsStream(spark, landing)
    assert(stream.isStreaming)
    StreamingIngest.runAvailable(StreamingIngest.toCanonical(
      stream.select($"id", $"home_team", $"away_team"),
      s"$base/canonical", s"$base/ckpt"))
    val canonical = spark.read.parquet(s"$base/canonical")
    assert(canonical.count() == 2)
  }

  test("event-time tumbling window aggregate with watermark") {
    val base = tmp()
    val landing = s"$base/events"
    Seq(
      ("2025-01-01 00:01:00", "click", 1.0),
      ("2025-01-01 00:02:00", "click", 2.0),
      ("2025-01-01 00:07:00", "click", 4.0),
      ("2025-01-01 00:01:30", "view", 8.0)
    ).toDF("ts_s", "event_type", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"event_type", $"value")
      .write.mode("overwrite").parquet(landing)
    val stream = spark.readStream
      .schema("ts timestamp, event_type string, value double")
      .parquet(landing)
    val agg = StreamingIngest.windowedCounts(stream,
      watermark = "10 minutes", window_ = "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("win_out")
      .filter($"event_type" === "click").orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2 &&
      out(0).getAs[Double]("total_value") == 3.0)
    assert(out(1).getAs[Long]("n") == 1)
  }

  test("streaming session windows group by gap") {
    val base = tmp()
    Seq(
      ("2025-01-01 00:00:00", 1L, 1.0),
      ("2025-01-01 00:10:00", 1L, 2.0),  // same session (gap 10m < 30m)
      ("2025-01-01 02:00:00", 1L, 4.0)   // new session
    ).toDF("ts_s", "user_id", "value")
      .select(to_timestamp($"ts_s").as("ts"), $"user_id", $"value")
      .write.mode("overwrite").parquet(s"$base/ev")
    val stream = spark.readStream
      .schema("ts timestamp, user_id bigint, value double")
      .parquet(s"$base/ev")
    val agg = StreamingIngest.sessionCounts(stream, gap = "30 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess_out").orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(1).getAs[Long]("n_events") == 1)
  }

  test("multimodal: feature extraction is deterministic and typed") {
    val assets = Multimodal.syntheticAssets(spark, 30)
    val f1 = Multimodal.extractFeatures(assets).collect()
      .map(m => m.asset_id -> m).toMap
    val f2 = Multimodal.extractFeatures(assets).collect()
      .map(m => m.asset_id -> m).toMap
    assert(f1.keySet.size == 30)
    f1.foreach { case (id, m) =>
      assert(m.feature.length == Multimodal.MediaCodec.featureDim)
      assert(m.feature.toSeq == f2(id).feature.toSeq) // deterministic
      assert(m.content_hash.length == 32)
    }
  }

  test("multimodal: frame sampling strides over payload chunks") {
    val assets = Multimodal.syntheticAssets(spark, 5)
    val frames = Multimodal.sampleFrames(assets, frameBytes = 32,
      stride = 2)
    val counts = frames.groupBy("asset_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // payload length 128..191 -> 4..6 chunks of 32 -> 2..3 sampled
    counts.values.foreach(c => assert(c >= 2 && c <= 3))
    assert(frames.columns.toSeq ==
      Seq("asset_id", "frame_idx", "frame_payload"))
  }

  test("multimodal: resize produces fixed-size payloads with metadata") {
    val assets = Multimodal.syntheticAssets(spark, 10)
    val resized = Multimodal.resize(assets, 8, 8)
    val rows = resized.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 64)
      assert(r.getAs[Int]("width") == 8 && r.getAs[Int]("height") == 8)
    }
    // deterministic: same input -> same resized bytes
    val again = Multimodal.resize(assets, 8, 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq)
      .toMap
    rows.foreach(r => assert(
      again(r.getLong(0)) == r.getAs[Array[Byte]]("payload").toSeq))
  }

  test("multimodal: content dedup collapses identical payloads") {
    val a = Multimodal.syntheticAssets(spark, 10)
    val doubled = a.unionByName(a.withColumn("asset_id",
      col("asset_id") + 100))
    val d = Multimodal.dedupByContent(doubled)
    assert(d.count() == 10)
    d.collect().foreach(r => assert(r.getAs[Long]("n_dups") == 2))
  }

  test("multimodal: scale-proportional assets stream through content " +
      "dedup") {
    // r3 verdict item 3: the asset table must grow with the data.
    // sf0.001 embeddings = 50 vectors; dupGroups=7 forces exact
    // payload duplicates (ids 0..49 -> 7 distinct payload groups
    // before any asset repeats would at the default 97).
    val vecs = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = vecs.count()
    val assets = Multimodal.assetsFromVectors(vecs, dupGroups = 7)
    assert(assets.count() == n) // one asset per embedding row
    val d = Multimodal.dedupByContent(assets).collect()
    assert(d.length == 7)
    assert(d.map(_.getAs[Long]("n_dups")).sum == n)
    // keep_id is the min asset id of its group: ids 0..6 each lead one
    assert(d.map(_.getAs[Long]("keep_id")).sorted.toSeq ==
      (0L to 6L).toSeq)
  }
}
