package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.StreamingIngest

/** Streaming-vs-batch equivalence (r4 verdict item 6): the streaming
  * paths (`windowedCounts`, `sessionCounts`, `intervalJoin`) executed
  * as REAL micro-batch runs over the driver's events table must
  * produce exactly what the oracle-checked batch plans (q09/q10 and a
  * static interval join) produce. This is the guarantee a lambda-less
  * architecture rests on: one semantics, two execution modes.
  */
class StreamBatchEquivSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  /** events with ts at MICROsecond timestamp precision — the same
    * truncation the batch q09/q10 plans apply (EventTime.epochUs over
    * whatever physical encoding the driver generated), staged to a
    * parquet dir a file-source stream can read.
    */
  private lazy val staged: String = {
    val out = Files.createTempDirectory("graft_stream_equiv").toString
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw
      .select(timestamp_micros(graft.functions.EventTime.epochUs(raw))
          .as("ts"),
        col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(out)
    out
  }

  private def streamed: DataFrame = spark.readStream
    .schema("ts timestamp, event_id bigint, user_id bigint, " +
      "event_type string, value double")
    .parquet(staged)

  private def runComplete(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("windowedCounts micro-batch == batch q09 hourly aggregate") {
    val got = runComplete(
      StreamingIngest.windowedCounts(streamed,
        watermark = "10 minutes", window_ = "1 hour"), "wc_equiv")
      .select(expr("unix_micros(window_start)").as("hour_us"),
        col("event_type"), col("n"),
        graft.functions.PortableRound.pround(col("total_value"), 4)
          .as("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = SparkEntry.queries("q09_hourly_windows")(spark, dir)
      .select(col("hour_us"), col("event_type"), col("n"),
        col("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("sessionCounts micro-batch == batch q10 gaps-and-islands") {
    // session_window end = last event + gap, so duration = (end -
    // gap) - start; compare per-user session sequences
    val gapUs = 1800L * 1000000L
    val got = runComplete(
      StreamingIngest.sessionCounts(streamed, gap = "30 minutes"),
      "sc_equiv")
      .select(col("user_id"),
        expr("unix_micros(session_start)").as("start_us"),
        col("n_events"),
        (expr("unix_micros(session_end)") - gapUs
          - expr("unix_micros(session_start)")).as("duration_us"),
        graft.functions.PortableRound.pround(col("total_value"), 4)
          .as("total_value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
      .map { case ((u, _), v) => u -> v }
    val want = SparkEntry.queries("q10_sessionize")(spark, dir)
      // session_id is 1-based in event-time order per user, so it
      // sorts identically to the streaming session_start
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"),
          r.getAs[Double]("total_value")))
      .sortBy(_._1)
      .map { case ((u, _), v) => u -> v }
    assert(want.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("intervalJoin micro-batch == static join with the same predicate") {
    val leftS = streamed.filter(col("event_type") === "purchase")
      .select(col("ts"), col("user_id"), col("event_id"))
    val rightS = streamed
      .select(col("ts"), col("user_id"), col("event_id"))
    val q = StreamingIngest
      .intervalJoin(leftS, rightS, "user_id", windowSpec = "1 hour",
        watermark = "10 minutes")
      .select(col("event_id"), col("r_event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("ivj_equiv").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ivj_equiv").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = spark.read.parquet(staged)
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("l_ts"), col("user_id"),
        col("event_id").as("l_id"))
    val r = ev.select(col("ts").as("r_ts"), col("user_id"),
      col("event_id").as("r_id"))
    val want = l.join(r, Seq("user_id"))
      .filter(col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr("INTERVAL 1 hour"))
      .select(col("l_id"), col("r_id"))
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("enrichStream micro-batch == batch broadcast dim join") {
    import spark.implicits._
    // derive a small dim from the data itself: user cohort + weight
    val dim = spark.read.parquet(staged)
      .select((col("user_id") % 7).as("cohort")).distinct()
      .select(col("cohort"),
        concat(lit("tier_"), (col("cohort") % 3).cast("string"))
          .as("tier"))
    val q = StreamingIngest.enrichStream(
        streamed.withColumn("cohort", col("user_id") % 7),
        dim, Seq("cohort"))
      .select(col("event_id"), col("tier"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enr_equiv").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enr_equiv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = spark.read.parquet(staged)
      .withColumn("cohort", col("user_id") % 7)
      .join(dim, Seq("cohort"), "left_outer")
      .select(col("event_id"), col("tier"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("streaming dirty-shard delta == batch dirtyShards on the " +
      "unioned input; untouched buckets provably clean and omitted") {
    import graft.operators.Release
    import graft.sampling.Packing
    val canonical = Files.createTempDirectory("graft_dsd_c").toString
    val delta = Files.createTempDirectory("graft_dsd_d").toString
    val chunker: DataFrame => DataFrame = d => d.select(
      col("doc_id"), lit(0).cast("int").as("chunk_idx"),
      size(split(col("text"), " ")).cast("long")
        .as("n_chunk_tokens"),
      md5(col("text")).as("chunk_hash"))
    def pack(d: DataFrame) =
      Packing.packSequences(chunker(d), capacity = 4, buckets = 4)
    val b0 = Seq((0L, "aa bb"), (1L, "cc dd"), (2L, "ee ff"),
      (3L, "gg hh")).toDF("doc_id", "text")
    val b1 = Seq((4L, "ii jj"), (5L, "kk ll")).toDF("doc_id", "text")
    StreamingIngest.commitBatchWithDirtyShards(b0, canonical, 0L,
      delta, chunker, capacity = 4, buckets = 4)
    StreamingIngest.commitBatchWithDirtyShards(b1, canonical, 1L,
      delta, chunker, capacity = 4, buckets = 4)
    def key(df: DataFrame): Set[(Int, Boolean, String, String)] =
      df.collect().map(r => (r.getAs[Int]("bucket"),
        r.getAs[Boolean]("dirty"),
        Option(r.getAs[String]("fp_v0")).getOrElse(""),
        Option(r.getAs[String]("fp_v1")).getOrElse(""))).toSet
    val deltas = StreamingIngest.readDirtyShardDeltas(spark, delta)
    // batch 1 touched buckets 0 and 1 only — 2 and 3 never appear in
    // its delta, and its rows equal the BATCH dirtyShards between the
    // pre- and post-commit corpora restricted to the touched buckets
    val d1 = deltas.filter(col("batch_id") === 1L)
    assert(d1.select(col("bucket")).collect().map(_.getInt(0)).toSet
      == Set(0, 1))
    val batchD1 = Release.dirtyShards(
      Release.manifest(pack(b0)),
      Release.manifest(pack(b0.unionByName(b1))))
    assert(key(d1) == key(batchD1.filter(col("bucket") < 2)))
    // the omitted buckets are PROVABLY clean in the batch compute
    assert(batchD1.filter(col("bucket") >= 2)
      .collect().forall(!_.getAs[Boolean]("dirty")))
    // cold start: batch 0's delta shows all four buckets added-dirty
    val d0 = deltas.filter(col("batch_id") === 0L)
    assert(key(d0) == key(Release.dirtyShards(
      Release.manifest(pack(b0)).filter(lit(false)),
      Release.manifest(pack(b0)))))
    assert(d0.collect().forall(_.getAs[Boolean]("dirty")))
  }

  test("dirty-shard delta survives replay and a crash between the " +
      "canonical marker and the delta write") {
    import graft.operators.Release
    val canonical = Files.createTempDirectory("graft_dsd_c2").toString
    val delta = Files.createTempDirectory("graft_dsd_d2").toString
    val chunker: DataFrame => DataFrame = d => d.select(
      col("doc_id"), lit(0).cast("int").as("chunk_idx"),
      size(split(col("text"), " ")).cast("long")
        .as("n_chunk_tokens"),
      md5(col("text")).as("chunk_hash"))
    val b0 = Seq((0L, "aa bb"), (1L, "cc dd")).toDF("doc_id", "text")
    val b1 = Seq((4L, "ii jj")).toDF("doc_id", "text")
    StreamingIngest.commitBatchWithDirtyShards(b0, canonical, 0L,
      delta, chunker, capacity = 4, buckets = 4)
    // crash window: the canonical commit of batch 1 lands but the
    // driver dies before the delta write...
    StreamingIngest.commitBatch(b1, canonical, 1L)
    // ...the replay must derive "before" as committed-minus-batch-1
    // and publish the delta batch 1 would have produced
    StreamingIngest.commitBatchWithDirtyShards(b1, canonical, 1L,
      delta, chunker, capacity = 4, buckets = 4)
    val d1 = StreamingIngest.readDirtyShardDeltas(spark, delta)
      .filter(col("batch_id") === 1L).collect()
    assert(d1.map(_.getAs[Int]("bucket")).toSet == Set(0))
    assert(d1.forall(_.getAs[Boolean]("dirty")))
    val before = d1.map(r =>
      Option(r.getAs[String]("fp_v0"))).toSeq
    assert(before.forall(_.isDefined),
      "the replayed delta still sees the PRE-commit fingerprint")
    // a full replay of an already-published delta is a no-op
    val snap = StreamingIngest.readDirtyShardDeltas(spark, delta)
      .collect().map(_.toString).toSet
    StreamingIngest.commitBatchWithDirtyShards(b1, canonical, 1L,
      delta, chunker, capacity = 4, buckets = 4)
    assert(StreamingIngest.readDirtyShardDeltas(spark, delta)
      .collect().map(_.toString).toSet == snap)
  }

  test("streaming cluster-label maintenance == batch simhashClusters " +
      "over the unioned corpus, under ANY micro-batch split") {
    import graft.dedup.Dedup
    // near-dup structured docs (8 base texts; exact copies + one-token
    // mutations) staged as FOUR files, streamed one file per trigger —
    // the equivalence must hold whatever the trigger batching
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(29)
    val all = (0 until 48).map { i =>
      val g = i % 8
      val base = (0 until 24).map(j =>
        words((g * 7 + j * 3 + g * j) % words.length))
      val txt = if (i % 3 == 0) base
        else base.updated(rnd.nextInt(24),
          words(rnd.nextInt(words.length)))
      (i.toLong, txt.mkString(" "))
    }
    val landing = Files.createTempDirectory("graft_lbl_land").toString
    all.grouped(12).zipWithIndex.foreach { case (slice, i) =>
      slice.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/f$i")
    }
    val canonical = Files.createTempDirectory("graft_lbl_c").toString
    val labels = Files.createTempDirectory("graft_lbl_l").toString
    val checkpoint = Files.createTempDirectory("graft_lbl_ck").toString
    val stream = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/f*")
    StreamingIngest.runAvailable(
      StreamingIngest.toCanonicalWithClusterLabels(stream, canonical,
        checkpoint, labels, maxHamming = 12))
    val got = StreamingIngest.readClusterLabels(spark, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.simhashClusters(all.toDF("doc_id", "text"),
        maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("cluster-label maintenance survives replay and the torn " +
      "window between the label write and its marker") {
    import graft.dedup.Dedup
    import org.apache.hadoop.fs.Path
    val canonical = Files.createTempDirectory("graft_lblr_c").toString
    val labels = Files.createTempDirectory("graft_lblr_l").toString
    val b0 = Seq((0L, "same text here"), (1L, "same text here"),
      (2L, "other words entirely")).toDF("doc_id", "text")
    val b1 = Seq((10L, "same text here"), (11L, "unrelated again"))
      .toDF("doc_id", "text")
    StreamingIngest.commitBatchWithClusterLabels(b0, canonical, 0L,
      labels, "doc_id", "text", 3)
    StreamingIngest.commitBatchWithClusterLabels(b1, canonical, 1L,
      labels, "doc_id", "text", 3)
    val snap = StreamingIngest.readClusterLabels(spark, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snap == Set((0L, 0L), (1L, 0L), (10L, 0L)))
    // full replay of a committed cycle is a no-op (marker short-circuit)
    StreamingIngest.commitBatchWithClusterLabels(b1, canonical, 1L,
      labels, "doc_id", "text", 3)
    assert(StreamingIngest.readClusterLabels(spark, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == snap)
    // torn window: the label table landed but the driver died before
    // the marker — the replay recomputes the IDENTICAL labels from
    // "committed canonical minus this batch"
    val fs = new Path(labels)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(labels, "_done/1"), false)
    StreamingIngest.commitBatchWithClusterLabels(b1, canonical, 1L,
      labels, "doc_id", "text", 3)
    assert(StreamingIngest.readClusterLabels(spark, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == snap)
    // and the streamed result equals the batch recompute
    assert(snap == Dedup.simhashClusters(b0.unionByName(b1),
        maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("crawl ingest: streaming WARC segmentation == batch parse") {
    // the crawl layer as a STREAM: containers arrive as files, the
    // partition-local record walk (mapPartitions — stateless, so it
    // runs unchanged under micro-batch) emits identical records to
    // the batch path, charset resolution included
    import graft.sources.WarcIngest
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val shards = WarcIngest.warcShardsFromDocs(docs, 8)
    val stagedW = Files.createTempDirectory("graft_stream_warc").toString
    shards.write.mode("overwrite").parquet(stagedW)
    val streamedW = spark.readStream
      .schema("shard_id bigint, payload binary")
      .parquet(stagedW)
    val cols = Seq("shard_id", "rec_index", "rec_offset", "target_uri",
      "http_status", "body_md5", "charset")
    val q = WarcIngest.warcRecords(streamedW).toDF()
      .select(cols.map(col): _*)
      .writeStream.outputMode("append")
      .format("memory").queryName("warc_equiv").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("warc_equiv").collect().map(_.toSeq).toSet
    val want = WarcIngest.warcRecords(shards).toDF()
      .select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }
}
