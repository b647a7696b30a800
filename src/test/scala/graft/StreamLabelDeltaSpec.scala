package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.streaming.StreamingIngest

/** Delta-publication cluster-label maintenance (r13): the streaming
  * cycle that publishes ONLY changed/created label rows per
  * micro-batch ([[StreamingIngest.toCanonicalWithClusterLabelDeltas]])
  * must serve — through the latest-wins overlay, across compaction
  * boundaries, and under replay — exactly what the full-republish
  * variant and the batch recompute serve.
  */
class StreamLabelDeltaSpec extends SparkSpec {

  import spark.implicits._

  /** Near-dup corpus: 8 base texts, exact copies + one-token
    * mutations — the same construction as the full-republish
    * equivalence test, so the two variants face identical cluster
    * structure.
    */
  private def corpus: Seq[(Long, String)] = {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
    val rnd = new scala.util.Random(31)
    (0 until 48).map { i =>
      val g = i % 8
      val base = (0 until 24).map(j =>
        words((g * 7 + j * 3 + g * j) % words.length))
      val txt = if (i % 3 == 0) base
        else base.updated(rnd.nextInt(24),
          words(rnd.nextInt(words.length)))
      (i.toLong, txt.mkString(" "))
    }
  }

  private def labelSet(df: org.apache.spark.sql.DataFrame)
      : Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streaming delta maintenance: overlay == batch simhashClusters " +
      "over the unioned corpus, under ANY micro-batch split") {
    val all = corpus
    val landing = Files.createTempDirectory("graft_ld_land").toString
    all.grouped(12).zipWithIndex.foreach { case (slice, i) =>
      slice.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/f$i")
    }
    val canonical = Files.createTempDirectory("graft_ld_c").toString
    val labels = Files.createTempDirectory("graft_ld_l").toString
    val checkpoint = Files.createTempDirectory("graft_ld_ck").toString
    val stream = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/f*")
    StreamingIngest.runAvailable(
      StreamingIngest.toCanonicalWithClusterLabelDeltas(stream,
        canonical, checkpoint, labels, maxHamming = 12))
    val got = labelSet(
      StreamingIngest.readClusterLabelsOverlay(spark, labels))
    val want = labelSet(Dedup.simhashClusters(
      all.toDF("doc_id", "text"), maxHamming = 12))
    assert(want.nonEmpty)
    assert(got == want)
    // the point of the scheme: per-cycle publications are DELTAS —
    // the total rows shipped across all cycles stay close to the
    // final table (each doc written once plus relabel slivers), not
    // cycles × corpus as full-republish ships
    val ids = (0 until 4).map(_.toLong)
    val shipped = ids.map(i => spark.read
      .parquet(s"$labels/delta/batch=$i").count()).sum
    assert(shipped < 2L * want.size,
      s"shipped $shipped rows for a ${want.size}-row final table")
  }

  test("compaction mid-stream: the overlay is identical before and " +
      "after, later cycles merge into the compacted base, and " +
      "re-compaction at the same mark short-circuits") {
    val all = corpus
    val canonical = Files.createTempDirectory("graft_ldc_c").toString
    val labels = Files.createTempDirectory("graft_ldc_l").toString
    val slices = all.grouped(12).toSeq
    def commit(i: Int): Unit =
      StreamingIngest.commitBatchWithClusterLabelDeltas(
        slices(i).toDF("doc_id", "text"), canonical, i.toLong,
        labels, "doc_id", "text", 12)
    commit(0); commit(1)
    val mid = labelSet(
      StreamingIngest.readClusterLabelsOverlay(spark, labels))
    StreamingIngest.compactClusterLabels(spark, labels)
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == mid, "compaction changed the served table")
    val fs = new Path(labels)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new Path(labels, "_basedone/1")))
    // idempotent at the same high-water mark
    StreamingIngest.compactClusterLabels(spark, labels)
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == mid)
    // cycles after the compaction overlay onto the base
    commit(2); commit(3)
    val got = labelSet(
      StreamingIngest.readClusterLabelsOverlay(spark, labels))
    val want = labelSet(Dedup.simhashClusters(
      all.toDF("doc_id", "text"), maxHamming = 12))
    assert(got == want)
    // and compacting again folds everything into version=3
    StreamingIngest.compactClusterLabels(spark, labels)
    assert(fs.exists(new Path(labels, "_basedone/3")))
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == want)
  }

  test("delta cycles survive replay and the torn window between the " +
      "delta write and its marker") {
    val canonical = Files.createTempDirectory("graft_ldr_c").toString
    val labels = Files.createTempDirectory("graft_ldr_l").toString
    val b0 = Seq((0L, "same text here"), (1L, "same text here"),
      (2L, "other words entirely")).toDF("doc_id", "text")
    val b1 = Seq((10L, "same text here"), (11L, "unrelated again"))
      .toDF("doc_id", "text")
    StreamingIngest.commitBatchWithClusterLabelDeltas(b0, canonical,
      0L, labels, "doc_id", "text", 3)
    StreamingIngest.commitBatchWithClusterLabelDeltas(b1, canonical,
      1L, labels, "doc_id", "text", 3)
    val snap = labelSet(
      StreamingIngest.readClusterLabelsOverlay(spark, labels))
    assert(snap == Set((0L, 0L), (1L, 0L), (10L, 0L)))
    // cycle 1's delta is ONLY the attached doc — the {0,1} cluster's
    // unchanged rows never re-ship
    assert(labelSet(spark.read.parquet(s"$labels/delta/batch=1")) ==
      Set((10L, 0L)))
    // full replay of a committed cycle is a no-op (marker
    // short-circuit)
    StreamingIngest.commitBatchWithClusterLabelDeltas(b1, canonical,
      1L, labels, "doc_id", "text", 3)
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == snap)
    // torn window: the delta landed but the driver died before the
    // marker — the replay recomputes the IDENTICAL delta from
    // "committed canonical minus this batch"
    val fs = new Path(labels)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(labels, "_done/1"), false)
    StreamingIngest.commitBatchWithClusterLabelDeltas(b1, canonical,
      1L, labels, "doc_id", "text", 3)
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == snap)
    // and the streamed result equals the batch recompute
    assert(snap == labelSet(Dedup.simhashClusters(
      b0.unionByName(b1), maxHamming = 3)))
  }

  test("gc prunes deltas and bases superseded by the compaction; the " +
      "overlay and later cycles are unaffected") {
    val all = corpus
    val canonical = Files.createTempDirectory("graft_ldg_c").toString
    val labels = Files.createTempDirectory("graft_ldg_l").toString
    val slices = all.grouped(12).toSeq
    def commit(i: Int): Unit =
      StreamingIngest.commitBatchWithClusterLabelDeltas(
        slices(i).toDF("doc_id", "text"), canonical, i.toLong,
        labels, "doc_id", "text", 12)
    // before any compaction: nothing to prune
    commit(0); commit(1)
    assert(StreamingIngest.gcClusterLabels(spark, labels).isEmpty)
    StreamingIngest.compactClusterLabels(spark, labels)
    val mid = labelSet(
      StreamingIngest.readClusterLabelsOverlay(spark, labels))
    val pruned = StreamingIngest.gcClusterLabels(spark, labels)
    assert(pruned.exists(_.contains("delta/batch=0")) &&
      pruned.exists(_.contains("delta/batch=1")), s"pruned: $pruned")
    val fs = new Path(labels)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(labels, "delta/batch=0")))
    // the served table is untouched, sigs and _done markers survive
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == mid)
    assert(fs.exists(new Path(labels, "sigs/batch=0")))
    assert(fs.exists(new Path(labels, "_done/0")))
    // cycles continue after gc; second compaction supersedes the
    // first base, and gc reclaims it
    commit(2); commit(3)
    StreamingIngest.compactClusterLabels(spark, labels)
    val pruned2 = StreamingIngest.gcClusterLabels(spark, labels)
    assert(pruned2.exists(_.contains("base/version=1")), s"$pruned2")
    assert(!fs.exists(new Path(labels, "base/version=1")))
    assert(fs.exists(new Path(labels, "base/version=3")))
    assert(labelSet(StreamingIngest.readClusterLabelsOverlay(
      spark, labels)) == labelSet(Dedup.simhashClusters(
      all.toDF("doc_id", "text"), maxHamming = 12)))
    // gc again: nothing left to prune
    assert(StreamingIngest.gcClusterLabels(spark, labels).isEmpty)
  }
}
