package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sim.{Similarity, VectorExpressions}
import graft.streaming.StreamingIngest

/** Streaming IVF maintenance (r13): streaming embedding ingest →
  * per-micro-batch assignment deltas → audit/refresh/fold cycles over
  * the versioned index — the served (centroids, assignments) pair
  * must equal composing the same operations in batch mode, across
  * replay, torn windows, and refresh boundaries.
  */
class StreamIvfSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
  }

  private def assignMap(df: DataFrame): Map[Long, Int] =
    df.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("cell")).toMap

  private def assignBatch(df: DataFrame,
                          cents: Seq[Array[Double]]): DataFrame =
    df.withColumn("cell",
      VectorExpressions.centroidAssign(col("embedding"), cents)
        .getField("cell"))

  test("streaming assignment deltas == batch assignment over the " +
      "union, under ANY micro-batch split") {
    val all = vecs(240, seed = 7)
    val landing = Files.createTempDirectory("graft_ivf_land").toString
    all.grouped(60).zipWithIndex.foreach { case (slice, i) =>
      slice.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/f$i")
    }
    val canonical = Files.createTempDirectory("graft_ivf_c").toString
    val index = Files.createTempDirectory("graft_ivf_i").toString
    val checkpoint = Files.createTempDirectory("graft_ivf_ck").toString
    val cents = Similarity.gridCentroids(6, 8)
    StreamingIngest.seedIvfIndex(spark, index, cents)
    val stream = spark.readStream
      .schema("vec_id bigint, embedding array<float>")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/f*")
    StreamingIngest.runAvailable(
      StreamingIngest.toCanonicalWithIvfAssignments(stream, canonical,
        checkpoint, index))
    val (servedCents, served) =
      StreamingIngest.readIvfServing(spark, index)
    assert(servedCents.map(_.toSeq) == cents.map(_.toSeq))
    val want = assignMap(
      assignBatch(all.toDF("vec_id", "embedding"), cents))
    assert(assignMap(served) == want)
    assert(served.count() == 240L)
  }

  test("refresh mid-stream: deltas fold into a versioned base, dirty " +
      "cells refit/re-route exactly as the batch refresh, and later " +
      "batches route against the UPDATED centroids") {
    val all = vecs(400, seed = 11)
    val slices = all.grouped(100).toSeq
    val canonical = Files.createTempDirectory("graft_ivfr_c").toString
    val index = Files.createTempDirectory("graft_ivfr_i").toString
    val cents0 = Similarity.gridCentroids(6, 8)
    StreamingIngest.seedIvfIndex(spark, index, cents0)
    def commit(i: Int): Unit =
      StreamingIngest.commitBatchWithIvfAssignments(
        slices(i).toDF("vec_id", "embedding"), canonical, i.toLong,
        index, "vec_id", "embedding")
    commit(0); commit(1)
    // audit threshold below the biggest cell so at least one is dirty
    val (c01, a01) = StreamingIngest.readIvfServing(spark, index)
    val stats = Similarity.ivfAssignedCellStats(a01, c01)
    val maxOcc = stats.agg(max(col("n_vecs"))).head.getLong(0) - 1
    StreamingIngest.refreshIvfServing(spark, index, maxOcc,
      minMeanAffinity = -1.0)
    // batch-mode composition of the SAME cycle
    val firstHalf = assignBatch(
      (slices(0) ++ slices(1)).toDF("vec_id", "embedding"), cents0)
    val dirty = Similarity.dirtyCellsFromStats(
      Similarity.ivfAssignedCellStats(firstHalf, cents0), maxOcc,
      minMeanAffinity = -1.0)
    assert(dirty.nonEmpty)
    val (cents1, reassigned) = Similarity.ivfRefreshDirtyCells(
      firstHalf, cents0, dirty)
    val serving1 = firstHalf
      .filter(!col("cell").isin(dirty.map(Int.box): _*))
      .unionByName(reassigned)
    val (gotCents, gotServing) =
      StreamingIngest.readIvfServing(spark, index)
    assert(gotCents.map(_.toSeq) == cents1.map(_.toSeq))
    assert(assignMap(gotServing) == assignMap(serving1))
    // refresh at the same high-water mark short-circuits
    StreamingIngest.refreshIvfServing(spark, index, maxOcc,
      minMeanAffinity = -1.0)
    assert(assignMap(StreamingIngest.readIvfServing(spark, index)._2)
      == assignMap(serving1))
    // later batches route against the REFRESHED centroids
    commit(2); commit(3)
    val tail = assignBatch(
      (slices(2) ++ slices(3)).toDF("vec_id", "embedding"), cents1)
    val want = assignMap(serving1) ++ assignMap(tail)
    val (fc, fserving) = StreamingIngest.readIvfServing(spark, index)
    assert(fc.map(_.toSeq) == cents1.map(_.toSeq))
    assert(assignMap(fserving) == want)
    assert(fserving.count() == 400L)
  }

  test("delta cycles survive replay and the torn window between the " +
      "delta write and its marker; cold start without a seed fails " +
      "loudly") {
    val canonical = Files.createTempDirectory("graft_ivft_c").toString
    val index = Files.createTempDirectory("graft_ivft_i").toString
    val b0 = vecs(40, seed = 3).toDF("vec_id", "embedding")
    // no seed yet: the assigner refuses rather than routing nowhere
    val ex = intercept[IllegalArgumentException] {
      StreamingIngest.commitBatchWithIvfAssignments(b0, canonical, 0L,
        index, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("seedIvfIndex"))
    val cents = Similarity.gridCentroids(4, 8)
    StreamingIngest.seedIvfIndex(spark, index, cents)
    StreamingIngest.commitBatchWithIvfAssignments(b0, canonical, 0L,
      index, "vec_id", "embedding")
    val snap = assignMap(StreamingIngest.readIvfServing(spark, index)._2)
    assert(snap == assignMap(assignBatch(b0, cents)))
    // full replay of a committed cycle is a no-op
    StreamingIngest.commitBatchWithIvfAssignments(b0, canonical, 0L,
      index, "vec_id", "embedding")
    assert(assignMap(
      StreamingIngest.readIvfServing(spark, index)._2) == snap)
    // torn window: delta landed, marker didn't — replay republishes
    // the identical delta
    val fs = new Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(index, "_done/0"), false)
    StreamingIngest.commitBatchWithIvfAssignments(b0, canonical, 0L,
      index, "vec_id", "embedding")
    assert(assignMap(
      StreamingIngest.readIvfServing(spark, index)._2) == snap)
  }

  test("gc prunes absorbed deltas and superseded bases (seed " +
      "included); serving and later batches are unaffected") {
    val all = vecs(200, seed = 17)
    val slices = all.grouped(50).toSeq
    val canonical = Files.createTempDirectory("graft_ivfg_c").toString
    val index = Files.createTempDirectory("graft_ivfg_i").toString
    val cents = Similarity.gridCentroids(6, 8)
    StreamingIngest.seedIvfIndex(spark, index, cents)
    def commit(i: Int): Unit =
      StreamingIngest.commitBatchWithIvfAssignments(
        slices(i).toDF("vec_id", "embedding"), canonical, i.toLong,
        index, "vec_id", "embedding")
    commit(0); commit(1)
    // only the seed base exists: nothing is absorbed yet
    assert(StreamingIngest.gcIvfIndex(spark, index).isEmpty)
    StreamingIngest.refreshIvfServing(spark, index,
      maxOccupancy = Long.MaxValue, minMeanAffinity = -1.0)
    val snap = assignMap(StreamingIngest.readIvfServing(spark, index)._2)
    val pruned = StreamingIngest.gcIvfIndex(spark, index)
    assert(pruned.exists(_.contains("delta/batch=0")) &&
      pruned.exists(_.contains("delta/batch=1")) &&
      pruned.exists(_.contains("base/upto=-1")), s"pruned: $pruned")
    val fs = new Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(index, "delta/batch=0")))
    assert(fs.exists(new Path(index, "_done/0")))
    assert(assignMap(
      StreamingIngest.readIvfServing(spark, index)._2) == snap)
    // later batches and a second refresh keep working; gc reclaims
    // the superseded base
    commit(2); commit(3)
    StreamingIngest.refreshIvfServing(spark, index,
      maxOccupancy = Long.MaxValue, minMeanAffinity = -1.0)
    val pruned2 = StreamingIngest.gcIvfIndex(spark, index)
    assert(pruned2.exists(_.contains("base/upto=1")), s"$pruned2")
    assert(StreamingIngest.readIvfServing(spark, index)._2.count()
      == 200L)
    assert(StreamingIngest.gcIvfIndex(spark, index).isEmpty)
  }
}
