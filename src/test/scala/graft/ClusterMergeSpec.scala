package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.model.Artifacts

/** Incremental cluster maintenance (r12): [[Dedup.mergeClusters]]
  * must be indistinguishable from a full [[Dedup.duplicateClusters]]
  * recompute over the union of historical and new edges — checked on
  * hand-built graphs, on arbitrary splits of a seeded random graph,
  * and across an [[Artifacts.saveLabels]] persistence boundary.
  */
class ClusterMergeSpec extends SparkSpec {

  import spark.implicits._

  private def edgesDF(e: Seq[(Long, Long)]): DataFrame =
    e.toDF("id_a", "id_b")

  private def clustersOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("one new edge bridges two existing clusters; merged root is " +
      "the global min") {
    // history: {1,2} and {5,6} — two components
    val labels = Dedup.duplicateClusters(
      edgesDF(Seq((1L, 2L), (5L, 6L))))
    val merged = Dedup.mergeClusters(labels, edgesDF(Seq((2L, 6L))))
    assert(clustersOf(merged) ==
      Set((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L)))
  }

  test("in-cluster rediscovery and empty batches are no-ops") {
    val labels = Dedup.duplicateClusters(
      edgesDF(Seq((1L, 2L), (2L, 3L), (7L, 8L))))
    val before = clustersOf(labels)
    // an edge inside an existing component changes nothing
    val redisc = Dedup.mergeClusters(labels, edgesDF(Seq((1L, 3L))))
    assert(clustersOf(redisc) == before)
    // an empty batch changes nothing
    val empty = Dedup.mergeClusters(labels,
      edgesDF(Seq.empty[(Long, Long)]))
    assert(clustersOf(empty) == before)
  }

  test("previously-unlabeled endpoints label themselves: a fresh " +
      "batch forms its own cluster; an attach joins the old one") {
    val labels = Dedup.duplicateClusters(edgesDF(Seq((4L, 9L))))
    val merged = Dedup.mergeClusters(labels,
      edgesDF(Seq((20L, 21L), (21L, 22L), (9L, 30L))))
    assert(clustersOf(merged) == Set(
      (4L, 4L), (9L, 4L), (30L, 4L),
      (20L, 20L), (21L, 20L), (22L, 20L)))
  }

  test("merged equals the full recompute for every split of a " +
      "seeded random graph") {
    val rnd = new scala.util.Random(42)
    val all = (0 until 120).map { _ =>
      val a = rnd.nextInt(60).toLong
      val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val full = clustersOf(Dedup.duplicateClusters(edgesDF(all)))
    // three different history/batch splits, including a lopsided one
    for (frac <- Seq(0.2, 0.5, 0.9)) {
      val cut = (all.length * frac).toInt
      val (oldE, newE) = all.splitAt(cut)
      val labels = Dedup.duplicateClusters(edgesDF(oldE))
      val merged = Dedup.mergeClusters(labels, edgesDF(newE))
      assert(clustersOf(merged) == full,
        s"split at $frac diverged from the full recompute")
    }
  }

  test("chained batches: merging batch after batch equals one full " +
      "recompute over everything") {
    val b0 = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val b1 = Seq((2L, 10L), (30L, 31L))
    val b2 = Seq((11L, 20L), (31L, 1L))
    var labels = Dedup.duplicateClusters(edgesDF(b0))
    labels = Dedup.mergeClusters(labels, edgesDF(b1))
    labels = Dedup.mergeClusters(labels, edgesDF(b2))
    val full = clustersOf(
      Dedup.duplicateClusters(edgesDF(b0 ++ b1 ++ b2)))
    assert(clustersOf(labels) == full)
    // everything collapsed into the single global-min component
    assert(clustersOf(labels).forall(_._2 == 1L))
  }

  test("mergeClustersDelta: overlaying the delta onto the prior " +
      "labels reproduces the full merge on every seeded split") {
    val rnd = new scala.util.Random(77)
    val all = (0 until 140).map { _ =>
      val a = rnd.nextInt(70).toLong
      val b = rnd.nextInt(70).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    for (frac <- Seq(0.2, 0.5, 0.9)) {
      val cut = (all.length * frac).toInt
      val (oldE, newE) = all.splitAt(cut)
      val labels = Dedup.duplicateClusters(edgesDF(oldE))
      val prior = clustersOf(labels)
      val fullMerge =
        clustersOf(Dedup.mergeClusters(labels, edgesDF(newE)))
      val delta =
        clustersOf(Dedup.mergeClustersDelta(labels, edgesDF(newE)))
      // the delta is exactly the changed/created rows...
      assert(delta == fullMerge -- prior,
        s"split at $frac: delta != full \\ prior")
      // ...it never repeats an unchanged prior row...
      assert(delta.forall(r => !prior.contains(r)))
      // ...and latest-wins overlay (delta docs override prior docs)
      // reconstructs the full table
      val deltaDocs = delta.map(_._1)
      val overlay = prior.filterNot(r => deltaDocs.contains(r._1)) ++
        delta
      assert(overlay == fullMerge, s"split at $frac: overlay diverged")
    }
  }

  test("mergeClustersDelta: rediscoveries and empty batches publish " +
      "an EMPTY delta — the cycle ships nothing when nothing moved") {
    val labels = Dedup.duplicateClusters(
      edgesDF(Seq((1L, 2L), (2L, 3L), (7L, 8L))))
    assert(clustersOf(
      Dedup.mergeClustersDelta(labels, edgesDF(Seq((1L, 3L))))).isEmpty)
    assert(clustersOf(Dedup.mergeClustersDelta(labels,
      edgesDF(Seq.empty[(Long, Long)]))).isEmpty)
  }

  test("mergeClustersDelta is touched-cluster-sized: a one-edge " +
      "batch against a wide history publishes only the merged pair " +
      "of clusters") {
    val hist = (0 until 500).flatMap(i =>
      Seq((2L * i, 2L * i + 1L)))
    val labels = Dedup.duplicateClusters(edgesDF(hist))
    // bridge clusters {100,101} and {200,201}: exactly the two
    // touched clusters' rows whose labels move appear in the delta
    val delta = clustersOf(
      Dedup.mergeClustersDelta(labels, edgesDF(Seq((101L, 200L)))))
    assert(delta == Set((200L, 100L), (201L, 100L)))
  }

  test("labels persist and merge across a save/load boundary") {
    val p = Files.createTempDirectory("graft_labels").toString + "/l"
    val labels = Dedup.duplicateClusters(
      edgesDF(Seq((3L, 4L), (8L, 9L))))
    Artifacts.saveLabels(labels, p)
    val loaded = Artifacts.loadLabels(spark, p)
    assert(clustersOf(loaded) == clustersOf(labels))
    // the NEXT cycle merges into the LOADED table — the production
    // loop shape (restart between cycles loses nothing)
    val merged = Dedup.mergeClusters(loaded, edgesDF(Seq((4L, 8L))))
    assert(clustersOf(merged) ==
      Set((3L, 3L), (4L, 3L), (8L, 3L), (9L, 3L)))
  }

  test("a label table violating the min-label invariant fails " +
      "loudly instead of merging silently wrong") {
    // cluster_id above the doc id: impossible for duplicateClusters
    // output — a hand-edited artifact shape (r12 ADVICE item 4)
    val aboveId = Seq((2L, 9L), (9L, 9L)).toDF("doc_id", "cluster_id")
    val ex1 = intercept[Exception] {
      Dedup.mergeClusters(aboveId, edgesDF(Seq((2L, 5L)))).collect()
    }
    val chain1 = Iterator.iterate[Throwable](ex1)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain1.contains("min-label"))
    // a touched cluster_id with NO self-labeled root row: the merged
    // root min would be computed over a phantom label. Still fails AT
    // CALL TIME (the closure materializes its input eagerly), but the
    // probe now rides that job (r13 opt round 1), so the error
    // arrives as a raise_error inside the Spark exception chain.
    val noRoot = Seq((7L, 3L)).toDF("doc_id", "cluster_id")
    val ex2 = intercept[Exception] {
      Dedup.mergeClusters(noRoot, edgesDF(Seq((7L, 8L))))
    }
    val chain2 = Iterator.iterate[Throwable](ex2)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(chain2.contains("self-label"))
    // and a VALID table (root rows present) passes the same shapes
    val ok = Seq((3L, 3L), (7L, 3L)).toDF("doc_id", "cluster_id")
    val merged = Dedup.mergeClusters(ok, edgesDF(Seq((7L, 8L))))
    assert(clustersOf(merged) == Set((3L, 3L), (7L, 3L), (8L, 3L)))
  }

  test("the merge's closure runs on the batch-sized label graph, " +
      "not the corpus") {
    // corpus-scale history: 2000 docs in 1000 two-doc clusters; a
    // 3-edge batch. Only the two touched labels per bridging edge
    // enter the label graph (the in-cluster rediscovery enters
    // nothing), so the closure input is edges over ≤ 4 labels however
    // large the history — the historical edge list is never
    // re-propagated.
    val hist = (0L until 1000L).map(i => (2 * i, 2 * i + 1))
    val labels = Dedup.duplicateClusters(edgesDF(hist))
    val batch = edgesDF(Seq((1L, 2L), (3L, 4L), (100L, 101L)))
    val merged = Dedup.mergeClusters(labels, batch)
    val got = merged.filter(col("doc_id") <= 5L)
    assert(clustersOf(got) == Set(
      (0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 0L)))
    // untouched clusters keep their labels bit-for-bit
    assert(clustersOf(merged.filter(col("doc_id").isin(500L, 501L)))
      == Set((500L, 500L), (501L, 500L)))
  }
}
