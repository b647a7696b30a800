package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, SuffixRepeats}

/** Takedown-side incremental maintenance (r13 — the delete path of
  * the ingest loop): [[Dedup.retractClusters]] /
  * [[Dedup.simhashRetractClusters]] and
  * [[SuffixRepeats.retractSpanList]] must be indistinguishable from
  * the full recompute over (corpus ∖ removed) — including the cases
  * adds never hit: a removed bridge SPLITTING a cluster, and a
  * removed doc ERASING or SHRINKING another doc's repeat spans.
  */
class RetractionSpec extends SparkSpec {

  import spark.implicits._

  private def clustersOf(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def edgesDF(e: Seq[(Long, Long)]): DataFrame =
    e.toDF("id_a", "id_b")

  test("retractClusters: removing a bridge splits the cluster; the " +
      "recompute sees ONLY the touched clusters' survivors") {
    // 1-2-3-4-5 chained through bridge 3, plus an untouched pair 7-8
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
    val labels = Dedup.duplicateClusters(edgesDF(edges))
    var seenScope: Set[Long] = Set.empty
    val removed = Seq(3L).toDF("doc_id")
    val out = Dedup.retractClusters(labels, removed, { survivors =>
      seenScope = survivors.collect().map(_.getLong(0)).toSet
      val s = seenScope
      edgesDF(edges.filter(e =>
        s.contains(e._1) && s.contains(e._2)))
    })
    // scope: the touched cluster's survivors only — never 7/8
    assert(seenScope == Set(1L, 2L, 4L, 5L))
    // the chain split into {1,2} and {4,5}; 7-8 passed through
    assert(clustersOf(out) == Set((1L, 1L), (2L, 1L), (4L, 4L),
      (5L, 4L), (7L, 7L), (8L, 7L)))
  }

  test("retractClusters: an isolated survivor drops from the table " +
      "and a fully-removed cluster vanishes") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    val labels = Dedup.duplicateClusters(edgesDF(edges))
    // removing 2 strands 1 and 3 (no surviving edge); removing both
    // 5 and 6 erases that cluster entirely
    val out = Dedup.retractClusters(labels,
      Seq(2L, 5L, 6L).toDF("doc_id"),
      survivors => {
        val s = survivors.collect().map(_.getLong(0)).toSet
        edgesDF(edges.filter(e =>
          s.contains(e._1) && s.contains(e._2)))
      })
    assert(clustersOf(out).isEmpty)
  }

  /** The IncrementalDetectorSpec text fixture: 8 near-dup groups of
    * exact copies and one-token mutations.
    */
  private def textCorpus(n: Int): DataFrame = {
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa")
    val rnd = new scala.util.Random(13)
    (0 until n).map { i =>
      val g = i % 8
      val base = (0 until 24).map(j =>
        words((g * 7 + j * 3 + g * j) % words.length))
      val txt =
        if (i % 3 == 0) base
        else base.updated(rnd.nextInt(24),
          words(rnd.nextInt(words.length)))
      (i.toLong, txt.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("simhashRetractClusters equals the full recompute over the " +
      "surviving corpus, on every removal slice") {
    val d = textCorpus(60)
    val labels = Dedup.simhashClusters(d, maxHamming = 12)
    val sigs = Dedup.simhashTable(d)
    for (m <- Seq(4L, 7L)) {
      val removed = d.filter(col("doc_id") % m === 1)
        .select(col("doc_id"))
      val got = clustersOf(Dedup.simhashRetractClusters(
        labels, sigs, removed, maxHamming = 12))
      val want = clustersOf(Dedup.simhashClusters(
        d.filter(col("doc_id") % m =!= 1), maxHamming = 12))
      assert(got == want, s"removal slice %$m diverged")
    }
  }

  // ---- suffix-index retraction ----------------------------------

  private def doc(id: Long, filler: Int,
                  blocks: Seq[(Int, Int)]): (Long, Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    var f = 0
    def fill(n: Int): Unit = (0 until n).foreach { _ =>
      buf += s"f${id}x$f"; f += 1
    }
    fill(filler)
    blocks.foreach { case (b, len) =>
      (0 until len).foreach(j => buf += s"b${b}w$j")
      fill(filler)
    }
    (id, buf.toSeq)
  }

  private def df(rows: Seq[(Long, Seq[String])]): DataFrame =
    rows.toDF("doc_id", "tokens")

  private def spansOf(d: DataFrame): Set[(Long, Long, Long, Long)] =
    d.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

  private def corpus(ids: Range): Seq[(Long, Seq[String])] =
    ids.map { i =>
      val blocks = Seq(
        if (i % 3 == 0) Some((0, 8)) else None,
        if (i % 4 == 1) Some((1, 6)) else None,
        if (i % 5 == 2) Some((2, 12)) else None,
        if (i % 2 == 0) Some((3, 3)) else None // below minLen
      ).flatten
      doc(i.toLong, 4 + i % 3, blocks)
    }

  test("retractSpanList equals the full rebuild over the surviving " +
      "corpus, on every removal slice") {
    val all = corpus(0 until 12)
    for (m <- Seq(3, 4, 6)) {
      val kept = all.filter(_._1 % m != 1)
      val removed = all.filter(_._1 % m == 1).map(_._1)
        .toDF("doc_id")
      val (got, grams) = SuffixRepeats.retractSpanList(
        SuffixRepeats.repeatedSpanList(df(all), 5),
        SuffixRepeats.gramIndex(df(all), 5),
        df(all), removed, minLen = 5)
      val want = spansOf(SuffixRepeats.repeatedSpanList(df(kept), 5))
      assert(spansOf(got) == want, s"removal slice %$m diverged")
      // the retracted gram index is the survivors' — the next
      // cycle's probe side carries no removed rows
      assert(grams.count() ==
        SuffixRepeats.gramIndex(df(kept), 5).count())
    }
  }

  test("a removed doc ERASES a span whose only evidence it was, and " +
      "SHRINKS a span whose longer extension it carried") {
    // A: blocks 0 (len 8) + 1 (len 6); B: blocks 0 + 1; C: block 0's
    // 6-token PREFIX (block (0,6) emits b0w0..b0w5). Removing B:
    // A's block-1 span loses its only evidence (erased); A's block-0
    // span keeps matching C but only 6 deep (max_ell shrinks).
    val a = doc(1L, 5, Seq((0, 8), (1, 6)))
    val b = doc(2L, 5, Seq((0, 8), (1, 6)))
    val c = doc(3L, 5, Seq((0, 6)))
    val all = Seq(a, b, c)
    val (got, _) = SuffixRepeats.retractSpanList(
      SuffixRepeats.repeatedSpanList(df(all), 5),
      SuffixRepeats.gramIndex(df(all), 5),
      df(all), Seq(2L).toDF("doc_id"), minLen = 5)
    val want = spansOf(SuffixRepeats.repeatedSpanList(
      df(Seq(a, c)), 5))
    assert(spansOf(got) == want)
    val aSpans = spansOf(got).filter(_._1 == 1L)
    val aBefore = spansOf(
      SuffixRepeats.repeatedSpanList(df(all), 5)).filter(_._1 == 1L)
    // before: two spans (block 0 at ell 8, block 1 at ell 6);
    // after: ONE span, shrunk to the 6-token prefix evidence
    assert(aBefore.size == 2 && aBefore.exists(_._4 == 8L) &&
      aBefore.exists(_._4 == 6L))
    assert(aSpans.size == 1 && aSpans.head._4 == 6L,
      s"expected the block-0 span shrunk to 6, got $aSpans")
  }

  test("add/remove lifecycle: merge a batch, retract a slice, merge " +
      "again — the served index equals the final corpus's rebuild") {
    val all = corpus(0 until 12)
    val start = all.filter(_._1 < 6)
    val batch1 = all.filter(x => x._1 >= 6 && x._1 < 9)
    val removedIds = Seq(2L, 7L)
    val batch2 = all.filter(_._1 >= 9)
    var spans = SuffixRepeats.repeatedSpanList(df(start), 5)
    var grams = SuffixRepeats.gramIndex(df(start), 5)
    var corpusNow = start
    // merge batch1
    val m1 = SuffixRepeats.mergeSpanList(spans, grams,
      df(corpusNow), df(batch1), minLen = 5)
    spans = m1._1; grams = m1._2; corpusNow = corpusNow ++ batch1
    // retract
    val r1 = SuffixRepeats.retractSpanList(spans, grams,
      df(corpusNow), removedIds.toDF("doc_id"), minLen = 5)
    spans = r1._1; grams = r1._2
    corpusNow = corpusNow.filterNot(x => removedIds.contains(x._1))
    // merge batch2
    val m2 = SuffixRepeats.mergeSpanList(spans, grams,
      df(corpusNow), df(batch2), minLen = 5)
    val finalCorpus = corpusNow ++ batch2
    assert(spansOf(m2._1) ==
      spansOf(SuffixRepeats.repeatedSpanList(df(finalCorpus), 5)))
  }
}
