package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.SuffixRepeats
import graft.model.Artifacts

/** Incremental suffix-index maintenance (r13):
  * [[SuffixRepeats.mergeSpanList]] must be indistinguishable from a
  * full prefix-octupling rebuild over (corpus ∪ batch) — checked on
  * planted-repeat corpora across splits, chained batches, and an
  * [[Artifacts.saveSuffixIndex]] persistence boundary.
  */
class SuffixMergeSpec extends SparkSpec {

  import spark.implicits._

  /** One doc: per-doc-unique filler runs with shared repeat blocks
    * (block b = tokens b<b>w0..w<len-1>) spliced between them —
    * repeats exist exactly where two docs carry the same block id.
    */
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

  // 12 docs; blocks 0-3 shared across various docs, block lengths
  // straddling minLen = 5 so sub-threshold repeats are exercised too
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

  test("single-task span build equals the distributed octupling " +
      "rounds (r13 size-adaptive build)") {
    // planted repeats incl. an equal-whole-suffix pair (docs ending in
    // the same block) and a below-minLen block
    val all = corpus(0 until 12)
    val viaLocal = spansOf(SuffixRepeats.repeatedSpanList(df(all), 5))
    assert(SuffixRepeats.lastBuildLocal.get(),
      "small corpus must take the single-task path")
    spark.conf.set("graft.sa.localTokenMax", "0")
    try {
      // threshold 0 forces the distributed rounds; bypass the
      // fit-once cache with a distinct (shuffled-order) plan
      val viaDist = spansOf(
        SuffixRepeats.repeatedSpanList(df(all.reverse), 5))
      assert(!SuffixRepeats.lastBuildLocal.get(),
        "threshold 0 must take the distributed rounds")
      assert(viaLocal == viaDist && viaLocal.nonEmpty)
    } finally spark.conf.unset("graft.sa.localTokenMax")
  }

  test("merged equals the full rebuild for every history/batch " +
      "split of a planted-repeat corpus") {
    val all = corpus(0 until 12)
    val full = spansOf(SuffixRepeats.repeatedSpanList(df(all), 5))
    for (m <- Seq(3, 4, 6)) {
      val hist = all.filter(_._1 % m != 0)
      val batch = all.filter(_._1 % m == 0)
      val (merged, grams) = SuffixRepeats.mergeSpanList(
        SuffixRepeats.repeatedSpanList(df(hist), 5),
        SuffixRepeats.gramIndex(df(hist), 5),
        df(hist), df(batch), minLen = 5)
      assert(spansOf(merged) == full,
        s"split %$m diverged from the full rebuild")
      // the merged gram index covers the union — the next cycle's
      // probe side is complete
      assert(grams.count() ==
        SuffixRepeats.gramIndex(df(all), 5).count())
    }
  }

  test("a repeat existing ONLY across the corpus/batch boundary is " +
      "found at its full extent") {
    // block 7 appears in exactly one history doc and one batch doc —
    // neither side alone contains a repeat at all
    val hist = Seq(doc(1L, 6, Seq((7, 9))), doc(2L, 6, Seq.empty))
    val batch = Seq(doc(10L, 5, Seq((7, 9))))
    val (merged, _) = SuffixRepeats.mergeSpanList(
      SuffixRepeats.repeatedSpanList(df(hist), 5),
      SuffixRepeats.gramIndex(df(hist), 5),
      df(hist), df(batch), minLen = 5)
    val got = spansOf(merged)
    // doc 1: filler(6) then the 9-token block at positions 7..15
    assert(got == Set((1L, 7L, 16L, 9L), (10L, 6L, 15L, 9L)),
      s"got $got")
    assert(got == spansOf(SuffixRepeats.repeatedSpanList(
      df(hist ++ batch), 5)))
  }

  test("a batch sharing no grams with history leaves old spans " +
      "bit-identical and adds only batch-internal repeats") {
    val hist = corpus(0 until 8)
    val oldSpans = SuffixRepeats.repeatedSpanList(df(hist), 5)
    // batch blocks 20/21 never occur in history; the two batch docs
    // share block 20
    val batch = Seq(doc(100L, 4, Seq((20, 7))),
      doc(101L, 4, Seq((20, 7), (21, 2))))
    val (merged, _) = SuffixRepeats.mergeSpanList(
      oldSpans, SuffixRepeats.gramIndex(df(hist), 5),
      df(hist), df(batch), minLen = 5)
    val histSide = spansOf(merged.filter(col("doc_id") < 100))
    assert(histSide == spansOf(oldSpans))
    assert(spansOf(merged) ==
      spansOf(SuffixRepeats.repeatedSpanList(df(hist ++ batch), 5)))
  }

  test("chained batches with the maintained index equal one full " +
      "rebuild; the index round-trips through its artifact") {
    val b0 = corpus(0 until 6)
    val b1 = corpus(6 until 9)
    val b2 = Seq(doc(20L, 5, Seq((0, 8), (9, 6))),
      doc(21L, 5, Seq((9, 6))))
    val root = Files.createTempDirectory("graft_sufidx").toString
    // cycle 0: full build over the first batch, persist
    Artifacts.saveSuffixIndex(
      SuffixRepeats.repeatedSpanList(df(b0), 5),
      SuffixRepeats.gramIndex(df(b0), 5), s"$root/v0")
    // cycle 1: load, merge, persist ("fresh driver" each cycle)
    val (s0, g0) = Artifacts.loadSuffixIndex(spark, s"$root/v0")
    val (s1, g1) = SuffixRepeats.mergeSpanList(s0, g0, df(b0),
      df(b1), minLen = 5)
    Artifacts.saveSuffixIndex(s1, g1, s"$root/v1")
    // cycle 2
    val (s1l, g1l) = Artifacts.loadSuffixIndex(spark, s"$root/v1")
    val (s2, _) = SuffixRepeats.mergeSpanList(s1l, g1l,
      df(b0 ++ b1), df(b2), minLen = 5)
    val full = spansOf(SuffixRepeats.repeatedSpanList(
      df(b0 ++ b1 ++ b2), 5))
    assert(spansOf(s2) == full)
  }

  test("the merge ranks only batch + candidate docs — uncontacted " +
      "history never enters the sub-build") {
    // candidate pruning is observable through the merged output when
    // an uncontacted doc's tokens are WRONG in the corpus frame the
    // merge receives: if the sub-build read them, its (still-correct)
    // old spans would be contradicted / new phantom spans appear.
    // Doc 2 shares nothing with the batch; hand it corrupted tokens
    // in corpusTok — a full rebuild over this frame would change doc
    // 2's spans (corrupt tokens repeat block 0), the merge must not.
    val hist = Seq(doc(1L, 6, Seq((0, 8))), doc(2L, 6, Seq((5, 9))),
      doc(3L, 6, Seq((5, 9))))
    val batch = Seq(doc(10L, 4, Seq((0, 8))))
    val oldSpans = SuffixRepeats.repeatedSpanList(df(hist), 5)
    val corrupted = df(Seq(doc(1L, 6, Seq((0, 8))),
      (2L, (0 until 20).map(j => s"b0w${j % 8}")), // fake block-0 runs
      doc(3L, 6, Seq((5, 9)))))
    val (merged, _) = SuffixRepeats.mergeSpanList(
      oldSpans, SuffixRepeats.gramIndex(df(hist), 5),
      corrupted, df(batch), minLen = 5)
    // doc 2's spans are its ORIGINAL ones: the merge never read its
    // (corrupted) tokens because no gram of the batch touches it
    assert(spansOf(merged.filter(col("doc_id") === 2L)) ==
      spansOf(oldSpans.filter(col("doc_id") === 2L)))
  }
}
