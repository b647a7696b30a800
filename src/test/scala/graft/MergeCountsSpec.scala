package graft

import org.apache.spark.sql.Row
import graft.model.NgramLm

/** One tokenized corpus row — top-level so the product encoder works
  * in [[MergeCountsSpec]]'s mapped Dataset.
  */
case class TokRow(doc_id: Long, lang: String, tk: Seq[String])

/** Incremental LM refresh (r9 verdict item 6):
  * NgramLm.mergeCounts(newBatch) must equal a full refit over
  * history+batch BIT FOR BIT (the tables are associative integer
  * counts), and must never rescan the history corpus — asserted with
  * an accumulator wired into the history scan itself.
  */
class MergeCountsSpec extends SparkSpec {

  import spark.implicits._

  private val histRows = Seq(
    TokRow(1L, "en", Seq("a", "b", "a", "b", "a", "c")),
    TokRow(2L, "en", Seq("b", "c")),
    TokRow(3L, "xx", Seq("z", "z", "z")),
    TokRow(4L, "en", Seq("solo")))
  private val newRows = Seq(
    TokRow(10L, "en", Seq("a", "b", "d")),   // grows (a,b), adds (b,d)
    TokRow(11L, "en", Seq("d", "d")),        // brand-new pair (d,d)
    TokRow(12L, "xx", Seq("a", "b")),        // untrusted: ignored
    TokRow(13L, "en", Seq("one")))           // no bigrams

  private def tables(m: NgramLm.BigramLm)
      : (Set[Row], Set[Row], Set[Row], Long, Long) =
    (m.c12.collect().toSet, m.ctx.collect().toSet,
      m.cont.collect().toSet, m.nall, m.v)

  test("merged model == full refit bit-for-bit; the refresh never " +
      "rescans history") {
    val acc = spark.sparkContext.longAccumulator("histRowReads")
    val hist = histRows.toDS().map { r => acc.add(1); r }.toDF()
    val m = NgramLm.cachedBigram(hist)
    val readsAfterFit = acc.value.longValue
    assert(readsAfterFit > 0, "the fit itself scans history once")

    val merged = NgramLm.mergeCounts(m, newRows.toDS().toDF())
    val mergedT = tables(merged)
    assert(acc.value.longValue == readsAfterFit,
      "mergeCounts must touch ONLY the served model tables and the " +
        "new batch — zero history re-reads")

    // full refit over history + batch (no accumulator side)
    val full = NgramLm.cachedBigram((histRows ++ newRows).toDS().toDF())
    assert(mergedT == tables(full),
      s"merged model must be bit-identical to the refit:\n" +
        s"merged=$mergedT\nfull=${tables(full)}")

    // spot-check the associativity actually did something: (a,b)
    // grew from 2 to 3 and (d,d) appeared
    val c12 = merged.c12.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(c12(("a", "b")) == 3L && c12(("d", "d")) == 1L)
  }

  test("trigram merge == trigram refit, both orders, zero history " +
      "re-reads") {
    val acc = spark.sparkContext.longAccumulator("histRowReads3")
    val hist = histRows.toDS().map { r => acc.add(1); r }.toDF()
    val m = NgramLm.cachedTrigram(hist)
    val readsAfterFit = acc.value.longValue
    val merged = NgramLm.mergeCounts(m, newRows.toDS().toDF(), "en")
    val m3 = (merged.c123.collect().toSet,
      merged.ctx12.collect().toSet, merged.n3, tables(merged.bigram))
    assert(acc.value.longValue == readsAfterFit,
      "trigram merge must not rescan history")
    val full = NgramLm.cachedTrigram(
      (histRows ++ newRows).toDS().toDF())
    assert(m3 == ((full.c123.collect().toSet,
      full.ctx12.collect().toSet, full.n3, tables(full.bigram))),
      "merged trigram model must be bit-identical to the refit")
  }

  test("retractCounts == survivor refit bit-for-bit, zero survivor " +
      "re-reads; a never-ingested batch fails loudly") {
    val all = histRows ++ newRows
    val removed = Seq(newRows(0), newRows(1)) // docs 10, 11
    val kept = all.filterNot(r => removed.exists(_.doc_id == r.doc_id))
    val acc = spark.sparkContext.longAccumulator("corpusRowReads")
    val corpus = all.toDS().map { r => acc.add(1); r }.toDF()
    val m = NgramLm.cachedBigram(corpus)
    val readsAfterFit = acc.value.longValue
    val retracted = NgramLm.retractCounts(m, removed.toDS().toDF())
    val retractedT = tables(retracted)
    assert(acc.value.longValue == readsAfterFit,
      "retractCounts must touch ONLY the served model tables and " +
        "the removed batch — zero survivor re-reads")
    assert(retractedT == tables(NgramLm.cachedBigram(
      kept.toDS().toDF())),
      "retracted model must be bit-identical to the survivor refit")
    // (d,d) existed ONLY in removed doc 11: the pair, its context
    // row, and its vocabulary contribution all vanish
    val c12 = retracted.c12.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!c12.contains(("d", "d")) && !c12.contains(("b", "d")))
    // retracting the same batch AGAIN drives counts negative → loud
    val ex = intercept[IllegalStateException] {
      NgramLm.retractCounts(retracted, removed.toDS().toDF())
    }
    assert(ex.getMessage.contains("never (fully) ingested"))
  }

  test("trigram retract == survivor refit across the whole backoff " +
      "chain") {
    val all = histRows ++ newRows
    val removed = Seq(newRows(0))
    val kept = all.filterNot(_.doc_id == removed.head.doc_id)
    val m = NgramLm.cachedTrigram(all.toDS().toDF())
    val retracted = NgramLm.retractCounts(m, removed.toDS().toDF(),
      "en")
    val full = NgramLm.cachedTrigram(kept.toDS().toDF())
    assert((retracted.c123.collect().toSet,
      retracted.ctx12.collect().toSet, retracted.n3,
      tables(retracted.bigram)) ==
      ((full.c123.collect().toSet, full.ctx12.collect().toSet,
        full.n3, tables(full.bigram))),
      "retracted trigram model must equal the survivor refit")
  }
}
