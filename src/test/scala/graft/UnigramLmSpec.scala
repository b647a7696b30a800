package graft

import org.apache.spark.sql.functions._
import graft.text.UnigramLm

/** Unigram-LM tokenizer (q138): Viterbi exactness against a
  * brute-force enumeration, inventory coverage, fit-once caching,
  * and the unknown-character fallback.
  */
class UnigramLmSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docsDf = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val inv = UnigramLm.cachedInventory(docsDf, "text")
  private lazy val units = inv.toMap

  /** All segmentations of `cps` into pieces of length <=
    * MaxPieceLen, brute-forced; min packed cost under the inventory
    * (no fallback — callers pick covered words).
    */
  private def bruteBest(cps: Vector[String]): Long = {
    def rec(i: Int): Long =
      if (i == cps.length) 0L
      else (1 to math.min(UnigramLm.MaxPieceLen, cps.length - i)).map {
        l =>
          units.get(cps.slice(i, i + l).mkString) match {
            case Some(u) =>
              val rest = rec(i + l)
              if (rest == Long.MaxValue) Long.MaxValue
              else u * 64L + 1L + rest
            case None => Long.MaxValue
          }
      }.min
    rec(0)
  }

  private def cps(w: String): Vector[String] =
    w.map(_.toString).toVector.take(UnigramLm.MaxWordLen)

  test("Viterbi equals brute-force enumeration on real corpus words") {
    val words = docsDf
      .select(explode(text.TextAnalysis.tokens(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
      .filter(w => w.codePointCount(0, w.length) <= 18)
      .take(400)
    assert(words.length > 30, "fixture corpus too small for the diff")
    import spark.implicits._
    val got = words.toSeq.toDF("text")
      .withColumn("st", UnigramLm.viterbiStats(col("text"), inv))
      .select(col("text"), col("st.n_pieces"), col("st.cost_units"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    words.foreach { w =>
      val best = bruteBest(cps(w))
      assert(best != Long.MaxValue, s"'$w' not coverable — inventory broken")
      assert(got(w) == (best % 64L, best / 64L),
        s"Viterbi diverges from brute force on '$w'")
    }
  }

  test("inventory covers every corpus character (single-char pieces)") {
    val corpusChars = docsDf.select(col("text")).collect()
      .flatMap(_.getString(0).split("\\s+")).flatMap(_.toCharArray)
      .map(_.toString).toSet
    val missing = corpusChars.diff(units.keySet)
    assert(missing.isEmpty, s"chars missing from inventory: $missing")
  }

  test("fit-once cache: the second cachedInventory call runs no fit") {
    val before = UnigramLm.fitRunCount.get()
    val again = UnigramLm.cachedInventory(docsDf, "text")
    assert(UnigramLm.fitRunCount.get() == before,
      "cachedInventory re-ran the fit for an identical corpus plan")
    assert(again == inv)
  }

  test("unknown characters fall back instead of crashing") {
    import spark.implicits._
    // ß etc. chosen to be absent from the fixture corpus
    val alien = "ßþӒ"
    assume(!units.contains(alien.take(1)))
    val r = Seq(s"hello $alien").toDF("text")
      .withColumn("st", UnigramLm.viterbiStats(col("text"), inv))
      .select(col("st.n_tokens"), col("st.n_pieces"),
        col("st.cost_units")).collect().head
    assert(r.getLong(0) == 2L)
    // the alien word segments per-character at the pinned UNK cost
    assert(r.getLong(1) >= 1L + 3L)
    assert(r.getLong(2) >= 3L * 50000000L)
  }

  test("packed-cost bounds hold (n_pieces per word < 64 guaranteed)") {
    // MaxWordLen(32) < 64 — the invariant the % 64 / // 64 unpack and
    // the oracle's `units*64 + 1` depend on; pin it so a future
    // constant bump can't silently corrupt the packing
    assert(UnigramLm.MaxWordLen < 64)
  }
}
