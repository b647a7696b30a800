package graft

import org.apache.spark.sql.functions._
import graft.text.MultiPattern

/** Aho–Corasick multi-pattern scan (q139): automaton vs a naive
  * per-pattern indexOf differential, overlap/nesting semantics, and
  * the fit-once cache.
  */
class MultiPatternSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docsDf = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val pats = MultiPattern.cachedPatterns(docsDf, "text")

  /** All (possibly overlapping) occurrences of `p` in `s`. */
  private def occurrences(s: String, p: String): Int = {
    var n = 0; var i = s.indexOf(p)
    while (i >= 0) { n += 1; i = s.indexOf(p, i + 1) }
    n
  }

  private def acOn(texts: Seq[String],
                   patterns: Seq[String]): Seq[(Long, Long)] = {
    import spark.implicits._
    texts.toDF("text")
      .withColumn("st", MultiPattern.acStats(col("text"), patterns))
      .select(col("st.n_hits"), col("st.n_patterns"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
  }

  test("automaton agrees with per-pattern indexOf on corpus docs") {
    val texts = docsDf.select(col("text")).collect()
      .map(_.getString(0)).toSeq
    val got = acOn(texts, pats)
    texts.zip(got).foreach { case (t, (hits, np)) =>
      val per = pats.map(p => occurrences(t, p))
      assert(hits == per.sum.toLong, s"hit count diverges on: ${t.take(60)}")
      assert(np == per.count(_ > 0).toLong, s"distinct diverges on: ${t.take(60)}")
    }
    assert(got.exists(_._1 > 0), "no matches at sf0.001 — vacuous diff")
  }

  test("overlaps, nesting, and patterns-inside-patterns all count") {
    // "aaaa": aa at 0,1,2 (3) + aaa at 0,1 (2) = 5 hits, 2 patterns
    assert(acOn(Seq("aaaa"), Seq("aa", "aaa")) == Seq((5L, 2L)))
    // nested: "ab" inside "xaby"; shared prefix fail-link path
    assert(acOn(Seq("xabyab"), Seq("ab", "xaby")) == Seq((3L, 2L)))
    // dict-suffix: "she" ends both "she" and "he"
    assert(acOn(Seq("she"), Seq("she", "he", "hers")) == Seq((2L, 2L)))
    // no match
    assert(acOn(Seq("zzz"), Seq("aa", "aaa")) == Seq((0L, 0L)))
  }

  test("fit-once cache: second cachedPatterns call runs no fit") {
    val before = MultiPattern.fitRunCount.get()
    val again = MultiPattern.cachedPatterns(docsDf, "text")
    assert(MultiPattern.fitRunCount.get() == before)
    assert(again == pats)
    // the fixture vocabulary has < 48 length-4+ tokens — the cap is
    // an upper bound, not a guaranteed fill
    assert(pats.nonEmpty && pats.size <= 48 && pats.forall(_.length >= 4))
  }

  test("construction guards: width cap, duplicates, empty patterns") {
    import spark.implicits._
    val c = col("text")
    intercept[IllegalArgumentException] {
      MultiPattern.acStats(c, (1 to 65).map("p" + _))
    }
    intercept[IllegalArgumentException] {
      MultiPattern.acStats(c, Seq("dup", "dup"))
    }
    intercept[IllegalArgumentException] {
      MultiPattern.acStats(c, Seq("ok", ""))
    }
  }
}
